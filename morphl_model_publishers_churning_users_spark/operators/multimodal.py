"""Multimodal columns — binary payloads with typed metadata.

The mandated pattern for image/audio/video at 100 TB: payloads as opaque
``binary`` columns + a typed metadata struct, feature extraction as
Arrow-batched ``mapInPandas``. The decode step for real media is STUBBED
(no image/audio libs in this container — see ``decode_media``); the
Spark-side plumbing (schema, batch shape, partition flow) is real and
oracle-verified using utf-8 text payloads, whose features DuckDB can
recompute.
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
import pyspark.sql.functions as F

from ..registry import register
from ._shared import t


def decode_media(payload: bytes, modality: str) -> bytes:
    """Stub decode for real media. In production this dispatches to
    PIL/ffmpeg/torchaudio; those libs are not in this container."""
    if modality == "text-bytes":
        return payload
    raise NotImplementedError(f"decoder for modality {modality!r} not available")


_OUT_SCHEMA = "doc_id bigint, modality string, n_bytes bigint, checksum16 bigint"


def _extract(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Arrow-batched feature extraction over binary payloads."""
    for pdf in batches:
        decoded = [
            decode_media(p, m).decode("utf-8")
            for p, m in zip(pdf["payload"], pdf["modality"])
        ]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "modality": pdf["modality"].values,
                "n_bytes": [len(p) for p in pdf["payload"]],
                "checksum16": [sum(ord(ch) for ch in s[:16]) for s in decoded],
            }
        )


@register(
    "mm_features",
    oracle="""
SELECT d.doc_id,
       'text-bytes' AS modality,
       CAST(strlen(d.text) AS BIGINT) AS n_bytes,
       CAST(SUM(ord(substr(d.text, CAST(s.i AS INTEGER), 1))) AS BIGINT) AS checksum16
FROM documents d, generate_series(1, 16) s(i)
GROUP BY d.doc_id, strlen(d.text)
""",
)
def mm_features(spark, sf_dir):
    """Binary-column pipeline: text → utf-8 binary payload + metadata →
    mapInPandas feature extraction (byte count + 16-codepoint checksum,
    both recomputable by the oracle from the source text)."""
    d = t(spark, sf_dir, "documents")
    binified = d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text-bytes").alias("modality"),
    )
    return binified.mapInPandas(_extract, schema=_OUT_SCHEMA)
