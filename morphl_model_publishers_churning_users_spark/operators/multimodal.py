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


_FRAME_BYTES = 16
_FRAME_STRIDE = 4

_FRAME_SCHEMA = "doc_id bigint, frame_idx bigint, frame_bytes bigint, frame_checksum bigint"


def _frame_sample(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """One input row → many output rows (sampled frames). The real-video
    version swaps the chunker for an ffmpeg keyframe iterator; the batch
    shape — explode inside the Arrow worker, never on the driver — is
    identical."""
    for pdf in batches:
        out: dict[str, list] = {"doc_id": [], "frame_idx": [], "frame_bytes": [], "frame_checksum": []}
        for doc_id, payload, modality in zip(pdf["doc_id"], pdf["payload"], pdf["modality"]):
            data = decode_media(payload, modality)
            n_frames = (len(data) + _FRAME_BYTES - 1) // _FRAME_BYTES
            for i in range(0, n_frames, _FRAME_STRIDE):
                frame = data[i * _FRAME_BYTES : (i + 1) * _FRAME_BYTES]
                out["doc_id"].append(doc_id)
                out["frame_idx"].append(i)
                out["frame_bytes"].append(len(frame))
                out["frame_checksum"].append(sum(frame))
        yield pd.DataFrame(out)


@register(
    "mm_framesample",
    oracle=f"""
WITH frames AS (
    SELECT doc_id,
           substr(text, CAST(unnest(range(0, CAST(ceil(strlen(text) / {_FRAME_BYTES}.0) AS BIGINT))) * {_FRAME_BYTES} + 1 AS INTEGER), {_FRAME_BYTES}) AS frame,
           unnest(range(0, CAST(ceil(strlen(text) / {_FRAME_BYTES}.0) AS BIGINT))) AS frame_idx
    FROM documents
)
SELECT doc_id, frame_idx,
       CAST(strlen(frame) AS BIGINT) AS frame_bytes,
       CAST(list_aggregate(list_transform(
               range(1, strlen(frame) + 1),
               j -> ord(substr(frame, CAST(j AS INTEGER), 1))),
            'sum') AS BIGINT) AS frame_checksum
FROM frames
WHERE frame_idx % {_FRAME_STRIDE} = 0
""",
)
def mm_framesample(spark, sf_dir):
    """Video-style frame sampling over a binary column: chunk the payload
    into fixed-size frames, keep every {stride}-th, one output row per
    sampled frame. The explode happens inside the Arrow batch (mapInPandas),
    so at 100 TB the fan-out never serializes through the driver and stays
    partition-local; decode is the stubbed deterministic chunker."""
    d = t(spark, sf_dir, "documents")
    binified = d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text-bytes").alias("modality"),
    )
    return binified.mapInPandas(_frame_sample, schema=_FRAME_SCHEMA)


_RESIZE_SCHEMA = "doc_id bigint, orig_bytes bigint, resized_bytes bigint, resized_checksum bigint"


def _resize(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
    """Downsample-by-2 'resize' over decoded payloads — stands in for a
    PIL thumbnail; same series→series Arrow batch shape."""
    for pdf in batches:
        decoded = [decode_media(p, m) for p, m in zip(pdf["payload"], pdf["modality"])]
        resized = [d[::2] for d in decoded]
        yield pd.DataFrame(
            {
                "doc_id": pdf["doc_id"].values,
                "orig_bytes": [len(d) for d in decoded],
                "resized_bytes": [len(r) for r in resized],
                "resized_checksum": [sum(r) for r in resized],
            }
        )


@register(
    "mm_resize",
    oracle="""
SELECT doc_id,
       CAST(strlen(text) AS BIGINT) AS orig_bytes,
       CAST((strlen(text) + 1) // 2 AS BIGINT) AS resized_bytes,
       CAST(list_aggregate(list_transform(
               range(1, strlen(text) + 1, 2),
               j -> ord(substr(text, CAST(j AS INTEGER), 1))),
            'sum') AS BIGINT) AS resized_checksum
FROM documents
""",
)
def mm_resize(spark, sf_dir):
    """Image-resize plumbing over a binary column: decode (stubbed) →
    downsample → re-emit features. Narrow per-partition transform, no
    shuffle; the production decode swaps in PIL without touching the
    Spark plan."""
    d = t(spark, sf_dir, "documents")
    binified = d.select(
        "doc_id",
        F.encode("text", "utf-8").alias("payload"),
        F.lit("text-bytes").alias("modality"),
    )
    return binified.mapInPandas(_resize, schema=_RESIZE_SCHEMA)
