"""§2.A `source_json` — semi-structured JSON ingest.

The reference's raw layer was GA API JSON payloads parsed row-by-row in
Python [SURVEY.md §3.1, unverified]. Spark-first version: JSON lines on
disk → schema-enforced `spark.read.json` (JVM Jackson parse, no Python),
full-fidelity round trip verified against the source table. Doubles
survive because Spark writes shortest-round-trip representations.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..operators._shared import scratch_dir, t
from ..registry import register


@register(
    "source_json",
    oracle="SELECT event_id, user_id, event_type, value FROM events",
)
def source_json(spark, sf_dir):
    """JSON-lines round-trip source: write events as JSONL, read back with schema — the semi-structured ingest path."""
    out = scratch_dir("source_json")
    (
        t(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .write.mode("overwrite")
        .json(out)
    )
    # Explicit schema: at 100 TB you never infer (a second full pass).
    return spark.read.schema(
        "event_id bigint, user_id bigint, event_type string, value double"
    ).json(out)


@register(
    "sink_json_lines",
    oracle="""
SELECT event_id, user_id, event_type, ROUND(value, 6) AS value,
       CAST(props->>'$.k' AS INTEGER) AS k
FROM events
""",
)
def sink_json_lines(spark, sf_dir):
    """JSON-lines sink round trip (gzip) — completes the sink format
    matrix (parquet/ORC/CSV/JSON): events written as compressed
    ndjson, read back schema-enforced. JSON's self-describing rows
    cost ~3-5× parquet on disk but are the interchange format half
    the downstream world ingests; the knob that matters at scale is
    the same as every unsplittable codec — written part count = read
    parallelism. The nested props payload is carried through the
    round trip as a re-parsed typed field, proving nested data
    survives the text format."""
    import os as _os

    from ..operators._shared import scratch_dir
    import pyspark.sql.functions as F

    out = scratch_dir(f"sink_json_{_os.path.basename(_os.path.abspath(sf_dir))}")
    (
        t(spark, sf_dir, "events")
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.round("value", 6).alias("value"),
            F.get_json_object("props", "$.k").cast("int").alias("k"),
        )
        .write.mode("overwrite")
        .option("compression", "gzip")
        .json(out)
    )
    return spark.read.schema(
        "event_id bigint, user_id bigint, event_type string, value double, k int"
    ).json(out)


@register(
    "source_json_multiline",
    oracle="""
SELECT lang, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents GROUP BY 1
""",
)
def source_json_multiline(spark, sf_dir):
    """Multi-line JSON ingest — ONE file holding one big JSON ARRAY
    (the REST-API-dump shape), read with multiLine=true: the reader
    must parse the whole document as a unit instead of splitting on
    newlines, which is exactly what breaks when someone points the
    default json-lines reader at an API dump. Staged from documents,
    re-read, and the per-lang profile hash-matches the source. The
    100 TB note on the op itself: a multiLine JSON file is NOT
    splittable — one task per file — so the pattern is quarantined to
    ingest edges and converted to parquet immediately (as here)."""
    import json as _json
    import os

    out = scratch_dir("source_json_multiline")
    docs = [
        {"doc_id": r["doc_id"], "lang": r["lang"], "n_chars": r["n_chars"]}
        for r in t(spark, sf_dir, "documents")
        .select("doc_id", "lang", "n_chars")
        .collect()
    ]
    path = os.path.join(out, "dump.json")
    with open(path, "w") as fh:
        _json.dump(docs, fh, indent=1)
    back = (
        spark.read.option("multiLine", True)
        .schema("doc_id bigint, lang string, n_chars bigint")
        .json(path)
    )
    return back.groupBy("lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("n_chars").cast("bigint").alias("total_chars"),
    )
