"""§2.A `source_json` — semi-structured JSON ingest.

The reference's raw layer was GA API JSON payloads parsed row-by-row in
Python [SURVEY.md §3.1, unverified]. Spark-first version: JSON lines on
disk → schema-enforced `spark.read.json` (JVM Jackson parse, no Python),
full-fidelity round trip verified against the source table. Doubles
survive because Spark writes shortest-round-trip representations.
"""

from __future__ import annotations

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
