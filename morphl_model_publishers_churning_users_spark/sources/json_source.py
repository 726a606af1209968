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
