"""§2.A `source_csv` — delimited-text ingest.

Same contract as the JSON source: land the table as CSV, read it back
with an explicit schema (never infer at scale — that is a second full
pass over 100 TB), verify full fidelity against the source table. CSV
splits per-file like JSON lines, so read parallelism is file-granular;
doubles survive because Spark writes shortest-round-trip text.
"""

from __future__ import annotations

from ..operators._shared import scratch_dir, t
from ..registry import register


@register(
    "source_csv",
    oracle="SELECT event_id, user_id, event_type, value FROM events",
)
def source_csv(spark, sf_dir):
    out = scratch_dir("source_csv")
    (
        t(spark, sf_dir, "events")
        .select("event_id", "user_id", "event_type", "value")
        .write.mode("overwrite")
        .option("header", True)
        .csv(out)
    )
    return (
        spark.read.schema("event_id bigint, user_id bigint, event_type string, value double")
        .option("header", True)
        .csv(out)
    )
