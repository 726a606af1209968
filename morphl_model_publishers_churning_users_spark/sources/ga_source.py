"""GA Reporting-API-style ingest — the reference's raw layer, Spark-first.

The reference's ingest core fetched Google Analytics `batchGet` JSON
(nested reports -> columnHeader + data.rows, every metric a STRING) and
parsed it row-by-row in Python [SURVEY.md SS3.1, unverified]. This op
reproduces that shape end-to-end without a per-row Python boundary:

  1. build deterministic batchGet-shaped payloads from `events` (one
     JSON document per day, metrics serialized as strings — GA parity);
  2. land them as a text file (the landing-zone boundary);
  3. parse with an EXPLICIT nested schema via from_json (JVM Jackson,
     whole-stage codegen) + explode, and cast the string metrics back.

The oracle recomputes the same per-(user, day) rollup straight from
`events`, so the whole JSON round-trip is hash-checked.
"""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from ..operators._shared import dsum, scratch_dir, t
from ..registry import register

_GA_SCHEMA = (
    "reports array<struct<"
    "columnHeader: struct<dimensions: array<string>, "
    "metricHeader: struct<metricHeaderEntries: array<struct<name: string>>>>, "
    "data: struct<rows: array<struct<"
    "dimensions: array<string>, metrics: array<struct<values: array<string>>>>>>>>"
)


def _stage_payloads(spark, sf_dir: str) -> str:
    out = scratch_dir(f"ga_payloads_{os.path.basename(os.path.abspath(sf_dir))}")
    marker = os.path.join(out, "_SUCCESS")
    if os.path.exists(marker):
        return out
    ev = t(spark, sf_dir, "events")
    per_user_day = ev.groupBy(
        F.to_date("ts").alias("day"), F.col("user_id")
    ).agg(
        F.count(F.lit(1)).alias("n_sessions"),
        F.sum(F.col("value").cast("decimal(38,6)")).alias("revenue"),
    )
    rows = per_user_day.groupBy("day").agg(
        F.collect_list(
            F.struct(
                F.array(
                    F.col("user_id").cast("string"), F.col("day").cast("string")
                ).alias("dimensions"),
                F.array(
                    F.struct(
                        F.array(
                            F.col("n_sessions").cast("string"),
                            F.col("revenue").cast("string"),
                        ).alias("values")
                    )
                ).alias("metrics"),
            )
        ).alias("rows")
    )
    payload = rows.select(
        F.to_json(
            F.struct(
                F.array(
                    F.struct(
                        F.struct(
                            F.array(
                                F.lit("ga:dimension1"), F.lit("ga:date")
                            ).alias("dimensions"),
                            F.struct(
                                F.array(
                                    F.struct(F.lit("ga:sessions").alias("name")),
                                    F.struct(F.lit("ga:transactionRevenue").alias("name")),
                                ).alias("metricHeaderEntries")
                            ).alias("metricHeader"),
                        ).alias("columnHeader"),
                        F.struct(F.col("rows").alias("rows")).alias("data"),
                    )
                ).alias("reports")
            )
        ).alias("value")
    )
    payload.write.mode("overwrite").text(out)
    return out


@register(
    "source_ga_json",
    oracle="""
SELECT user_id, CAST(ts AS DATE) AS day, COUNT(*) AS n_sessions,
       ROUND(CAST(SUM(CAST(value AS DECIMAL(38,6))) AS DOUBLE), 6) AS revenue
FROM events GROUP BY 1, 2
""",
)
def source_ga_json(spark, sf_dir):
    """batchGet JSON -> typed rows: explicit-schema from_json, nested
    explodes (reports -> data.rows), string-metric casts. All JVM-side;
    at 100 TB each payload file parses partition-locally with no Python
    in the loop — the Spark-native answer to the reference's json.loads."""
    staged = _stage_payloads(spark, sf_dir)
    raw = spark.read.text(staged)
    return (
        raw.select(F.from_json("value", _GA_SCHEMA).alias("p"))
        .select(F.explode("p.reports").alias("r"))
        .select(F.explode("r.data.rows").alias("row"))
        .select(
            F.col("row.dimensions")[0].cast("bigint").alias("user_id"),
            F.col("row.dimensions")[1].cast("date").alias("day"),
            F.col("row.metrics")[0]["values"][0].cast("bigint").alias("n_sessions"),
            F.round(F.col("row.metrics")[0]["values"][1].cast("double"), 6).alias("revenue"),
        )
    )
