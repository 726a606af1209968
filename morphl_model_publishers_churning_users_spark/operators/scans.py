"""§2.A — scans and sinks.

The reference's ingest scanned Cassandra via the spark-cassandra-connector
and wrote features back per day [SURVEY.md §2.A, unverified]; here the
storage layer is columnar parquet, where Catalyst gives predicate pushdown
and column pruning for free. At 100 TB these tables would be
date-partitioned and the sink below shows the partitioned-write shape
(partition column → directory → partition pruning on re-read).
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..registry import register
from ._shared import scratch_dir, t


@register("scan_parquet", oracle="SELECT * FROM lineitem")
def scan_parquet(spark, sf_dir):
    """Full table scan. Vectorized parquet reader; no shuffle."""
    return t(spark, sf_dir, "lineitem")


@register(
    "scan_projected",
    oracle="SELECT l_orderkey, l_linenumber, l_extendedprice, l_shipdate FROM lineitem",
)
def scan_projected(spark, sf_dir):
    """Pruned scan — Catalyst pushes the projection into the parquet
    ReadSchema so only 4 of 11 columns are decoded."""
    return t(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_linenumber", "l_extendedprice", "l_shipdate"
    )


@register(
    "sink_parquet_part",
    oracle="SELECT l_returnflag, COUNT(*) AS n_rows FROM lineitem GROUP BY l_returnflag",
)
def sink_parquet_part(spark, sf_dir):
    """Partitioned parquet write + re-read.

    Writes lineitem partitioned by l_returnflag (at 100 TB: by ship date),
    re-reads and counts per partition — verifying round-trip fidelity and
    demonstrating the layout partition pruning needs.
    """
    out = scratch_dir("sink_parquet_part")
    t(spark, sf_dir, "lineitem").write.mode("overwrite").partitionBy("l_returnflag").parquet(out)
    return (
        spark.read.parquet(out)
        .groupBy(F.col("l_returnflag").cast("string").alias("l_returnflag"))
        .agg(F.count("*").alias("n_rows"))
    )
