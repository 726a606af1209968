#!/usr/bin/env python
"""Skew-join strategy study (SURVEY §6): the same hot-key join run three
ways, outputs proven identical, walls compared.

Setup: an 8M-row fact where ~45% of rows share ONE join key (the
Zipf-head tenant every multi-tenant fact table has) joined to a 1M-row
dim with a fat payload. Broadcast is disabled for the study — the case
under test is both-sides-too-big-to-broadcast, where a plain shuffle
join sends the entire hot key to one reducer.

Strategies:
  naive   — sort-merge join, AQE skew splitting OFF (the straggler).
  aqe     — AQE skew-join ON with thresholds scaled to the test size
            (at 100 TB the DEFAULT 256MB thresholds fire the same way;
            locally the hot partition is ~250MB so we lower the knobs
            proportionally rather than inflate the data 100x).
  salted  — the join_skew_salted pattern: fact salted by hash%16, dim
            exploded over the 16 salts, join on (key, salt).

Prints one JSON line per strategy: wall seconds + row count (must agree).
"""

from __future__ import annotations

import json
import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.session import build_session

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "skew_r7"
)
N_FACT = 8_000_000
N_DIM = 1_000_000
HOT_FRACTION = 0.45
N_SALT = 16


def build() -> None:
    os.makedirs(OUT, exist_ok=True)
    con = duckdb.connect()
    if not os.path.exists(f"{OUT}/fact.parquet"):
        con.execute(
            f"""
            COPY (
                SELECT CASE WHEN random() < {HOT_FRACTION} THEN 1
                            ELSE 1 + CAST(floor(random() * {N_DIM}) AS BIGINT) END AS k,
                       i AS fact_id,
                       repeat('x', 48) AS payload
                FROM range({N_FACT}) t(i)
            ) TO '{OUT}/fact.parquet' (FORMAT PARQUET)
            """
        )
    if not os.path.exists(f"{OUT}/dim.parquet"):
        con.execute(
            f"""
            COPY (
                SELECT 1 + i AS k, repeat('d', 96) AS dim_payload
                FROM range({N_DIM}) t(i)
            ) TO '{OUT}/dim.parquet' (FORMAT PARQUET)
            """
        )


def run_join(spark, salted: bool) -> int:
    fact = spark.read.parquet(f"{OUT}/fact.parquet")
    dim = spark.read.parquet(f"{OUT}/dim.parquet")
    if not salted:
        return fact.join(dim, "k").count()
    f = fact.withColumn("salt", F.pmod(F.xxhash64("fact_id"), F.lit(N_SALT)))
    d = dim.withColumn(
        "salt", F.explode(F.array(*[F.lit(i).cast("bigint") for i in range(N_SALT)]))
    )
    return f.join(d, ["k", "salt"]).count()


def main() -> None:
    build()
    spark = build_session("skew-study-r7", cpus=32)
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    spark.conf.set("spark.sql.adaptive.autoBroadcastJoinThreshold", "-1")

    results = {}
    for name, skew_on, salted in (
        ("naive", False, False),
        ("aqe", True, False),
        ("salted", False, True),
    ):
        spark.conf.set("spark.sql.adaptive.skewJoin.enabled", str(skew_on).lower())
        if skew_on:
            # Scale the 100 TB-default 256MB knobs to the test size.
            spark.conf.set(
                "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes", "16m"
            )
            spark.conf.set("spark.sql.adaptive.advisoryPartitionSizeInBytes", "16m")
        run_join(spark, salted)  # warm (file index + codegen)
        t0 = time.perf_counter()
        n = run_join(spark, salted)
        results[name] = {"wall_s": round(time.perf_counter() - t0, 2), "rows": n}
        print(json.dumps({name: results[name]}), flush=True)

    assert len({v["rows"] for v in results.values()}) == 1, results
    print(json.dumps({"study": "skew_join_r7", "results": results}))


if __name__ == "__main__":
    main()
