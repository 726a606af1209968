"""Round-13b: decompose join_fuzzy_blocked cost (guide §1.1).

Variants (noop sink, min of PASSES at sf0.1, one sf0.001 warmup each):
  current   — registered op (threshold lev appears twice in the join cond)
  pairs     — the blocked join WITHOUT levenshtein: pair-formation cost only
  single    — ONE threshold-lev predicate (dist >= 0; -1 iff dist > 2, so
              dist>=0 alone is equivalent to 0<=dist<=2)
  postfilter— equi-join on (nation, key<) then .filter(dist>=0) after
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from morphl_model_publishers_churning_users_spark.operators._shared import t
from morphl_model_publishers_churning_users_spark.registry import get_queries
from morphl_model_publishers_churning_users_spark.session import build_session

PASSES = int(os.environ.get("PASSES", "3"))
SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def variants(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    a, b = c.alias("a"), c.alias("b")
    block = (F.col("a.c_nationkey") == F.col("b.c_nationkey")) & (
        F.col("a.c_custkey") < F.col("b.c_custkey")
    )
    dist = F.levenshtein(F.col("a.c_name"), F.col("b.c_name"), 2)
    sel = [
        F.col("a.c_custkey").alias("key_a"),
        F.col("b.c_custkey").alias("key_b"),
        dist.cast("bigint").alias("dist"),
    ]
    q = get_queries()
    return {
        "current": lambda: q["join_fuzzy_blocked"](spark, sf_dir),
        "pairs": lambda: a.join(b, block).select(
            F.col("a.c_custkey").alias("key_a"), F.col("b.c_custkey").alias("key_b")
        ),
        "single": lambda: a.join(b, block & (dist >= 0)).select(*sel),
        "postfilter": lambda: a.join(b, block).filter(dist >= 0).select(*sel),
    }


def main() -> None:
    spark = build_session("fuzzy-profile-r13b")

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for name, make in variants(spark, "/root/testdata/sf0.001").items():
        noop(make())
    results = {}
    for name, make in variants(spark, SF_DIR).items():
        best = float("inf")
        for i in range(PASSES):
            spark.sparkContext.setJobDescription(f"fuzzy {name} pass {i}")
            t0 = time.perf_counter()
            noop(make())
            best = min(best, time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        results[name] = round(best, 3)
        print(f"{name:12s} {best:7.2f}s", flush=True)
    print(results)
    spark.stop()


if __name__ == "__main__":
    main()
