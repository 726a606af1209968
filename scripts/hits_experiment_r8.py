#!/usr/bin/env python
"""graph_hits plan experiments (r7 verdict item 5): can the 5-round
HITS loop drop below 9 s isolated at sf0.1 without changing a bit of
output?

Variants (each returns the same top-20 authority frame; outputs are
hash-compared against the shipped baseline):
  baseline  shipped operator: ckpt on BOTH half-round raw sums (10
            materializations/run).
  fused     ckpt only the authority-side sums (ar); the hub half-round
            stays lazy inside the next round's lineage — 5
            materializations, relying on ReusedExchange to keep the
            hub join single-execution within each round's job.
  prepart   baseline + edges pre-partitioned per join side (edges_o
            hash(o), edges_p hash(p)) so the per-half-round edge
            shuffle disappears if the join is not broadcast.

Run on an idle guest: python scripts/hits_experiment_r8.py [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def _spark():
    from morphl_model_publishers_churning_users_spark.catalog import ensure_confs
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("hits-experiment-r8")
        .getOrCreate()
    )
    ensure_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def q12(c):
    return F.floor(c * F.lit(1e12) + F.lit(0.5)).cast("decimal(38,12)")


def d12(c):
    return F.sum(q12(c)).cast("double") / F.lit(1e12)


def _edges(spark, sf_dir):
    from morphl_model_publishers_churning_users_spark.operators._shared import ckpt, t

    li = t(spark, sf_dir, "lineitem").select(
        F.col("l_orderkey").alias("o"), F.col("l_partkey").alias("p")
    )
    return ckpt(li.distinct())


def _finish(a):
    return (
        a.orderBy(F.desc("a"), F.asc("p"))
        .limit(20)
        .select(F.col("p").alias("part"), F.round(F.col("a") * 1000, 6).alias("authority_x1000"))
    )


def variant_baseline(spark, sf_dir):
    from morphl_model_publishers_churning_users_spark.registry import get_queries

    return get_queries()["graph_hits"](spark, sf_dir)


def variant_fused(spark, sf_dir):
    from morphl_model_publishers_churning_users_spark.operators._shared import ckpt

    edges = _edges(spark, sf_dir)
    h = edges.select("o").distinct().withColumn("h", F.lit(1.0))
    a = None
    for _ in range(5):
        ar = ckpt(edges.join(h, "o").groupBy("p").agg(d12(F.col("h")).alias("s")))
        at = ar.agg(d12(F.col("s")).alias("t"))
        a = ar.crossJoin(F.broadcast(at)).select("p", (F.col("s") / F.col("t")).alias("a"))
        hr = edges.join(a, "p").groupBy("o").agg(d12(F.col("a")).alias("s"))  # lazy
        ht = hr.agg(d12(F.col("s")).alias("t"))
        h = hr.crossJoin(F.broadcast(ht)).select("o", (F.col("s") / F.col("t")).alias("h"))
    return _finish(a)


def variant_prepart(spark, sf_dir):
    from morphl_model_publishers_churning_users_spark.operators._shared import ckpt

    edges = _edges(spark, sf_dir)
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges_o = ckpt(edges.repartition(n, "o"))
    edges_p = ckpt(edges.repartition(n, "p"))
    h = edges_o.select("o").distinct().withColumn("h", F.lit(1.0))
    a = None
    for _ in range(5):
        ar = ckpt(edges_o.join(h, "o").groupBy("p").agg(d12(F.col("h")).alias("s")))
        at = ar.agg(d12(F.col("s")).alias("t"))
        a = ar.crossJoin(F.broadcast(at)).select("p", (F.col("s") / F.col("t")).alias("a"))
        hr = ckpt(edges_p.join(a, "p").groupBy("o").agg(d12(F.col("a")).alias("s")))
        ht = hr.agg(d12(F.col("s")).alias("t"))
        h = hr.crossJoin(F.broadcast(ht)).select("o", (F.col("s") / F.col("t")).alias("h"))
    return _finish(a)


def variant_fused_deg(spark, sf_dir):
    """fused + round-1 shortcut: the initial hub vector is all-ones, so
    the first authority half-round's quantized sum is EXACTLY the part's
    degree (q12(1.0) = 1e12 per edge; sum/1e12 = count, exact as double
    below 2^53) — one groupBy on edges, no join."""
    from morphl_model_publishers_churning_users_spark.operators._shared import ckpt

    edges = _edges(spark, sf_dir)
    a = None
    first = True
    h = None
    for _ in range(5):
        if first:
            ar = ckpt(edges.groupBy("p").agg(F.count(F.lit(1)).cast("double").alias("s")))
            first = False
        else:
            ar = ckpt(edges.join(h, "o").groupBy("p").agg(d12(F.col("h")).alias("s")))
        at = ar.agg(d12(F.col("s")).alias("t"))
        a = ar.crossJoin(F.broadcast(at)).select("p", (F.col("s") / F.col("t")).alias("a"))
        hr = edges.join(a, "p").groupBy("o").agg(d12(F.col("a")).alias("s"))  # lazy
        ht = hr.agg(d12(F.col("s")).alias("t"))
        h = hr.crossJoin(F.broadcast(ht)).select("o", (F.col("s") / F.col("t")).alias("h"))
    return _finish(a)


def variant_fused_prepart(spark, sf_dir):
    from morphl_model_publishers_churning_users_spark.operators._shared import ckpt

    edges = _edges(spark, sf_dir)
    n = int(spark.conf.get("spark.sql.shuffle.partitions"))
    edges_o = ckpt(edges.repartition(n, "o"))
    edges_p = ckpt(edges.repartition(n, "p"))
    h = edges_o.select("o").distinct().withColumn("h", F.lit(1.0))
    a = None
    for _ in range(5):
        ar = ckpt(edges_o.join(h, "o").groupBy("p").agg(d12(F.col("h")).alias("s")))
        at = ar.agg(d12(F.col("s")).alias("t"))
        a = ar.crossJoin(F.broadcast(at)).select("p", (F.col("s") / F.col("t")).alias("a"))
        hr = edges_p.join(a, "p").groupBy("o").agg(d12(F.col("a")).alias("s"))  # lazy
        ht = hr.agg(d12(F.col("s")).alias("t"))
        h = hr.crossJoin(F.broadcast(ht)).select("o", (F.col("s") / F.col("t")).alias("h"))
    return _finish(a)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = _spark()
    results = {}
    for name, fn in (
        ("baseline", variant_baseline),
        ("fused", variant_fused),
        ("prepart", variant_prepart),
        ("fused_pp", variant_fused_prepart),
        ("fused_deg", variant_fused_deg),
    ):
        times = []
        rows = None
        for _ in range(3):
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).collect()
            times.append(round(time.perf_counter() - t0, 2))
        sig = tuple((r["part"], float(r["authority_x1000"])) for r in rows)
        results[name] = (min(times), times, sig)
        print(f"{name:9s} min={min(times):6.2f}s runs={times}", flush=True)
    base_sig = results["baseline"][2]
    for name, (_, _, sig) in results.items():
        status = "IDENTICAL" if sig == base_sig else "*** DIVERGED ***"
        print(f"{name:9s} output vs baseline: {status}")
    spark.stop()


if __name__ == "__main__":
    main()
