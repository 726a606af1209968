#!/usr/bin/env python
"""graph_hits fixed-overhead experiment (r8 verdict item 9 — the ONE
allowed experiment before declaring the operator done).

The r8 plan (shipped) checkpoints only the authority-side raw sums —
5 materialization jobs + the final action; profiling showed ~2.1 s of
the sf0.1 runtime is fixed scheduling/checkpoint cost. Two candidate
cuts at that fixed cost, both bit-identity-gated:

  shipped   current operator (fused hub half-round + round-1 degree
            shortcut, 5 ar checkpoints).
  combined  ONE checkpoint per round materializing BOTH half-rounds'
            raw sums as a single (side, node, s) union frame — the
            hub half-round is materialized in the same job instead of
            being lazily re-derived inside the next round's ar job
            (ReusedExchange should execute the shared ar subtree once
            inside the union).
  skip1     checkpoint ar only on rounds 0/2/4 — 3 materializations;
            odd rounds' full lineage (ar→a→hr→h→ar) stays lazy and
            leans on ReusedExchange across the two references to the
            odd ar exchange.

Run on an idle guest: python scripts/hits_experiment_r9.py [sf_dir]
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
        .appName("hits-experiment-r9")
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


def variant_shipped(spark, sf_dir):
    from morphl_model_publishers_churning_users_spark.registry import get_queries

    return get_queries()["graph_hits"](spark, sf_dir)


def variant_combined(spark, sf_dir):
    from morphl_model_publishers_churning_users_spark.operators._shared import ckpt

    edges = _edges(spark, sf_dir)
    h = None
    a = None
    for rnd in range(5):
        if rnd == 0:
            ar = edges.groupBy("p").agg(F.count(F.lit(1)).cast("double").alias("s"))
        else:
            ar = edges.join(h, "o").groupBy("p").agg(d12(F.col("h")).alias("s"))
        at = ar.agg(d12(F.col("s")).alias("t"))
        a_lazy = ar.crossJoin(F.broadcast(at)).select(
            "p", (F.col("s") / F.col("t")).alias("a")
        )
        hr = edges.join(a_lazy, "p").groupBy("o").agg(d12(F.col("a")).alias("s"))
        comb = ckpt(
            ar.select(F.lit("a").alias("side"), F.col("p").alias("node"), "s").unionAll(
                hr.select(F.lit("h").alias("side"), F.col("o").alias("node"), "s")
            )
        )
        ar_m = comb.filter(F.col("side") == "a").select(F.col("node").alias("p"), "s")
        hr_m = comb.filter(F.col("side") == "h").select(F.col("node").alias("o"), "s")
        at_m = ar_m.agg(d12(F.col("s")).alias("t"))
        a = ar_m.crossJoin(F.broadcast(at_m)).select(
            "p", (F.col("s") / F.col("t")).alias("a")
        )
        ht = hr_m.agg(d12(F.col("s")).alias("t"))
        h = hr_m.crossJoin(F.broadcast(ht)).select(
            "o", (F.col("s") / F.col("t")).alias("h")
        )
    return _finish(a)


def variant_skip1(spark, sf_dir):
    from morphl_model_publishers_churning_users_spark.operators._shared import ckpt

    edges = _edges(spark, sf_dir)
    h = None
    a = None
    for rnd in range(5):
        if rnd == 0:
            ar = edges.groupBy("p").agg(F.count(F.lit(1)).cast("double").alias("s"))
        else:
            ar = edges.join(h, "o").groupBy("p").agg(d12(F.col("h")).alias("s"))
        if rnd % 2 == 0:
            ar = ckpt(ar)
        at = ar.agg(d12(F.col("s")).alias("t"))
        a = ar.crossJoin(F.broadcast(at)).select("p", (F.col("s") / F.col("t")).alias("a"))
        hr = edges.join(a, "p").groupBy("o").agg(d12(F.col("a")).alias("s"))  # lazy
        ht = hr.agg(d12(F.col("s")).alias("t"))
        h = hr.crossJoin(F.broadcast(ht)).select("o", (F.col("s") / F.col("t")).alias("h"))
    return _finish(a)


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    spark = _spark()
    results = {}
    only = os.environ.get("HITS_VARIANTS", "").split(",") if os.environ.get("HITS_VARIANTS") else None
    for name, fn in (
        ("shipped", variant_shipped),
        ("combined", variant_combined),
        ("skip1", variant_skip1),
    ):
        if only and name not in only:
            continue
        times = []
        rows = None
        for _ in range(3):
            t0 = time.perf_counter()
            rows = fn(spark, sf_dir).collect()
            times.append(round(time.perf_counter() - t0, 2))
        sig = tuple((r["part"], float(r["authority_x1000"])) for r in rows)
        results[name] = (min(times), times, sig)
        print(f"{name:9s} min={min(times):6.2f}s runs={times}", flush=True)
    base_sig = results["shipped"][2] if "shipped" in results else next(iter(results.values()))[2]
    for name, (_, _, sig) in results.items():
        status = "IDENTICAL" if sig == base_sig else "*** DIVERGED ***"
        print(f"{name:9s} output vs shipped: {status}")
    spark.stop()


if __name__ == "__main__":
    main()
