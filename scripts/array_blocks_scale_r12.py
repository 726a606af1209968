"""Round-12 scale sweep: fn_avro_array_blocks throughput vs input size.

The block decode is the package's one higher-order-function fold path
(deliberate: unrolled ladders tripped janino's 64 KB limit and cap the
block length) — HOF lambdas evaluate interpreted, outside whole-stage
codegen, so the 100 TB question is whether the per-row cost stays flat
as rows grow (linear total, no superlinear planning/memory term).

Synthesizes lineitem-shaped scratch tables at x1/x4/x16 (125k/500k/2M
lines, 5 lines per order, values spanning multi-limb varints of both
signs) and times the FULL operator (groupBy + encode + fold decode)
on each. Expect ~linear totals / flat per-row cost. Run idle:

    python scripts/array_blocks_scale_r12.py

Record in SURVEY §6 (round-12 log).
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from morphl_model_publishers_churning_users_spark import catalog
from morphl_model_publishers_churning_users_spark.operators._shared import scratch_dir
from morphl_model_publishers_churning_users_spark.registry import (
    QUERIES,
)
from morphl_model_publishers_churning_users_spark import load_all_operators

spark = (
    SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
    .config("spark.sql.shuffle.partitions", "32")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
catalog.ensure_confs(spark)
load_all_operators()

results = {}
for mult, n_lines in (("x1", 125_000), ("x4", 500_000), ("x16", 2_000_000)):
    sf_dir = scratch_dir(f"ab_scale_{mult}")
    path = os.path.join(sf_dir, "lineitem.parquet")
    if not os.path.isdir(path):
        (
            spark.range(n_lines)
            .select(
                (F.col("id") / 5).cast("bigint").alias("l_orderkey"),
                (F.col("id") % 5 + 1).cast("int").alias("l_linenumber"),
                # deterministic multi-limb values of both signs
                (
                    (F.hash(F.col("id")).cast("bigint") % 90_000 + 90_001)
                    / F.lit(2.0)
                ).alias("l_extendedprice"),
            )
            .repartition(32)
            .write.mode("overwrite")
            .parquet(path)
        )
    # warm (JIT + py4j class loading) once per size before timing, so
    # the x1 per-pass numbers are comparable to x4/x16 (r12 review:
    # the comment previously claimed a warmup that didn't exist)
    QUERIES["fn_avro_array_blocks"](spark, sf_dir).count()
    times = []
    for _ in range(3):
        t0 = time.perf_counter()
        QUERIES["fn_avro_array_blocks"](spark, sf_dir).count()
        times.append(round(time.perf_counter() - t0, 3))
    best = min(times)
    results[mult] = {
        "lines": n_lines,
        "best_s": best,
        "us_per_line": round(best / n_lines * 1e6, 2),
    }
    print(
        f"{mult:4s} {n_lines:9,d} lines: best {best:7.3f}s  "
        f"{results[mult]['us_per_line']:6.2f} us/line  {times}",
        flush=True,
    )

print(json.dumps(results))
