"""Round-12 idle re-anchor of the in-bench watch list (r11 verdict
item 4): min-of-N steady-state timings at sf0.1 for keys whose
BENCH_r11 in-bench numbers moved without an idle anchor on record —
ml_logreg_gd (+23% in-bench vs r10) and join_spatial_grid (+17%) —
plus first-series bars for the r11 additions
(scan_delta_time_travel_ts <= 3.6, fn_avro_union_nullable <= 6.2) and
birth anchors for the r12 additions.

Protocol = bench.py's extended-probe discipline (sf0.001 warmup pass,
GC fence between keys, gc + JVM System.gc before each timed pass),
repeated N times per key; the anchor is the MIN across passes — host
noise only ever adds time. Run on an idle guest:

    python scripts/idle_anchor_r12.py [N] [sf_dir]

Record results in SURVEY §6 (round-12 log).
"""

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS = (
    "ml_logreg_gd",
    "join_spatial_grid",
    "scan_delta_time_travel_ts",
    "fn_avro_union_nullable",
    "scan_delta_partition_values",
    "fn_avro_array_blocks",
)


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession

    from morphl_model_publishers_churning_users_spark import catalog
    from morphl_model_publishers_churning_users_spark.registry import get_queries

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.driver.memory", "8g")
        .getOrCreate()
    )
    catalog.ensure_confs(spark)
    queries = get_queries()
    results = {}
    for key in KEYS:
        fn = queries[key]
        times = []
        # one warmup at sf0.001 (JIT/py4j class-loading, not query cost)
        fn(spark, "/root/testdata/sf0.001").count()
        for _ in range(n):
            gc.collect()
            spark.sparkContext._jvm.System.gc()
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            times.append(round(time.perf_counter() - t0, 3))
        results[key] = {"min": min(times), "passes": times}
        print(f"{key:32s} min {min(times):7.3f}  passes {times}", flush=True)
    try:
        load = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        load = None
    print(json.dumps({"anchors": results, "loadavg": load, "sf_dir": sf_dir}))


if __name__ == "__main__":
    main()
