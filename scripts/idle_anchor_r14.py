"""Round-14 idle re-anchor (VERDICT r13 next-round item 6): same
protocol as the r13 script this derives from, over the five probes the
r13 driver artifact read noisy/high: scan_delta_time_travel_ts (7.98
in-bench vs 3.9 isolated), scan_delta_checkpoint (4.58 vs 2.65),
graph_modularity (3.44 vs 2.16 idle anchor), join_spatial_grid (1.32
vs 0.75), graph_hits (10.15, known in-bench breathing).

Original r13 header follows.

Round-13 idle re-anchor (r12 verdict item 4): close the
graph-family drift with the ml_logreg_gd protocol — isolated idle
min-of-N series at sf0.1 for graph_hits (r11 in-bench 9.46 s, judge's
idle full-bench 11.76) and graph_modularity (2.47 -> 3.24) — plus
birth anchors for the round-13 additions
(scan_delta_deletion_vectors, fn_avro_map_blocks).

Protocol = bench.py's extended-probe discipline (sf0.001 warmup pass,
GC fence between keys, gc + JVM System.gc before each timed pass),
repeated N times per key; the anchor is the MIN across passes — host
noise only ever adds time. graph_hits skips the warmup pass: its
checkpointed shuffle rounds self-warm within one execution and a
separate warmup's live checkpoint blocks slow the timed pass ~75%
(bench.py NO_WARMUP note, measured r7). Run on an idle guest:

    python scripts/idle_anchor_r14.py [N] [sf_dir]

Record results in SURVEY §6 (round-14 log).
"""

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

KEYS = (
    "graph_hits",
    "graph_modularity",
    "join_spatial_grid",
    "scan_delta_checkpoint",
    "scan_delta_time_travel_ts",
)
NO_WARMUP = {"graph_hits"}


def main():
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 5
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from pyspark.sql import SparkSession

    from morphl_model_publishers_churning_users_spark import catalog
    from morphl_model_publishers_churning_users_spark.registry import get_queries

    spark = (
        SparkSession.builder.master(
            f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]"
        )
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
        if key not in NO_WARMUP:
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
