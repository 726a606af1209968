"""Round-12 config axis: RocksDB state store provider for the
13-key streaming family (r11 verdict item 5).

Every streaming run so far used the default
HDFSBackedStateStoreProvider — and the r11 2001-partition finding
(a provider-specific tracking race) showed provider internals are
exactly what local-mode testing underexercises. This sweep runs the
full streaming family in a bare driver-shaped session under

    spark.sql.streaming.stateStore.providerClass =
        ...state.RocksDBStateStoreProvider
    spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled
        = true   (the production restart-latency configuration)

at BOTH the default shuffle-partition count and the 2001 extreme that
exposed the r11 race (the run_available_now cap engages there and
must hold under RocksDB exactly as it does under HDFS-backed).

    python scripts/streaming_rocksdb_r12.py [SF_DIR] [partitions]

Record results in the SURVEY §6 configuration-independence matrix.
"""

import sys
import time
import traceback

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
PARTS = sys.argv[2] if len(sys.argv) > 2 else None

STREAM_MODULES = (
    "morphl_model_publishers_churning_users_spark.streaming.ops",
    "morphl_model_publishers_churning_users_spark.sources.stream_source",
    "morphl_model_publishers_churning_users_spark.sources.python_ds",
)

b = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.session.timeZone", "America/New_York")
    .config("spark.driver.memory", "8g")
    .config(
        "spark.sql.streaming.stateStore.providerClass",
        "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider",
    )
    .config(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )
)
if PARTS:
    b = b.config("spark.sql.shuffle.partitions", PARTS)
spark = b.getOrCreate()
spark.sparkContext.setLogLevel("ERROR")

from morphl_model_publishers_churning_users_spark import registry, load_all_operators
from tests.oracle_utils import compare

load_all_operators()
keys = [
    k for k, f in registry.QUERIES.items() if f.__module__ in STREAM_MODULES
]
assert len(keys) == 13, keys

ok = 0
t_all = time.time()
for i, key in enumerate(keys):
    t0 = time.time()
    try:
        sdf = registry.QUERIES[key](spark, SF)
        if key in registry.ORACLES and registry.ORACLES[key]:
            compare(sdf, registry.ORACLES[key], SF)
            status = "HASH_OK"
        else:
            n = sdf.count()
            status = f"ROWS_OK({n})" if n >= 0 else "EMPTY"
        ok += 1
    except Exception:
        status = "FAIL"
        traceback.print_exc()
    print(f"[{i + 1:3d}/13] {key:32s} {status:12s} {time.time() - t0:6.2f}s", flush=True)

print(
    f"\nROCKSDB STATE STORE (partitions={PARTS or 'default'}): "
    f"{ok}/13 green in {time.time() - t_all:.0f}s at {SF}"
)
