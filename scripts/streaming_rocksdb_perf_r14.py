"""r14 A/B (VERDICT r13 next-round item 7): RocksDB state store vs the
default HDFS-backed provider for the STREAMING probes' performance.

r12 proved RocksDB a green correctness axis; this measures wall time.
One session per provider (the provider class is read at query start,
but a clean session keeps block-manager state comparable), min-of-3
per op after one warmup pass, at the core count given by
$SPARK_GRAFT_CPUS (run at 8 and 32 — adopt only if it wins at both).

    python scripts/streaming_rocksdb_perf_r14.py [SF_DIR]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from morphl_model_publishers_churning_users_spark.registry import get_queries
from morphl_model_publishers_churning_users_spark.session import build_session

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
KEYS = [
    "ts_stream_stream_join",
    "ts_watermark",
    "ts_dedup_stream",
    "ts_session_stream",
    "ts_stream_sliding",
    "ts_stateful",
]
ROCKS = "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"


def run_provider(provider: str) -> dict[str, float]:
    if provider == "rocksdb":
        os.environ["SPARK_GRAFT_EXTRA_CONFS"] = (
            f"spark.sql.streaming.stateStore.providerClass={ROCKS};"
            "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled=true"
        )
    else:
        os.environ.pop("SPARK_GRAFT_EXTRA_CONFS", None)
    spark = build_session(f"stream-ab-{provider}", cpus=CPUS)
    q = get_queries()
    out = {}
    for key in KEYS:
        fn = q[key]
        fn(spark, "/root/testdata/sf0.001").count()  # warm
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            fn(spark, SF).count()
            ts.append(time.perf_counter() - t0)
        out[key] = min(ts)
    spark.stop()
    return out


def main():
    base = run_provider("hdfs")
    rocks = run_provider("rocksdb")
    print(f"{'key':26s} {'hdfs':>8s} {'rocksdb':>8s} {'ratio':>6s}")
    for k in KEYS:
        print(f"{k:26s} {base[k]:8.3f} {rocks[k]:8.3f} {base[k] / rocks[k]:6.2f}")
    print(f"cpus={CPUS} sf={SF}")


if __name__ == "__main__":
    main()
