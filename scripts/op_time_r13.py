"""Round-13: time arbitrary registered ops with the noop sink (guide
§1.4), min of PASSES passes, after one sf0.001 warmup per op.

Usage: [PASSES=3] [SPARK_GRAFT_SF_DIR=...] python scripts/op_time_r13.py key1 key2 ...
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from morphl_model_publishers_churning_users_spark.registry import get_queries  # noqa: E402
from morphl_model_publishers_churning_users_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("PASSES", "3"))


def main() -> None:
    targets = sys.argv[1:]
    spark = build_session("op-time-r13")
    q = get_queries()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    for k in targets:
        noop(q[k](spark, "/root/testdata/sf0.001"))  # warm the plan shape

    results = {}
    for k in targets:
        best = float("inf")
        for i in range(PASSES):
            spark.sparkContext.setJobDescription(f"{k} pass {i}")
            t0 = time.perf_counter()
            noop(q[k](spark, SF_DIR))
            best = min(best, time.perf_counter() - t0)
            spark.sparkContext.setJobDescription(None)
        results[k] = round(best, 3)
        print(f"{k:32s} {best:7.2f}s", flush=True)
    print(results)
    spark.stop()


if __name__ == "__main__":
    main()
