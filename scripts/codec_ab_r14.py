"""r14 codec decode A/B: numpy-vectorized (functions/avro_np) vs the
per-row reference (functions/avro_arrow), measured per the guide §1.4
noop-sink discipline, min-of-3 after one warmup, at sf0.1.

The scalar.py ops import their decoder from avro_np AT CALL TIME
(function-local `from .avro_np import ...` resolves module attributes),
so the reference path is produced by monkeypatching the avro_np symbols
back to their avro_arrow twins — identical plans, only the Python batch
function differs.

Usage: python scripts/codec_ab_r14.py [sf_dir]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from morphl_model_publishers_churning_users_spark.functions import avro_arrow, avro_np
from morphl_model_publishers_churning_users_spark.registry import get_queries
from morphl_model_publishers_churning_users_spark.session import build_session

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
KEYS = [
    "fn_protobuf_wire",
    "fn_avro_wire",
    "fn_avro_schema_evolution",
    "fn_avro_union_nullable",
    "fn_avro_container",
    "fn_avro_array_blocks",
    "fn_avro_map_blocks",
]
SYMS = [
    "decode_protobuf_wire",
    "decode_wire",
    "decode_schema_evolution",
    "decode_union_nullable",
    "make_decode_container",
    "decode_array_blocks",
    "decode_map_blocks",
]


def noop(df):
    df.write.format("noop").mode("overwrite").save()


def timed(fn, spark, reps=3):
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        noop(fn(spark, SF))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    spark = build_session("codec-ab-r14")
    q = get_queries()
    saved = {s: getattr(avro_np, s) for s in SYMS}
    print(f"{'key':28s} {'rowwise':>8s} {'numpy':>8s} {'speedup':>8s}")
    tot_ref = tot_np = 0.0
    for key in KEYS:
        fn = q[key]
        fn(spark, "/root/testdata/sf0.001").count()  # warm both paths' plans
        spark.sparkContext.setJobDescription(f"{key}: rowwise")
        for s in SYMS:
            setattr(avro_np, s, getattr(avro_arrow, s))
        t_ref = timed(fn, spark)
        spark.sparkContext.setJobDescription(f"{key}: numpy")
        for s, v in saved.items():
            setattr(avro_np, s, v)
        t_np = timed(fn, spark)
        tot_ref += t_ref
        tot_np += t_np
        print(f"{key:28s} {t_ref:8.3f} {t_np:8.3f} {t_ref / t_np:8.2f}")
    print(f"{'TOTAL':28s} {tot_ref:8.3f} {tot_np:8.3f} {tot_ref / tot_np:8.2f}")
    spark.stop()


if __name__ == "__main__":
    main()
