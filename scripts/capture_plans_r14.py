"""Capture explain('formatted') dumps for the r14-touched keys.

Usage: python scripts/capture_plans_r14.py SUFFIX [key ...]
Writes plans/r14/<key>_<SUFFIX>.txt at sf0.001.
"""

import io
import os
import sys
from contextlib import redirect_stdout

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from morphl_model_publishers_churning_users_spark.registry import get_queries
from morphl_model_publishers_churning_users_spark.session import build_session

DEFAULT_KEYS = [
    "fn_protobuf_wire",
    "fn_avro_wire",
    "fn_avro_schema_evolution",
    "fn_avro_union_nullable",
    "fn_avro_container",
    "fn_avro_array_blocks",
    "fn_avro_map_blocks",
    "llm_langid",
    "llm_lang_confusion",
    "join_fuzzy_blocked",
]


def main():
    suffix = sys.argv[1]
    keys = sys.argv[2:] or DEFAULT_KEYS
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r14")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session("plan-capture-r14", cpus=8)
    q = get_queries()
    for key in keys:
        buf = io.StringIO()
        with redirect_stdout(buf):
            q[key](spark, "/root/testdata/sf0.001").explain("formatted")
        with open(os.path.join(out_dir, f"{key}_{suffix}.txt"), "w") as f:
            f.write(buf.getvalue())
        print("captured", key, suffix)
    spark.stop()


if __name__ == "__main__":
    main()
