"""Capture .explain("formatted") for the bench keys (headline + extended)
into plans/r13/<key>_<tag>.txt, where tag comes from argv[1]
("before"/"after"). Uses sf0.001 so fixture-building ops stay cheap; the
plan SHAPE (exchanges, join strategies, PushedFilters, Python eval nodes)
is scale-independent for these fixed pipelines.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from morphl_model_publishers_churning_users_spark.registry import get_queries  # noqa: E402
from morphl_model_publishers_churning_users_spark.session import build_session  # noqa: E402

TAG = sys.argv[1] if len(sys.argv) > 1 else "before"
SF_DIR = sys.argv[3] if len(sys.argv) > 3 else "/root/testdata/sf0.001"

KEYS = [
    # headline
    "join_star", "join_inner_hash", "join_asof", "agg_group", "agg_pivot",
    "win_rownum", "ts_session", "dedup_exact", "llm_dedup_exact",
    "llm_simsearch", "llm_dedup_minhash_sql", "llm_cc_pipeline", "topk",
    "agg_stats", "ts_ewma",
    # extended bench probes
    "graph_hits", "graph_modularity", "llm_ngram_novelty",
    "ts_theta_forecast", "dq_observe_metrics", "join_bloom_pruned",
    "llm_lsh_tuning_curve", "ml_logreg_gd", "join_spatial_grid",
    "scan_delta_log", "fn_avro_container", "scan_delta_checkpoint",
    "fn_avro_schema_evolution", "scan_delta_time_travel_ts",
    "fn_avro_union_nullable", "scan_delta_partition_values",
    "fn_avro_array_blocks", "scan_delta_deletion_vectors",
    "fn_avro_map_blocks", "fn_avro_wire",
]
if len(sys.argv) > 2 and sys.argv[2]:
    KEYS = sys.argv[2].split(",")


def main() -> None:
    out_dir = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r13")
    os.makedirs(out_dir, exist_ok=True)
    spark = build_session("capture-plans-r13")
    q = get_queries()
    # raw engine paths benched alongside the registered wrappers
    from morphl_model_publishers_churning_users_spark.operators.llm import (
        raw_dedup_fuzzy,
        raw_simsearch_ann,
    )

    q = dict(q)
    q["raw_dedup_fuzzy"] = raw_dedup_fuzzy
    q["raw_simsearch_ann"] = raw_simsearch_ann
    for key in KEYS:
        fn = q.get(key)
        if fn is None:
            print(f"SKIP {key}: not registered")
            continue
        try:
            df = fn(spark, SF_DIR)
            plan = df._sc._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as e:  # noqa: BLE001
            plan = f"ERROR: {e}"
        with open(os.path.join(out_dir, f"{key}_{TAG}.txt"), "w") as f:
            f.write(plan)
        print(f"wrote {key}_{TAG}.txt ({len(plan)} chars)")
    spark.stop()


if __name__ == "__main__":
    main()
