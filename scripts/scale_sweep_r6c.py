#!/usr/bin/env python
"""Final-wave scale evidence (SURVEY §6): the last round-6 operators at
growing input sizes. Claims: llm_span_corruption / llm_curriculum_order /
llm_bpe_first_merges are linear (narrow or vocab-bounded);
ts_stickiness's bounded window fan-out stays linear in user-days;
join_spatial_grid's grid blocking keeps pair cost at O(cell occupancy),
not O(n²) — measured by the pair count vs point count ratio at growing
point sets (sf0.01 vs sf0.1 user populations)."""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from morphl_model_publishers_churning_users_spark.registry import QUERIES
from morphl_model_publishers_churning_users_spark.session import build_session
import morphl_model_publishers_churning_users_spark as pkg

SWEEP = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                     ".scratch", "scale_sweep")


def timed(fn, spark, sf_dir):
    t0 = time.perf_counter()
    n = fn(spark, sf_dir).count()
    return round(time.perf_counter() - t0, 2), n


def main() -> None:
    pkg.load_all_operators()
    spark = build_session("scale-sweep-r6c")
    out = {}
    for key in ("llm_span_corruption", "llm_curriculum_order", "llm_bpe_first_merges"):
        fn = QUERIES[key]
        fn(spark, "/root/testdata/sf0.001").count()
        rows = {}
        for s in (1, 4, 16):
            d = f"{SWEEP}/x{s}"
            if not os.path.isdir(d):
                continue
            wall, n = timed(fn, spark, d)
            rows[f"x{s}"] = {"wall_s": wall, "rows": n}
        out[key] = rows
    for key in ("ts_stickiness", "join_spatial_grid", "ts_markov_stationary",
                "ml_logreg_gd", "join_snowflake"):
        fn = QUERIES[key]
        rows = {}
        for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
            wall, n = timed(fn, spark, sf)
            rows[os.path.basename(sf)] = {"wall_s": wall, "rows": n}
        out[key] = rows
    print(json.dumps({"sweep": "r6c", "loadavg": [round(x, 2) for x in os.getloadavg()],
                      "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
