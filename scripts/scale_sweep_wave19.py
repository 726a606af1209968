#!/usr/bin/env python
"""Continuation-session scale-out evidence (SURVEY §6).

Measures the wave-19+ operators at growing input sizes, one JSON line:

* llm_greedy_coverage at 1x/4x/16x the sf0.1 corpus (scale_sweep.py's
  scaled copies). Claim: each greedy round is one anti-join + one
  aggregate keyed by bigram, so wall time is linear in corpus size and
  the 10-round count is fixed — no pairwise doc comparison anywhere.
* ml_bradley_terry, graph_closeness, ml_poisson_glm, ml_permutation_test,
  ts_matrix_profile at sf0.01 vs sf0.1 (~10x facts). Claims: BT's MM
  rounds run on the O(brands^2) pair table (fact cost = one basket
  self-join); closeness is frontier-bounded multi-source BFS; the GLM
  is 5 aggregates over the user frame; the permutation explode is
  map-side combinable to 256 partials; the matrix-profile pair join is
  over O(days)^2 which does NOT grow with fact volume — only the day
  aggregate does.

Run AFTER the heavy suites finish (timings on an idle machine).
"""

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
    spark = build_session("scale-sweep-wave19")
    out = {}
    fn = QUERIES["llm_greedy_coverage"]
    fn(spark, "/root/testdata/sf0.001").count()  # warm plan shapes
    rows = {}
    for s in (1, 4, 16):
        d = f"{SWEEP}/x{s}"
        if not os.path.isdir(d):
            continue
        wall, n = timed(fn, spark, d)
        rows[f"x{s}"] = {"wall_s": wall, "rows": n}
    out["llm_greedy_coverage"] = rows
    for key in ("ml_bradley_terry", "graph_closeness", "ml_poisson_glm",
                "ml_permutation_test", "ts_matrix_profile"):
        fn = QUERIES[key]
        fn(spark, "/root/testdata/sf0.001").count()
        rows = {}
        for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
            wall, n = timed(fn, spark, sf)
            rows[os.path.basename(sf)] = {"wall_s": wall, "rows": n}
        out[key] = rows
    out["loadavg"] = [round(x, 2) for x in os.getloadavg()]
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
