#!/usr/bin/env python
"""Round-6 scale-out evidence (SURVEY §6).

Measures the new corpus/graph operators at growing input sizes and
prints one JSON line per measurement:

* llm_ngram_novelty + llm_template_prefix at 1x/4x/16x the sf0.1 corpus
  (the scale_sweep.py scaled copies: disjoint vocab per copy, so gram
  tables grow linearly and cross-copy matches cannot occur). Claim:
  wall time and output rows are linear in corpus size — the gram join
  is keyed by the gram string and never compares docs pairwise.
* graph_bfs_distance + graph_assortativity + graph_jaccard_linkpred at
  sf0.01 vs sf0.1 (~10x the co-purchase edges). Claim: BFS rounds are
  frontier-bounded joins, assortativity is one aggregate over the
  degree-tagged edges, and the link-pred two-hop join is brand-blocked
  — all sub-quadratic in edges.

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
    spark = build_session("scale-sweep-r6")
    out = {}
    for key in ("llm_ngram_novelty", "llm_template_prefix"):
        fn = QUERIES[key]
        fn(spark, "/root/testdata/sf0.001").count()  # warm plan shapes
        rows = {}
        for s in (1, 4, 16):
            d = f"{SWEEP}/x{s}"
            if not os.path.isdir(d):
                continue
            wall, n = timed(fn, spark, d)
            rows[f"x{s}"] = {"wall_s": wall, "rows": n}
        out[key] = rows
    for key in ("graph_bfs_distance", "graph_assortativity", "graph_jaccard_linkpred"):
        fn = QUERIES[key]
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
