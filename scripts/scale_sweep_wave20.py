#!/usr/bin/env python
"""Late-continuation scale-out evidence (SURVEY §6).

sf0.01 vs sf0.1 (~10x facts) for the statistics-heavy continuation
operators. Claims under test:

* ml_harrell_c — concordance runs on (tenure, score) CELLS, so the
  pair join is post-aggregate; wall should be ~flat at 10x facts.
* ts_absorbing_markov — 8 value-iteration rounds over the O(states^2)
  transition table; only the one sequence shuffle sees the facts.
* ts_chain_ladder — the triangle is O(cohorts x 7); one fact aggregate.
* ts_pacf_durbin — the lag-pair join is O(days^2) of a bounded frame;
  the 10-step recursion is a 1-row chain.
* llm_uncertainty_sample / ml_knn_classify — classifier-plan-bound:
  uncertainty adds one window to NB's plan; kNN is bcast-query x corpus.

Run on an idle machine; record in SURVEY §6.
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


def timed(fn, spark, sf_dir):
    t0 = time.perf_counter()
    n = fn(spark, sf_dir).count()
    return round(time.perf_counter() - t0, 2), n


def main() -> None:
    pkg.load_all_operators()
    spark = build_session("scale-sweep-wave20")
    out = {}
    for key in ("ml_harrell_c", "ts_absorbing_markov", "ts_chain_ladder",
                "ts_pacf_durbin", "llm_uncertainty_sample", "ml_knn_classify"):
        fn = QUERIES[key]
        fn(spark, "/root/testdata/sf0.001").count()  # warm plan shapes
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
