#!/usr/bin/env python
"""Late-round-6 scale-out evidence (SURVEY §6).

Sweeps the newest corpus/graph operators at growing input sizes using
the existing .scratch/scale_sweep/x{1,4,16} corpora (disjoint-vocab
copies of the sf0.1 documents/embeddings tables — cross-copy matches
impossible, so pair outputs must stay linear) and sf0.01 vs sf0.1 for
the fixture-graph ops. One JSON line at the end.

Claims under test:
* llm_dedup_containment / llm_boilerplate_ngrams — shingle-keyed joins:
  wall and candidate counts linear in corpus (never doc-pairwise).
* llm_lsh_tuning_curve — signature pass + band join: linear; the 8x1
  layout's candidate count is the only super-linear column and is
  REPORTED BY the operator itself.
* llm_url_dedup / llm_corpus_card — single-shuffle aggs: linear.
* graph_hash_walks / graph_hits / graph_label_propagation — per-round
  keyed joins on edges: sub-linear in edges at 10x (fixed round count
  dominates).

Run on an idle machine.
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
    spark = build_session("scale-sweep-r6b")
    out = {}
    for key in ("llm_dedup_containment", "llm_boilerplate_ngrams",
                "llm_lsh_tuning_curve", "llm_url_dedup", "llm_corpus_card"):
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
    for key in ("graph_hash_walks", "graph_hits", "graph_label_propagation"):
        fn = QUERIES[key]
        rows = {}
        for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
            wall, n = timed(fn, spark, sf)
            rows[os.path.basename(sf)] = {"wall_s": wall, "rows": n}
        out[key] = rows
    print(json.dumps({"sweep": "r6b", "loadavg": [round(x, 2) for x in os.getloadavg()],
                      "results": out}))
    spark.stop()


if __name__ == "__main__":
    main()
