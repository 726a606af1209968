#!/usr/bin/env python
"""Wave-4 scale-out evidence (SURVEY §6).

Measures the round-6 wave-4 operators at growing input sizes and prints
one JSON line per family:

* agg_heavy_hitters at 1x/4x/16x the sf0.1 corpus (scale_sweep.py's
  disjoint-vocab copies). Claim: the Misra-Gries pass is O(k) state per
  task and one scan, so wall time is linear in corpus size regardless
  of vocabulary growth (the scaled copies multiply the vocabulary too —
  a full groupBy's hash table grows 16x, the sketch's does not).
* llm_retrieval_eval at the same 1x/4x/16x embeddings. Claim: the exact
  side grows linearly (5 broadcast queries x n candidates); the ANN
  side grows with its bucket sizes — the measured recall/nDCG at each
  scale shows what fixed 4-bit buckets cost in quality as n grows (the
  same dial llm_semdedup's sweep demonstrated for dedup).
* scan_rowgroup_stats + sink_clustered_write at sf0.01 vs sf0.1 (10x
  rows). Claim: the footer audit reads metadata only, so wall time is
  O(files), flat in row count; the clustered write is one range
  shuffle, linear.

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

SWEEP = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    "scale_sweep",
)


def timed(fn, spark, sf_dir):
    t0 = time.perf_counter()
    rows = fn(spark, sf_dir).collect()
    return round(time.perf_counter() - t0, 2), rows


def main() -> None:
    pkg.load_all_operators()
    spark = build_session("scale-sweep-wave4")
    out = {}

    for key in ("agg_heavy_hitters", "llm_retrieval_eval"):
        fn = QUERIES[key]
        fn(spark, "/root/testdata/sf0.001").count()  # warm plan shapes
        rows = {}
        for s in (1, 4, 16):
            d = f"{SWEEP}/x{s}"
            if not os.path.isdir(d):
                continue
            wall, res = timed(fn, spark, d)
            entry = {"wall_s": wall, "rows": len(res)}
            if key == "llm_retrieval_eval" and res:
                entry["mean_recall_at_10"] = round(
                    sum(r["recall_at_10"] for r in res) / len(res), 3
                )
                entry["mean_ndcg_at_10"] = round(
                    sum(r["ndcg_at_10"] for r in res) / len(res), 3
                )
            rows[f"x{s}"] = entry
        out[key] = rows

    for key in ("scan_rowgroup_stats", "sink_clustered_write"):
        fn = QUERIES[key]
        rows = {}
        for sf in ("/root/testdata/sf0.01", "/root/testdata/sf0.1"):
            wall, res = timed(fn, spark, sf)
            rows[os.path.basename(sf)] = {"wall_s": wall, "rows": len(res)}
        out[key] = rows

    print(json.dumps(out))


if __name__ == "__main__":
    main()
