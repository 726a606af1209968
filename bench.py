#!/usr/bin/env python
"""Per-round benchmark: headline queries at $SPARK_GRAFT_SF_DIR (default
sf0.1) on local[$SPARK_GRAFT_CPUS]. Prints ONE JSON line:
{"metric": ..., "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced with a cheap count() (no driver-side collect of the
full result — the measurement is engine time, not Arrow transfer time).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from morphl_model_publishers_churning_users_spark.registry import get_queries
from morphl_model_publishers_churning_users_spark.session import build_session

# Headline set: one representative per §2 family, weighted toward the
# shuffle-heavy shapes that dominate at scale.
HEADLINE = [
    "join_star",        # multi-way star join + agg (flagship)
    "join_inner_hash",  # fact-fact shuffle join
    "join_asof",        # as-of (union + window)
    "agg_group",        # per-key rollup
    "agg_pivot",        # pivot
    "win_rownum",       # window rank
    "ts_session",       # sessionization
    "dedup_exact",      # exact dedup
    "llm_dedup_exact",  # corpus hash dedup
    "llm_simsearch",    # cosine top-k
    "raw_dedup_fuzzy",  # MinHash-LSH near-dup (bucketed similarity join)
    "llm_dedup_minhash_sql",  # pure-codegen MinHash banding + exact rescore
    "llm_cc_pipeline",  # composed corpus-cleanup pipeline
    "raw_simsearch_ann",  # random-projection LSH ANN
    "topk",             # TakeOrdered
    "agg_stats",        # statistical aggs
    "ts_ewma",          # segmented ordered fold
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    try:
        sf = float(os.path.basename(sf_dir.rstrip("/")).replace("sf", ""))
    except ValueError:
        sf = -1.0
    spark = build_session("mpcu-bench")
    queries = dict(get_queries())
    # Production paths for the near-dup / ANN ops: the REGISTERED
    # llm_dedup_fuzzy / llm_simsearch_ann are driver-contract wrappers
    # that also compute an exact-ground-truth recall anchor; benching
    # them measured mostly oracle-anchor overhead (VERDICT r3). The raw
    # functions are the engine paths a production pipeline runs.
    from morphl_model_publishers_churning_users_spark.operators.llm import (
        raw_dedup_fuzzy,
        raw_simsearch_ann,
    )

    queries["raw_dedup_fuzzy"] = raw_dedup_fuzzy
    queries["raw_simsearch_ann"] = raw_simsearch_ann
    # Warmup: run the same queries at sf0.001 first. Plan shapes are
    # identical, so whole-stage codegen compiles once here and the timed
    # runs measure engine throughput rather than JVM JIT/compile time.
    warm_dir = "/root/testdata/sf0.001"
    if os.path.isdir(warm_dir) and warm_dir != sf_dir:
        for key in HEADLINE:
            fn = queries.get(key)
            if fn is not None:
                fn(spark, warm_dir).count()

    # Three timed passes per query, report the MEDIAN: two-pass min still
    # oscillated ±25% round-over-round on an unchanged, plan-pin-tested
    # flagship (join_star 0.69-0.92 s across r1-r4 — VERDICT r4 item 6),
    # making deltas unreadable near the 2x bar. The median of three is
    # robust to a single GC/AQE/OS hiccup in either direction.
    passes: dict[str, list[float]] = {k: [] for k in HEADLINE}
    for _ in range(3):
        for key in HEADLINE:
            fn = queries.get(key)
            if fn is None:
                continue
            t0 = time.perf_counter()
            fn(spark, sf_dir).count()
            passes[key].append(time.perf_counter() - t0)
    timings: dict[str, float] = {
        k: round(sorted(v)[len(v) // 2], 3) for k, v in passes.items() if v
    }
    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
