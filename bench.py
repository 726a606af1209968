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
    # Warmup: one pass at sf0.001 (compiles every plan shape cheaply),
    # then ONE pass at the TARGET sf. The second is load-bearing for the
    # MLlib MinHash paths: their hot loops only JIT-tier at real data
    # volume, and without it pass times fall monotonically across the
    # timed reps (measured r6: raw_dedup_fuzzy 2.02→1.15 s over 5 passes)
    # so the median reads ~20% above steady state — the entire apparent
    # r4→r5 "regression" on that family (VERDICT r5 item 5).
    warm_dirs = [d for d in ("/root/testdata/sf0.001", sf_dir) if os.path.isdir(d)]
    for wd in dict.fromkeys(warm_dirs):
        for key in HEADLINE:
            fn = queries.get(key)
            if fn is not None:
                fn(spark, wd).count()

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
    # Extended (non-headline) probes: one representative per round-6
    # family. Kept OUT of "queries"/"value" so the headline total stays
    # comparable round-over-round. Each gets ONE sf0.001 warmup pass
    # before the timed target-sf pass: without it the first probe to
    # touch a cold code path pays JIT/py4j class-loading, not query cost
    # (measured r7: dq_observe_metrics 7.6 s cold vs 0.8 s warm on an
    # otherwise idle host — a 2x round-over-round phantom in BENCH_r07
    # vs r6 traced entirely to first-touch warmth).
    # graph_hits runs FIRST and skips the sf0.001 warmup: its 10
    # checkpointed shuffle rounds self-warm within one execution, and a
    # separate warmup run's ~50 live checkpoint blocks slow the timed
    # pass by ~75% (measured r7: 21.1 s warmed-in-bench vs 12.1 s
    # isolated steady state — the GC fence does not reclaim them fast
    # enough for this, the heaviest probe).
    EXTENDED = (
        "graph_hits",
        "graph_modularity",
        "llm_ngram_novelty",
        "ts_theta_forecast",
        "dq_observe_metrics",
        "join_bloom_pruned",
        "llm_lsh_tuning_curve",
        "ml_logreg_gd",
        "join_spatial_grid",
        # Round-9 additions tracked from their first full round so the
        # per-round series starts at birth, not at first regression.
        "scan_delta_log",
        "fn_avro_container",
        # Round-10 additions, same discipline.
        "scan_delta_checkpoint",
        "fn_avro_schema_evolution",
        # Round-11 additions, same discipline.
        "scan_delta_time_travel_ts",
        "fn_avro_union_nullable",
        # Round-12 additions, same discipline.
        "scan_delta_partition_values",
        "fn_avro_array_blocks",
        # Round-13 additions, same discipline.
        "scan_delta_deletion_vectors",
        "fn_avro_map_blocks",
        # Round-14 additions (additions-only per the driver contract):
        # the two ops this optimization round restructured — langid's
        # pre-aggregated scoring join and the SymDelete fuzzy join —
        # tracked from their rewrite so future rounds see regressions.
        "llm_lang_confusion",
        "join_fuzzy_blocked",
    )
    NO_WARMUP = {"graph_hits"}
    # Interleaved warm→measure per key, with a GC fence between keys:
    # batching all nine warmups before any timed pass left ~18 runs of
    # localCheckpoint blocks live in the block manager, and the probes
    # timed last read 3-4x slow from the squeezed execution memory
    # (measured r7: graph_modularity 13.1 s batched vs 3.5 s isolated).
    import gc

    extended: dict[str, float] = {}
    have_warm_dir = os.path.isdir("/root/testdata/sf0.001")
    for key in EXTENDED:
        fn = queries.get(key)
        if fn is None:
            continue
        gc.collect()  # release prior keys' checkpoint RDDs via py4j finalizers
        spark.sparkContext._jvm.System.gc()
        if have_warm_dir and key not in NO_WARMUP:
            fn(spark, "/root/testdata/sf0.001").count()
            # The warmup's own checkpoint blocks (10/run for the iterative
            # graph ops) must not squeeze the timed pass either.
            gc.collect()
            spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        fn(spark, sf_dir).count()
        extended[key] = round(time.perf_counter() - t0, 3)
    # Machine load (1/5/15-min averages) recorded alongside the numbers:
    # BENCH_r05 was captured right after a long build session and read
    # ~20% slow across unrelated queries; the load field makes such
    # contamination visible in round-over-round comparisons (VERDICT r5).
    try:
        loadavg = [round(x, 2) for x in os.getloadavg()]
    except OSError:
        loadavg = None
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "extended": extended,
                "sf": sf,
                "loadavg": loadavg,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
