"""Meta-test: every ok-flag oracle key must name its backing invariant.

37 registry keys carrying 52 flag columns (approximate/sketch/model/
engine-specific ops — counts derived from ``_okflag_keys()``) use the
documented exact-anchor + ok-flag oracle contract: the exactly
recomputable columns are value-hashed against DuckDB, while the
approximate part rides a Spark-side boolean invariant compared against a
literal ``TRUE AS <flag>`` in the oracle. That flag half is self-graded
by construction (r7 verdict), so the compensating evidence is a
property/invariant test that computes the flag's inputs INDEPENDENTLY
(e.g. HLL vs exact count, ANN recall vs brute force, roundtrip vs a
Python reference). This meta-test makes that evidence mandatory and
self-enforcing, the same pattern as test_invariant_coverage.py:

* the ok-flag key set is REGEX-DISCOVERED from the live oracles
  (``TRUE AS <alias>``), so registering a new ok-flag op without adding
  a mapping entry here fails the suite;
* each mapped backing test must still exist by name and still reference
  its key, so renaming or deleting the backing test also fails.
"""

from __future__ import annotations

import pathlib
import re

from morphl_model_publishers_churning_users_spark.registry import get_oracles

_TESTS_DIR = pathlib.Path(__file__).parent

# key -> (test file, backing test function). The named function computes
# the flag's inputs independently of the operator's own flag expression.
BACKING: dict[str, tuple[str, str]] = {
    "agg_approx_distinct": ("test_ml.py", "test_approx_distinct_within_tolerance"),
    "agg_hll_union": ("test_engine.py", "test_hll_union_rollup_accuracy"),
    "agg_percentile_approx": ("test_engine.py", "test_percentile_approx_tracks_exact"),
    "agg_sketch_hll": ("test_engine.py", "test_hll_sketch_within_5pct_of_exact"),
    "dq_hll_error_audit": (
        "test_round10_window_invariants.py",
        "test_hll_audit_anchors_to_exact_count",
    ),
    "dq_quantile_sketch_audit": (
        "test_round6_wave4_ops.py",
        "test_quantile_sketch_bounds_hold_at_all_accuracies",
    ),
    "fn_avro_container": (
        "test_round9_ops.py",
        "test_avro_container_parses_with_reference_ocf_reader",
    ),
    "fn_avro_schema_evolution": (
        "test_round10_ops.py",
        "test_avro_schema_evolution_matches_python_reference",
    ),
    "fn_avro_union_nullable": (
        "test_round11_ops.py",
        "test_avro_union_nullable_matches_python_encoder",
    ),
    "fn_avro_array_blocks": (
        "test_round12_ops.py",
        "test_array_blocks_matches_python_encoder",
    ),
    "scan_delta_partition_values": (
        "test_round12_ops.py",
        "test_partition_pruning_never_opens_out_of_range_files",
    ),
    "fn_avro_map_blocks": (
        "test_round13_ops.py",
        "test_map_blocks_matches_python_encoder",
    ),
    "scan_delta_deletion_vectors": (
        "test_round13_ops.py",
        "test_dv_tombstones_match_independent_scan",
    ),
    "fn_avro_wire": ("test_round8_ops.py", "test_avro_zigzag_varint_boundaries"),
    "fn_protobuf_wire": ("test_round7_ops.py", "test_protobuf_wire_varint_boundaries"),
    "llm_compression_filter": (
        "test_round7_window_extra_invariants.py",
        "test_compression_filter_covers_corpus_with_true_flags_on_normal_text",
    ),
    "llm_dedup_fuzzy": ("test_ml.py", "test_fuzzy_dedup_and_ann_run_symmetrically"),
    "llm_dedup_simhash": (
        "test_llm_corpus_backstop_invariants.py",
        "test_simhash_covers_every_exact_dup_group",
    ),
    "llm_kmeans_embed": ("test_llm_corpus_backstop_invariants.py", "test_kmeans_anchor"),
    "llm_simsearch_ann": ("test_ml.py", "test_fuzzy_dedup_and_ann_run_symmetrically"),
    "llm_simsearch_ivf": ("test_ml.py", "test_ivf_recall_vs_exact"),
    "llm_tfidf": ("test_core_ml_llm_udf_invariants.py", "test_tfidf_anchor_flag_holds"),
    "ml_crossval": (
        "test_core_ml_llm_udf_invariants.py",
        "test_crossval_selects_a_unique_best_fold_winner",
    ),
    "ml_eval": ("test_ml.py", "test_eval_auc_beats_chance"),
    "ml_features": ("test_ml.py", "test_features_standardized"),
    "ml_infer": ("test_ml.py", "test_infer_probabilities_valid"),
    "ml_kmeans_segment": ("test_ml.py", "test_kmeans_segments_partition_users"),
    "ml_pca_embed": (
        "test_r5_backstop_invariants.py",
        "test_pca_components_are_dense_and_flagged_ok",
    ),
    "ml_rf": ("test_r5_backstop_invariants.py", "test_rf_importances_form_a_simplex"),
    "ml_split": ("test_ml.py", "test_split_disjoint_and_complete"),
    "ml_train": ("test_ml.py", "test_train_produces_nonzero_model"),
    "mm_header_parse": ("test_round5_ops.py", "test_header_parse_all_valid"),
    "sample_rows": ("test_ml.py", "test_sample_fraction_tolerance"),
    "sample_stratified": (
        "test_behavioral_ts_win_invariants.py",
        "test_stratified_sample_hits_every_stratum",
    ),
    "scan_metadata_cols": (
        "test_round10_window_invariants.py",
        "test_metadata_cols_one_file_per_partition_and_dense_rowidx",
    ),
    "scan_orphan_files": (
        "test_round10_window_invariants.py",
        "test_orphan_audit_finds_staged_orphans_without_corrupting_reads",
    ),
    "scan_partition_skew_audit": (
        "test_round6_wave4_ops.py",
        "test_partition_skew_audit_reconciles_with_source",
    ),
    "scan_rowgroup_stats": (
        "test_round6_wave4_ops.py",
        "test_rowgroup_stats_match_full_scan",
    ),
    "sink_bloom_filter_parquet": (
        "test_round6_wave4_ops.py",
        "test_bloom_write_measured_larger",
    ),
    "sink_clustered_write": (
        "test_round6_wave4_ops.py",
        "test_clustered_write_ranges_disjoint",
    ),
    "sink_compact_small_files": (
        "test_round10_window_invariants.py",
        "test_compaction_is_lossless_and_actually_compacts",
    ),
    "sink_compression_codecs": (
        "test_round10_window_invariants.py",
        "test_codec_bakeoff_flags_and_lossless_roundtrip",
    ),
}


def _okflag_keys() -> set[str]:
    return {
        k
        for k, sql in get_oracles().items()
        if re.search(r"\bTRUE\s+AS\s+\w+", sql, re.I)
    }


def _function_body(path: pathlib.Path, func: str) -> str | None:
    text = path.read_text()
    m = re.search(rf"(?m)^def {re.escape(func)}\b.*?(?=^def |\Z)", text, re.S)
    return m.group(0) if m else None


def test_okflag_key_set_matches_backing_map():
    discovered = _okflag_keys()
    mapped = set(BACKING)
    assert discovered == mapped, (
        f"ok-flag keys without a named backing invariant: "
        f"{sorted(discovered - mapped)}; stale mapping entries: "
        f"{sorted(mapped - discovered)} — every literal-TRUE oracle flag "
        f"needs a property test computing its inputs independently."
    )


def test_every_backing_test_exists_and_references_its_key():
    problems = []
    for key, (fname, func) in BACKING.items():
        path = _TESTS_DIR / fname
        if not path.exists():
            problems.append(f"{key}: {fname} missing")
            continue
        body = _function_body(path, func)
        if body is None:
            problems.append(f"{key}: {fname}::{func} not found")
        elif f'"{key}"' not in body and f"'{key}'" not in body:
            problems.append(f"{key}: {fname}::{func} no longer references the key")
    assert problems == [], problems
