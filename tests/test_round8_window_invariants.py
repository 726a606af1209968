"""Semantic invariants for round-8-window keys (oracle-hash parity is
covered by test_oracle.py at three scales; these pin the DOMAIN
properties a hash can't explain — bounds, monotonicity, conservation)."""

from __future__ import annotations

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.registry import get_queries

_Q = get_queries()


def _df(spark, sf_dir, key):
    return _Q[key](spark, sf_dir)


def test_containment_is_a_proper_fraction(spark, sf_dir):
    d = _df(spark, sf_dir, "llm_dedup_containment")
    assert d.filter((F.col("containment") < 0.0) | (F.col("containment") > 1.0)).count() == 0
    # containment is directional: the contained doc's shingles sit inside
    # the container's, so a pair never lists a doc as its own container.
    assert d.filter(F.col("contained_doc") == F.col("container_doc")).count() == 0


def test_watermark_ztest_flag_matches_zscore(spark, sf_dir):
    d = _df(spark, sf_dir, "llm_watermark_ztest")
    # green-token count bounded by token count; the flag is a pure
    # function of the z-score (one-sided detection at z > threshold).
    assert d.filter(F.col("n_green") > F.col("n_tokens")).count() == 0
    assert d.filter(F.col("flagged") & (F.col("z_score") <= 0)).count() == 0


def test_embed_norm_audit_counts_are_consistent(spark, sf_dir):
    r = _df(spark, sf_dir, "llm_embed_norm_audit").collect()[0]
    assert 0 <= r["n_zero_vectors"] <= r["n_vectors"]
    assert 0 <= r["n_norm_outliers"] <= r["n_vectors"]
    assert r["min_norm"] <= r["max_norm"]
    assert r["min_norm"] >= 0.0


def test_ece_is_a_probability_gap(spark, sf_dir):
    r = _df(spark, sf_dir, "ml_ece").collect()[0]
    assert 0.0 <= r["ece"] <= 1.0
    assert r["n_bins"] <= r["n_total"]


def test_jsd_within_log2_bound(spark, sf_dir):
    # Jensen-Shannon divergence (nats, base-2 normalized variants both
    # bounded by 1) can never go negative or exceed 1.
    r = _df(spark, sf_dir, "ml_drift_jsd").collect()[0]
    assert 0.0 <= r["jsd"] <= 1.0


def test_pinball_loss_nonnegative_every_quantile(spark, sf_dir):
    d = _df(spark, sf_dir, "ml_pinball_loss")
    assert d.filter(F.col("pinball") < 0).count() == 0
    assert d.filter((F.col("tau") <= 0) | (F.col("tau") >= 1)).count() == 0


def test_qini_curve_deciles_partition_population(spark, sf_dir):
    d = _df(spark, sf_dir, "ml_qini_curve")
    rows = d.orderBy("decile").collect()
    assert [r["decile"] for r in rows] == list(range(1, len(rows) + 1))
    assert all(r["n_treated"] >= 0 and r["n_control"] >= 0 for r in rows)


def test_rmst_bounded_by_horizon(spark, sf_dir):
    r = _df(spark, sf_dir, "ml_km_rmst").collect()[0]
    assert 0.0 <= r["rmst_30d"] <= 30.0


def test_gbm_stumps_beats_constant_predictor(spark, sf_dir):
    # The boosted stumps' training MSE must not exceed the variance of
    # the label (the MSE of predicting the mean) — otherwise boosting
    # made things worse than the 0-round model.
    r = _df(spark, sf_dir, "ml_gbm_stumps").collect()[0]
    p = r["mean_pred"]
    assert 0.0 <= r["mse"] <= max(p * (1 - p), 1e-9) + 1e-9


def test_hosmer_lemeshow_stat_nonnegative(spark, sf_dir):
    r = _df(spark, sf_dir, "ml_hosmer_lemeshow").collect()[0]
    assert r["hl_stat"] >= 0.0
    assert r["df"] == r["n_bins"] - 2


def test_cost_threshold_confusion_cells_nonnegative(spark, sf_dir):
    r = _df(spark, sf_dir, "ml_cost_threshold").collect()[0]
    assert r["tp"] >= 0 and r["fp"] >= 0 and r["fn"] >= 0
    assert r["cost"] >= 0


def test_curriculum_order_is_a_per_stage_permutation(spark, sf_dir):
    d = _df(spark, sf_dir, "llm_curriculum_order")
    n = d.count()
    # every doc placed exactly once across the whole curriculum
    assert d.select("doc_id").distinct().count() == n
    # within each stage, positions are exactly 1..|stage| (dense ranks)
    stages = (
        d.groupBy("stage")
        .agg(
            F.min("position").alias("lo"),
            F.max("position").alias("hi"),
            F.count(F.lit(1)).alias("n"),
            F.countDistinct("position").alias("nd"),
        )
        .collect()
    )
    for s in stages:
        assert s["lo"] == 1 and s["hi"] == s["n"] and s["nd"] == s["n"], s


def test_cuped_never_increases_variance(spark, sf_dir):
    r = _df(spark, sf_dir, "ml_cuped").collect()[0]
    assert r["var_adjusted"] <= r["var_y"] + 1e-9
    assert 0.0 <= r["var_reduction"] <= 1.0


def test_power_mde_positive_and_relative_consistent(spark, sf_dir):
    d = _df(spark, sf_dir, "ml_power_mde")
    assert d.filter(F.col("mde_abs") <= 0).count() == 0
    bad = d.filter(
        F.abs(F.col("mde_rel") - F.col("mde_abs") / F.col("mean_y")) > 1e-4
    ).count()
    assert bad == 0


def test_kwic_span_contains_the_keyword_window(spark, sf_dir):
    d = _df(spark, sf_dir, "llm_kwic_spans")
    assert d.count() > 0
    assert d.filter(F.col("pos") < 0).count() == 0
    assert d.filter(F.length("span") == 0).count() == 0


def test_corpus_card_internal_consistency(spark, sf_dir):
    r = _df(spark, sf_dir, "llm_corpus_card").collect()[0]
    assert r["n_exact_dups"] <= r["n_docs"]
    assert r["median_tokens"] <= r["max_tokens"]
    assert r["total_tokens"] <= r["total_chars"]  # tokens are ≥1 char + sep
    assert r["n_langs"] >= 1 and r["n_sources"] >= 1


def test_hard_negatives_ranked_by_similarity(spark, sf_dir):
    d = _df(spark, sf_dir, "llm_hard_negatives")
    assert d.filter((F.col("cos_sim") < -1.0) | (F.col("cos_sim") > 1.0)).count() == 0
    assert d.filter(F.col("query_id") == F.col("neighbor_id")).count() == 0
    # within a query, rank order must follow descending similarity
    from pyspark.sql import Window

    w = Window.partitionBy("query_id").orderBy("rank")
    bad = (
        d.withColumn("prev", F.lag("cos_sim").over(w))
        .filter(F.col("prev").isNotNull() & (F.col("cos_sim") > F.col("prev") + 1e-9))
        .count()
    )
    assert bad == 0


def test_span_corruption_conserves_tokens(spark, sf_dir):
    d = _df(spark, sf_dir, "llm_span_corruption")
    assert d.filter(F.col("n_masked") > F.col("n_tokens")).count() == 0
    # corrupted text carries sentinels iff tokens were masked, and the
    # targets hold exactly the masked-out tokens (split('') is [''] —
    # size 1 — so the count check only applies to masked docs)
    bad = d.filter(
        (F.col("n_masked") > 0)
        & (F.size(F.split(F.col("targets"), r"\s+")) != F.col("n_masked"))
    ).count()
    assert bad == 0
    assert d.filter((F.col("n_masked") == 0) & (F.length("targets") > 0)).count() == 0
    assert d.filter(~F.col("corrupted").contains("<X>") & (F.col("n_masked") > 0)).count() == 0


def test_preference_pairs_gap_positive(spark, sf_dir):
    d = _df(spark, sf_dir, "llm_preference_pairs")
    assert d.filter(F.col("quality_gap") <= 0).count() == 0
    assert d.filter(F.col("chosen") == F.col("rejected")).count() == 0


def test_bpe_first_merges_are_frequency_ranked_bigrams(spark, sf_dir):
    d = _df(spark, sf_dir, "llm_bpe_first_merges")
    assert d.filter(F.col("freq") <= 0).count() == 0
    assert d.filter(F.length("pair") < 2).count() == 0
    assert d.select("pair").distinct().count() == d.count()


def test_transitivity_ratio_is_a_fraction(spark, sf_dir):
    r = _df(spark, sf_dir, "llm_dedup_transitivity_audit").collect()[0]
    assert r["n_closed"] <= r["n_wedges"]
    assert 0.0 <= r["transitivity"] <= 1.0


def test_lsh_bucket_skew_accounting(spark, sf_dir):
    d = _df(spark, sf_dir, "llm_lsh_bucket_skew")
    assert d.filter(F.col("max_bucket") < 1).count() == 0
    assert d.filter(F.col("mean_probe_cost") < 1.0).count() == 0
    # candidate pairs can never exceed n_buckets * C(max_bucket, 2)
    bad = d.filter(
        F.col("candidate_pairs")
        > F.col("n_buckets") * (F.col("max_bucket") * (F.col("max_bucket") - 1) / 2)
    ).count()
    assert bad == 0


def test_dedup_impact_ledger_conserves(spark, sf_dir):
    r = _df(spark, sf_dir, "llm_dedup_impact").collect()[0]
    assert r["docs_after"] <= r["docs_before"]
    assert r["chars_after"] <= r["chars_before"]
    assert abs(r["doc_reduction"] - (1 - r["docs_after"] / r["docs_before"])) < 1e-6


def test_bootstrap_ci_brackets_the_bootstrap_mean(spark, sf_dir):
    r = _df(spark, sf_dir, "ml_bootstrap_metric_ci").collect()[0]
    assert r["ci_lo"] <= r["boot_mean"] <= r["ci_hi"]


def test_propensity_match_distances_nonnegative(spark, sf_dir):
    r = _df(spark, sf_dir, "ml_propensity_match").collect()[0]
    assert r["n_matched"] >= 0
    assert r["total_dist"] >= 0


def test_did_estimate_is_delta_of_deltas(spark, sf_dir):
    rows = _df(spark, sf_dir, "ml_diff_in_diff").collect()
    if not rows:  # sf0.001 has no treated/control overlap — oracle agrees
        return
    r = rows[0]
    assert abs(r["did_estimate"] - (r["treated_delta"] - r["control_delta"])) < 1e-6


def test_conformal_coverage_bounded_by_test_size(spark, sf_dir):
    d = _df(spark, sf_dir, "ml_conformal_interval")
    assert d.filter(F.col("n_covered") > F.col("n_test")).count() == 0
    assert d.filter(F.col("interval_halfwidth") < 0).count() == 0


def test_shap_linear_attributions_sum_to_zero_mean(spark, sf_dir):
    r = _df(spark, sf_dir, "ml_shap_linear").collect()[0]
    # SHAP of a linear model: mean total attribution over the dataset is
    # E[f(x)] - E[f(x)] = 0 by construction
    assert abs(r["mean_total_attribution"]) < 1e-6
    assert r["mean_abs_shap_recency"] >= 0 and r["mean_abs_shap_events"] >= 0


def test_learning_curve_buckets_grow_training_data(spark, sf_dir):
    rows = _df(spark, sf_dir, "ml_learning_curve").orderBy("train_buckets").collect()
    assert len(rows) >= 2
    sizes = [r["n_train"] for r in rows]
    assert sizes == sorted(sizes)
    assert all(r["holdout_logloss"] >= 0 for r in rows)


def test_mcnemar_discordant_cells_bound_chi2(spark, sf_dir):
    r = _df(spark, sf_dir, "ml_mcnemar_paired").collect()[0]
    assert r["nb_correct"] <= r["n_pairs"] and r["li_correct"] <= r["n_pairs"]
    assert r["b_disc"] + r["c_disc"] <= r["n_pairs"]
    assert r["chi2"] >= 0.0
    assert 0.0 <= r["p_value"] <= 1.0
    assert r["classifiers_differ"] == (r["p_value"] < 0.05)


def test_activity_segments_fit_in_active_frames(spark, sf_dir):
    d = _df(spark, sf_dir, "mm_activity_segments")
    assert d.count() > 0
    # a run can't be longer than the total active frames, and k segments
    # need at least k active frames
    assert d.filter(F.col("max_seg_len") > F.col("n_active")).count() == 0
    assert d.filter(F.col("n_segments") > F.col("n_active")).count() == 0
    assert d.filter((F.col("n_active") > 0) & (F.col("n_segments") == 0)).count() == 0


def test_modality_balance_shares_sum_to_one(spark, sf_dir):
    rows = _df(spark, sf_dir, "mm_modality_balance").collect()
    assert abs(sum(r["share"] for r in rows) - 1.0) < 1e-3
    for r in rows:
        # resample factor moves each modality toward the uniform target
        assert r["resample_factor"] > 0
        target = 1.0 / len(rows)
        assert abs(r["share"] * r["resample_factor"] - target) < 1e-3
