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
