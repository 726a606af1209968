"""Property tests for rows-only ML ops (SURVEY.md §5.3)."""

from __future__ import annotations

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.plans import churn
from morphl_model_publishers_churning_users_spark.registry import get_queries

_Q = get_queries()


def test_split_disjoint_and_complete(spark, sf_dir):
    split = _Q["ml_split"](spark, sf_dir)
    users = churn.user_features(spark, sf_dir).select("user_id")
    n_users = users.count()
    assert split.count() == n_users
    assert split.select("user_id").distinct().count() == n_users
    # Deterministic: same split twice.
    again = _Q["ml_split"](spark, sf_dir)
    assert split.exceptAll(again).count() == 0


def test_features_standardized(spark, sf_dir):
    feats = _Q["ml_features"](spark, sf_dir)
    row = feats.agg(
        F.round(F.avg("f_n_events"), 2).alias("mu"),
        F.round(F.stddev_samp("f_n_events"), 1).alias("sd"),
    ).collect()[0]
    assert abs(row.mu) < 0.05  # withMean=True → centered
    assert abs(row.sd - 1.0) < 0.2  # unit variance


def test_train_produces_nonzero_model(spark, sf_dir):
    coefs = _Q["ml_train"](spark, sf_dir)
    nonzero = coefs.filter(F.abs(F.col("coefficient")) > 1e-9).count()
    assert nonzero > 0


def test_eval_auc_beats_chance(spark, sf_dir):
    auc = _Q["ml_eval"](spark, sf_dir).collect()[0].value
    # recency_days is in the features and defines the label → must separate.
    assert auc > 0.5


def test_infer_probabilities_valid(spark, sf_dir):
    scored = _Q["ml_infer"](spark, sf_dir)
    bad = scored.filter((F.col("churn_prob") < 0) | (F.col("churn_prob") > 1)).count()
    assert bad == 0
    assert scored.count() == churn.user_features(spark, sf_dir).count()


def test_approx_distinct_within_tolerance(spark, sf_dir):
    rows = _Q["agg_approx_distinct"](spark, sf_dir).collect()
    for r in rows:
        assert r.approx_ok, (r.l_returnflag, r.exact_orders)


def test_sample_fraction_tolerance(spark, sf_dir):
    from morphl_model_publishers_churning_users_spark.catalog import table

    total = table(spark, sf_dir, "lineitem").count()
    n = _Q["sample_rows"](spark, sf_dir).count()
    assert 0.1 * total <= n <= 0.3 * total


def test_dedup_idempotent(spark, sf_dir):
    once = _Q["dedup_exact"](spark, sf_dir)
    assert once.count() == once.dropDuplicates().count()


def test_fuzzy_dedup_and_ann_run_symmetrically(spark, sf_dir):
    pairs = _Q["llm_dedup_fuzzy"](spark, sf_dir)
    # pairs are strictly ordered (a < b): no self-pairs, no mirrored dups
    assert pairs.filter(F.col("doc_a") >= F.col("doc_b")).count() == 0
    ann = _Q["llm_simsearch_ann"](spark, sf_dir)
    assert ann.filter(F.col("rank") > 10).count() == 0


def test_ivf_recall_vs_exact(spark, sf_dir):
    """IVF probes 2/16 cells yet must still recover a meaningful share of
    the exact top-10 — the quality bar for the approximate scale path."""
    exact = {
        (r.query_id, r.neighbor_id)
        for r in _Q["llm_simsearch"](spark, sf_dir).collect()
    }
    ivf = {
        (r.query_id, r.neighbor_id)
        for r in _Q["llm_simsearch_ivf"](spark, sf_dir).collect()
    }
    recall = len(exact & ivf) / len(exact)
    assert recall >= 0.2, f"IVF recall@10 too low: {recall:.2f}"


def test_kmeans_segments_partition_users(spark, sf_dir):
    """Segments must partition the user base: sizes sum to the user
    count and at least 2 non-empty clusters emerge at k=4."""
    from morphl_model_publishers_churning_users_spark.registry import get_queries
    from morphl_model_publishers_churning_users_spark.plans import churn

    rows = get_queries()["ml_kmeans_segment"](spark, sf_dir).collect()
    n_users = churn.user_features(spark, sf_dir).count()
    assert sum(r["n_users"] for r in rows) == n_users
    assert 2 <= len(rows) <= 4
