"""Semantic invariants for the ml/llm/udf contract rows — including
the staged r9 canaries (llm_dedup_exact, udf_pandas) and the r11
canary (ml_label). Python surfaces are re-checked against JVM
expressions (the exact inversion a broken Arrow batch would fail),
and the dedup/label/filter keys against independent recounts."""

from __future__ import annotations

import hashlib
import math

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.operators._shared import t
from morphl_model_publishers_churning_users_spark.registry import get_queries

_Q = get_queries()


def _df(spark, sf_dir, key):
    return _Q[key](spark, sf_dir)


def test_churn_label_threshold_recomputed(spark, sf_dir):
    rows = _df(spark, sf_dir, "ml_label").collect()
    ev = t(spark, sf_dir, "events")
    expect = {
        r["user_id"]: r["lts"]
        for r in ev.groupBy("user_id").agg(F.max("ts").alias("lts")).collect()
    }
    assert len(rows) == len(expect)
    import datetime as dt

    cut = dt.datetime(2024, 1, 29, 20, 0, 0)
    for r in rows:
        assert r["last_ts"] == expect[r["user_id"]]
        assert r["churned"] == (1 if r["last_ts"] < cut else 0)


def test_crossval_selects_a_unique_best_fold_winner(spark, sf_dir):
    rows = _df(spark, sf_dir, "ml_crossval").collect()
    assert len(rows) >= 2  # at least two hyperparameter candidates
    assert all(r["auc_ok"] for r in rows)
    # n_best is the total winner count, stamped on every grid row:
    # the fold-averaged selection must pick exactly one model.
    assert all(r["n_best"] == 1 for r in rows)
    assert {r["reg_param"] for r in rows} == {0.01, 0.5}


def test_dedup_exact_groups_are_a_partition_with_min_survivor(spark, sf_dir):
    rows = _df(spark, sf_dir, "llm_dedup_exact").collect()
    docs = t(spark, sf_dir, "documents")
    # Hash groups partition the corpus.
    assert sum(r["dup_count"] for r in rows) == docs.count()
    # The survivor is the min doc_id of its group, so survivors are
    # distinct and there are as many groups as distinct normalized
    # texts.
    keep = [r["keep_doc_id"] for r in rows]
    assert len(keep) == len(set(keep))
    n_norm = docs.select(F.md5(F.lower(F.trim("text")))).distinct().count()
    assert len(rows) == n_norm
    # Spot-check the hash against Python hashlib on a few docs.
    sample = docs.select("doc_id", "text").limit(20).collect()
    hashes = {r["content_hash"] for r in rows}
    for s in sample:
        h = hashlib.md5(s["text"].strip().lower().encode("utf-8")).hexdigest()
        assert h in hashes


def test_langfilter_is_the_exact_predicate_slice(spark, sf_dir):
    d = _df(spark, sf_dir, "llm_langfilter")
    docs = t(spark, sf_dir, "documents")
    expect = docs.filter(
        F.col("lang").isin("en", "de") & F.col("n_chars").between(100, 400)
    )
    assert d.count() == expect.count()
    assert d.filter(~F.col("lang").isin("en", "de")).count() == 0
    assert d.filter((F.col("n_chars") < 100) | (F.col("n_chars") > 400)).count() == 0


def test_tfidf_anchor_flag_holds(spark, sf_dir):
    r = _df(spark, sf_dir, "llm_tfidf").collect()[0]
    assert r["n_docs"] == t(spark, sf_dir, "documents").count()
    assert r["tfidf_ok"]


def test_embed_ops_scalar_algebra(spark, sf_dir):
    d = _df(spark, sf_dir, "llm_embed_ops")
    emb = t(spark, sf_dir, "embeddings")
    assert d.count() == emb.count()
    # min <= mean <= max, and the L2 norm dominates |mean| * sqrt(dim)
    # by Cauchy-Schwarz (dim = 64 in the fixture).
    assert d.filter(
        (F.col("min_elem") > F.col("mean_elem")) | (F.col("mean_elem") > F.col("max_elem"))
    ).count() == 0
    assert d.filter(F.col("l2_norm") < 0).count() == 0
    assert d.filter(
        F.col("l2_norm") + 1e-6 < F.abs(F.col("mean_elem")) * math.sqrt(64.0)
    ).count() == 0
    # Re-derive the norm for a sample with higher-order functions.
    jn = d.alias("s").join(emb.alias("e"), F.col("s.vec_id") == F.col("e.vec_id"))
    sq = F.aggregate(
        F.transform("e.embedding", lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x * x,
    )
    assert jn.filter(F.abs(F.col("l2_norm") - F.sqrt(sq)) > 1e-4).count() == 0


def test_python_udf_tag_matches_jvm_concat(spark, sf_dir):
    d = _df(spark, sf_dir, "udf_python").alias("u")
    docs = t(spark, sf_dir, "documents").alias("d")
    jn = d.join(docs, F.col("u.doc_id") == F.col("d.doc_id"))
    assert jn.count() == docs.count()
    assert jn.filter(
        F.col("tag") != F.concat_ws(":", "d.lang", "d.source")
    ).count() == 0


def test_pandas_udf_log1p_inverts_back_to_value(spark, sf_dir):
    d = _df(spark, sf_dir, "udf_pandas").alias("p")
    ev = t(spark, sf_dir, "events").alias("e")
    assert d.count() == ev.count()
    jn = d.join(ev, F.col("p.event_id") == F.col("e.event_id"))
    # exp(log1p(v)) - 1 == v: the Arrow batch path must invert exactly
    # (up to the 1e-6 output rounding).
    assert jn.filter(
        F.abs(F.exp(F.col("log1p_value")) - 1.0 - F.col("e.value")) > 1e-3
    ).count() == 0


def test_grouped_map_zscores_standardize_each_user(spark, sf_dir):
    d = _df(spark, sf_dir, "udf_grouped_map")
    ev = t(spark, sf_dir, "events")
    assert d.count() == ev.count()
    # Per user: z-scores have mean ~0 and sample-sd ~1 (the defining
    # property of standardization), recomputed JVM-side.
    stats = d.groupBy("user_id").agg(
        F.avg("z_value").alias("m"),
        F.stddev_samp("z_value").alias("s"),
        F.count("z_value").alias("n"),
    )
    bad = stats.filter(
        (F.col("n") >= 3)
        & ((F.abs(F.col("m")) > 1e-4) | (F.abs(F.col("s") - 1.0) > 1e-3))
    )
    assert bad.count() == 0


def test_grouped_agg_weighted_mean_within_value_range(spark, sf_dir):
    rows = _df(spark, sf_dir, "udf_grouped_agg").collect()
    ev = t(spark, sf_dir, "events")
    rng = {
        r["event_type"]: (r["mn"], r["mx"])
        for r in ev.groupBy("event_type")
        .agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
        .collect()
    }
    assert len(rows) == len(rng)
    for r in rows:
        mn, mx = rng[r["event_type"]]
        # A weighted mean with positive weights lives in [min, max].
        assert mn - 1e-6 <= r["weighted_mean"] <= mx + 1e-6


def test_udtf_word_explosion_conserves_token_counts(spark, sf_dir):
    d = _df(spark, sf_dir, "udtf_python")
    docs = t(spark, sf_dir, "documents").filter(F.col("doc_id") < 100)
    expect = docs.select(
        F.size(F.split(F.trim("text"), r"\s+")).alias("n")
    ).agg(F.sum("n")).collect()[0][0]
    assert d.count() == expect
    assert d.select("doc_id").distinct().count() == docs.count()
    assert d.filter(F.length("word") < 1).count() == 0
