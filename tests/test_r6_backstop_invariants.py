"""Semantic invariants for the round-6-tagged backstop keys — the
graph link-prediction pair, asof variants, corpus fits, scorecard ml
ops, dq audits, forecasting backtests, and the remaining io/window
surfaces. Each contract re-derived from the fixture independently."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.operators._shared import t
from morphl_model_publishers_churning_users_spark.registry import get_queries

_Q = get_queries()


def _df(spark, sf_dir, key):
    return _Q[key](spark, sf_dir)


def test_adamic_adar_scores_and_ranks(spark, sf_dir):
    rows = _df(spark, sf_dir, "graph_adamic_adar").collect()
    for r in rows:
        assert r["a"] < r["b"]  # canonical pair
        assert r["n_common"] >= 1
        # AA score of k common neighbors is at most k/log(2).
        assert 0 < r["aa_score"] <= r["n_common"] / math.log(2) + 1e-9
    # The rank is a GLOBAL top-20 across brands: dense 1..n with
    # scores descending along it.
    rows.sort(key=lambda r: r["rank"])
    assert [r["rank"] for r in rows] == list(range(1, len(rows) + 1))
    assert len(rows) <= 20
    scores = [r["aa_score"] for r in rows]
    assert scores == sorted(scores, reverse=True)


def test_clustering_coeff_is_a_fraction_over_real_nodes(spark, sf_dir):
    rows = _df(spark, sf_dir, "graph_clustering_coeff").collect()
    for r in rows:
        assert r["n_nodes"] >= 1
        assert -1e-9 <= r["mean_cc"] <= 1.0 + 1e-9


def _check_asof(rows, tolerance_check):
    # One row per purchase; clicks are the same user's and never in
    # the future beyond what the variant allows.
    pids = [r["purchase_id"] for r in rows]
    assert len(pids) == len(set(pids))
    for r in rows:
        if r["click_id"] is not None:
            tolerance_check(r)


def test_asof_tolerance_matches_are_within_the_window(spark, sf_dir):
    rows = _df(spark, sf_dir, "join_asof_tolerance").collect()
    n_purch = None

    def chk(r):
        dt_s = (r["purchase_ts"] - r["click_ts"]).total_seconds()
        # Backward asof with tolerance: click at or before the
        # purchase, within the declared window (24h).
        assert 0 <= dt_s <= 24 * 3600 + 1e-6

    _check_asof(rows, chk)


def test_asof_nearest_is_the_closest_click_either_side(spark, sf_dir):
    rows = _df(spark, sf_dir, "join_asof_nearest").collect()

    def chk(r):
        assert r["click_ts"] is not None

    _check_asof(rows, chk)
    # Spot-verify minimality on a sample: no other click of the user
    # is strictly closer than the chosen one.
    sample = [r for r in rows if r["click_id"] is not None][:20]
    assert sample


def test_asof_nearest_minimality_against_full_click_set(spark, sf_dir):
    rows = [r for r in _df(spark, sf_dir, "join_asof_nearest").collect() if r["click_id"] is not None]
    ev = t(spark, sf_dir, "events")
    clicks = {}
    for c in ev.filter(F.col("event_type") == "click").select("user_id", "ts").collect():
        clicks.setdefault(c["user_id"], []).append(c["ts"])
    for r in rows[:50]:
        chosen = abs((r["purchase_ts"] - r["click_ts"]).total_seconds())
        best = min(abs((r["purchase_ts"] - ts).total_seconds()) for ts in clicks[r["user_id"]])
        assert abs(chosen - best) < 1e-6


def test_zipf_fit_slope_is_negative_over_real_vocab(spark, sf_dir):
    r = _df(spark, sf_dir, "llm_zipf_fit").collect()[0]
    assert r["n_terms"] >= 10
    # Zipf rank-frequency slope is negative; intercept is the log of
    # the top frequency scale, hence positive for a real corpus.
    assert r["zipf_slope"] < 0
    assert r["zipf_intercept"] > 0


def test_blocklist_filter_arithmetic(spark, sf_dir):
    d = _df(spark, sf_dir, "llm_blocklist_filter")
    docs = t(spark, sf_dir, "documents")
    assert d.count() == docs.count()
    assert d.filter(F.col("n_hits") > F.col("n_words")).count() == 0
    assert d.filter(
        F.abs(F.col("hit_rate") - F.col("n_hits") / F.col("n_words")) > 1e-5
    ).count() == 0
    # The gate keeps exactly the low-hit-rate docs: kept docs' max rate
    # is below dropped docs' min rate.
    kept = d.filter(F.col("is_kept")).agg(F.max("hit_rate")).collect()[0][0]
    dropped = d.filter(~F.col("is_kept")).agg(F.min("hit_rate")).collect()[0][0]
    if kept is not None and dropped is not None:
        assert kept < dropped + 1e-9


def test_woe_iv_accounting(spark, sf_dir):
    rows = _df(spark, sf_dir, "ml_woe_iv").collect()
    ev = t(spark, sf_dir, "events")
    n_users = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    assert sum(r["n_users"] for r in rows) == n_users
    for r in rows:
        assert r["n_bad"] + r["n_good"] == r["n_users"]
        assert r["iv_term"] >= -1e-12  # IV terms are nonnegative
        # woe sign agrees with the bad/good imbalance direction after
        # smoothing: a bucket with zero bads has negative woe.
        if r["n_bad"] == 0 and r["n_good"] > 0:
            assert r["woe"] < 0


def test_psi_terms_and_distributions(spark, sf_dir):
    rows = _df(spark, sf_dir, "ml_psi").collect()
    p1 = sum(r["p1"] for r in rows)
    p2 = sum(r["p2"] for r in rows)
    assert abs(p1 - 1.0) < 1e-3 and abs(p2 - 1.0) < 1e-3
    for r in rows:
        assert r["p1"] > 0 and r["p2"] > 0
        assert r["psi_term"] >= -1e-12  # each PSI term is nonnegative


def test_target_encode_is_leave_one_out_smoothed(spark, sf_dir):
    rows = _df(spark, sf_dir, "ml_target_encode").collect()
    # Leave-one-out with prior smoothing: enc =
    # (seg_sum - own_label + prior*10) / (seg_n - 1 + 10). Recompute
    # the segment sums and the global prior from the rows themselves.
    n = len(rows)
    prior = sum(r["churned"] for r in rows) / n
    seg_stats = {}
    for r in rows:
        assert r["churned"] in (0, 1)
        s = seg_stats.setdefault(r["segment"], [0, 0])
        s[0] += r["churned"]
        s[1] += 1
    for r in rows:
        seg_sum, seg_n = seg_stats[r["segment"]]
        expect = (seg_sum - r["churned"] + prior * 10.0) / (seg_n - 1.0 + 10.0)
        assert abs(r["segment_enc"] - expect) < 1e-5
        assert 0.0 <= r["segment_enc"] <= 1.0
    # Within a segment, excluding your own positive label can only
    # lower the encoding: churned users encode below non-churned ones.
    for seg, _ in seg_stats.items():
        enc1 = [r["segment_enc"] for r in rows if r["segment"] == seg and r["churned"] == 1]
        enc0 = [r["segment_enc"] for r in rows if r["segment"] == seg and r["churned"] == 0]
        if enc1 and enc0:
            assert max(enc1) < min(enc0) + 1e-9


def test_feature_hashing_bucket_space(spark, sf_dir):
    d = _df(spark, sf_dir, "ml_feature_hashing")
    ev = t(spark, sf_dir, "events")
    n_users = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    assert d.filter((F.col("bucket") < 0) | (F.col("bucket") > 31)).count() == 0
    # Each user contributes a bounded number of hashed features.
    per_user = d.groupBy("user_id").count()
    assert per_user.filter(F.col("count") > 32).count() == 0
    assert per_user.count() == n_users


def test_confusion_matrix_identities(spark, sf_dir):
    r = _df(spark, sf_dir, "ml_confusion_matrix").collect()[0]
    ev = t(spark, sf_dir, "events")
    n_users = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    assert r["tp"] + r["fp"] + r["fn"] + r["tn"] == n_users
    if r["tp"] + r["fp"] > 0:
        assert abs(r["precision"] - r["tp"] / (r["tp"] + r["fp"])) < 1e-4
    if r["tp"] + r["fn"] > 0:
        assert abs(r["recall"] - r["tp"] / (r["tp"] + r["fn"])) < 1e-4
    if r["precision"] + r["recall"] > 0:
        f1 = 2 * r["precision"] * r["recall"] / (r["precision"] + r["recall"])
        assert abs(r["f1"] - f1) < 1e-4


def test_ks_stat_is_a_proper_fraction(spark, sf_dir):
    r = _df(spark, sf_dir, "ml_ks_stat").collect()[0]
    assert 0.0 <= r["ks"] <= 1.0


def test_l_diversity_flag_is_a_pure_threshold(spark, sf_dir):
    rows = _df(spark, sf_dir, "dq_l_diversity").collect()
    for r in rows:
        assert 1 <= r["l_distinct"] <= r["n_orders"]
    flagged = [r["l_distinct"] for r in rows if r["at_risk"]]
    unflagged = [r["l_distinct"] for r in rows if not r["at_risk"]]
    if flagged and unflagged:
        assert max(flagged) < min(unflagged)


def test_fk_cardinality_recounts(spark, sf_dir):
    rows = {r["fk_edge"]: r for r in _df(spark, sf_dir, "dq_fk_cardinality").collect()}
    li = t(spark, sf_dir, "lineitem")
    r = rows["lineitem->orders"]
    fan = li.groupBy("l_orderkey").count()
    agg = fan.agg(
        F.count(F.lit(1)).alias("p"),
        F.sum("count").alias("c"),
        F.min("count").alias("mn"),
        F.max("count").alias("mx"),
    ).collect()[0]
    assert r["n_parents"] == agg["p"]
    assert r["n_children"] == agg["c"]
    assert r["min_fanout"] == agg["mn"] and r["max_fanout"] == agg["mx"]
    assert abs(r["avg_fanout"] - agg["c"] / agg["p"]) < 1e-4
    for rr in rows.values():
        assert rr["min_fanout"] <= rr["avg_fanout"] <= rr["max_fanout"]


def test_autocorr_coefficients_bounded(spark, sf_dir):
    rows = _df(spark, sf_dir, "ts_autocorr").collect()
    lags = sorted(r["lag_k"] for r in rows)
    assert lags == list(range(1, len(lags) + 1))
    for r in rows:
        assert -1.0 - 1e-6 <= r["acf"] <= 1.0 + 1e-6
        assert r["n_pairs"] >= 1
    # Longer lags have fewer pairs.
    by_lag = sorted(rows, key=lambda r: r["lag_k"])
    pairs = [r["n_pairs"] for r in by_lag]
    assert pairs == sorted(pairs, reverse=True)


def test_changepoint_cusum_is_nonnegative_with_flag_at_peak(spark, sf_dir):
    rows = sorted(_df(spark, sf_dir, "ts_changepoint").collect(), key=lambda r: r["day"])
    ev = t(spark, sf_dir, "events")
    assert len(rows) == ev.select(F.to_date("ts")).distinct().count()
    n_flag = sum(1 for r in rows if r["is_changepoint"])
    assert n_flag <= 1  # a single declared changepoint at most
    if n_flag == 1:
        flagged = next(r for r in rows if r["is_changepoint"])
        # The changepoint is the argmax of |cusum|.
        assert abs(flagged["cusum"]) == max(abs(r["cusum"]) for r in rows)


def test_backtest_error_metrics_ranges(spark, sf_dir):
    rows = _df(spark, sf_dir, "ts_backtest_metrics").collect()
    ev = t(spark, sf_dir, "events")
    assert len(rows) == ev.select("event_type").distinct().count()
    for r in rows:
        assert r["n_days"] >= 1
        assert r["wape_naive1"] >= 0.0 and r["wape_snaive7"] >= 0.0
        # sMAPE is bounded by 2 by definition.
        assert 0.0 <= r["smape_snaive7"] <= 2.0 + 1e-9


def test_lag_features_shift_correctly(spark, sf_dir):
    rows = _df(spark, sf_dir, "ts_lag_features").collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for u, rs in by_user.items():
        rs.sort(key=lambda r: r["day"])
        for i, r in enumerate(rs):
            # lag_1 is yesterday's revenue (0-filled off the grid).
            expect1 = rs[i - 1]["r"] if i >= 1 else 0.0
            assert abs(r["lag_1"] - expect1) < 1e-6
            expect7 = rs[i - 7]["r"] if i >= 7 else 0.0
            assert abs(r["lag_7"] - expect7) < 1e-6
            window = [x["r"] for x in rs[max(0, i - 6) : i + 1]]
            assert abs(r["mean_7"] - sum(window) / len(window)) < 1e-4


def test_pandas_iter_udf_agrees_with_jvm(spark, sf_dir):
    d = _df(spark, sf_dir, "udf_pandas_iter").alias("p")
    ev = t(spark, sf_dir, "events").alias("e")
    assert d.count() == ev.count()
    j = d.join(ev, F.col("p.event_id") == F.col("e.event_id"))
    assert j.filter(
        F.abs(F.exp(F.col("log1p_value")) - 1.0 - F.col("e.value")) > 1e-3
    ).count() == 0
    assert j.filter(
        F.abs(F.col("value_sq") - F.col("e.value") * F.col("e.value")) > 1e-3
    ).count() == 0


def test_frame_interval_rolling_sum_includes_current_row(spark, sf_dir):
    d = _df(spark, sf_dir, "win_frame_interval").alias("w")
    ev = t(spark, sf_dir, "events")
    assert d.count() == ev.count()
    assert d.filter(F.col("n_2d") < 1).count() == 0
    # A 2-day trailing sum is at least the current row's contribution
    # when values are nonnegative, and at most the user total.
    tot = ev.groupBy(F.col("user_id").alias("u")).agg(
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double").alias("t")
    )
    j = d.join(tot, F.col("w.user_id") == F.col("u"))
    assert j.filter(F.col("roll_2d") > F.col("t") + 1e-4).count() == 0


def test_json_lines_roundtrip_is_lossless(spark, sf_dir):
    d = _df(spark, sf_dir, "sink_json_lines")
    ev = t(spark, sf_dir, "events")
    assert d.count() == ev.count()
    # Key sums survive the ndjson round trip, including the nested
    # props extraction.
    a = d.agg(
        F.sum("event_id").alias("i"),
        F.sum("k").alias("k"),
        F.round(F.sum(F.col("value").cast("decimal(38,6)")).cast("double"), 4).alias("v"),
    ).collect()[0]
    b = ev.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("bigint").alias("k"),
        "value",
    ).agg(
        F.sum("event_id").alias("i"),
        F.sum("k").alias("k"),
        F.round(F.sum(F.col("value").cast("decimal(38,6)")).cast("double"), 4).alias("v"),
    ).collect()[0]
    assert (a["i"], a["k"]) == (b["i"], b["k"])
    assert abs(a["v"] - b["v"]) < 1e-3
