"""Semantic invariants for round-11-window keys (oracle-hash parity is
covered by test_oracle.py at three scales; these pin DOMAIN properties
a hash can't explain — bounds, conservation across operators, flag
purity, and re-derivation of published fits from their own outputs).

The round-11 driver window (projected registry order after the r8-r10
folds) is the behavioral/ops ts_* tail. This file closes the 8 keys in
that slice that had no dedicated test anywhere in tests/."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.operators._shared import t
from morphl_model_publishers_churning_users_spark.registry import get_queries

_Q = get_queries()


def _df(spark, sf_dir, key):
    return _Q[key](spark, sf_dir)


def test_out_of_order_audit_reports_only_late_users(spark, sf_dir):
    rows = _df(spark, sf_dir, "ts_out_of_order_audit").collect()
    assert len(rows) >= 1  # the staged collector delay guarantees signal
    for r in rows:
        assert 1 <= r["n_late"] <= r["n_events"]
        assert r["max_lateness_us"] > 0


def test_top_paths_is_a_deterministic_topk_of_real_sessions(spark, sf_dir):
    rows = _df(spark, sf_dir, "ts_top_paths").collect()
    assert 1 <= len(rows) <= 15
    # Deterministic top-k order: count desc, path asc on ties.
    pairs = [(-r["n_sessions"], r["path"]) for r in rows]
    assert pairs == sorted(pairs)
    # Paths are '>'-joined event types drawn from the fixture vocabulary.
    vocab = {
        r["event_type"]
        for r in t(spark, sf_dir, "events").select("event_type").distinct().collect()
    }
    for r in rows:
        assert r["n_sessions"] >= 1
        assert set(r["path"].split(">")) <= vocab
        assert 1 <= len(r["path"].split(">")) <= 3
    # Conservation vs the sessionization the histogram ops share: total
    # sessions = users (first events) + inter-session gaps >= 30 min,
    # which is exactly ts_days_to_return's total. Top-15 paths can't
    # cover more sessions than exist.
    ev = t(spark, sf_dir, "events")
    n_users = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    n_returns = (
        _df(spark, sf_dir, "ts_days_to_return").agg(F.sum("n_returns")).collect()[0][0]
    )
    assert sum(r["n_sessions"] for r in rows) <= n_users + n_returns


def test_burstiness_lives_in_its_closed_interval(spark, sf_dir):
    d = _df(spark, sf_dir, "ts_gap_burstiness")
    # B = (sigma - mu)/(sigma + mu) with mu > 0, sigma >= 0 is in [-1, 1).
    assert d.filter(
        (F.col("burstiness") < -1.0) | (F.col("burstiness") > 1.0)
    ).count() == 0
    assert d.filter(F.col("n_gaps") < 1).count() == 0


def test_lateness_quantiles_are_ordered_or_honestly_empty(spark, sf_dir):
    r = _df(spark, sf_dir, "ts_lateness_quantiles").collect()[0]
    assert r["n_late"] >= 0
    if r["n_late"] == 0:
        # No late arrivals in event_id order: the policy row says so
        # with NULL quantiles, not a fabricated zero.
        assert r["p50_us"] is None and r["max_us"] is None
    else:
        assert 0 < r["p50_us"] <= r["p95_us"] <= r["p99_us"] <= r["max_us"]


def test_event_study_counts_users_at_most_once_per_relative_day(spark, sf_dir):
    rows = _df(spark, sf_dir, "ts_event_study").collect()
    assert len(rows) >= 1
    days = [r["rel_day"] for r in rows]
    assert len(days) == len(set(days))
    for r in rows:
        # A user contributes at most one user-day per relative day.
        assert 1 <= r["n_users"] <= r["n_user_days"]


def test_slo_burn_page_fires_iff_both_windows_agree(spark, sf_dir):
    rows = _df(spark, sf_dir, "ts_slo_burn_rate").collect()
    ev = t(spark, sf_dir, "events")
    n_hours = ev.select(F.date_trunc("hour", "ts")).distinct().count()
    assert len(rows) == n_hours  # one alert decision per active hour
    for r in rows:
        assert r["burn_1h"] >= 0.0 and r["burn_6h"] >= 0.0
        # Multi-window alert purity: page == fast AND sustained burn.
        assert r["page"] == (r["burn_1h"] > 2.0 and r["burn_6h"] > 1.0)
    # 5% budget: burn is error_rate/0.05, so it is bounded by 20.
    assert all(r["burn_1h"] <= 20.0 + 1e-9 and r["burn_6h"] <= 20.0 + 1e-9 for r in rows)


def test_demand_classes_respect_their_adi_cut(spark, sf_dir):
    rows = _df(spark, sf_dir, "ts_demand_classification").collect()
    allowed = {"smooth", "intermittent", "erratic", "lumpy"}
    assert {r["demand_class"] for r in rows} <= allowed
    for r in rows:
        assert r["n_users"] >= 1
        # Syntetos-Boylan quadrants: the 1.32 ADI cut separates the
        # classes, so each class's MEAN ADI sits on its own side.
        if r["demand_class"] in ("intermittent", "lumpy"):
            assert r["mean_adi"] >= 1.32
        else:
            assert r["mean_adi"] < 1.32


def test_gumbel_return_levels_rederive_from_published_params(spark, sf_dir):
    r = _df(spark, sf_dir, "ts_extreme_value_gumbel").collect()[0]
    ev = t(spark, sf_dir, "events")
    assert r["n_days"] == ev.select(F.to_date("ts")).distinct().count()
    assert r["gumbel_beta"] > 0.0
    # Return levels must be the Gumbel quantile of the fit's own
    # (mu, beta) — re-derive from the published params (rounded 1e-6).
    p99 = r["gumbel_mu"] - r["gumbel_beta"] * math.log(-math.log(0.99))
    p999 = r["gumbel_mu"] - r["gumbel_beta"] * math.log(-math.log(0.999))
    assert abs(r["p99_daily_max"] - p99) < 1e-4
    assert abs(r["p999_daily_max"] - p999) < 1e-4
    # Extrapolation is monotone in the return period.
    assert r["gumbel_mu"] < r["p99_daily_max"] < r["p999_daily_max"]
