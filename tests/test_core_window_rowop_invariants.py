"""Semantic invariants for the §2.C window and §2.A rowop contract
rows, plus the round-7 canaries (win_running, ts_session). Each test
recomputes the operator's defining property with independent
expressions: rank arithmetic, frame-sum conservation, NTILE balance,
sessionization gap laws, and scalar-expression truth tables."""

from __future__ import annotations

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.operators._shared import t
from morphl_model_publishers_churning_users_spark.registry import get_queries

_Q = get_queries()


def _df(spark, sf_dir, key):
    return _Q[key](spark, sf_dir)


# ---------------------------------------------------------------- windows


def test_rownum_emits_exactly_min3_rows_per_user(spark, sf_dir):
    d = _df(spark, sf_dir, "win_rownum")
    ev = t(spark, sf_dir, "events")
    per_user = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = {
        r["user_id"]: r["n"]
        for r in d.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == {u: min(3, n) for u, n in per_user.items()}
    # rn is dense 1..k per user; rank >= dense_rank >= 1 always.
    rows = d.collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r["rn"])
        assert r["rnk"] >= r["drnk"] >= 1
    for u, rns in by_user.items():
        assert sorted(rns) == list(range(1, len(rns) + 1))


def test_lag_lead_boundary_accounting(spark, sf_dir):
    d = _df(spark, sf_dir, "win_lag")
    ev = t(spark, sf_dir, "events")
    n_users = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    assert d.count() == ev.count()
    # Exactly one NULL gap (the first event) and one NULL lead (the
    # last event) per user; gaps are never negative on a ts-ordered
    # window.
    assert d.filter(F.col("gap_us").isNull()).count() == n_users
    assert d.filter(F.col("next_type").isNull()).count() == n_users
    assert d.filter(F.col("gap_us") < 0).count() == 0


def test_frame_rows_avg3_stays_inside_the_user_range(spark, sf_dir):
    d = _df(spark, sf_dir, "win_frame_rows").alias("w")
    ev = t(spark, sf_dir, "events")
    rng = ev.groupBy(F.col("user_id").alias("u")).agg(
        F.min("value").alias("mn"), F.max("value").alias("mx")
    )
    j = d.join(rng, F.col("w.user_id") == F.col("u"))
    # A 3-row trailing mean can never leave the user's [min, max].
    assert j.filter(
        (F.col("avg3") < F.col("mn") - 1e-6) | (F.col("avg3") > F.col("mx") + 1e-6)
    ).count() == 0
    assert d.count() == ev.count()


def test_frame_range_7d_sum_bounded_by_user_total_and_own_price(spark, sf_dir):
    d = _df(spark, sf_dir, "win_frame_range").alias("w")
    o = t(spark, sf_dir, "orders")
    # The 7-day trailing revenue includes the current order and never
    # exceeds the customer's lifetime total.
    own = o.select(
        F.col("o_orderkey").alias("k"), F.col("o_totalprice").alias("p")
    )
    j = d.join(own, F.col("w.o_orderkey") == F.col("k"))
    assert j.filter(F.col("rev_7d") < F.col("p") - 1e-4).count() == 0
    tot = o.groupBy(F.col("o_custkey").alias("u")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(38,6)")).cast("double").alias("t")
    )
    j2 = d.join(tot, F.col("w.o_custkey") == F.col("u"))
    assert j2.filter(F.col("rev_7d") > F.col("t") + 1e-4).count() == 0


def test_ntile_deciles_are_balanced_and_monotone(spark, sf_dir):
    rows = _df(spark, sf_dir, "win_ntile").collect()
    n = len(rows)
    assert n == t(spark, sf_dir, "customer").count()
    sizes = {}
    for r in rows:
        sizes[r["decile"]] = sizes.get(r["decile"], 0) + 1
        assert 0.0 <= r["pr"] <= 1.0
        assert 0.0 < r["cd"] <= 1.0
        # cume_dist counts ties inclusively, percent_rank exclusively.
        assert r["cd"] >= r["pr"] or abs(r["cd"] - r["pr"]) < 1e-9
    # NTILE balance law: sizes differ by at most 1.
    assert set(sizes) == set(range(1, 11))
    assert max(sizes.values()) - min(sizes.values()) <= 1


def test_firstlast_matches_ordered_recompute(spark, sf_dir):
    rows = _df(spark, sf_dir, "win_firstlast").collect()
    ev = t(spark, sf_dir, "events")
    # Deterministic recompute via min/max_by on the (ts, event_id) key.
    expect = {
        r["user_id"]: (r["ft"], r["lt"])
        for r in ev.groupBy("user_id")
        .agg(
            F.expr("min_by(event_type, struct(ts, event_id))").alias("ft"),
            F.expr("max_by(event_type, struct(ts, event_id))").alias("lt"),
        )
        .collect()
    }
    assert len(rows) == len(expect)
    for r in rows:
        assert (r["first_touch"], r["last_touch"]) == expect[r["user_id"]]


def test_running_sum_final_row_equals_user_total(spark, sf_dir):
    d = _df(spark, sf_dir, "win_running")
    ev = t(spark, sf_dir, "events")
    assert d.count() == ev.count()
    # The largest cumulative value per user is the user's exact total
    # ONLY if values are nonnegative — the fixture's are; assert that
    # premise too so a fixture change resurfaces here.
    assert ev.filter(F.col("value") < 0).count() == 0
    per_user_max = d.groupBy("user_id").agg(F.max("cum_value").alias("m"))
    totals = ev.groupBy(F.col("user_id").alias("u")).agg(
        F.round(F.sum(F.col("value").cast("decimal(38,6)")).cast("double"), 6).alias("t")
    )
    j = per_user_max.join(totals, F.col("user_id") == F.col("u"))
    assert j.filter(F.abs(F.col("m") - F.col("t")) > 1e-4).count() == 0


# ----------------------------------------------------- sessionization/ts


def test_session_canary_gap_laws(spark, sf_dir):
    d = _df(spark, sf_dir, "ts_session")
    ev = t(spark, sf_dir, "events")
    n_users = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    n_events = ev.count()
    rows = d.collect()
    # Sessions partition each user's events; session count per user is
    # 1 + (number of >= 30 min gaps) — recompute independently with
    # fractional-second timestamps (cast double keeps microsecond
    # precision at epoch magnitudes).
    from pyspark.sql import Window

    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    # NTZ won't cast to double directly; go via timestamp (a constant
    # session-tz shift that cancels in the gap).
    ts_s = F.col("ts").cast("timestamp").cast("double")
    gaps = ev.select(
        "user_id",
        (ts_s - F.lag(ts_s).over(w)).alias("gap_s"),
    )
    expect_sessions = (
        gaps.groupBy("user_id")
        .agg(
            (F.sum((F.col("gap_s") >= 1800.0).cast("long")) + 1).alias("ns")
        )
        .agg(F.sum("ns"))
        .collect()[0][0]
    )
    assert len(rows) == expect_sessions
    assert sum(r["n_events"] for r in rows) == n_events
    assert all(r["n_events"] >= 1 for r in rows)
    assert all(r["session_start"] <= r["last_ts"] for r in rows)
    assert len({r["user_id"] for r in rows}) == n_users


def test_tumbling_windows_partition_events(spark, sf_dir):
    d = _df(spark, sf_dir, "ts_tumbling")
    ev = t(spark, sf_dir, "events")
    assert d.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    # day x type cells are unique, and the day grain really is a date.
    assert d.groupBy("day_start", "event_type").count().filter(F.col("count") > 1).count() == 0
    total = ev.agg(F.sum(F.col("value").cast("decimal(38,6)")).cast("double")).collect()[0][0]
    assert abs(d.agg(F.sum("sum_value")).collect()[0][0] - total) < 1e-2


def test_sliding_15min_windows_fan_each_event_four_times(spark, sf_dir):
    d = _df(spark, sf_dir, "ts_sliding")
    ev = t(spark, sf_dir, "events")
    # 1h window / 15min slide: every event contributes to exactly 4
    # window starts.
    assert d.agg(F.sum("n_events")).collect()[0][0] == 4 * ev.count()
    assert d.filter(F.col("n_events") < 1).count() == 0
    # Window starts are aligned to the 15-minute grid.
    assert d.filter(
        (F.minute("win_start") % 15 != 0) | (F.second("win_start") != 0)
    ).count() == 0


# ------------------------------------------------------------- rowops


def test_cast_types_roundtrip_identities(spark, sf_dir):
    d = _df(spark, sf_dir, "cast_types")
    ev = t(spark, sf_dir, "events")
    assert d.count() == ev.count()
    # String and double casts round-trip back to the integer id.
    assert d.filter(F.col("uid_double").cast("bigint").cast("string") != F.col("uid_str")).count() == 0
    assert d.filter(F.col("value_floor") > F.col("uid_double") * 0 + 1e9).count() == 0
    j = d.alias("c").join(ev.alias("e"), F.col("c.event_id") == F.col("e.event_id"))
    assert j.filter(F.col("ts_day") != F.to_date("e.ts")).count() == 0
    assert j.filter(F.col("value_floor") != F.floor("e.value").cast("bigint")).count() == 0


def test_cond_expr_bands_partition_and_agree_with_source(spark, sf_dir):
    d = _df(spark, sf_dir, "cond_expr").alias("c")
    ev = t(spark, sf_dir, "events").alias("e")
    j = d.join(ev, F.col("c.event_id") == F.col("e.event_id"))
    band = (
        F.when(F.col("e.value") > 75, "high")
        .when(F.col("e.value") > 40, "mid")
        .otherwise("low")
    )
    assert j.filter(F.col("value_band") != band).count() == 0
    assert j.filter(
        F.col("is_purchase") != (F.col("e.event_type") == "purchase").cast("int")
    ).count() == 0
    # The three bands partition the table.
    assert d.groupBy("value_band").count().count() <= 3
    assert d.count() == t(spark, sf_dir, "events").count()


def test_null_handling_truth_table(spark, sf_dir):
    d = _df(spark, sf_dir, "null_handling").alias("n")
    ev = t(spark, sf_dir, "events").alias("e")
    j = d.join(ev, F.col("n.event_id") == F.col("e.event_id"))
    # was_nulled marks exactly the value > 90 rows, which surface as
    # the -1 sentinel after COALESCE.
    assert j.filter(F.col("was_nulled") != (F.col("e.value") > 90)).count() == 0
    assert d.filter(F.col("was_nulled") & (F.col("value_capped") != -1.0)).count() == 0
    assert d.filter(~F.col("was_nulled") & (F.col("value_capped") < 0)).count() == 0
    # NULL-safe equality is the complement of was_nulled here (value
    # is never NULL in the fixture, so IS NOT DISTINCT FROM value is
    # true exactly when the CASE kept the value).
    assert d.filter(F.col("null_safe_eq") == F.col("was_nulled")).count() == 0
    # error rows are rewritten to 'unknown', everything else passes
    # through.
    assert j.filter(
        (F.col("e.event_type") == "error") & (F.col("et_clean") != "unknown")
    ).count() == 0
    assert j.filter(
        (F.col("e.event_type") != "error") & (F.col("et_clean") != F.col("e.event_type"))
    ).count() == 0


def test_project_derive_price_algebra(spark, sf_dir):
    d = _df(spark, sf_dir, "project_derive")
    li = t(spark, sf_dir, "lineitem")
    assert d.count() == li.count()
    # gross >= net exactly when tax >= 0 (fixture taxes are), and net
    # <= extendedprice exactly when discount in [0, 1].
    assert li.filter((F.col("l_tax") < 0) | (F.col("l_discount") < 0) | (F.col("l_discount") > 1)).count() == 0
    assert d.filter(F.col("gross_price") < F.col("net_price") - 1e-6).count() == 0
