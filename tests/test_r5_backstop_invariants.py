"""Semantic invariants for the round-5-tagged backstop keys — fuzzy
blocking, model anchors, calibration, perceptual-hash dedup,
k-anonymity, and the LTV/concurrency/survival behavioral suite. Each
contract is re-derived from the fixture tables independently."""

from __future__ import annotations

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.operators._shared import t
from morphl_model_publishers_churning_users_spark.registry import get_queries

_Q = get_queries()


def _df(spark, sf_dir, key):
    return _Q[key](spark, sf_dir)


def test_fuzzy_blocked_pairs_are_ordered_and_within_threshold(spark, sf_dir):
    rows = _df(spark, sf_dir, "join_fuzzy_blocked").collect()
    assert len(rows) >= 1
    seen = set()
    for r in rows:
        assert r["key_a"] < r["key_b"]  # canonical pair order
        assert r["dist"] >= 0
        seen.add((r["key_a"], r["key_b"]))
    assert len(seen) == len(rows)
    # The blocked join is a filter: distances are capped by the match
    # threshold the op declares (every emitted pair is a candidate hit).
    assert max(r["dist"] for r in rows) <= 5


def test_rf_importances_form_a_simplex(spark, sf_dir):
    rows = _df(spark, sf_dir, "ml_rf").collect()
    assert len(rows) >= 2
    assert all(r["imp_ok"] and r["simplex_ok"] for r in rows)
    # One anchor row per feature.
    feats = [r["feature"] for r in rows]
    assert len(feats) == len(set(feats))


def test_pca_components_are_dense_and_flagged_ok(spark, sf_dir):
    rows = _df(spark, sf_dir, "ml_pca_embed").collect()
    comps = sorted(r["component"] for r in rows)
    assert comps == list(range(len(comps)))
    assert all(r["var_ok"] and r["spectrum_ok"] for r in rows)


def test_calibration_bins_partition_users_with_consistent_rates(spark, sf_dir):
    rows = _df(spark, sf_dir, "ml_calibration_bins").collect()
    ev = t(spark, sf_dir, "events")
    n_users = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    assert sum(r["n_users"] for r in rows) == n_users
    for r in rows:
        assert 0.0 <= r["mean_score"] <= 1.0
        assert 0.0 <= r["churn_rate"] <= 1.0
        assert r["n_users"] >= 1
    # Mean scores are monotone in the bin index (deciles of the score).
    by_bin = sorted(rows, key=lambda r: r["bin"])
    scores = [r["mean_score"] for r in by_bin]
    assert scores == sorted(scores)


def test_phash_groups_have_min_keepers_and_consistent_sizes(spark, sf_dir):
    rows = _df(spark, sf_dir, "mm_phash_dedup").collect()
    docs = t(spark, sf_dir, "documents")
    # One row per staged image doc (doc_id % 3 == 0), singletons
    # included: coverage is total, not just dup groups.
    n_staged = docs.filter(F.col("doc_id") % 3 == 0).count()
    assert len(rows) == n_staged
    by_hash = {}
    for r in rows:
        by_hash.setdefault(r["phash"], []).append(r)
    for h, grp in by_hash.items():
        ids = [g["doc_id"] for g in grp]
        keepers = {g["keep_doc_id"] for g in grp}
        sizes = {g["group_size"] for g in grp}
        # The keeper is the min id of the exact-phash group; every
        # member agrees on the group size = member count.
        assert keepers == {min(ids)}
        assert sizes == {len(ids)}


def test_k_anonymity_flags_and_population(spark, sf_dir):
    rows = _df(spark, sf_dir, "dq_k_anonymity").collect()
    docs = t(spark, sf_dir, "documents")
    expect = {
        (r["lang"], r["source"]): r["n"]
        for r in docs.groupBy("lang", "source").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert len(rows) == len(expect)
    ks = sorted({r["group_size"] for r in rows if r["below_k"]})
    for r in rows:
        assert r["group_size"] == expect[(r["lang"], r["source"])]
    # The below_k flag is a pure threshold on group_size: every flagged
    # size is strictly below every unflagged size.
    flagged = [r["group_size"] for r in rows if r["below_k"]]
    unflagged = [r["group_size"] for r in rows if not r["below_k"]]
    if flagged and unflagged:
        assert max(flagged) < min(unflagged)


def test_user_ltv_internal_arithmetic(spark, sf_dir):
    rows = _df(spark, sf_dir, "ts_user_ltv").collect()
    ev = t(spark, sf_dir, "events")
    expect = {
        r["user_id"]: r
        for r in ev.groupBy("user_id")
        .agg(
            F.min("ts").alias("f"),
            F.max("ts").alias("l"),
            F.round(F.sum(F.col("value").cast("decimal(38,6)")).cast("double"), 6).alias("v"),
        )
        .collect()
    }
    assert len(rows) == len(expect)
    for r in rows:
        e = expect[r["user_id"]]
        assert r["first_seen"] == e["f"] and r["last_seen"] == e["l"]
        assert abs(r["total_value"] - e["v"]) < 1e-4
        assert r["tenure_days"] == (e["l"].date() - e["f"].date()).days
        # value_per_day divides by the INCLUSIVE tenure (days + 1) so a
        # single-day user divides by 1, not 0.
        assert abs(r["value_per_day"] - r["total_value"] / (r["tenure_days"] + 1)) < 1e-3


def test_peak_concurrency_bounded_by_dau(spark, sf_dir):
    rows = {r["day"]: r["peak_concurrent_users"] for r in _df(spark, sf_dir, "ts_peak_concurrency").collect()}
    ev = t(spark, sf_dir, "events")
    dau = {
        r["d"]: r["u"]
        for r in ev.groupBy(F.to_date("ts").alias("d"))
        .agg(F.countDistinct("user_id").alias("u"))
        .collect()
    }
    assert set(rows) == set(dau)
    for day, peak in rows.items():
        # Peak simultaneous sessions can't exceed the day's distinct
        # users, and a day with events has at least one concurrent.
        assert 1 <= peak <= dau[day]


def test_interpolation_agrees_with_gap_fill_grid(spark, sf_dir):
    d = _df(spark, sf_dir, "ts_interpolate_linear")
    g = _df(spark, sf_dir, "ts_gap_fill")
    # Same dense per-user day grid as the gap-fill twin.
    assert d.count() == g.count()
    rows = d.collect()
    by_user = {}
    for r in rows:
        by_user.setdefault(r["user_id"], []).append(r)
        assert r["was_gap"] in (0, 1)
        assert r["v_interp"] is not None
    for u, rs in by_user.items():
        rs.sort(key=lambda r: r["day"])
        # Interpolated values on gap days lie between their bracketing
        # real values (linearity implies the local min/max bound).
        reals = [r["v_interp"] for r in rs if r["was_gap"] == 0]
        lo, hi = min(reals), max(reals)
        for r in rs:
            if r["was_gap"] == 1:
                assert lo - 1e-6 <= r["v_interp"] <= hi + 1e-6


def test_cohort_value_curves_are_nondecreasing(spark, sf_dir):
    rows = _df(spark, sf_dir, "ts_cohort_value_curve").collect()
    by_cohort = {}
    for r in rows:
        assert r["week_n"] >= 0
        by_cohort.setdefault(r["cohort_week"], []).append(r)
    for c, rs in by_cohort.items():
        rs.sort(key=lambda r: r["week_n"])
        vals = [r["cum_value"] for r in rs]
        # Cumulative value never decreases week over week.
        assert all(b >= a - 1e-6 for a, b in zip(vals, vals[1:]))
        assert rs[0]["week_n"] == 0


def test_conversion_latency_quantile_ordering(spark, sf_dir):
    r = _df(spark, sf_dir, "ts_conversion_latency").collect()[0]
    assert r["n_converted"] >= 1
    assert 0 <= r["min_hours"] <= r["median_hours"] <= r["max_hours"]
    ev = t(spark, sf_dir, "events")
    n_users = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    assert r["n_converted"] <= n_users


def test_survival_curve_is_a_nonincreasing_fraction(spark, sf_dir):
    rows = sorted(_df(spark, sf_dir, "ts_survival_curve").collect(), key=lambda r: r["day_n"])
    ev = t(spark, sf_dir, "events")
    n_users = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    fracs = [r["survival_frac"] for r in rows]
    assert all(0.0 <= f <= 1.0 for f in fracs)
    assert all(b <= a + 1e-9 for a, b in zip(fracs, fracs[1:]))
    for r in rows:
        assert 0 <= r["n_surviving"] <= n_users
        assert abs(r["survival_frac"] - r["n_surviving"] / n_users) < 1e-4
