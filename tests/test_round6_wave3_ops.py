"""Invariant tests for the last round-6 wave — algorithmic properties
beyond cross-engine equality."""

from __future__ import annotations

import pytest

from morphl_model_publishers_churning_users_spark.registry import get_queries

_Q = get_queries()


def test_lorenz_curve_is_convex_and_anchored(spark, sf_dir):
    """Lorenz points: value share ≤ population share everywhere (values
    sorted ascending), both reach 1.0 at the top decile, and the curve
    is non-decreasing."""
    rows = sorted(_Q["agg_lorenz_points"](spark, sf_dir).collect(), key=lambda r: r["decile"])
    prev = 0.0
    for r in rows:
        assert r["value_share"] <= r["pop_share"] + 1e-9
        assert r["value_share"] >= prev - 1e-9
        prev = r["value_share"]
    assert rows[-1]["pop_share"] == pytest.approx(1.0, abs=1e-6)
    assert rows[-1]["value_share"] == pytest.approx(1.0, abs=1e-6)


def test_theil_decomposition_sums(spark, sf_dir):
    """Between + within must equal total exactly (the decomposability
    Theil exists for), and all parts are non-negative."""
    r = _Q["agg_theil_decomposition"](spark, sf_dir).collect()[0]
    assert r["theil_total"] == pytest.approx(r["theil_between"] + r["theil_within"], abs=2e-6)
    assert r["theil_total"] >= -1e-9 and r["theil_between"] >= -1e-9
    assert r["theil_within"] >= -1e-9


def test_stickiness_ordering(spark, sf_dir):
    """DAU ≤ WAU ≤ MAU on every day, and stickiness ∈ (0, 1]."""
    for r in _Q["ts_stickiness"](spark, sf_dir).collect():
        assert r["dau"] <= r["wau"] <= r["mau"]
        assert 0 < r["stickiness"] <= 1.0 + 1e-9


def test_growth_accounting_reconciles(spark, sf_dir):
    """Weekly stage counts must sum to that week's distinct actives,
    and week 1 must be all-new."""
    import pyspark.sql.functions as F
    from morphl_model_publishers_churning_users_spark.operators._shared import t as tbl

    out = _Q["ts_growth_accounting"](spark, sf_dir)
    actives = (
        tbl(spark, sf_dir, "events")
        .select(F.date_trunc("week", "ts").alias("wk"), "user_id")
        .distinct()
        .groupBy("wk")
        .agg(F.count(F.lit(1)).alias("n_active"))
    )
    per_wk = out.groupBy("wk").agg(F.sum("n_users").alias("n_staged"))
    bad = per_wk.join(actives, "wk").filter(F.col("n_staged") != F.col("n_active")).count()
    assert bad == 0
    first_wk = min(r["wk"] for r in out.collect())
    stages = {r["stage"] for r in out.collect() if r["wk"] == first_wk}
    assert stages == {"new"}


def test_markov_stationary_is_distribution(spark, sf_dir):
    """Stationary probabilities are positive and sum to ~1."""
    rows = _Q["ts_markov_stationary"](spark, sf_dir).collect()
    assert all(r["stationary_prob"] > 0 for r in rows)
    assert sum(r["stationary_prob"] for r in rows) == pytest.approx(1.0, abs=1e-4)


def test_luhn_classes_cover_all_rows(spark, sf_dir):
    """Checksum classes partition the orders table (no row lost in the
    digit algebra) and classes are in 0..9."""
    import pyspark.sql.functions as F
    from morphl_model_publishers_churning_users_spark.operators._shared import t as tbl

    rows = _Q["fn_luhn_check"](spark, sf_dir).collect()
    n_orders = tbl(spark, sf_dir, "orders").count()
    assert sum(r["n"] for r in rows) == n_orders
    assert all(0 <= r["check_class"] <= 9 for r in rows)


def test_spatial_grid_matches_brute_force(spark, sf_dir):
    """Grid blocking must find EXACTLY the brute-force pair set (cell
    size = radius ⇒ no misses) — checked on the sf0.001 point set."""
    import pyspark.sql.functions as F
    from morphl_model_publishers_churning_users_spark.operators._shared import t as tbl

    r = _Q["join_spatial_grid"](spark, "/root/testdata/sf0.001").collect()[0]
    e = tbl(spark, "/root/testdata/sf0.001", "events").select("user_id").distinct()
    h = lambda salt: (
        F.conv(F.substring(F.md5(F.concat(F.col("user_id").cast("string"), F.lit(salt))), 1, 8), 16, 10)
        .cast("bigint") % 4096
    )
    pts = [(row["user_id"], row["x"], row["y"]) for row in
           e.select("user_id", h(":lat").alias("x"), h(":lon").alias("y")).collect()]
    brute = 0
    pts.sort()
    import bisect
    for i in range(len(pts)):
        for j in range(i + 1, len(pts)):
            dx = pts[i][1] - pts[j][1]
            dy = pts[i][2] - pts[j][2]
            if dx * dx + dy * dy <= 900:
                brute += 1
    assert r["n_pairs"] == brute


def test_ips_snips_identity(spark, sf_dir):
    """IPS = SNIPS × mean_weight exactly (swr/n = (swr/sw)·(sw/n)) —
    the algebraic relation between the two estimators. (mean_weight→1
    is only an ASYMPTOTIC property; at fixture scale its variance is
    the support-mismatch alarm working as intended, so it is not
    asserted.)"""
    r = _Q["ml_ips_offpolicy"](spark, sf_dir).collect()[0]
    assert r["ips_value"] == pytest.approx(
        r["snips_value"] * r["mean_weight"], rel=1e-4
    )


def test_shot_counts_bounded_by_frames(spark, sf_dir):
    """Shots are 1..n_frames and every video surfaces."""
    rows = _Q["mm_shot_boundaries"](spark, sf_dir).collect()
    assert rows
    for r in rows:
        assert 1 <= r["n_shots"] <= r["n_frames"]
