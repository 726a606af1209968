"""Semantic invariants for the extended aggregate family — the OLDEST
driver greens in the registry (r1 tags), untouched by the driver for
six rounds while the registry quadrupled around them. Each test pins
the statistic's mathematical law (range, conservation, or identity)
with an independent recompute, so a silent regression between canary
re-touches fails locally instead of in a future driver window."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.operators._shared import t
from morphl_model_publishers_churning_users_spark.registry import get_queries

_Q = get_queries()


def _df(spark, sf_dir, key):
    return _Q[key](spark, sf_dir)


def test_count_if_flags_agree_with_counters(spark, sf_dir):
    rows = _df(spark, sf_dir, "agg_count_if").collect()
    ev = t(spark, sf_dir, "events")
    per = {
        (r["user_id"], r["event_type"]): r["n"]
        for r in ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in rows:
        assert r["n_purchases"] == per.get((r["user_id"], "purchase"), 0)
        assert r["n_errors"] == per.get((r["user_id"], "error"), 0)
        # Boolean-aggregate purity: had_error == (n_errors > 0).
        assert r["had_error"] == (1 if r["n_errors"] > 0 else 0)
        assert r["all_nonneg"] in (0, 1)


def test_histogram_conserves_each_type(spark, sf_dir):
    d = _df(spark, sf_dir, "agg_histogram")
    ev = t(spark, sf_dir, "events")
    got = {
        r["event_type"]: r["s"]
        for r in d.groupBy("event_type").agg(F.sum("n").alias("s")).collect()
    }
    src = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert got == src
    assert d.filter(F.col("n") < 1).count() == 0


def test_weighted_avg_lives_between_min_and_max_price(spark, sf_dir):
    rows = _df(spark, sf_dir, "agg_weighted").collect()
    li = t(spark, sf_dir, "lineitem")
    rng = {
        r["l_returnflag"]: (r["mn"], r["mx"], r["q"])
        for r in li.groupBy("l_returnflag")
        .agg(
            F.min("l_extendedprice").alias("mn"),
            F.max("l_extendedprice").alias("mx"),
            F.sum("l_quantity").alias("q"),
        )
        .collect()
    }
    for r in rows:
        mn, mx, q = rng[r["l_returnflag"]]
        assert mn - 1e-6 <= r["wavg_price"] <= mx + 1e-6
        assert abs(r["total_qty"] - q) < 1e-6


def test_listagg_is_sorted_and_complete(spark, sf_dir):
    rows = _df(spark, sf_dir, "agg_listagg").collect()
    nat = t(spark, sf_dir, "nation").alias("n").join(
        t(spark, sf_dir, "region").alias("r"),
        F.col("n.n_regionkey") == F.col("r.r_regionkey"),
    )
    expect = {
        r["r_name"]: sorted(x["n_name"] for x in grp)
        for r_name, grp in {}.items()
    }
    per_region = {}
    for r in nat.select("r.r_name", "n.n_name").collect():
        per_region.setdefault(r["r_name"], []).append(r["n_name"])
    assert len(rows) == len(per_region)
    for r in rows:
        names = r["nations"].split(",")
        assert names == sorted(names)
        assert r["n_nations"] == len(names)
        assert names == sorted(per_region[r["r_name"]])


def test_entropy_bounded_by_log_cardinality(spark, sf_dir):
    rows = _df(spark, sf_dir, "agg_entropy").collect()
    ev = t(spark, sf_dir, "events")
    k = ev.select("event_type").distinct().count()
    per_user = {
        r["user_id"]: r["n"]
        for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in rows:
        # Shannon entropy over event types: 0 <= H <= log2(k).
        assert -1e-9 <= r["type_entropy"] <= math.log2(k) + 1e-9
        assert r["n_events"] == per_user[r["user_id"]]


def test_product_agg_compounds_positive_factors(spark, sf_dir):
    d = _df(spark, sf_dir, "agg_product")
    li = t(spark, sf_dir, "lineitem")
    assert d.count() == li.select("l_orderkey").distinct().count()
    assert d.agg(F.sum("n_lines")).collect()[0][0] == li.count()
    # The compounded (1 + tax-like) factors are >= 1 when every factor
    # is >= 1; the fixture's discounts/taxes keep factors positive.
    assert d.filter(F.col("compounded") <= 0).count() == 0


def test_corr_matrix_entries_are_correlations(spark, sf_dir):
    r = _df(spark, sf_dir, "agg_corr_matrix").collect()[0]
    assert r["n"] == t(spark, sf_dir, "events").count()
    for c in ("corr_v_h", "corr_v_u", "corr_h_u"):
        assert -1.0 - 1e-9 <= r[c] <= 1.0 + 1e-9


def test_reaggregate_weekly_rollup_conserves_daily(spark, sf_dir):
    d = _df(spark, sf_dir, "agg_reaggregate")
    ev = t(spark, sf_dir, "events")
    assert d.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    assert d.filter((F.col("n_days") < 1) | (F.col("n_days") > 7)).count() == 0
    # Weeks start on Mondays (date_trunc week): the grain column is a
    # Monday for every row.
    assert d.filter(F.dayofweek("week") != 2).count() == 0
    total = ev.agg(F.sum(F.col("value").cast("decimal(38,6)")).cast("double")).collect()[0][0]
    assert abs(d.agg(F.sum("sum_value")).collect()[0][0] - total) < 1e-2


def test_weighted_median_lives_in_the_flag_price_range(spark, sf_dir):
    rows = _df(spark, sf_dir, "agg_weighted_median").collect()
    li = t(spark, sf_dir, "lineitem")
    rng = {
        r["l_returnflag"]: (r["mn"], r["mx"])
        for r in li.groupBy("l_returnflag")
        .agg(F.min("l_extendedprice").alias("mn"), F.max("l_extendedprice").alias("mx"))
        .collect()
    }
    for r in rows:
        mn, mx = rng[r["l_returnflag"]]
        assert mn - 1e-6 <= r["weighted_median"] <= mx + 1e-6


def test_gini_and_hhi_ranges_and_segment_counts(spark, sf_dir):
    gini = {r["c_mktsegment"]: r for r in _df(spark, sf_dir, "agg_gini").collect()}
    hhi = {r["c_mktsegment"]: r for r in _df(spark, sf_dir, "agg_hhi").collect()}
    # Both statistics are defined over the POSITIVE-balance customers
    # (shares need a positive denominator).
    cust = t(spark, sf_dir, "customer").filter(F.col("c_acctbal") > 0)
    seg_n = {
        r["c_mktsegment"]: r["n"]
        for r in cust.groupBy("c_mktsegment").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert set(gini) == set(seg_n) and set(hhi) == set(seg_n)
    for seg, n in seg_n.items():
        g, h = gini[seg], hhi[seg]
        assert g["n"] == n and h["n"] == n
        # Gini of n nonnegative values is in [0, (n-1)/n].
        assert -1e-9 <= g["gini"] <= (n - 1) / n + 1e-9
        # HHI of n positive shares is in [1/n, 1].
        assert 1.0 / n - 1e-9 <= h["hhi"] <= 1.0 + 1e-9


def test_mad_is_at_most_the_max_deviation_and_nonnegative(spark, sf_dir):
    rows = _df(spark, sf_dir, "agg_mad").collect()
    ev = t(spark, sf_dir, "events")
    rng = {
        r["event_type"]: (r["mn"], r["mx"])
        for r in ev.groupBy("event_type")
        .agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
        .collect()
    }
    for r in rows:
        mn, mx = rng[r["event_type"]]
        assert r["mad"] >= 0.0
        assert mn - 1e-6 <= r["med_value"] <= mx + 1e-6
        # MAD can't exceed the span around the median.
        assert r["mad"] <= max(r["med_value"] - mn, mx - r["med_value"]) + 1e-6


def test_cooccurrence_is_symmetric_free_and_bounded(spark, sf_dir):
    rows = _df(spark, sf_dir, "agg_cooccurrence").collect()
    ev = t(spark, sf_dir, "events")
    users_per_type = {
        r["event_type"]: r["u"]
        for r in ev.groupBy("event_type").agg(F.countDistinct("user_id").alias("u")).collect()
    }
    pairs = set()
    for r in rows:
        assert r["type_a"] < r["type_b"]  # canonical unordered pairs
        pairs.add((r["type_a"], r["type_b"]))
        # Co-occurrence bounded by each marginal.
        assert r["n_users_both"] <= min(
            users_per_type[r["type_a"]], users_per_type[r["type_b"]]
        )
    assert len(pairs) == len(rows)
    k = len(users_per_type)
    assert len(rows) <= k * (k - 1) // 2


def test_pareto_shares_are_monotone_in_the_cutoff(spark, sf_dir):
    rows = sorted(
        _df(spark, sf_dir, "agg_pareto_share").collect(), key=lambda r: r["cutoff"]
    )
    assert all(0.0 <= r["value_share"] <= 1.0 for r in rows)
    # A larger top-fraction of customers owns at least as much value,
    # and at least its population share (top customers are above
    # average by construction).
    shares = [r["value_share"] for r in rows]
    assert shares == sorted(shares)
    for r in rows:
        assert r["value_share"] >= r["cutoff"] - 1e-6


def test_topn_array_is_the_exact_top3(spark, sf_dir):
    rows = _df(spark, sf_dir, "agg_topn_array").collect()
    ev = t(spark, sf_dir, "events")
    from pyspark.sql import Window

    w = Window.partitionBy("event_type").orderBy(F.desc("value"), F.asc("event_id"))
    expect = {}
    for r in (
        ev.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 3)
        .orderBy("event_type", "rn")
        .collect()
    ):
        expect.setdefault(r["event_type"], []).append(r["value"])
    for r in rows:
        got = [float(x) for x in r["top3_values"].split(",")]
        assert got == sorted(got, reverse=True)
        assert [round(v, 4) for v in got] == [round(v, 4) for v in expect[r["event_type"]][: len(got)]]


def test_skew_kurtosis_moment_inequalities(spark, sf_dir):
    rows = _df(spark, sf_dir, "agg_skew_kurtosis").collect()
    ev = t(spark, sf_dir, "events")
    src = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for r in rows:
        assert r["n_events"] == src[r["event_type"]]
        assert r["variance_pop"] >= 0.0
        # Pearson inequality: kurtosis >= skewness^2 + 1, i.e. excess
        # kurtosis >= skew^2 - 2.
        assert r["kurtosis_excess"] >= r["skewness_pop"] ** 2 - 2.0 - 1e-6
