"""Semantic invariants for the §2.B aggregate contract rows. These are
driver-verified, but between driver touches the only guard was the
oracle twin. Each test recomputes a conservation law or algebraic
identity with independent expressions: grand totals across grouping
levels, pivot row/column marginals, unpivot fan-out arithmetic,
ROLLUP/GROUPING SETS level accounting, and the variance/stddev and
correlation/covariance identities inside agg_stats.

agg_group was the r6 canary and rotates back in later rounds."""

from __future__ import annotations

import math

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.operators._shared import t
from morphl_model_publishers_churning_users_spark.registry import get_queries

_Q = get_queries()


def _df(spark, sf_dir, key):
    return _Q[key](spark, sf_dir)


def test_group_agg_partitions_the_fact_table(spark, sf_dir):
    d = _df(spark, sf_dir, "agg_group")
    ev = t(spark, sf_dir, "events")
    assert d.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    # Per-group internal consistency: avg * n == sum (both published).
    bad = d.filter(
        F.abs(F.col("avg_value") * F.col("n_events") - F.col("sum_value"))
        > 1e-3 * F.col("n_events")
    )
    assert bad.count() == 0
    assert d.filter(F.col("first_ts") > F.col("last_ts")).count() == 0
    # Grand total of group sums equals the global decimal sum.
    total = ev.agg(
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
    ).collect()[0][0]
    assert abs(d.agg(F.sum("sum_value")).collect()[0][0] - total) < 1e-2


def test_global_agg_matches_field_by_field_recount(spark, sf_dir):
    r = _df(spark, sf_dir, "agg_global").collect()[0]
    li = t(spark, sf_dir, "lineitem")
    assert r["n_rows"] == li.count()
    assert r["n_orders"] == li.select("l_orderkey").distinct().count()
    mn, mx = li.agg(F.min("l_extendedprice"), F.max("l_extendedprice")).collect()[0]
    assert abs(r["min_price"] - mn) < 1e-5 and abs(r["max_price"] - mx) < 1e-5
    assert r["min_price"] <= r["max_price"]


def test_distinct_counts_bounded_by_event_counts(spark, sf_dir):
    d = _df(spark, sf_dir, "agg_distinct")
    ev = t(spark, sf_dir, "events")
    assert d.filter(F.col("n_users") > F.col("n_events")).count() == 0
    assert d.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    n_users_total = ev.agg(F.countDistinct("user_id")).collect()[0][0]
    assert d.filter(F.col("n_users") > n_users_total).count() == 0
    assert d.count() == ev.select("event_type").distinct().count()


def test_pivot_cells_cross_foot_to_both_marginals(spark, sf_dir):
    d = _df(spark, sf_dir, "agg_pivot")
    ev = t(spark, sf_dir, "events")
    assert d.count() == ev.agg(F.countDistinct("user_id")).collect()[0][0]
    cols = ["click_n", "error_n", "purchase_n", "signup_n", "view_n"]
    # Column marginals: each pivot column sums to its type's count.
    sums = d.agg(*[F.sum(c).alias(c) for c in cols]).collect()[0]
    src = {
        r["event_type"]: r["n"]
        for r in ev.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    for c in cols:
        assert sums[c] == src.get(c[:-2], 0)
    # Row marginals: the five cells cover every event of the user.
    row_total = sum(F.col(c) for c in cols)
    per_user = {r["user_id"]: r["n"] for r in ev.groupBy("user_id").agg(F.count(F.lit(1)).alias("n")).collect()}
    for r in d.select("user_id", row_total.alias("rt"), "purchase_value").collect():
        assert r["rt"] == per_user[r["user_id"]]
        assert r["purchase_value"] >= 0.0


def test_unpivot_fans_each_row_into_three_metrics(spark, sf_dir):
    d = _df(spark, sf_dir, "agg_unpivot")
    n_li = t(spark, sf_dir, "lineitem").count()
    assert d.count() == 3 * n_li
    per_metric = {
        r["metric"]: r["n"]
        for r in d.groupBy("metric").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert per_metric == {
        "l_quantity": n_li,
        "l_extendedprice": n_li,
        "l_discount": n_li,
    }


def _level_checks(rows, n_customers, expect_gids):
    # gid 0 = (region, nation) leaf; gid 1 = region subtotal;
    # gid 3 = grand total. Each level independently sums to the
    # customer population.
    by_gid = {}
    for r in rows:
        by_gid.setdefault(r["gid"], []).append(r)
    assert set(by_gid) == expect_gids
    for gid in expect_gids:
        assert sum(r["n_customers"] for r in by_gid[gid]) == n_customers
    assert len(by_gid[3]) == 1
    assert by_gid[3][0]["r_name"] is None and by_gid[3][0]["n_name"] is None
    assert all(r["n_name"] is None for r in by_gid[1])


def test_rollup_levels_each_conserve_the_population(spark, sf_dir):
    rows = _df(spark, sf_dir, "agg_rollup").collect()
    n_cust = t(spark, sf_dir, "customer").count()
    _level_checks(rows, n_cust, {0, 1, 3})


def test_grouping_sets_levels_each_conserve_the_population(spark, sf_dir):
    rows = _df(spark, sf_dir, "agg_grouping_sets").collect()
    n_cust = t(spark, sf_dir, "customer").count()
    _level_checks(rows, n_cust, {0, 1, 3})


def test_having_keeps_exactly_the_qualifying_groups(spark, sf_dir):
    d = _df(spark, sf_dir, "agg_having")
    assert d.filter(F.col("n_orders") < 5).count() == 0
    o = t(spark, sf_dir, "orders")
    expect = (
        o.groupBy("o_custkey").agg(F.count(F.lit(1)).alias("n")).filter(F.col("n") >= 5).count()
    )
    assert d.count() == expect
    # Conservation: qualifying groups account for their orders exactly.
    total = o.join(
        d.select(F.col("o_custkey").alias("k")), o.o_custkey == F.col("k"), "left_semi"
    ).count()
    assert d.agg(F.sum("n_orders")).collect()[0][0] == total


def test_collect_emits_sorted_distinct_type_lists(spark, sf_dir):
    rows = _df(spark, sf_dir, "agg_collect").collect()
    ev = t(spark, sf_dir, "events")
    assert len(rows) == ev.agg(F.countDistinct("user_id")).collect()[0][0]
    per_user = {
        r["user_id"]: {x["event_type"] for x in r["types"]}
        for r in ev.groupBy("user_id")
        .agg(F.collect_set(F.struct("event_type")).alias("types"))
        .collect()
    }
    for r in rows:
        types = r["event_types"].split(",")
        assert types == sorted(types)  # deterministic ordered agg
        assert len(types) == len(set(types)) == r["n_types"]
        assert set(types) == per_user[r["user_id"]]


def test_stats_identities_variance_stddev_corr(spark, sf_dir):
    rows = _df(spark, sf_dir, "agg_stats").collect()
    for r in rows:
        # sd^2 == var (both published, rounded 1e-6).
        assert abs(r["sd_value"] ** 2 - r["var_value"]) < 1e-3
        assert r["var_value"] >= 0.0
        if r["corr_vu"] is not None:
            assert -1.0 - 1e-9 <= r["corr_vu"] <= 1.0 + 1e-9
            # corr = covar / (sd_v * sd_u): same sign as covar.
            if abs(r["covar_vu"]) > 1e-6:
                assert math.copysign(1, r["corr_vu"]) == math.copysign(1, r["covar_vu"])
    # The median lives inside the type's value range.
    ev = t(spark, sf_dir, "events")
    rng = {
        x["event_type"]: (x["mn"], x["mx"])
        for x in ev.groupBy("event_type")
        .agg(F.min("value").alias("mn"), F.max("value").alias("mx"))
        .collect()
    }
    for r in rows:
        mn, mx = rng[r["event_type"]]
        assert mn - 1e-6 <= r["median_value"] <= mx + 1e-6
