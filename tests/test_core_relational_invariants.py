"""Semantic invariants for the §2.A-core relational contract rows
(joins, set operations, sort/limit/top-k, subqueries). These keys are
driver-verified (hash-green vs DuckDB), but between driver touches the
only guard was the oracle twin — which can be wrong on both engines the
same way. Each test here RECOMPUTES the operator's defining property
with independent Spark expressions against the source tables: FK
conservation for joins, multiset arithmetic for set ops, explicit order
checks for sorts, and threshold re-derivation for subqueries.

join_inner_hash and set_union are the staged r10 canaries; subquery
keys include the r7 _REVERIFY slot (subquery_scalar's 1.8x threshold)
and the r8 canary (subquery_scalar again per the rotation table)."""

from __future__ import annotations

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.operators._shared import t
from morphl_model_publishers_churning_users_spark.registry import get_queries

_Q = get_queries()


def _df(spark, sf_dir, key):
    return _Q[key](spark, sf_dir)


# ------------------------------------------------------------------ joins


def test_inner_join_conserves_orders_under_total_fk(spark, sf_dir):
    d = _df(spark, sf_dir, "join_inner_hash")
    orders = t(spark, sf_dir, "orders")
    n_valid = orders.join(
        t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("k")),
        orders.o_custkey == F.col("k"),
        "left_semi",
    ).count()
    # 1:N inner join on the FK emits exactly the FK-valid order rows,
    # each order once.
    assert d.count() == n_valid
    assert d.select("o_orderkey").distinct().count() == n_valid


def test_left_outer_preserves_every_customer(spark, sf_dir):
    d = _df(spark, sf_dir, "join_left_outer")
    cust = t(spark, sf_dir, "customer")
    orders = t(spark, sf_dir, "orders")
    assert d.select("c_custkey").distinct().count() == cust.count()
    n_matched = orders.join(
        cust.select(F.col("c_custkey").alias("k")), orders.o_custkey == F.col("k"), "left_semi"
    ).count()
    n_unmatched_cust = cust.join(
        orders.select(F.col("o_custkey").alias("k")), cust.c_custkey == F.col("k"), "left_anti"
    ).count()
    assert d.count() == n_matched + n_unmatched_cust
    # NULL-extended rows are exactly the order-less customers.
    assert d.filter(F.col("o_orderkey").isNull()).count() == n_unmatched_cust


def test_broadcast_dim_join_is_total_on_the_fact(spark, sf_dir):
    d = _df(spark, sf_dir, "join_broadcast")
    assert d.count() == t(spark, sf_dir, "customer").count()
    # The (nation, region) combinations come from the dim snowflake.
    combos = {
        (r["n_name"], r["r_name"])
        for r in t(spark, sf_dir, "nation")
        .join(
            t(spark, sf_dir, "region"),
            F.col("n_regionkey") == F.col("r_regionkey"),
        )
        .select("n_name", "r_name")
        .collect()
    }
    got = {(r["n_name"], r["r_name"]) for r in d.select("n_name", "r_name").distinct().collect()}
    assert got <= combos


def test_semi_and_anti_joins_are_exact_exists_filters(spark, sf_dir):
    cust = t(spark, sf_dir, "customer")
    with_orders = {
        r["o_custkey"]
        for r in t(spark, sf_dir, "orders").select("o_custkey").distinct().collect()
    }
    semi = {r["c_custkey"] for r in _df(spark, sf_dir, "join_semi").collect()}
    all_cust = {r["c_custkey"] for r in cust.select("c_custkey").collect()}
    assert semi == all_cust & with_orders

    event_users = {
        r["user_id"]
        for r in t(spark, sf_dir, "events").select("user_id").distinct().collect()
    }
    anti = {r["c_custkey"] for r in _df(spark, sf_dir, "join_anti").collect()}
    assert anti == all_cust - event_users


def test_cross_join_enumerates_each_unordered_pair_once(spark, sf_dir):
    d = _df(spark, sf_dir, "join_cross")
    n = t(spark, sf_dir, "nation").count()
    assert d.count() == n * (n - 1) // 2
    assert d.filter(F.col("n1") == F.col("n2")).count() == 0
    assert d.distinct().count() == d.count()


# --------------------------------------------------------------- set ops


def test_union_all_conserves_multiplicity(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    n_click = ev.filter(F.col("event_type") == "click").count()
    n_view = ev.filter(F.col("event_type") == "view").count()
    d = _df(spark, sf_dir, "set_union")
    assert d.count() == n_click + n_view
    got = {r["event_type"]: r["n"] for r in d.groupBy("event_type").agg(F.count(F.lit(1)).alias("n")).collect()}
    assert got == {"click": n_click, "view": n_view}


def test_intersect_is_users_active_in_both_halves(spark, sf_dir):
    ev = t(spark, sf_dir, "events")
    cut = F.lit("2024-01-15").cast("timestamp_ntz")
    both = (
        ev.groupBy("user_id")
        .agg(
            F.max((F.col("ts") < cut).cast("int")).alias("a"),
            F.max((F.col("ts") >= cut).cast("int")).alias("b"),
        )
        .filter((F.col("a") == 1) & (F.col("b") == 1))
    )
    got = {r["user_id"] for r in _df(spark, sf_dir, "set_intersect").collect()}
    assert got == {r["user_id"] for r in both.select("user_id").collect()}


def test_except_removes_exactly_the_event_users(spark, sf_dir):
    cust_keys = {
        r["c_custkey"]
        for r in t(spark, sf_dir, "customer").select("c_custkey").collect()
    }
    event_users = {
        r["user_id"]
        for r in t(spark, sf_dir, "events").select("user_id").distinct().collect()
    }
    got = {r["c_custkey"] for r in _df(spark, sf_dir, "set_except").collect()}
    assert got == cust_keys - event_users


def test_except_all_multiset_arithmetic(spark, sf_dir):
    # EXCEPT ALL keeps max(0, n_left - n_right) copies per value.
    orders_per_cust = (
        t(spark, sf_dir, "orders").groupBy(F.col("o_custkey").alias("k")).agg(F.count(F.lit(1)).alias("nl"))
    )
    cust_per_key = (
        t(spark, sf_dir, "customer").groupBy(F.col("c_custkey").alias("k")).agg(F.count(F.lit(1)).alias("nr"))
    )
    expect = (
        orders_per_cust.join(cust_per_key, "k", "left")
        .select(F.greatest(F.col("nl") - F.coalesce(F.col("nr"), F.lit(0)), F.lit(0)).alias("m"))
        .agg(F.sum("m"))
        .collect()[0][0]
    )
    assert _df(spark, sf_dir, "set_except_all").count() == expect


def test_intersect_all_multiset_arithmetic(spark, sf_dir):
    # INTERSECT ALL keeps min(n_left, n_right) copies per value.
    o = t(spark, sf_dir, "orders")
    per = o.groupBy(F.col("o_custkey").alias("k")).agg(
        F.sum((F.col("o_orderstatus") == "F").cast("long")).alias("nf"),
        F.sum((F.col("o_orderstatus") == "O").cast("long")).alias("no"),
    )
    expect = per.select(F.least("nf", "no").alias("m")).agg(F.sum("m")).collect()[0][0]
    assert _df(spark, sf_dir, "set_intersect_all").count() == expect


def test_union_by_name_null_fills_the_missing_column(spark, sf_dir):
    docs = t(spark, sf_dir, "documents")
    d = _df(spark, sf_dir, "set_union_by_name")
    assert d.count() == docs.count()
    n_web = docs.filter(F.col("source") == "web").count()
    # The web branch selects no n_chars: exactly its rows are NULL.
    assert d.filter(F.col("n_chars").isNull()).count() == n_web


# ------------------------------------------------------- sort/limit/topk


def test_sort_multi_emits_the_exact_lexicographic_order(spark, sf_dir):
    rows = _df(spark, sf_dir, "sort_multi").collect()
    assert len(rows) == t(spark, sf_dir, "customer").count()
    keys = [
        (r["c_mktsegment"], -(r["c_acctbal"] if r["c_acctbal"] is not None else float("-inf")), r["c_custkey"])
        for r in rows
    ]
    assert keys == sorted(keys)


def test_limit_offset_is_the_exact_key_slice(spark, sf_dir):
    got = [r["o_orderkey"] for r in _df(spark, sf_dir, "limit_offset").collect()]
    expect = [
        r["o_orderkey"]
        for r in t(spark, sf_dir, "orders")
        .select("o_orderkey")
        .orderBy("o_orderkey")
        .limit(150)
        .collect()
    ][100:150]
    assert got == expect


def test_topk_nulls_last_takes_the_largest_nonnull_values(spark, sf_dir):
    rows = _df(spark, sf_dir, "topk_nulls_last").collect()
    assert len(rows) == 50
    ev = t(spark, sf_dir, "events")
    n_nonnull = ev.filter(F.col("value") <= 90).count()
    if n_nonnull >= 50:
        # Enough non-null candidates: NULLS LAST keeps them all out.
        assert all(r["v"] is not None for r in rows)
        # Descending with event_id tiebreak, and nothing above the
        # NULLing threshold leaks through.
        seq = [(-r["v"], r["event_id"]) for r in rows]
        assert seq == sorted(seq)
        assert all(r["v"] <= 90.0 + 1e-9 for r in rows)
        floor_v = min(r["v"] for r in rows)
        n_strictly_better = ev.filter(
            (F.col("value") <= 90) & (F.round("value", 6) > floor_v)
        ).count()
        assert n_strictly_better < 50


# ------------------------------------------------------------ subqueries


def test_scalar_subquery_threshold_rederived(spark, sf_dir):
    o = t(spark, sf_dir, "orders")
    mean = o.agg(F.avg("o_totalprice")).collect()[0][0]
    cut = 1.8 * mean
    d = _df(spark, sf_dir, "subquery_scalar")
    assert d.count() == o.filter(F.col("o_totalprice") > cut).count()
    assert d.filter(F.col("totalprice") <= cut - 1e-6).count() == 0
    # The 1.8x semantics (zero-output-contract repair) must keep the
    # filter selective but non-empty at every scale.
    assert 0 < d.count() < o.count()


def test_correlated_subquery_compares_within_its_own_part(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    per_part = li.groupBy(F.col("l_partkey").alias("pk")).agg(
        F.avg("l_extendedprice").alias("avg_p")
    )
    d = _df(spark, sf_dir, "subquery_correlated").alias("s")
    j = d.join(per_part, F.col("s.l_partkey") == F.col("pk"))
    assert j.count() == d.count()
    assert j.filter(F.col("price") <= 1.5 * F.col("avg_p") - 1e-6).count() == 0
    expect = (
        li.join(per_part, li.l_partkey == F.col("pk"))
        .filter(F.col("l_extendedprice") > 1.5 * F.col("avg_p"))
        .count()
    )
    assert d.count() == expect


def test_lateral_subquery_is_a_per_customer_top2(spark, sf_dir):
    from pyspark.sql import Window

    d = _df(spark, sf_dir, "subquery_lateral")
    o = t(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.desc("o_totalprice"), F.asc("o_orderkey")
    )
    expect = {
        (r["o_custkey"], r["o_orderkey"])
        for r in o.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") <= 2)
        .select("o_custkey", "o_orderkey")
        .collect()
    }
    got = {(r["c_custkey"], r["o_orderkey"]) for r in d.collect()}
    assert got == expect
