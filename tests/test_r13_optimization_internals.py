"""Focused pins for the round-13 optimization rewrites (operators whose
INTERNALS changed while their results must not): the Markov fold's
alive-mask drop-out semantics, the cogrouped-map bucket independence,
the fn_try guard equivalence on adversarial inputs, and the threshold
levenshtein's exactness for surviving pairs.
"""

from __future__ import annotations

import pyspark.sql.functions as F
import pytest

from morphl_model_publishers_churning_users_spark.registry import get_queries

_Q = get_queries()


# ---------------------------------------------------------------------------
# ts_markov_stationary / ts_absorbing_markov: HOF-fold rewrites
# ---------------------------------------------------------------------------


def test_markov_stationary_is_single_fold_no_loop_jobs(spark, sf_dir):
    """The 20-round power iteration must NOT appear as 20 join/agg plan
    layers: the returned frame reads from the checkpointed one-row fold
    (Scan ExistingRDD) with no Join above it."""
    df = _Q["ts_markov_stationary"](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Scan ExistingRDD" in plan
    assert "Join" not in plan  # explode tail only — iteration ran in the fold
    assert "Exchange" not in plan


def test_markov_stationary_probabilities_form_distribution(spark, sf_dir):
    rows = _Q["ts_markov_stationary"](spark, sf_dir).collect()
    assert rows, "stationary vector must be non-empty"
    total = sum(r["stationary_prob"] for r in rows)
    assert abs(total - 1.0) < 1e-4  # L1-renormalized each round
    assert all(r["stationary_prob"] >= 0 for r in rows)
    states = [r["state"] for r in rows]
    assert len(states) == len(set(states))


def test_markov_fold_alive_mask_mirrors_join_dropout(spark):
    """The alive mask must reproduce the OLD join semantics: a state
    that never RECEIVES transitions (pure source) leaves the vector on
    round 1 and is absent from the output, exactly as the r-join
    produced no row for it. Chain: A -> B -> A plus C -> A (C is never
    a destination among {A,B,C} sources)."""
    from morphl_model_publishers_churning_users_spark.operators import timeseries as ts

    # Re-run the fold construction over a synthetic p matrix by
    # monkey-free means: drive the registered op's exact expressions via
    # a tiny in-memory frame shaped like its internal `p` table.
    p = spark.createDataFrame(
        [("A", "B", 1.0), ("B", "A", 1.0), ("C", "A", 1.0)],
        "prev string, nxt string, pr double",
    )
    mat = p.agg(F.expr("sort_array(collect_list(struct(prev, nxt, pr)))").alias("m"))
    dense = mat.select(
        "m",
        F.expr("array_sort(array_distinct(transform(m, x -> x.prev)))").alias("states"),
    ).select(
        "states",
        F.expr(
            "transform(states, ps -> transform(states, ns -> "
            "coalesce(get(filter(m, x -> x.prev = ps AND x.nxt = ns), 0).pr, 0d)))"
        ).alias("P"),
    )
    alive_after_1 = dense.select(
        F.expr(
            "transform(sequence(0, size(states)-1), j -> "
            "exists(sequence(0, size(states)-1), i -> P[i][j] != 0d))"
        ).alias("alive"),
        "states",
    ).collect()[0]
    alive = dict(zip(alive_after_1["states"], alive_after_1["alive"]))
    # A and B receive transitions; C receives none -> drops out round 1.
    assert alive == {"A": True, "B": True, "C": False}


def test_absorbing_markov_plan_is_fold_not_loop(spark, sf_dir):
    df = _Q["ts_absorbing_markov"](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "Scan ExistingRDD" in plan
    assert "Join" not in plan


# ---------------------------------------------------------------------------
# udf_cogrouped_map: hash-bucket cogrouping
# ---------------------------------------------------------------------------


def test_cogrouped_map_matches_declarative_join(spark, sf_dir):
    """The bucketed cogroup must equal the LEFT JOIN + GROUP BY it
    reimplements, per customer, regardless of which bucket a customer
    landed in."""
    from morphl_model_publishers_churning_users_spark.operators._shared import t

    got = {
        r["c_custkey"]: (r["n_orders"], r["total_spend"])
        for r in _Q["udf_cogrouped_map"](spark, sf_dir).collect()
    }
    c = t(spark, sf_dir, "customer").select("c_custkey")
    o = t(spark, sf_dir, "orders").select("o_custkey", "o_totalprice")
    exp_rows = (
        c.join(o, c["c_custkey"] == o["o_custkey"], "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_custkey").cast("bigint").alias("n"),
            F.sum("o_totalprice").alias("s"),
        )
        .collect()
    )
    assert len(got) == len(exp_rows)
    for r in exp_rows:
        n, spend = got[r["c_custkey"]]
        assert n == r["n"]
        if r["n"] == 0:
            assert spend is None  # NULL, not NaN — the LEFT JOIN contract
        else:
            assert spend == pytest.approx(r["s"], abs=1e-4)


def test_cogrouped_map_bucket_count_floor(spark, sf_dir):
    """Bucket count is parallelism-scaled with a floor of 64 so the
    driver's lower-core bench run keeps real batches per Python call."""
    nb = max(64, spark.sparkContext.defaultParallelism * 8)
    assert nb >= 64


# ---------------------------------------------------------------------------
# fn_try: guard equivalence on adversarial inputs
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "s",
    [
        "7",  # digits fast path
        "3x",  # the fixture's failure class — direct NULL route
        " 42 ",  # whitespace: fails both regexes, must still try_cast to 42
        "2000000000",  # 10 digits, in int range — regex miss, try_cast succeeds
        "4000000000",  # 10 digits, out of range — try_cast NULL
        "3.7",  # decimal string: Spark casts to 3 — must reach try_cast
        "-5",
        "",
        "x3",
    ],
)
def test_fn_try_parsed_line_guard_equals_plain_try_cast(spark, s):
    """The regex routing may only change WHICH path computes the value,
    never the value: for every input class it must equal a bare
    try_cast."""
    guarded = (
        "CASE WHEN v RLIKE '^[0-9]{1,9}$' THEN try_cast(v AS INT) "
        "WHEN v RLIKE '^[0-9]+x$' THEN CAST(NULL AS INT) "
        "ELSE try_cast(v AS INT) END"
    )
    row = (
        spark.createDataFrame([(s,)], "v string")
        .selectExpr(f"{guarded} AS g", "try_cast(v AS INT) AS p")
        .collect()[0]
    )
    assert row["g"] == row["p"], f"guard diverged for {s!r}: {row['g']} vs {row['p']}"


@pytest.mark.parametrize("ln", [1, 3, 4, 7, 100, -1])
def test_fn_try_near_overflow_guard_equals_try_add(spark, ln):
    row = (
        spark.createDataFrame([(ln,)], "l int")
        .selectExpr(
            "CASE WHEN 2147483640L + cast(l as bigint) * 2 "
            "BETWEEN -2147483648L AND 2147483647L "
            "THEN try_cast(2147483640L + cast(l as bigint) * 2 AS INT) "
            "ELSE CAST(NULL AS INT) END AS g",
            "try_add(2147483640, l * 2) AS p",
        )
        .collect()[0]
    )
    assert row["g"] == row["p"]


# ---------------------------------------------------------------------------
# join_fuzzy_blocked: threshold levenshtein exactness
# ---------------------------------------------------------------------------


def test_threshold_levenshtein_exact_for_survivors(spark):
    pairs = [
        ("Customer#000000001", "Customer#000000001"),  # 0
        ("Customer#000000001", "Customer#000000002"),  # 1
        ("Customer#000000001", "Customer#000000021"),  # 2
        ("Customer#000000001", "Customer#000000222"),  # 3 -> -1 under threshold
        ("abc", "axbxc"),  # 2 via insertions
    ]
    rows = (
        spark.createDataFrame(pairs, "a string, b string")
        .select(
            F.levenshtein("a", "b").alias("full"),
            F.levenshtein("a", "b", 2).alias("thr"),
        )
        .collect()
    )
    for r in rows:
        if r["full"] <= 2:
            assert r["thr"] == r["full"]  # exact where it matters
        else:
            assert r["thr"] == -1  # sentinel — filtered out either way


def test_fuzzy_blocked_probe_side_is_parallelized(spark, sf_dir):
    """The r13b fix spreads the probe side (where every candidate
    pair's levenshtein runs) across the session's parallelism when the
    dimension-sized scan arrives as fewer splits — measured 9.2 s -> 1.1 s
    at sf0.1 because the whole DP stage previously ran in ONE task. Pin:
    (a) the plan keeps the broadcast join AND gains a probe-side
    hash exchange on c_custkey (no shuffle join, no cartesian);
    (b) the repartition changes nothing about the result set."""
    df = _Q["join_fuzzy_blocked"](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan and "Cartesian" not in plan
    assert "hashpartitioning(c_custkey" in plan and "REPARTITION_BY_NUM" in plan

    from morphl_model_publishers_churning_users_spark.operators._shared import t

    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    a, b = c.alias("a"), c.alias("b")
    dist = F.levenshtein(F.col("a.c_name"), F.col("b.c_name"), 2)
    plain = a.join(
        b,
        (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
        & (F.col("a.c_custkey") < F.col("b.c_custkey"))
        & (dist >= 0)
        & (dist <= 2),
    ).select(
        F.col("a.c_custkey").alias("key_a"),
        F.col("b.c_custkey").alias("key_b"),
        dist.cast("bigint").alias("dist"),
    )
    got = {tuple(r) for r in df.collect()}
    want = {tuple(r) for r in plain.collect()}
    assert got == want and got, "repartition must not change the pair set"


def test_dedup_cluster_unrolled_fixpoint_matches_single_step(spark, sf_dir):
    """The r13b unroll runs TWO doc→key→doc min half-steps per
    materialized round. Min-propagation is monotone non-increasing, so
    the converged labels must be bit-identical to the one-step
    schedule's — pin it against a single-step reference loop."""
    from morphl_model_publishers_churning_users_spark.operators._shared import t

    d = t(spark, sf_dir, "documents").select(
        "doc_id", F.split(F.trim("text"), " ").alias("w")
    )
    keys = d.select(
        "doc_id",
        F.explode(
            F.array(
                F.concat_ws(" ", F.slice("w", 1, 3)),
                F.concat_ws(" ", F.expr("slice(w, greatest(size(w) - 2, 1), 3)")),
            )
        ).alias("k"),
    )
    labels = d.select("doc_id", F.col("doc_id").alias("label"))
    for _ in range(24):  # single-step reference, generous bound
        kmin = keys.join(labels, "doc_id").groupBy("k").agg(F.min("label").alias("klabel"))
        new = keys.join(kmin, "k").groupBy("doc_id").agg(F.min("klabel").alias("label")).localCheckpoint()
        changed = (
            labels.withColumnRenamed("label", "old")
            .join(new, "doc_id")
            .filter(F.col("old") != F.col("label"))
            .limit(1)
            .count()
        )
        labels = new
        if changed == 0:
            break
    ref = {(r["doc_id"], r["label"]) for r in labels.collect()}
    got = {
        (r["doc_id"], r["component_id"])
        for r in _Q["llm_dedup_cluster"](spark, sf_dir).collect()
    }
    assert got == ref and got


def test_grouped_map_bucketing_matches_per_user_groups(spark, sf_dir):
    """The r13b bucketed grouped-map must return exactly the per-user
    z-scores of the plain groupBy(user_id).applyInPandas form — the
    bucket key only packs users into shared Arrow batches; each user's
    frame is still built and scored by the same pandas calls. Also pin
    the single-event-user NULL contract and the wide-Python-stage plan
    shape (REPARTITION_BY_NUM exchange, not an AQE-coalescible one)."""
    import pandas as pd

    from morphl_model_publishers_churning_users_spark.operators._shared import t

    df = _Q["udf_grouped_map"](spark, sf_dir)
    plan = df._jdf.queryExecution().explainString(
        spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString("formatted")
    )
    assert "REPARTITION_BY_NUM" in plan
    assert "FlatMapGroupsInPandas" in plan or "ArrowEvalPython" in plan

    def zscore(pdf: pd.DataFrame) -> pd.DataFrame:
        sd = pdf["value"].std(ddof=1)
        mu = pdf["value"].mean()
        if pd.isna(sd) or sd == 0:
            z = pd.Series([None] * len(pdf), dtype="float64")
        else:
            z = ((pdf["value"] - mu) / sd).round(6)
        return pd.DataFrame(
            {"event_id": pdf["event_id"], "user_id": pdf["user_id"], "z_value": z}
        )

    ev = t(spark, sf_dir, "events").select("event_id", "user_id", "value")
    plain = ev.groupBy("user_id").applyInPandas(
        zscore, schema="event_id bigint, user_id bigint, z_value double"
    )
    got = {tuple(r) for r in df.collect()}
    want = {tuple(r) for r in plain.collect()}
    assert got == want and got


def test_closeness_lazy_visited_matches_eager_union(spark, sf_dir):
    """The r13b rewrite recomposes the visited set lazily from the
    checkpointed frontiers instead of re-materializing the growing
    union each round (and leaves the last frontier lazy). The reach
    set — hence the returned top-20 — must be identical to the eager
    formulation's."""
    from morphl_model_publishers_churning_users_spark.operators._shared import ckpt
    from morphl_model_publishers_churning_users_spark.operators.graph import (
        _brand_edges,
        _sym,
    )
    from pyspark.sql import Window

    sym = ckpt(_sym(_brand_edges(spark, sf_dir), "brand"))
    r0 = sym.select(
        "brand", F.col("src").alias("seed"), F.col("src").alias("node")
    ).distinct()
    frontier, visited = r0, ckpt(r0)
    per_dist = []
    for i in range(1, 4):  # the pre-r13b eager-visited loop, verbatim
        nxt = (
            sym.join(
                frontier.select("brand", "seed", F.col("node").alias("src")),
                ["brand", "src"],
            )
            .select("brand", "seed", F.col("dst").alias("node"))
            .distinct()
            .join(visited, ["brand", "seed", "node"], "left_anti")
        )
        frontier = ckpt(nxt)
        visited = ckpt(visited.unionByName(frontier))
        per_dist.append(frontier.withColumn("dist", F.lit(i)))
    reach = per_dist[0].unionByName(per_dist[1]).unionByName(per_dist[2])
    counts = reach.groupBy("brand", F.col("seed").alias("part")).agg(
        *[
            F.sum(F.when(F.col("dist") == d, 1).otherwise(0))
            .cast("bigint")
            .alias(f"n_hop{d}")
            for d in (1, 2, 3)
        ]
    )
    harmonic = F.floor(
        (
            F.col("n_hop1").cast("double")
            + 0.5 * F.col("n_hop2")
            + F.col("n_hop3") / F.lit(3.0)
        )
        * F.lit(1e6)
        + F.lit(0.5)
    ) / F.lit(1e6)
    w = Window.orderBy(F.desc("harmonic"), F.asc("brand"), F.asc("part"))
    ref_rows = (
        counts.withColumn("harmonic", harmonic)
        .withColumn("rank", F.row_number().over(w).cast("bigint"))
        .filter(F.col("rank") <= 20)
        .orderBy("rank")
        .collect()
    )
    got_rows = _Q["graph_closeness"](spark, sf_dir).collect()
    assert [tuple(r) for r in got_rows] == [tuple(r) for r in ref_rows]
    assert got_rows


# ---------------------------------------------------------------------------
# graph_pagerank / graph_ppr: per-NODE contribution pre-quantization
# ---------------------------------------------------------------------------


def test_pagerank_per_node_contribution_equals_per_edge(spark):
    """The r13c rewrite quantizes q12(r/outdeg) once per SOURCE NODE and
    joins it onto the edges, instead of computing it per EDGE inside the
    join projection. Pin: on a graph with a high-degree hub and rank
    values at awkward quantization points, the per-dst decimal insums
    are bit-identical both ways (same addend crosses every edge, decimal
    sums are order-independent), including a dst with NO in-edges being
    absent from both."""
    q12 = lambda c: (F.floor(c * F.lit(1e12) + F.lit(0.5)) / F.lit(1e12)).cast(
        "decimal(38,12)"
    )
    # hub node 1 fans out to 50 dsts; r/outdeg values hit non-terminating
    # binary fractions (1/3-ish ranks over degree 50 and 7).
    edges = [(1, d) for d in range(100, 150)] + [(2, d) for d in range(100, 107)]
    sym = spark.createDataFrame(edges, "src bigint, dst bigint")
    pr = spark.createDataFrame(
        [(1, 50.0, 0.333333333333333), (2, 7.0, 0.142857142857143)],
        "node bigint, outdeg double, r double",
    )
    per_edge = (
        pr.join(sym, pr["node"] == sym["src"])
        .select(F.col("dst").alias("node"), q12(F.col("r") / F.col("outdeg")).alias("c"))
        .groupBy("node")
        .agg(F.sum("c").cast("double").alias("insum"))
    )
    per_node = (
        pr.select(F.col("node").alias("src"), q12(F.col("r") / F.col("outdeg")).alias("c"))
        .join(sym, "src")
        .groupBy(F.col("dst").alias("node"))
        .agg(F.sum("c").cast("double").alias("insum"))
    )
    a = {r["node"]: r["insum"] for r in per_edge.collect()}
    b = {r["node"]: r["insum"] for r in per_node.collect()}
    assert a == b
    assert len(a) == 50  # dsts 100..106 get two in-edges, rest one


def test_bfs_lazy_visited_matches_eager_union(spark, sf_dir):
    """graph_bfs_distance r13c: visited recomposes lazily from the
    checkpointed frontier pieces and the last frontier stays lazy. Pin
    the per-(brand, dist) histogram against an eagerly-unioned visited
    reference loop (the pre-r13c recurrence)."""
    from morphl_model_publishers_churning_users_spark.operators._shared import ckpt
    from morphl_model_publishers_churning_users_spark.operators.graph import (
        _brand_edges,
        _sym,
    )

    sym = ckpt(_sym(_brand_edges(spark, sf_dir), "brand"))
    frontier = sym.groupBy("brand").agg(F.min("src").alias("node")).withColumn(
        "dist", F.lit(0)
    )
    visited = frontier
    for i in range(1, 5):
        nxt = (
            sym.join(
                frontier.select("brand", F.col("node").alias("src")), ["brand", "src"]
            )
            .select("brand", F.col("dst").alias("node"))
            .distinct()
            .join(visited.select("brand", "node"), ["brand", "node"], "left_anti")
            .withColumn("dist", F.lit(i))
        )
        frontier = ckpt(nxt)
        visited = ckpt(visited.unionByName(frontier))
    ref = {
        (r["brand"], r["dist"]): r["n_nodes"]
        for r in visited.groupBy("brand", "dist")
        .agg(F.count(F.lit(1)).cast("bigint").alias("n_nodes"))
        .collect()
    }
    got = {
        (r["brand"], r["dist"]): r["n_nodes"]
        for r in _Q["graph_bfs_distance"](spark, sf_dir).collect()
    }
    assert got == ref
    assert got
