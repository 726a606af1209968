"""§2.B — projection / filter / row-level ops.

The reference's preprocessing cast GA string metrics to numerics, derived
columns, and deduped re-fetched rows [SURVEY.md §2.B, unverified]. All of
these stay inside whole-stage codegen (no Python boundary), so they run at
scan speed and scale linearly with partitions.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..registry import register
from ._shared import t


@register(
    "project_derive",
    oracle="""
SELECT l_orderkey, l_linenumber,
       ROUND(l_extendedprice * (1 - l_discount), 6) AS net_price,
       ROUND(l_extendedprice * (1 - l_discount) * (1 + l_tax), 6) AS gross_price
FROM lineitem
""",
)
def project_derive(spark, sf_dir):
    li = t(spark, sf_dir, "lineitem")
    net = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(net, 6).alias("net_price"),
        F.round(net * (1 + F.col("l_tax")), 6).alias("gross_price"),
    )


@register(
    "filter_pred",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
FROM lineitem
WHERE l_quantity BETWEEN 10 AND 20
  AND l_returnflag IN ('A', 'R')
  AND l_shipdate >= TIMESTAMP '1998-01-01'
  AND l_linestatus LIKE 'F%'
  AND l_discount IS NOT NULL
""",
)
def filter_pred(spark, sf_dir):
    """Conjunctive range/IN/LIKE/NULL predicates — all pushed to the
    parquet scan (visible as PushedFilters in explain)."""
    li = t(spark, sf_dir, "lineitem")
    return (
        li.filter(F.col("l_quantity").between(10, 20))
        .filter(F.col("l_returnflag").isin("A", "R"))
        .filter(F.col("l_shipdate") >= F.lit("1998-01-01").cast("timestamp_ntz"))
        .filter(F.col("l_linestatus").like("F%"))
        .filter(F.col("l_discount").isNotNull())
        .select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")
    )


@register(
    "cast_types",
    oracle="""
SELECT event_id,
       CAST(user_id AS DOUBLE) AS uid_double,
       CAST(user_id AS VARCHAR) AS uid_str,
       CAST(strftime(ts, '%Y-%m-%d') AS DATE) AS ts_day,
       CAST(FLOOR(value) AS BIGINT) AS value_floor
FROM events
""",
)
def cast_types(spark, sf_dir):
    """Type casts (the reference's GA metrics arrived as strings and were
    cast before aggregation). FLOOR-then-cast is used instead of a bare
    double→int cast because Spark truncates while ANSI engines round."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.col("user_id").cast("double").alias("uid_double"),
        F.col("user_id").cast("string").alias("uid_str"),
        F.to_date(F.date_format("ts", "yyyy-MM-dd")).alias("ts_day"),
        F.floor("value").cast("bigint").alias("value_floor"),
    )


@register(
    "cond_expr",
    oracle="""
SELECT event_id, user_id,
       CASE WHEN value > 75 THEN 'high' WHEN value > 40 THEN 'mid' ELSE 'low' END AS value_band,
       CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_purchase
FROM events
""",
)
def cond_expr(spark, sf_dir):
    """Conditional expressions — the churn-label shape (when/otherwise)."""
    ev = t(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        F.when(F.col("value") > 75, "high")
        .when(F.col("value") > 40, "mid")
        .otherwise("low")
        .alias("value_band"),
        F.when(F.col("event_type") == "purchase", 1).otherwise(0).alias("is_purchase"),
    )


@register(
    "null_handling",
    oracle="""
SELECT event_id,
       COALESCE(NULLIF(event_type, 'error'), 'unknown') AS et_clean,
       COALESCE(CASE WHEN value > 90 THEN NULL ELSE ROUND(value, 6) END, -1.0) AS value_capped,
       (CASE WHEN value > 90 THEN NULL ELSE value END IS NULL) AS was_nulled,
       (CASE WHEN value > 90 THEN NULL ELSE value END IS NOT DISTINCT FROM value) AS null_safe_eq
FROM events
""",
)
def null_handling(spark, sf_dir):
    """NULL semantics: nullif/coalesce/is-null and null-safe equality
    (Spark's <=> is ANSI IS NOT DISTINCT FROM)."""
    ev = t(spark, sf_dir, "events")
    nulled = F.when(F.col("value") > 90, None).otherwise(F.col("value"))
    return ev.select(
        "event_id",
        F.coalesce(F.nullif("event_type", F.lit("error")), F.lit("unknown")).alias("et_clean"),
        F.coalesce(F.when(F.col("value") > 90, None).otherwise(F.round("value", 6)), F.lit(-1.0)).alias(
            "value_capped"
        ),
        nulled.isNull().alias("was_nulled"),
        nulled.eqNullSafe(F.col("value")).alias("null_safe_eq"),
    )


@register("dedup_exact", oracle="SELECT DISTINCT user_id, event_type FROM events")
def dedup_exact(spark, sf_dir):
    """Exact dedup on a projected key set — one hash shuffle on the key;
    at 100 TB the map-side partial aggregate collapses duplicates before
    the exchange."""
    return t(spark, sf_dir, "events").select("user_id", "event_type").dropDuplicates()


@register("sample_rows")  # rows-only: sampling is engine-specific (count-tolerance tested)
def sample_rows(spark, sf_dir):
    """Seeded Bernoulli sample (train/test-split shape). No shuffle —
    sampling happens inside the scan stage."""
    return (
        t(spark, sf_dir, "lineitem")
        .select("l_orderkey", "l_linenumber")
        .sample(fraction=0.2, seed=42)
    )


_SCALAR_SUBQ_SQL = """
SELECT o_orderkey, o_custkey, ROUND(o_totalprice, 6) AS totalprice
FROM orders
WHERE o_totalprice >
      (SELECT 2 * CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
       FROM orders)
"""


@register("subquery_scalar", oracle=_SCALAR_SUBQ_SQL)
def subquery_scalar(spark, sf_dir):
    """Uncorrelated scalar subquery (orders above 2× the global average)
    through the real SQL path: Catalyst plans the inner aggregate once and
    broadcasts the scalar — one extra stage, no per-row recompute. The
    threshold goes through DECIMAL(38,6) so both engines agree exactly at
    the comparison boundary."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_SCALAR_SUBQ_SQL)


_CORR_SUBQ_SQL = """
SELECT l_orderkey, l_linenumber, l_partkey, ROUND(l_extendedprice, 6) AS price
FROM lineitem l
WHERE l_extendedprice >
      (SELECT 1.5 * CAST(SUM(CAST(l2.l_extendedprice AS DECIMAL(38,6))) AS DOUBLE) / COUNT(*)
       FROM lineitem l2
       WHERE l2.l_partkey = l.l_partkey)
"""


@register("subquery_correlated", oracle=_CORR_SUBQ_SQL)
def subquery_correlated(spark, sf_dir):
    """Correlated scalar subquery (lineitems priced 1.5× above their
    part's average). Catalyst decorrelates this into a per-part aggregate
    + equi-join on l_partkey — the shape that scales (one shuffle on the
    correlation key), never a per-row re-execution."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_CORR_SUBQ_SQL)


_LATERAL_SQL = """
SELECT c.c_custkey, o.o_orderkey, o.o_totalprice
FROM customer c, LATERAL (
    SELECT o_orderkey, o_totalprice FROM orders
    WHERE o_custkey = c.c_custkey
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 2
) o
"""


@register("subquery_lateral", oracle=_LATERAL_SQL)
def subquery_lateral(spark, sf_dir):
    """Lateral (correlated table) subquery — top-2 orders per customer.
    Catalyst decorrelates the per-row ORDER BY/LIMIT into a single
    WindowGroupLimit (partial top-k before the shuffle, final after), so
    the 'run a query per customer' semantics execute as ONE ranked pass
    over orders — the only shape that survives 10^9 customers. Same SQL
    text runs on DuckDB as the oracle."""
    from ..catalog import register_views

    register_views(spark, sf_dir)
    return spark.sql(_LATERAL_SQL)
