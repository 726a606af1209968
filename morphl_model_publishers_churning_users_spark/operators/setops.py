"""§2.F — sort / limit / top-k / set operations.

topk folds to TakeOrderedAndProject (per-partition heap + driver merge of
k rows — no global sort, the only scalable top-k). Set ops are hash
shuffles on the full row; distinct variants partial-aggregate map-side.
"""

from __future__ import annotations

import pyspark.sql.functions as F

from ..registry import register
from ._shared import t


@register(
    "sort_multi",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal
FROM customer
ORDER BY c_mktsegment ASC, c_acctbal DESC NULLS LAST, c_custkey ASC
""",
)
def sort_multi(spark, sf_dir):
    """Multi-key global sort with explicit null placement — Spark plans a
    range-partitioned sort (sampled boundaries), the scalable global sort."""
    return (
        t(spark, sf_dir, "customer")
        .select("c_custkey", "c_mktsegment", "c_acctbal")
        .orderBy(
            F.asc("c_mktsegment"), F.desc_nulls_last("c_acctbal"), F.asc("c_custkey")
        )
    )


@register(
    "topk",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 25
""",
)
def topk(spark, sf_dir):
    """Top-K (highest-value orders). sort+limit folds to
    TakeOrderedAndProject: k-row heaps per partition, no global sort."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.desc("o_totalprice"), F.asc("o_orderkey"))
        .limit(25)
    )


@register(
    "limit_offset",
    oracle="""
SELECT o_orderkey, o_totalprice
FROM orders
ORDER BY o_orderkey
LIMIT 50 OFFSET 100
""",
)
def limit_offset(spark, sf_dir):
    """Pagination (the reference's results API shape). Requires a
    deterministic order; offset is driver-side after the sorted take."""
    return (
        t(spark, sf_dir, "orders")
        .select("o_orderkey", "o_totalprice")
        .orderBy("o_orderkey")
        .offset(100)
        .limit(50)
    )


@register(
    "set_union",
    oracle="""
SELECT user_id, event_type, value FROM events WHERE event_type = 'click'
UNION ALL
SELECT user_id, event_type, value FROM events WHERE event_type = 'view'
""",
)
def set_union(spark, sf_dir):
    """UNION ALL by name — no shuffle at all, just concatenated scans."""
    ev = t(spark, sf_dir, "events").select("user_id", "event_type", "value")
    return ev.filter(F.col("event_type") == "click").unionByName(
        ev.filter(F.col("event_type") == "view")
    )


@register(
    "set_intersect",
    oracle="""
SELECT user_id FROM events WHERE ts < TIMESTAMP '2024-01-15'
INTERSECT
SELECT user_id FROM events WHERE ts >= TIMESTAMP '2024-01-15'
""",
)
def set_intersect(spark, sf_dir):
    """Users active in both halves of the month (retained set)."""
    ev = t(spark, sf_dir, "events")
    cutoff = F.lit("2024-01-15").cast("timestamp_ntz")
    first = ev.filter(F.col("ts") < cutoff).select("user_id")
    second = ev.filter(F.col("ts") >= cutoff).select("user_id")
    return first.intersect(second)


@register(
    "set_except",
    oracle="""
SELECT c_custkey FROM customer
EXCEPT
SELECT user_id AS c_custkey FROM events
""",
)
def set_except(spark, sf_dir):
    """Customers with no event activity (churn set-difference)."""
    c = t(spark, sf_dir, "customer").select("c_custkey")
    active = t(spark, sf_dir, "events").select(F.col("user_id").alias("c_custkey"))
    return c.subtract(active)


@register(
    "set_except_all",
    oracle="""
SELECT o_custkey AS cust_id FROM orders
EXCEPT ALL
SELECT c_custkey AS cust_id FROM customer
""",
)
def set_except_all(spark, sf_dir):
    """Multiset difference (EXCEPT ALL): each order-occurrence of a
    customer key minus one catalog occurrence — bag semantics survive,
    unlike ``subtract``. Plans as one hash aggregate over (row, side
    counts), a single shuffle on the row value."""
    o = t(spark, sf_dir, "orders").select(F.col("o_custkey").alias("cust_id"))
    c = t(spark, sf_dir, "customer").select(F.col("c_custkey").alias("cust_id"))
    return o.exceptAll(c)


@register(
    "set_intersect_all",
    oracle="""
SELECT o_custkey AS cust_id FROM orders WHERE o_orderstatus = 'F'
INTERSECT ALL
SELECT o_custkey AS cust_id FROM orders WHERE o_orderstatus = 'O'
""",
)
def set_intersect_all(spark, sf_dir):
    """Multiset intersection (INTERSECT ALL): min(multiplicity) per key
    across the two branches — one hash aggregate, one shuffle."""
    o = t(spark, sf_dir, "orders")
    f = o.filter(F.col("o_orderstatus") == "F").select(F.col("o_custkey").alias("cust_id"))
    op = o.filter(F.col("o_orderstatus") == "O").select(F.col("o_custkey").alias("cust_id"))
    return f.intersectAll(op)


@register(
    "topk_nulls_last",
    oracle="""
SELECT event_id, user_id,
       CASE WHEN value > 90 THEN NULL ELSE ROUND(value, 6) END AS v
FROM events
ORDER BY v DESC NULLS LAST, event_id
LIMIT 50
""",
)
def topk_nulls_last(spark, sf_dir):
    """Top-k over a NULLABLE key with explicit null placement — the case
    where null ordering changes WHICH rows survive, not just their
    order (Spark defaults NULLS FIRST on ASC, DuckDB NULLS LAST, so an
    implicit sort here would silently return different rows). Still
    folds to TakeOrderedAndProject: per-partition top-50, tiny merge —
    no global sort at any scale."""
    ev = t(spark, sf_dir, "events")
    v = F.when(F.col("value") > 90, None).otherwise(F.round("value", 6))
    return (
        ev.select("event_id", "user_id", v.alias("v"))
        .orderBy(F.desc_nulls_last("v"), F.asc("event_id"))
        .limit(50)
    )


@register(
    "set_union_by_name",
    oracle="""
SELECT doc_id, lang, n_chars FROM (
  SELECT doc_id, lang, CAST(NULL AS BIGINT) AS n_chars
  FROM documents WHERE source = 'web'
  UNION ALL
  SELECT doc_id, lang, n_chars FROM documents WHERE source <> 'web'
)
""",
)
def set_union_by_name(spark, sf_dir):
    """Schema-evolving union — unionByName(allowMissingColumns=True)
    aligns by COLUMN NAME and NULL-pads what one side lacks, the safe
    way to stack heterogeneous batches (positional UNION would silently
    pair mismatched columns). Narrow op: no shuffle, both branches stay
    in their scan stages."""
    d = t(spark, sf_dir, "documents")
    old_batch = d.filter(F.col("source") == "web").select("doc_id", "lang")
    new_batch = d.filter(F.col("source") != "web").select("doc_id", "lang", "n_chars")
    return old_batch.unionByName(new_batch, allowMissingColumns=True)
