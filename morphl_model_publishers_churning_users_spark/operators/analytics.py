"""Behavioral-analytics operators (SURVEY.md §2.M continuation).

Second-pass behavioral readouts over `events` — the analyses a churn /
engagement team runs downstream of the reference's feature pipeline
[SURVEY.md §1.1, unverified]. All follow the aggregate-then-window
discipline: the event stream is touched by exactly one keyed shuffle,
and every subsequent pass runs over a table bounded by user count or
type cardinality, so each plan survives a 100 TB event table unchanged.
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import Window

from ..registry import register
from ._shared import DSUM, dsum, t


@register(
    "ts_markov_transitions",
    oracle="""
WITH pairs AS (
    SELECT event_type,
           LEAD(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS next_type
    FROM events
), counts AS (
    SELECT event_type, next_type, COUNT(*) AS n_trans
    FROM pairs WHERE next_type IS NOT NULL GROUP BY 1, 2
)
SELECT event_type, next_type, n_trans,
       ROUND(CAST(n_trans AS DOUBLE) / SUM(n_trans) OVER (PARTITION BY event_type), 6) AS p_trans
FROM counts
""",
)
def ts_markov_transitions(spark, sf_dir):
    """First-order Markov transition matrix over per-user event sequences
    (what follows a signup? what precedes an error?). One user-keyed
    window builds the (from, to) pairs; the count table is bounded by
    type-cardinality² (≤25 rows here) at any event volume, so the
    row-normalizing second window is free. Deterministic sequence order
    via the (ts, event_id) tiebreak."""
    ev = t(spark, sf_dir, "events")
    seq = Window.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = (
        ev.select("event_type", F.lead("event_type").over(seq).alias("next_type"))
        .where(F.col("next_type").isNotNull())
    )
    counts = pairs.groupBy("event_type", "next_type").agg(F.count(F.lit(1)).alias("n_trans"))
    per_from = Window.partitionBy("event_type")
    return counts.select(
        "event_type",
        "next_type",
        "n_trans",
        F.round(F.col("n_trans").cast("double") / F.sum("n_trans").over(per_from), 6).alias("p_trans"),
    )


@register(
    "ts_rfm_segment",
    oracle=f"""
WITH anchor AS (
    SELECT MAX(CAST(ts AS DATE)) AS anchor_day FROM events
), per_user AS (
    SELECT user_id,
           date_diff('day', MAX(CAST(ts AS DATE)), (SELECT anchor_day FROM anchor)) AS recency_days,
           COUNT(*) AS frequency,
           ROUND(COALESCE({DSUM("CASE WHEN event_type = 'purchase' THEN value END")}, 0.0), 6) AS monetary
    FROM events GROUP BY user_id
)
SELECT user_id, recency_days, frequency, monetary,
       NTILE(4) OVER (ORDER BY recency_days ASC, user_id) AS r_q,
       NTILE(4) OVER (ORDER BY frequency DESC, user_id) AS f_q,
       NTILE(4) OVER (ORDER BY monetary DESC, user_id) AS m_q
FROM per_user
""",
)
def ts_rfm_segment(spark, sf_dir):
    """RFM (recency / frequency / monetary) segmentation — the classic
    churn-marketing readout the reference's predictions feed [SURVEY.md
    §1.1, unverified]. One event-table aggregate computes all three
    metrics; the three NTILE windows then sort only the per-user table.
    Quartile 1 = best (most recent / most frequent / highest spend);
    user_id tiebreaks make bucket assignment deterministic under ties.
    Monetary sums go through DECIMAL so both engines agree exactly."""
    ev = t(spark, sf_dir, "events")
    anchor = ev.agg(F.max(F.col("ts").cast("date")).alias("anchor_day"))
    per_user = (
        ev.groupBy("user_id")
        .agg(
            F.max(F.col("ts").cast("date")).alias("last_day"),
            F.count(F.lit(1)).alias("frequency"),
            F.round(
                F.coalesce(dsum(F.when(F.col("event_type") == "purchase", F.col("value"))), F.lit(0.0)), 6
            ).alias("monetary"),
        )
        .join(F.broadcast(anchor))
        .withColumn("recency_days", F.datediff("anchor_day", "last_day"))
    )
    return per_user.select(
        "user_id",
        "recency_days",
        "frequency",
        "monetary",
        F.ntile(4).over(Window.orderBy(F.asc("recency_days"), F.asc("user_id"))).alias("r_q"),
        F.ntile(4).over(Window.orderBy(F.desc("frequency"), F.asc("user_id"))).alias("f_q"),
        F.ntile(4).over(Window.orderBy(F.desc("monetary"), F.asc("user_id"))).alias("m_q"),
    )


@register(
    "ts_interval_merge",
    oracle="""
WITH iv AS (
    SELECT user_id, event_id,
           epoch_us(ts) AS start_us,
           epoch_us(ts) + 600000000 AS end_us
    FROM events
), flagged AS (
    SELECT user_id, event_id, start_us, end_us,
           CASE WHEN MAX(end_us) OVER (
                    PARTITION BY user_id ORDER BY start_us, event_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING
                ) >= start_us THEN 0 ELSE 1 END AS new_island
    FROM iv
), islands AS (
    SELECT user_id, start_us, end_us,
           SUM(new_island) OVER (
               PARTITION BY user_id ORDER BY start_us, event_id
               ROWS UNBOUNDED PRECEDING
           ) AS island_id
    FROM flagged
), merged AS (
    SELECT user_id, island_id, MIN(start_us) AS s, MAX(end_us) AS e
    FROM islands GROUP BY 1, 2
)
SELECT user_id,
       COUNT(*) AS n_intervals,
       CAST(SUM(e - s) // 1000000 AS BIGINT) AS covered_sec
FROM merged GROUP BY user_id
""",
)
def ts_interval_merge(spark, sf_dir):
    """Overlapping-interval union (gaps-and-islands on time ranges):
    each event opens a 10-minute presence interval; overlapping
    intervals merge, yielding per-user distinct presence spans and total
    covered wall-clock. The island key is `start > max(all previous
    ends)` — a running MAX window, not a self-join, so one user-keyed
    sort handles arbitrarily many overlaps. All arithmetic in integer
    microseconds: exact on both engines. Both window passes order by
    (start_us, event_id) — end_us is start_us+const here, so it cannot
    break start_us ties and the running sum would be nondeterministic
    without the unique event_id tiebreak. The oracle CASTs the covered
    seconds to BIGINT: DuckDB's SUM over BIGINT yields HUGEINT, which
    pandas would materialize as float64 and hash-mismatch Spark's int64."""
    ev = t(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ; unix_micros requires TIMESTAMP. The session zone
    # is pinned to UTC (catalog.py), so the cast is an exact relabel.
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    iv = ev.select(
        "user_id",
        "event_id",
        us.alias("start_us"),
        (us + F.lit(600_000_000)).alias("end_us"),
    )
    seq = Window.partitionBy("user_id").orderBy("start_us", "event_id")
    prev_end = F.max("end_us").over(seq.rowsBetween(Window.unboundedPreceding, -1))
    flagged = iv.withColumn(
        "new_island", F.when(prev_end >= F.col("start_us"), F.lit(0)).otherwise(F.lit(1))
    )
    runw = Window.partitionBy("user_id").orderBy("start_us", "event_id").rowsBetween(
        Window.unboundedPreceding, 0
    )
    islands = flagged.withColumn("island_id", F.sum("new_island").over(runw))
    merged = islands.groupBy("user_id", "island_id").agg(
        F.min("start_us").alias("s"), F.max("end_us").alias("e")
    )
    return merged.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_intervals"),
        F.expr("sum(e - s) div 1000000").cast("long").alias("covered_sec"),
    )


@register(
    "ts_decay_score",
    oracle="""
WITH anchor AS (
    SELECT MAX(CAST(ts AS DATE)) AS anchor_day FROM events
), terms AS (
    SELECT user_id,
           CAST(value * power(2.0, -date_diff('day', CAST(ts AS DATE), (SELECT anchor_day FROM anchor)))
                AS DECIMAL(38,18)) AS term
    FROM events
)
SELECT user_id,
       ROUND(CAST(SUM(term) AS DOUBLE), 6) AS decay_score
FROM terms GROUP BY user_id
""",
)
def ts_decay_score(spark, sf_dir):
    """Recency-decayed engagement score: Σ value · 2^(−age_days), a
    1-day half-life. Unlike ts_ewma's ordered fold this is an UNORDERED,
    map-combinable aggregate — the 100 TB-friendly form. Numeric
    discipline: 2^(−n) for integer n is an exact power of two in IEEE
    double, the per-row product is one deterministic multiply, and the
    sum runs in DECIMAL(38,18) so partition order cannot move the 6th
    decimal on either engine."""
    ev = t(spark, sf_dir, "events")
    anchor = ev.agg(F.max(F.col("ts").cast("date")).alias("anchor_day"))
    terms = ev.join(F.broadcast(anchor)).select(
        "user_id",
        (
            F.col("value") * F.pow(F.lit(2.0), -F.datediff("anchor_day", F.col("ts").cast("date")))
        ).cast("decimal(38,18)").alias("term"),
    )
    return terms.groupBy("user_id").agg(
        F.round(F.sum("term").cast("double"), 6).alias("decay_score")
    )


@register(
    "ts_calendar_dim",
    oracle="""
WITH span AS (
    SELECT MIN(CAST(o_orderdate AS DATE)) AS d0, MAX(CAST(o_orderdate AS DATE)) AS d1 FROM orders
), cal AS (
    SELECT CAST(unnest(range(CAST(d0 AS TIMESTAMP), CAST(d1 AS TIMESTAMP) + INTERVAL 1 DAY,
                             INTERVAL 1 DAY)) AS DATE) AS day
    FROM span
)
SELECT day,
       year(day) AS yr,
       quarter(day) AS qtr,
       month(day) AS mth,
       week(day) AS iso_week,
       dayofweek(day) + 1 AS dow,
       CASE WHEN dayofweek(day) IN (0, 6) THEN 1 ELSE 0 END AS is_weekend,
       CASE WHEN day = date_trunc('month', day) THEN 1 ELSE 0 END AS is_month_start
FROM cal
""",
)
def ts_calendar_dim(spark, sf_dir):
    """Calendar-dimension synthesis over the fact table's date span —
    the spine every gap-fill / cohort / seasonality query joins against.
    Generated executor-side from one 2-value aggregate via
    sequence+explode (zero I/O, ~2400 rows for the orders span at any
    fact-table scale). Day-of-week uses Spark's 1=Sunday numbering; the
    oracle shifts DuckDB's 0=Sunday to match (SURVEY.md §2.M
    ts_traffic_profile precedent). ISO week agrees natively."""
    orders = t(spark, sf_dir, "orders")
    span = orders.agg(
        F.min(F.col("o_orderdate").cast("date")).alias("d0"),
        F.max(F.col("o_orderdate").cast("date")).alias("d1"),
    )
    cal = span.select(
        F.explode(F.sequence("d0", "d1", F.expr("interval 1 day"))).alias("day")
    )
    return cal.select(
        "day",
        F.year("day").alias("yr"),
        F.quarter("day").alias("qtr"),
        F.month("day").alias("mth"),
        F.weekofyear("day").alias("iso_week"),
        F.dayofweek("day").alias("dow"),
        F.when(F.dayofweek("day").isin(1, 7), F.lit(1)).otherwise(F.lit(0)).alias("is_weekend"),
        F.when(F.col("day") == F.date_trunc("month", "day").cast("date"), F.lit(1))
        .otherwise(F.lit(0))
        .alias("is_month_start"),
    )
