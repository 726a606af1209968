"""Semantic invariants for the nine streaming registry keys — each
streaming query drains the staged file stream with AvailableNow and
must land on the BATCH answer (the exactly-once contract made
checkable): counts, sums, and session totals are re-derived from the
events table with plain batch expressions. Slower than the batch
invariant files (each test runs a real micro-batch query); still well
inside the suite budget."""

from __future__ import annotations

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.operators._shared import t
from morphl_model_publishers_churning_users_spark.registry import get_queries

_Q = get_queries()


def _df(spark, sf_dir, key):
    return _Q[key](spark, sf_dir)


def _type_counts(spark, sf_dir):
    return {
        r["event_type"]: r["n"]
        for r in t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }


def test_source_stream_profile_equals_batch(spark, sf_dir):
    got = {r["event_type"]: r["n_events"] for r in _df(spark, sf_dir, "source_stream").collect()}
    assert got == _type_counts(spark, sf_dir)


def test_watermark_tumbling_agg_equals_batch(spark, sf_dir):
    rows = _df(spark, sf_dir, "ts_watermark").collect()
    ev = t(spark, sf_dir, "events")
    expect = {
        r["d"]: (r["n"], r["s"])
        for r in ev.groupBy(F.to_date("ts").alias("d"))
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(38,6)")).cast("double"), 6).alias("s"),
        )
        .collect()
    }
    assert {r["day_start"] for r in rows} == set(expect)
    for r in rows:
        n, s = expect[r["day_start"]]
        assert r["n_events"] == n
        assert abs(r["sum_value"] - s) < 1e-4


def test_dedup_stream_collapses_replayed_ids_to_batch_counts(spark, sf_dir):
    got = {r["event_type"]: r["n_events"] for r in _df(spark, sf_dir, "ts_dedup_stream").collect()}
    # The staged stream replays duplicates; dropDuplicates on event_id
    # within the watermark must land on the exact batch profile.
    assert got == _type_counts(spark, sf_dir)


def test_stateful_per_user_state_equals_batch_totals(spark, sf_dir):
    rows = _df(spark, sf_dir, "ts_stateful").collect()
    ev = t(spark, sf_dir, "events")
    expect = {
        r["user_id"]: (r["n"], r["s"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(38,6)")).cast("double"), 6).alias("s"),
        )
        .collect()
    }
    assert {r["user_id"] for r in rows} == set(expect)
    for r in rows:
        n, s = expect[r["user_id"]]
        assert r["n_events"] == n
        assert abs(r["sum_value"] - s) < 1e-4


def test_incremental_daily_counts_equal_batch(spark, sf_dir):
    rows = _df(spark, sf_dir, "ts_incremental").collect()
    ev = t(spark, sf_dir, "events")
    expect = {
        r["d"]: r["n"]
        for r in ev.groupBy(F.to_date("ts").alias("d")).agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert {r["day_start"]: r["n_events"] for r in rows} == expect


def test_session_stream_conserves_the_batch_sessionization(spark, sf_dir):
    d = _df(spark, sf_dir, "ts_session_stream")
    # Streaming session windows must produce the same session count
    # and the same total events as the batch twin.
    batch = _df(spark, sf_dir, "ts_session")
    assert d.count() == batch.count()
    ev = t(spark, sf_dir, "events")
    assert d.agg(F.sum("n_events")).collect()[0][0] == ev.count()
    assert d.filter(F.col("n_events") < 1).count() == 0


def test_stream_static_join_conserves_events_across_nations(spark, sf_dir):
    rows = _df(spark, sf_dir, "ts_stream_join").collect()
    ev = t(spark, sf_dir, "events")
    # Stream-static enrichment loses nothing: events distribute across
    # nations and total back exactly (every user maps to a nation).
    assert sum(r["n_events"] for r in rows) == ev.count()
    nations = {r["n_name"] for r in t(spark, sf_dir, "nation").select("n_name").collect()}
    assert {r["n_name"] for r in rows} <= nations
    total = ev.agg(F.sum(F.col("value").cast("decimal(38,6)")).cast("double")).collect()[0][0]
    assert abs(sum(r["sum_value"] for r in rows) - total) < 1e-2


def test_stream_upsert_sink_latest_state_equals_batch(spark, sf_dir):
    rows = _df(spark, sf_dir, "sink_stream_upsert").collect()
    ev = t(spark, sf_dir, "events")
    expect = {
        r["user_id"]: (r["n"], r["s"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("value").cast("decimal(38,6)")).cast("double"), 6).alias("s"),
        )
        .collect()
    }
    # The foreachBatch MERGE keeps exactly one latest row per key —
    # identical to the batch aggregate after the final micro-batch.
    assert {r["user_id"] for r in rows} == set(expect)
    for r in rows:
        n, s = expect[r["user_id"]]
        assert r["n_events"] == n
        assert abs(r["sum_value"] - s) < 1e-4


def test_stream_stream_join_pairs_are_real_and_in_window(spark, sf_dir):
    rows = _df(spark, sf_dir, "ts_stream_stream_join").collect()
    ev = t(spark, sf_dir, "events")
    by_id = {
        r["event_id"]: r
        for r in ev.select("event_id", "user_id", "event_type", "ts").collect()
    }
    assert len(rows) >= 1
    seen = set()
    for r in rows:
        c, p = by_id[r["click_id"]], by_id[r["purchase_id"]]
        assert c["event_type"] == "click" and p["event_type"] == "purchase"
        assert c["user_id"] == r["user_id"] == p["user_id"]
        # The interval condition: the click precedes the purchase
        # within the join's declared window (1 hour).
        dt_s = (p["ts"] - c["ts"]).total_seconds()
        assert 0 <= dt_s <= 3600 + 1e-6
        seen.add((r["click_id"], r["purchase_id"]))
    assert len(seen) == len(rows)
