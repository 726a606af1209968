"""Semantic invariants for the round-12-window keys — the final slice
of the staged driver-verification queue (scalar fn_* surfaces, the
interchange source_* trio, the streaming sliding window, and the two
remaining udf/window keys). With this file every key in the staged
queue has a dedicated semantic test beyond oracle-hash parity."""

from __future__ import annotations

import base64
import calendar
import re

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.operators._shared import t
from morphl_model_publishers_churning_users_spark.registry import get_queries

_Q = get_queries()


def _df(spark, sf_dir, key):
    return _Q[key](spark, sf_dir)


def test_pandas_struct_udf_agrees_with_codegen_recount(spark, sf_dir):
    d = _df(spark, sf_dir, "udf_pandas_struct").alias("u")
    docs = t(spark, sf_dir, "documents").alias("d")
    assert d.count() == docs.count()
    j = d.join(docs, F.col("u.doc_id") == F.col("d.doc_id"))
    # The Arrow-batched struct UDF must agree with the JVM expressions
    # it replaces: exact char count, positive word count, and the ratio
    # recomputable from its own two integers.
    assert j.filter(F.col("u.n_chars") != F.length("d.text")).count() == 0
    assert j.filter(F.col("u.n_words") < 1).count() == 0
    assert (
        j.filter(
            F.abs(
                F.col("u.chars_per_word")
                - F.col("u.n_chars") / F.col("u.n_words")
            )
            > 1e-5
        ).count()
        == 0
    )


def test_expanding_slope_emits_from_the_second_day_per_type(spark, sf_dir):
    rows = _df(spark, sf_dir, "win_expanding_slope").collect()
    per_type_days = {
        r["event_type"]: r["nd"]
        for r in t(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct(F.to_date("ts")).alias("nd"))
        .collect()
    }
    got = {}
    for r in rows:
        assert r["slope"] is not None
        got[r["event_type"]] = got.get(r["event_type"], 0) + 1
    # An expanding OLS needs n >= 2 points: exactly (days - 1) rows per
    # type, each a distinct day.
    assert got == {k: v - 1 for k, v in per_type_days.items() if v >= 2}
    seen = {(r["event_type"], r["d"]) for r in rows}
    assert len(seen) == len(rows)


def test_regex_surface_internal_consistency(spark, sf_dir):
    rows = _df(spark, sf_dir, "fn_regex").limit(200).collect()
    for r in rows:
        if r["long_words"]:
            assert all(
                len(w) >= 4 and w == w.lower() for w in r["long_words"].split(",")
            )
        assert r["n_the"] >= 0
        if r["second_word"] is not None:
            assert " " not in r["second_word"]
        if r["snake_head"] is not None:
            assert re.fullmatch(r"[a-z0-9_]+", r["snake_head"])


def test_interval_arithmetic_identities(spark, sf_dir):
    d = _df(spark, sf_dir, "fn_interval").alias("i")
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", F.to_date("o_orderdate").alias("od")
    ).alias("o")
    j = d.join(o, "o_orderkey")
    # Re-derive each output from the source date with independent
    # expressions: day offsets exact, month adds calendar-clamped,
    # boundaries on real month/quarter starts.
    assert j.filter(F.col("minus_45d") != F.date_sub("od", 45)).count() == 0
    assert j.filter(F.col("plus_3mo") != F.add_months("od", 3)).count() == 0
    assert j.filter(F.col("month_end") != F.last_day("od")).count() == 0
    assert j.filter(F.to_date("plus_150min") != F.col("od")).count() == 0
    assert (
        j.filter(
            (F.month("quarter_start") % 3 != 1)
            | (F.dayofmonth("quarter_start") != 1)
            | (F.col("quarter_start") > F.col("od"))
            | (F.months_between(F.col("od"), F.col("quarter_start")) >= 3)
        ).count()
        == 0
    )


def test_string_extra_surface_against_source_columns(spark, sf_dir):
    d = _df(spark, sf_dir, "fn_string_extra").alias("x")
    docs = t(spark, sf_dir, "documents").alias("d")
    j = d.join(docs, F.col("x.doc_id") == F.col("d.doc_id"))
    assert j.filter(F.col("lang_title") != F.initcap("d.lang")).count() == 0
    assert j.filter(F.col("lang_rev") != F.reverse(F.lower("d.lang"))).count() == 0
    assert (
        j.filter(F.col("source_twice") != F.concat("d.source", "d.source")).count()
        == 0
    )
    assert j.filter(F.length("lang_lpad") != 6).count() == 0
    assert j.filter(F.length("source_rpad") != 8).count() == 0
    assert j.filter(F.length("head12") > 12).count() == 0
    assert j.filter(F.col("src_tail2") != F.substring("d.source", -2, 2)).count() == 0


def test_trig_pythagorean_and_unit_identities(spark, sf_dir):
    d = _df(spark, sf_dir, "fn_trig")
    pyth = F.abs(
        F.col("sin_v") * F.col("sin_v") + F.col("cos_v") * F.col("cos_v") - 1.0
    )
    assert d.filter(pyth > 1e-6).count() == 0
    assert d.filter(
        F.abs(F.col("at2_deg") - F.degrees(F.col("at2"))) > 1e-4
    ).count() == 0
    import math

    assert d.filter(
        (F.col("at2") < -math.pi - 1e-9) | (F.col("at2") > math.pi + 1e-9)
    ).count() == 0
    assert d.filter((F.col("decay") <= 0) | (F.col("decay") > 1.0 + 1e-9)).count() == 0


def test_surrogate_keys_are_well_formed_and_collision_free(spark, sf_dir):
    d = _df(spark, sf_dir, "fn_surrogate_key")
    n = d.count()
    assert n == t(spark, sf_dir, "orders").count()
    # UUID shape and the 64-bit key both stay collision-free over the
    # fixture keyspace (xxhash/sha-derived — a collision here means the
    # derivation broke, not bad luck).
    assert (
        d.filter(
            ~F.col("sk_uuid").rlike(r"^[0-9a-f]{8}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{4}-[0-9a-f]{12}$")
        ).count()
        == 0
    )
    agg = d.agg(
        F.countDistinct("sk_uuid").alias("u"), F.countDistinct("sk_int").alias("i")
    ).collect()[0]
    assert agg["u"] == n and agg["i"] == n


def test_ipv4_subnet_rollup_bit_consistency(spark, sf_dir):
    rows = _df(spark, sf_dir, "fn_ipv4_subnet").collect()
    for r in rows:
        assert 0 <= r["octet1"] <= 255
        assert 1 <= r["n_subnet16"] <= r["n_users"]
        # The /8 bucket is literally the top octet of the group's ips.
        assert (r["min_ip32"] >> 24) == r["octet1"]


def test_binary_surface_roundtrips_through_python_base64(spark, sf_dir):
    # b64 encodes the first-12-char prefix, hex4 the first 4 bytes, and
    # n_bytes is the FULL payload's byte length — cross-check all three
    # with an independent Python decode against the source text.
    d = _df(spark, sf_dir, "fn_binary").alias("b")
    docs = t(spark, sf_dir, "documents").alias("d")
    rows = (
        d.join(docs, F.col("b.doc_id") == F.col("d.doc_id"))
        .select("b64", "n_bytes", "hex4", "d.text")
        .limit(100)
        .collect()
    )
    assert len(rows) >= 1
    for r in rows:
        raw = base64.b64decode(r["b64"])
        assert raw == r["text"][:12].encode("utf-8")
        assert r["n_bytes"] == len(r["text"].encode("utf-8"))
        assert raw[:4].hex() == r["hex4"].lower()


def test_geohash_cells_prefix_their_z_range(spark, sf_dir):
    rows = _df(spark, sf_dir, "fn_geohash_interleave").collect()
    total = 0
    for r in rows:
        assert r["min_z"] <= r["max_z"]
        # The coarse cell is the shared prefix of every z-value in it —
        # the property that makes Z-order range scans prune.
        assert (r["min_z"] >> 24) == r["cell8"] == (r["max_z"] >> 24)
        total += r["n_points"]
    assert total >= len(rows)


def test_hash_collision_counts_decrease_with_prefix_width(spark, sf_dir):
    r = _df(spark, sf_dir, "fn_hash_collision_audit").collect()[0]
    assert r["n_keys"] == t(spark, sf_dir, "orders").count()
    # Widening the prefix can only remove collisions.
    assert (
        r["coll_4hex"] >= r["coll_6hex"] >= r["coll_8hex"] >= r["coll_12hex"] >= 0
    )


def test_uuidv7_roundtrip_is_total_and_time_ordered(spark, sf_dir):
    r = _df(spark, sf_dir, "fn_uuidv7_roundtrip").collect()[0]
    assert r["n_roundtrip_ok"] == r["n_ids"] == r["n_distinct"]
    # Timestamps extracted back out of the v7 ids live in the fixture's
    # event window (Jan 2024), and the extremes are ordered.
    jan1 = 1704067200000
    mar1 = 1709251200000
    assert jan1 <= r["min_ms"] <= r["max_ms"] < mar1


def test_tsv_roundtrip_matches_customer_profile(spark, sf_dir):
    got = {
        r["c_mktsegment"]: (r["n_rows"], r["sum_bal"])
        for r in _df(spark, sf_dir, "source_tsv").collect()
    }
    src = {
        r["c_mktsegment"]: (r["n"], r["s"])
        for r in t(spark, sf_dir, "customer")
        .groupBy("c_mktsegment")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.round(F.sum(F.col("c_acctbal").cast("decimal(38,6)")).cast("double"), 6).alias("s"),
        )
        .collect()
    }
    assert set(got) == set(src)
    for k in got:
        assert got[k][0] == src[k][0]
        assert abs(got[k][1] - src[k][1]) < 1e-4


def test_text_lines_histogram_conserves_documents(spark, sf_dir):
    rows = _df(spark, sf_dir, "source_text_lines").collect()
    # One flattened line per document: the histogram masses sum back to
    # the corpus size, and every line tokenizes to >= 1 token.
    assert sum(r["n_lines"] for r in rows) == t(spark, sf_dir, "documents").count()
    assert all(r["n_tokens"] >= 1 and r["n_lines"] >= 1 for r in rows)


def test_json_multiline_profile_matches_documents(spark, sf_dir):
    got = {
        r["lang"]: (r["n_docs"], r["total_chars"])
        for r in _df(spark, sf_dir, "source_json_multiline").collect()
    }
    src = {
        r["lang"]: (r["n"], r["c"])
        for r in t(spark, sf_dir, "documents")
        .groupBy("lang")
        .agg(F.count(F.lit(1)).alias("n"), F.sum(F.length("text")).alias("c"))
        .collect()
    }
    assert got == src


def test_stream_sliding_fans_each_event_into_exactly_two_windows(spark, sf_dir):
    rows = _df(spark, sf_dir, "ts_stream_sliding").collect()
    ev = t(spark, sf_dir, "events")
    n_events = ev.count()
    n_days = ev.select(F.to_date("ts")).distinct().count()
    # 2-day window, 1-day slide: every event lands in exactly 2 windows.
    assert sum(r["n_events"] for r in rows) == 2 * n_events
    # Contiguous daily fixture: day-grain starts span days + 1 windows.
    assert len(rows) == n_days + 1
    assert len({r["win_start"] for r in rows}) == len(rows)
    total_value = ev.agg(
        F.sum(F.col("value").cast("decimal(38,6)")).cast("double")
    ).collect()[0][0]
    assert abs(sum(r["sum_value"] for r in rows) - 2 * total_value) < 1e-2


def test_rate_stream_emits_the_exact_arithmetic_series(spark, sf_dir):
    r = _df(spark, sf_dir, "source_rate_stream").collect()[0]
    n = r["n_rows"]
    assert n >= 1 and r["n_batches"] >= 1
    # The rate source emits value = 0..n-1: the sum is the exact
    # triangular number — any dropped or duplicated micro-batch row
    # breaks it.
    assert r["sum_vals"] == n * (n - 1) // 2
