"""Round-7 operator invariants: COW MERGE and proto3 wire round-trip."""

from __future__ import annotations

import io
from contextlib import redirect_stdout

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.registry import get_queries

_Q = get_queries()


def test_merge_into_rewrites_only_touched_months(spark, sf_dir):
    from morphl_model_publishers_churning_users_spark.operators._shared import t

    out = _Q["sink_merge_into"](spark, sf_dir)
    rows = {r["ym"]: r for r in out.collect()}
    # Expected touched set, recomputed independently: months holding a
    # matched key (update %7 / delete %13 within the 1999-06+ source
    # window) plus months receiving inserts (2001-06+). Everything
    # else must survive the MERGE untouched (COW partition pruning) —
    # in particular every month before 1999-06.
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey",
        F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
        "o_orderdate",
    )
    cutoff = F.lit("1999-06-01").cast("timestamp_ntz")
    matched = (
        o.filter(
            (F.col("o_orderdate") >= cutoff)
            & ((F.col("o_orderkey") % 7 == 0) | (F.col("o_orderkey") % 13 == 0))
        )
        .select("ym")
    )
    inserted = o.filter(
        F.col("o_orderdate") >= F.lit("2001-06-01").cast("timestamp_ntz")
    ).select("ym")
    expected = {r["ym"] for r in matched.unionByName(inserted).distinct().collect()}
    got = {ym for ym, r in rows.items() if r["was_rewritten"]}
    assert got == expected
    assert all(ym >= "1999-06" for ym in got)
    assert any(ym < "1999-06" for ym in rows)  # untouched months exist


def test_merge_into_delete_beats_update_on_collision(spark, sf_dir):
    # Keys ≡ 0 (mod 91) match BOTH the update (%7) and delete (%13)
    # source: MERGE clause order says delete wins, so none may survive.
    from morphl_model_publishers_churning_users_spark.operators._shared import scratch_dir, t

    _Q["sink_merge_into"](spark, sf_dir).count()  # runs the merge
    back = spark.read.parquet(scratch_dir("merge_into_target"))
    cutoff = F.lit("1999-06-01").cast("timestamp_ntz")
    collided = (
        t(spark, sf_dir, "orders")
        .filter((F.col("o_orderdate") >= cutoff) & (F.col("o_orderkey") % 91 == 0))
        .select("o_orderkey")
    )
    survivors = back.join(collided, "o_orderkey", "left_semi").count()
    assert collided.count() > 0  # the collision class is non-empty
    assert survivors == 0


def test_merge_into_emptied_partition_does_not_resurrect(spark):
    """ADVICE r7: with partitionOverwriteMode=dynamic, a touched month
    whose rewrite yields ZERO rows is never overwritten, so its
    pre-merge files would survive and deleted rows resurrect. The
    _cow_merge kernel must drop such stale partition dirs. Synthetic
    target (untriggerable at fixture scale): month 2020-01 has two
    rows, BOTH deleted; month 2020-02 gets a normal update."""
    import shutil

    from morphl_model_publishers_churning_users_spark.operators.scans import _cow_merge
    from morphl_model_publishers_churning_users_spark.operators._shared import scratch_dir

    tbl = scratch_dir("merge_into_empty_month_test")
    shutil.rmtree(tbl, ignore_errors=True)
    target = spark.createDataFrame(
        [(1, "2020-01", 10.0), (2, "2020-01", 20.0), (3, "2020-02", 30.0), (4, "2020-03", 40.0)],
        "o_orderkey bigint, ym string, price double",
    )
    target.write.mode("overwrite").partitionBy("ym").parquet(tbl)
    src_upd = spark.createDataFrame([(3, 33.0)], "o_orderkey bigint, new_price double")
    src_del = spark.createDataFrame([(1,), (2,)], "o_orderkey bigint")
    src_ins = spark.createDataFrame([], "o_orderkey bigint, ym string, price double")

    back, touched = _cow_merge(spark, tbl, src_upd, src_del, src_ins)
    rows = {(r["o_orderkey"], r["ym"], r["price"]) for r in back.collect()}
    assert rows == {(3, "2020-02", 33.0), (4, "2020-03", 40.0)}, rows
    assert {r["ym"] for r in touched.collect()} == {"2020-01", "2020-02"}


def test_merge_into_rejects_non_ym_partition_cleanup(spark):
    """ADVICE r8: _cow_merge's stale-partition cleanup path is built
    from DATA-derived ym values — a value outside the YYYY-MM shape
    (here a traversal-shaped one) must abort the merge with ValueError
    BEFORE any rmtree, never compose a filesystem path from it."""
    import shutil

    import pytest

    from morphl_model_publishers_churning_users_spark.operators.scans import _cow_merge
    from morphl_model_publishers_churning_users_spark.operators._shared import scratch_dir

    tbl = scratch_dir("merge_into_hostile_ym_test")
    shutil.rmtree(tbl, ignore_errors=True)
    target = spark.createDataFrame(
        [(1, "..__x", 10.0), (3, "2020-02", 30.0)],
        "o_orderkey bigint, ym string, price double",
    )
    target.write.mode("overwrite").partitionBy("ym").parquet(tbl)
    src_upd = spark.createDataFrame([], "o_orderkey bigint, new_price double")
    src_del = spark.createDataFrame([(1,)], "o_orderkey bigint")  # empties ..__x
    src_ins = spark.createDataFrame([], "o_orderkey bigint, ym string, price double")

    with pytest.raises(ValueError, match="non-YYYY-MM"):
        _cow_merge(spark, tbl, src_upd, src_del, src_ins)
    # the hostile partition dir is untouched — nothing was rmtree'd
    assert spark.read.parquet(tbl).filter(F.col("ym") == "..__x").count() == 1


def test_protobuf_wire_roundtrip_every_row(spark, sf_dir):
    out = _Q["fn_protobuf_wire"](spark, sf_dir)
    n = out.count()
    assert n > 0
    assert out.filter(~F.col("roundtrip_ok")).count() == 0


def test_protobuf_wire_zero_shuffle(spark, sf_dir):
    """Encode+decode is a narrow projection — no Exchange in the plan
    (the 100 TB interchange fast path rides the scan)."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        _Q["fn_protobuf_wire"](spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "CartesianProduct" not in plan


def test_protobuf_wire_varint_boundaries(spark):
    """"fn_protobuf_wire" roundtrip_ok backing invariant: the operator's
    own varint encode/decode at every limb boundary
    across the FULL non-negative bigint domain — including 2^28, where
    the pre-r8 4-limb ladder silently truncated (ADVICE r7), and the
    2^63-1 max. Encoded bytes must match a reference Python varint and
    _pb_vval(payload) must invert _pb_varint exactly."""
    from morphl_model_publishers_churning_users_spark.functions.scalar import (
        _pb_varint,
        _pb_vlen,
        _pb_vval,
    )

    vals = [0, 1, 127, 128, 16383, 16384, 2097151, 2097152]
    for k in range(4, 9):  # 2^(7k)-1 / 2^(7k) limb boundaries
        vals += [(1 << (7 * k)) - 1, 1 << (7 * k)]
    vals += [1 << 28, (1 << 35) - 1, 1 << 62, (1 << 63) - 1]
    vals = sorted(set(vals))
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    out = df.select(
        "v", _pb_varint(F.col("v")).alias("payload")
    ).select(
        "v",
        "payload",
        F.length("payload").alias("n"),
        _pb_vval(F.lit(1)).alias("back"),
        _pb_vlen(F.lit(1)).alias("vl"),
    )
    got = {r["v"]: r for r in out.collect()}

    def ref_varint(x):
        out = bytearray()
        while True:
            b = x & 0x7F
            x >>= 7
            if x:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    for x in vals:
        r = got[x]
        assert bytes(r["payload"]) == ref_varint(x), x
        assert r["n"] == len(ref_varint(x)), x
        assert r["back"] == x, (x, r["back"])
        assert r["vl"] == len(ref_varint(x)), x

    # Negative input (outside the proto3 unsigned domain) must be NULL,
    # never silently-corrupt bytes.
    neg = spark.createDataFrame([(-1,)], "v bigint").select(
        _pb_varint(F.col("v")).alias("payload")
    ).collect()
    assert neg[0]["payload"] is None
