"""Round-13 stretch operators: scan_delta_deletion_vectors (DV-aware
Delta read — tombstone sidecar + broadcast anti-join instead of file
rewrite) and fn_avro_map_blocks (Avro map block encoding with the
data-dependent key-length cursor advance) — semantic invariants beyond
oracle parity, checked against the ON-DISK commit log / a pure-Python
spec-level codec, not the operators' own aggregates."""

from __future__ import annotations

import io
import json
import os
from contextlib import redirect_stdout

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.registry import get_queries

_Q = get_queries()


# ---------------------------------------------------------------------------
# scan_delta_deletion_vectors


def _read_log(log_dir):
    adds, removes = [], []
    for fname in sorted(os.listdir(log_dir)):
        if not fname.endswith(".json"):
            continue
        v = int(fname.split(".")[0])
        with open(os.path.join(log_dir, fname)) as f:
            for line in f:
                a = json.loads(line)
                if "add" in a:
                    adds.append((v, a["add"]))
                if "remove" in a:
                    removes.append((v, a["remove"]))
    return adds, removes


def test_dv_on_disk_shape(spark, sf_dir):
    """The DELETE commit must be remove-free: v0 writes 8 plain adds,
    v1 RE-adds only the touched files (same path, dataChange=false)
    each carrying a deletionVector descriptor whose cardinality totals
    the sidecar's row count — the O(deleted)-not-O(table) contract."""
    from morphl_model_publishers_churning_users_spark.operators._shared import (
        scratch_dir,
    )

    _Q["scan_delta_deletion_vectors"](spark, sf_dir).collect()
    tbl = scratch_dir("delta_deletion_vectors_table")
    adds, removes = _read_log(os.path.join(tbl, "_delta_log"))

    v0 = [a for v, a in adds if v == 0]
    v1 = [a for v, a in adds if v == 1]
    assert len(v0) == 8 and not removes  # remove-free DELETE
    assert all("deletionVector" not in a for a in v0)
    assert v1, "no file was touched by the delete at this sf"
    v0_paths = {a["path"] for a in v0}
    for a in v1:
        assert a["path"] in v0_paths  # same bytes, re-referenced
        assert a["dataChange"] is False
        dv = a["deletionVector"]
        assert dv["storageType"] == "u" and dv["pathOrInlineDv"] == "dv"
        assert dv["cardinality"] > 0

    sidecar = spark.read.parquet(os.path.join(tbl, "dv"))
    assert set(sidecar.columns) == {"fp", "ri"}
    assert sidecar.count() == sum(a["deletionVector"]["cardinality"] for a in v1)
    # sidecar bytes are O(deleted): orders of magnitude under the data
    dv_bytes = sum(
        os.path.getsize(os.path.join(tbl, "dv", f))
        for f in os.listdir(os.path.join(tbl, "dv"))
    )
    data_bytes = sum(a["size"] for a in v0)
    assert dv_bytes < data_bytes / 10


def test_dv_read_plans_as_broadcast_anti_join(spark, sf_dir):
    """100 TB posture: the tombstone filter must be a BROADCAST left-
    anti hash join — a plan that shuffles the whole data side to drop
    0.1% of it is the scale bug the DV design exists to avoid."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        _Q["scan_delta_deletion_vectors"](spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    assert "BroadcastHashJoin" in plan and "LeftAnti" in plan, plan
    assert "SortMergeJoin" not in plan
    # no hash-exchange of the scanned data below the anti-join: the only
    # allowed exchanges are the broadcast itself and the final aggregate
    pre_join = plan.split("BroadcastHashJoin")[0]
    assert "Exchange hashpartitioning" not in pre_join, plan


def test_dv_tombstones_match_independent_scan(spark, sf_dir):
    """Row-index stability, asserted from OUTSIDE the operator: an
    independent scan with a DIFFERENT projection must derive exactly
    the sidecar's (file, row_index) set — the property that lets a DV
    computed in one scan land on the right rows in another."""
    from morphl_model_publishers_churning_users_spark.operators._shared import (
        scratch_dir,
    )

    rows = _Q["scan_delta_deletion_vectors"](spark, sf_dir).collect()
    assert rows and all(r["dv_ok"] for r in rows)
    tbl = scratch_dir("delta_deletion_vectors_table")

    sidecar = {
        (r["fp"], r["ri"])
        for r in spark.read.parquet(os.path.join(tbl, "dv")).collect()
    }
    independent = {
        (r["fp"], r["ri"])
        for r in spark.read.parquet(os.path.join(tbl, "data", "v0"))
        .select(
            F.col("_metadata.file_path").alias("fp"),
            F.col("_metadata.row_index").alias("ri"),
            "l_orderkey",
            "l_returnflag",  # wider projection than the op's DV scan
        )
        .filter(F.col("l_orderkey") % 997 == 0)
        .select("fp", "ri")
        .collect()
    }
    assert sidecar == independent
    # every tombstoned file is a descriptor-carrying live file
    adds, _ = _read_log(os.path.join(tbl, "_delta_log"))
    dv_paths = {
        "file:" + os.path.join(tbl, a["path"])
        for _, a in adds
        if "deletionVector" in a
    }
    assert {fp for fp, _ in sidecar} == dv_paths


def test_dv_survivors_equal_direct_filter(spark, sf_dir):
    """End to end: the DV read's per-flag counts must equal a direct
    filter(NOT pred) of the source — recomputed here independently."""
    from morphl_model_publishers_churning_users_spark.operators._shared import t

    got = {
        r["l_returnflag"]: r["n_rows"]
        for r in _Q["scan_delta_deletion_vectors"](spark, sf_dir).collect()
    }
    want = {
        r["l_returnflag"]: r["n"]
        for r in t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey") % 997 != 0)
        .groupBy("l_returnflag")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == want


# ---------------------------------------------------------------------------
# fn_avro_map_blocks


def _py_zigzag(n: int) -> int:
    return 2 * n if n >= 0 else -2 * n - 1


def _py_varint(u: int) -> bytes:
    out = bytearray()
    while True:
        b = u & 0x7F
        u >>= 7
        if u:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _py_avro_long(v: int) -> bytes:
    # uint64 wire domain: zigzag of |v| >= 2^62 exceeds 2^63 and wraps
    # into the 10-limb form — mask to 64 bits like the engine's carrier
    return _py_varint(_py_zigzag(v) & ((1 << 64) - 1))


def _py_entry(k: str, v: int) -> bytes:
    kb = k.encode("utf-8")
    return _py_avro_long(len(kb)) + kb + _py_avro_long(v)


def _py_map_blocks(key: int, items: list) -> bytes:
    """Spec encoder for record{key: long, attrs: map<string,long>} in
    the operator's two-block layout: positive-count block 1 with the
    first min(n,2) (key-sorted) entries, negative-count size-prefixed
    block 2 with the rest, 0x00 terminator."""
    out = _py_avro_long(key)
    out += _py_avro_long(min(len(items), 2))
    out += b"".join(_py_entry(k, v) for k, v in items[:2])
    if len(items) > 2:
        body = b"".join(_py_entry(k, v) for k, v in items[2:])
        out += _py_avro_long(-(len(items) - 2))
        out += _py_avro_long(len(body))
        out += body
    return out + b"\x00"


def test_map_blocks_matches_python_encoder(spark, sf_dir):
    """Counts, key-byte totals, value sums, wire length, and block
    arithmetic must agree row-for-row with the independent Python
    encoder over the same key-sorted per-customer maps."""
    from morphl_model_publishers_churning_users_spark.operators._shared import t

    out = {
        r["o_custkey"]: r
        for r in _Q["fn_avro_map_blocks"](spark, sf_dir)
        .orderBy("o_custkey")
        .limit(150)
        .collect()
    }
    assert out and all(r["map_ok"] for r in out.values())
    # the sample must exercise BOTH wire forms
    assert {r["n_blocks"] for r in out.values()} == {1, 2}

    rows = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_custkey").isin(*list(out)))
        .select(
            F.col("o_custkey").cast("bigint").alias("c"),
            F.col("o_orderpriority").alias("k"),
            (
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
                - 15000000
            ).alias("v"),
        )
        .collect()
    )
    per: dict[int, dict] = {}
    for r in rows:
        per.setdefault(r["c"], {}).setdefault(r["k"], 0)
        per[r["c"]][r["k"]] += r["v"]
    assert set(per) == set(out)
    for c, m in per.items():
        items = sorted(m.items())
        wire = _py_map_blocks(c, items)
        got = out[c]
        assert got["n_entries"] == len(items)
        assert got["key_bytes"] == sum(len(k.encode()) for k, _ in items)
        assert got["sum_vals"] == sum(v for _, v in items)
        assert got["wire_len"] == len(wire)
        assert got["n_blocks"] == (2 if len(items) > 2 else 1)
        if len(items) > 2:
            body = b"".join(_py_entry(k, v) for k, v in items[2:])
            assert got["block2_size"] == len(body)
        else:
            assert got["block2_size"] is None


def test_map_blocks_fast_skip_decodes_standalone(spark, sf_dir):
    """The negative-count form must be skippable WITHOUT entry decode:
    a pure-Python reader that walks block 1 entry by entry (variable
    key advance) then jumps block 2 using ONLY the size prefix must
    land exactly on the terminator."""
    from morphl_model_publishers_churning_users_spark.operators._shared import t

    rows = (
        t(spark, sf_dir, "orders")
        .select(
            F.col("o_custkey").cast("bigint").alias("c"),
            F.col("o_orderpriority").alias("k"),
            (
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
                - 15000000
            ).alias("v"),
        )
        .groupBy("c", "k")
        .agg(F.sum("v").alias("v"))
        .groupBy("c")
        .agg(F.sort_array(F.collect_list(F.struct("k", "v"))).alias("es"))
        .orderBy("c")
        .limit(50)
        .collect()
    )
    assert rows

    def read_varint(buf, pos):
        shift = u = 0
        while True:
            b = buf[pos]
            pos += 1
            u |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return (u >> 1) ^ -(u & 1), pos

    multi = 0
    for r in rows:
        items = [(e["k"], e["v"]) for e in r["es"]]
        wire = _py_map_blocks(r["c"], items)
        _, pos = read_varint(wire, 0)  # record key
        c1, pos = read_varint(wire, pos)  # block-1 count
        for _ in range(c1):  # block-1 entries must be walked
            klen, pos = read_varint(wire, pos)
            pos += klen  # the data-dependent key jump
            _, pos = read_varint(wire, pos)
        hdr, pos = read_varint(wire, pos)
        if hdr < 0:
            multi += 1
            bsize, pos = read_varint(wire, pos)
            pos += bsize  # FAST SKIP: no entry decode
            term, pos = read_varint(wire, pos)
            assert term == 0 and pos == len(wire)
        else:
            assert hdr == 0 and len(items) <= 2
            assert pos == len(wire)
    assert multi > 0  # the sample exercised the fast-skip form


def test_map_blocks_adversarial_domain(spark, tmp_path):
    """Boundary coverage the TPC-H fixture cannot reach: multi-limb
    KEY-LENGTH varints (a 130-byte key: zigzag 260 = 2 limbs), a
    1-byte key, values in the 9- and 10-limb zigzag domains
    (|val| >= 2^62 wraps the carrier), the n=2 / n=3 block-split
    boundaries, and a 12-entry block 2. Runs the REAL operator against
    a crafted orders.parquet and grades it with the spec encoder fed
    the Spark-computed values."""
    longkey = "K" * 130
    rows = []

    def order(ck, pri, price):
        rows.append((ck, pri, price))

    order(1, "Z", 4.0e16)  # val ~4e18: 9-limb zigzag
    order(2, "Z", 5.0e16)  # val ~5e18 > 2^62: wraps -> 10-limb
    order(3, "Z", 0.0)  # val = -15_000_000: negative multi-limb
    order(4, longkey, 100.0)  # 2-limb key-length varint
    order(4, "A", 200.0)  # n=2 boundary: single block
    order(5, "A", 1.0)
    order(5, "BB", 2.0)
    order(5, "CCC", 3.0)  # n=3: minimal 1-entry negative block
    for i in range(14):  # n=14 -> 12-entry block 2
        order(6, f"P{i:02d}", float(10 + i))
    order(7, "dup", 10.0)
    order(7, "dup", 20.0)  # same key aggregates to ONE entry

    sf = str(tmp_path / "adversarial_sf")
    os.makedirs(sf)
    spark.createDataFrame(
        rows, "o_custkey bigint, o_orderpriority string, o_totalprice double"
    ).coalesce(1).write.parquet(os.path.join(sf, "orders.parquet"))

    out = {r["o_custkey"]: r for r in _Q["fn_avro_map_blocks"](spark, sf).collect()}
    assert set(out) == {1, 2, 3, 4, 5, 6, 7}
    assert all(r["map_ok"] for r in out.values()), {
        k: r["map_ok"] for k, r in out.items()
    }

    # grade against the spec encoder on the SAME Spark-computed values
    vals = (
        spark.read.parquet(os.path.join(sf, "orders.parquet"))
        .select(
            "o_custkey",
            "o_orderpriority",
            (
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
                - 15000000
            ).alias("v"),
        )
        .collect()
    )
    per: dict[int, dict] = {}
    for r in vals:
        per.setdefault(r["o_custkey"], {}).setdefault(r["o_orderpriority"], 0)
        per[r["o_custkey"]][r["o_orderpriority"]] += r["v"]
    for ck, m in per.items():
        items = sorted(m.items())
        # engine sums wrap in int64 on the 10-limb row; mirror that
        items = [(k, ((v + (1 << 63)) % (1 << 64)) - (1 << 63)) for k, v in items]
        wire = _py_map_blocks(ck, items)
        got = out[ck]
        assert got["n_entries"] == len(items), ck
        assert got["key_bytes"] == sum(len(k.encode()) for k, _ in items), ck
        assert got["wire_len"] == len(wire), ck
    assert out[7]["n_entries"] == 1  # duplicate key pre-aggregated
    assert out[6]["n_blocks"] == 2 and out[4]["n_blocks"] == 1
