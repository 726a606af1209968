"""Round-12 stretch operators: scan_delta_partition_values (partition
pruning through the commit-log fold) and fn_avro_array_blocks (Avro
composite block encoding, both positive-count and negative-count
fast-skip wire forms) — semantic invariants beyond oracle parity,
checked against the ON-DISK commit log / a pure-Python spec-level
encoder, not the operators' own aggregates."""

from __future__ import annotations

import json
import os

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.registry import get_queries

_Q = get_queries()


# ---------------------------------------------------------------------------
# scan_delta_partition_values


def test_partition_values_on_disk_shape(spark, sf_dir):
    """The written log must carry Delta's exact on-disk shape: every
    add action has a partitionValues string map naming the partition,
    the data files themselves OMIT the partition column, and the v2
    delete removes exactly v0's 1998 file."""
    from morphl_model_publishers_churning_users_spark.operators._shared import (
        scratch_dir,
    )

    _Q["scan_delta_partition_values"](spark, sf_dir).collect()
    tbl = scratch_dir("delta_partition_values_table")
    log_dir = os.path.join(tbl, "_delta_log")

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
    assert len(adds) == 8 and len(removes) == 1
    for _, add in adds:
        assert set(add["partitionValues"]) == {"o_year"}
        year = int(add["partitionValues"]["o_year"])
        assert 1995 <= year <= 2001
        # partitionValues must agree with the hive-style directory name
        assert f"o_year={year}" in add["path"]
        assert add["size"] > 0
    # the removed path is v0's 1998 file, and v1's 1998 append survives
    (rv, removed), = removes
    assert rv == 2 and "o_year=1998" in removed["path"]
    assert removed["path"].startswith("data/v0")
    live_1998 = [
        a["path"]
        for _, a in adds
        if a["partitionValues"]["o_year"] == "1998"
        and a["path"] != removed["path"]
    ]
    assert len(live_1998) == 1 and live_1998[0].startswith("data/v1")

    # data files omit the partition column (Delta's shape: the reader
    # must reconstruct it from partitionValues)
    some_file = os.path.join(tbl, adds[0][1]["path"])
    cols = spark.read.parquet(some_file).columns
    assert "o_year" not in cols and "o_orderkey" in cols


def test_partition_pruning_never_opens_out_of_range_files(spark, sf_dir):
    """The staged design's core claim, asserted from OUTSIDE the
    operator: re-derive the live fold from the on-disk log with pure
    Python, prune o_year BETWEEN 1997 AND 1998, and verify the
    operator's result could only have come from those 2 files — the
    per-year file counts are exactly 1, the flag row asserting
    no-out-of-range-file-scanned is TRUE on every row, and the row
    counts match a direct parquet read of ONLY the pruned files."""
    from morphl_model_publishers_churning_users_spark.operators._shared import (
        scratch_dir,
    )

    rows = {
        r["o_year"]: r for r in _Q["scan_delta_partition_values"](spark, sf_dir).collect()
    }
    assert set(rows) == {1997, 1998}
    assert all(r["pruned_ok"] for r in rows.values())
    assert all(r["n_files"] == 1 for r in rows.values())
    assert all(r["n_live_total"] == 7 for r in rows.values())
    assert all(r["n_files_pruned"] == 2 for r in rows.values())

    tbl = scratch_dir("delta_partition_values_table")
    log_dir = os.path.join(tbl, "_delta_log")
    state = {}  # pure-Python last-action-wins fold
    for fname in sorted(os.listdir(log_dir)):
        if not fname.endswith(".json"):
            continue
        with open(os.path.join(log_dir, fname)) as f:
            for line in f:
                a = json.loads(line)
                if "add" in a:
                    state[a["add"]["path"]] = a["add"]["partitionValues"]["o_year"]
                if "remove" in a:
                    state.pop(a["remove"]["path"], None)
    assert len(state) == 7
    pruned = {p: int(y) for p, y in state.items() if 1997 <= int(y) <= 1998}
    assert len(pruned) == 2 and sorted(pruned.values()) == [1997, 1998]

    for path, year in pruned.items():
        n = spark.read.parquet(os.path.join(tbl, path)).count()
        assert rows[year]["n_rows"] == n


def test_partition_pruning_content_matches_fold_slices(spark, sf_dir):
    """1997 must be the FULL year while 1998 reflects the v2 delete
    (odd o_orderkey only) — recomputed directly from the orders table,
    proving the fold applied the remove before pruning."""
    from morphl_model_publishers_churning_users_spark.operators._shared import t

    rows = {
        r["o_year"]: r for r in _Q["scan_delta_partition_values"](spark, sf_dir).collect()
    }
    o = t(spark, sf_dir, "orders").select(
        "o_orderkey", F.year("o_orderdate").cast("int").alias("y")
    )
    n_1997 = o.filter(F.col("y") == 1997).count()
    n_1998_odd = o.filter(
        (F.col("y") == 1998) & (F.col("o_orderkey") % 2 == 1)
    ).count()
    assert rows[1997]["n_rows"] == n_1997
    assert rows[1998]["n_rows"] == n_1998_odd


# ---------------------------------------------------------------------------
# fn_avro_array_blocks


def _py_zigzag(n: int) -> int:
    return (n << 1) ^ (n >> 63) if n >= 0 else (-n << 1) - 1


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


def _py_avro_long(n: int) -> bytes:
    return _py_varint(_py_zigzag(n))


def _py_avro_array_blocks(key: int, vals: list[int]) -> bytes:
    """Independent spec-level encoder: record{key: long, vals: array}
    with block 1 = first min(n,2) items (positive count) and block 2 =
    the rest in the NEGATIVE-count size-prefixed fast-skip form."""
    out = bytearray(_py_avro_long(key))
    b1, b2 = vals[:2], vals[2:]
    out += _py_avro_long(len(b1))
    for v in b1:
        out += _py_avro_long(v)
    if b2:
        body = b"".join(_py_avro_long(v) for v in b2)
        out += _py_avro_long(-len(b2))  # negative count
        out += _py_avro_long(len(body))  # byte-size prefix (fast skip)
        out += body
    out += b"\x00"  # zero-count terminator block
    return bytes(out)


def test_array_blocks_matches_python_encoder(spark, sf_dir):
    """Wire length, counts, sums, and block arithmetic must agree
    row-for-row with the independent Python encoder over the same
    (l_linenumber, val)-ordered per-order arrays."""
    from morphl_model_publishers_churning_users_spark.operators._shared import t

    # deterministic sample: lowest 150 order keys
    out = {
        r["o_orderkey"]: r
        for r in _Q["fn_avro_array_blocks"](spark, sf_dir)
        .orderBy("o_orderkey")
        .limit(150)
        .collect()
    }
    assert out and all(r["blocks_ok"] for r in out.values())
    # the sample must exercise BOTH wire forms
    assert {r["n_blocks"] for r in out.values()} == {1, 2}

    vals = (
        t(spark, sf_dir, "lineitem")
        .filter(F.col("l_orderkey").isin(*list(out)))
        .select(
            F.col("l_orderkey").cast("bigint").alias("k"),
            "l_linenumber",
            (
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
                - 5000000
            ).alias("val"),
        )
        .collect()
    )
    per: dict[int, list] = {}
    for r in vals:
        per.setdefault(r["k"], []).append((r["l_linenumber"], r["val"]))
    assert set(per) == set(out)
    for k, pairs in per.items():
        arr = [v for _, v in sorted(pairs)]
        wire = _py_avro_array_blocks(k, arr)
        got = out[k]
        assert got["n_items"] == len(arr)
        assert got["sum_vals"] == sum(arr)
        assert got["wire_len"] == len(wire)
        assert got["n_blocks"] == (2 if len(arr) > 2 else 1)
        if len(arr) > 2:
            body = b"".join(_py_avro_long(v) for v in arr[2:])
            assert got["block2_size"] == len(body)
        else:
            assert got["block2_size"] is None


def test_array_blocks_fast_skip_decodes_standalone(spark, sf_dir):
    """The negative-count form must be skippable WITHOUT item decode:
    re-parse a sample of the operator's implied wires with a pure
    Python reader that uses ONLY the size prefix to jump block 2, and
    confirm it lands on the terminator."""
    from morphl_model_publishers_churning_users_spark.operators._shared import t

    rows = (
        t(spark, sf_dir, "lineitem")
        .groupBy(F.col("l_orderkey").cast("bigint").alias("k"))
        .agg(
            F.transform(
                F.array_sort(
                    F.collect_list(
                        F.struct(
                            "l_linenumber",
                            (
                                F.floor(
                                    F.col("l_extendedprice") * 100 + F.lit(0.5)
                                ).cast("bigint")
                                - 5000000
                            ).alias("val"),
                        )
                    )
                ),
                lambda s: s["val"],
            ).alias("vals")
        )
        .orderBy("k")
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
        wire = _py_avro_array_blocks(r["k"], list(r["vals"]))
        _, pos = read_varint(wire, 0)  # key
        c1, pos = read_varint(wire, pos)  # block-1 count
        for _ in range(c1):  # block-1 items must be walked
            _, pos = read_varint(wire, pos)
        hdr, pos = read_varint(wire, pos)
        if hdr < 0:
            multi += 1
            bsize, pos = read_varint(wire, pos)
            pos += bsize  # FAST SKIP: no item decode
        else:
            assert hdr == 0 and len(r["vals"]) <= 2
            assert pos == len(wire)
            continue
        term, pos = read_varint(wire, pos)
        assert term == 0 and pos == len(wire)
    assert multi > 0  # the sample exercised the fast-skip form


def test_array_blocks_adversarial_domain(spark, tmp_path):
    """Boundary coverage the TPC-H fixture cannot reach: values whose
    zigzag crosses into the 9- and 10-limb varint forms (>= 2^62, the
    uint64-in-signed-carrier wrap), the n=1 / n=2 / n=3 block-split
    boundaries, a 20-item order (18-item negative-count block), and
    duplicate (l_linenumber, val) ties. Runs the REAL operator against
    a crafted lineitem.parquet and grades it with the pure-Python spec
    encoder fed the Spark-computed values."""
    rows = []

    def order(key, prices):
        for i, p in enumerate(prices):
            rows.append((key, (i % 3) + 1, p))  # duplicate linenumbers

    order(1, [4.0e16])            # val ~4e18: 9-limb zigzag
    order(2, [5.0e16])            # val ~5e18 > 2^62: zigzag wraps -> 10-limb
    order(3, [0.0])               # val = -5_000_000: negative, multi-limb
    order(4, [10.0, 20.0])        # n=2 boundary: single block, no fast-skip
    order(5, [10.0, 20.0, 30.0])  # n=3: minimal 1-item negative block
    order(6, [float(100 + 7 * i) for i in range(20)])  # 18-item block 2
    order(7, [50.0, 50.0, 50.0, 50.0])  # exact (linenumber, val) ties

    sf_dir = str(tmp_path / "adversarial_sf")
    os.makedirs(sf_dir)
    spark.createDataFrame(
        rows, "l_orderkey bigint, l_linenumber int, l_extendedprice double"
    ).coalesce(1).write.parquet(os.path.join(sf_dir, "lineitem.parquet"))

    out = {
        r["o_orderkey"]: r
        for r in _Q["fn_avro_array_blocks"](spark, sf_dir).collect()
    }
    assert set(out) == {1, 2, 3, 4, 5, 6, 7}
    assert all(r["blocks_ok"] for r in out.values()), {
        k: r["blocks_ok"] for k, r in out.items()
    }

    # grade wire lengths/sums against the spec encoder on the SAME
    # Spark-computed values (floor(price*100+0.5) - 5e6, sorted like
    # the operator sorts)
    vals = (
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet"))
        .select(
            "l_orderkey",
            "l_linenumber",
            (
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
                - 5000000
            ).alias("val"),
        )
        .collect()
    )
    per: dict[int, list] = {}
    for r in vals:
        per.setdefault(r["l_orderkey"], []).append((r["l_linenumber"], r["val"]))
    for k, pairs in per.items():
        arr = [v for _, v in sorted(pairs)]
        wire = _py_avro_array_blocks(k, arr)
        got = out[k]
        assert got["n_items"] == len(arr)
        assert got["sum_vals"] == sum(arr)
        assert got["wire_len"] == len(wire), (k, arr)
        assert got["n_blocks"] == (2 if len(arr) > 2 else 1)
    # the 10-limb boundary really was exercised
    assert per[2][0][1] >= 1 << 62
    assert out[6]["block2_size"] > 18  # 18 items, each >= 1 byte + headers
