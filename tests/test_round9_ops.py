"""Round-9 stretch operators: scan_delta_log (commit-log replay) and
fn_avro_container (Avro OCF framing) — semantic invariants beyond
oracle parity, checked against the ON-DISK artifacts / a pure-Python
spec-level reference, not the operators' own aggregates."""

from __future__ import annotations

import io
import json
import os
import re
from contextlib import redirect_stdout

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.registry import get_queries

_Q = get_queries()


def test_delta_log_replay_isolation_and_compaction_equivalence(spark, sf_dir):
    """Three invariants computed from the on-disk _delta_log (parsed
    with plain Python json, independent of the operator's Spark fold):
    (1) replaying commits 0..N in Python yields live-file sets of size
    4/6/3 and v0's set is disjoint from the appended and compacted
    files; (2) reading v2's fold-derived files returns content
    identical to v1's even though the file sets differ; (3) the
    OPTIMIZE commit marks every action dataChange=false."""
    from morphl_model_publishers_churning_users_spark.operators._shared import (
        scratch_dir,
    )

    _Q["scan_delta_log"](spark, sf_dir).count()  # materialize table+log
    tbl = scratch_dir("delta_log_table")
    log_dir = os.path.join(tbl, "_delta_log")
    commits = {}
    for fname in sorted(os.listdir(log_dir)):
        v = int(fname.split(".")[0])
        with open(os.path.join(log_dir, fname)) as f:
            commits[v] = [json.loads(l) for l in f if l.strip()]
    assert sorted(commits) == [0, 1, 2]

    def replay(n):  # independent Python fold: last action per path wins
        live = set()
        for v in range(n + 1):
            for a in commits[v]:
                if "add" in a:
                    live.add(a["add"]["path"])
                elif "remove" in a:
                    live.discard(a["remove"]["path"])
        return live

    l0, l1, l2 = replay(0), replay(1), replay(2)
    assert (len(l0), len(l1), len(l2)) == (4, 6, 3)
    assert l0 < l1  # append keeps the base files
    assert not (l2 & l0)  # compaction retired every base file
    assert l1 - l0 < l2  # ...but kept the appended ones

    def content(paths):
        df = spark.read.parquet(*[os.path.join(tbl, p) for p in paths])
        return {(r["o_orderkey"], r["price"]) for r in df.collect()}

    assert content(l1) == content(l2)  # metadata-only swap
    assert all(
        not a[k]["dataChange"]
        for a in commits[2]
        for k in ("add", "remove")
        if k in a
    )


def test_delta_log_fold_is_one_hash_aggregate(spark, sf_dir):
    """The version fold must stay hash-aggregate-shaped (the O(log)
    path a 100 TB client needs): no cartesian and no shuffle join
    anywhere. Since r13 the final plan scans the distinct live data
    files ONCE and attributes rows to versions via a BROADCAST
    (file -> version) metadata join — assert exactly that shape: one
    parquet scan of the data tree, the attach join broadcast-only."""
    buf = io.StringIO()
    with redirect_stdout(buf):
        _Q["scan_delta_log"](spark, sf_dir).explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    assert "SortMergeJoin" not in plan and "ShuffledHashJoin" not in plan
    assert len(re.findall(r"\(\d+\) BroadcastHashJoin", plan)) == 1, plan
    assert len(re.findall(r"\(\d+\) Scan parquet", plan)) == 1, plan


def _ref_ocf_parse(blob: bytes):
    """Pure-Python spec-level Avro OCF reader (header + metadata map +
    sync-delimited blocks + zigzag-varint record fields) — the
    independent reference the operator's ok-flags are graded against."""
    pos = 0

    def u8():
        nonlocal pos
        b = blob[pos]
        pos += 1
        return b

    def varint():
        shift, acc = 0, 0
        while True:
            b = u8()
            acc |= (b & 0x7F) << shift
            if not b & 0x80:
                break
            shift += 7
        return acc

    def zlong():
        z = varint()
        return (z >> 1) ^ -(z & 1)

    def raw(n):
        nonlocal pos
        out = blob[pos : pos + n]
        pos += n
        return out

    assert raw(4) == b"Obj\x01"
    meta = {}
    while True:
        n = zlong()
        if n == 0:
            break
        for _ in range(abs(n)):
            k = raw(zlong()).decode()
            meta[k] = raw(zlong()).decode()
    sync = raw(16)
    records = []
    while pos < len(blob):
        n_rec = zlong()
        size = zlong()
        end = pos + size
        for _ in range(n_rec):
            key = zlong()
            pri = raw(zlong()).decode()
            delta = zlong()
            records.append((key, pri, delta))
        assert pos == end, "block size must cover exactly its records"
        assert raw(16) == sync, "block sync marker must match the header's"
    return meta, records


def test_avro_container_parses_with_reference_ocf_reader(spark, sf_dir):
    """"fn_avro_container" ok-flags backing invariant: every emitted
    container file must parse END-TO-END with a pure-Python spec-level
    OCF reader — magic, metadata map (schema + null codec), sync
    discipline, block framing, and every record's three zigzag/varint
    fields equal to the month's source rows."""
    from morphl_model_publishers_churning_users_spark.functions.scalar import (
        _avro_container_frames,
    )
    from morphl_model_publishers_churning_users_spark.operators._shared import t

    frames = {r["ym"]: bytes(r["file"]) for r in
              _avro_container_frames(spark, sf_dir).collect()}
    src = (
        t(spark, sf_dir, "orders")
        .select(
            F.date_format("o_orderdate", "yyyy-MM").alias("ym"),
            F.col("o_orderkey"),
            F.col("o_orderpriority"),
            (F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
             - 200000).alias("delta"),
        )
        .collect()
    )
    by_month = {}
    for r in src:
        by_month.setdefault(r["ym"], []).append(
            (r["o_orderkey"], r["o_orderpriority"], r["delta"])
        )
    assert set(frames) == set(by_month)
    for ym, blob in frames.items():
        meta, records = _ref_ocf_parse(blob)
        assert meta["avro.codec"] == "null"
        schema = json.loads(meta["avro.schema"])
        assert [f["name"] for f in schema["fields"]] == ["key", "priority", "delta"]
        assert records == sorted(by_month[ym]), ym


def test_avro_container_oracle_flags_hold_on_every_row(spark, sf_dir):
    out = _Q["fn_avro_container"](spark, sf_dir)
    bad = out.filter(
        ~F.col("magic_ok")
        | ~F.col("meta_ok")
        | ~F.col("sync_ok")
        | ~F.col("framing_ok")
        | ~F.col("first_record_ok")
    ).count()
    assert bad == 0
