"""Round-11 stretch operators: scan_delta_time_travel_ts (timestamp
AS-OF version resolution over the commit log) and
fn_avro_union_nullable (Avro ["null", T] union codec) — semantic
invariants beyond oracle parity, checked against the ON-DISK commit
log / a pure-Python spec-level encoder, not the operators' own
aggregates."""

from __future__ import annotations

import io
import json
import os
from contextlib import redirect_stdout

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.registry import get_queries

_Q = get_queries()


def test_time_travel_resolution_matches_python(spark, sf_dir):
    """AS-OF resolution must agree with an independent pure-Python fold
    of the on-disk commitInfo timestamps: greatest version whose
    commit ts <= probe, with `<=` keeping a probe landing EXACTLY on a
    commit time (Delta's boundary contract, the at_v2 probe)."""
    from morphl_model_publishers_churning_users_spark.operators._shared import (
        scratch_dir,
    )

    rows = {r["probe"]: r for r in _Q["scan_delta_time_travel_ts"](spark, sf_dir).collect()}
    assert set(rows) == {"mid_v0", "at_v2", "after_v3"}

    tbl = scratch_dir("delta_tt_table")
    log_dir = os.path.join(tbl, "_delta_log")
    commit_ts = {}
    for fname in sorted(os.listdir(log_dir)):
        if not fname.endswith(".json"):
            continue
        v = int(fname.split(".")[0])
        with open(os.path.join(log_dir, fname)) as f:
            for line in f:
                a = json.loads(line)
                if "commitInfo" in a:
                    commit_ts[v] = a["commitInfo"]["timestamp"]
    assert sorted(commit_ts) == [0, 1, 2, 3]
    assert all(commit_ts[v] < commit_ts[v + 1] for v in range(3))

    def resolve(probe):  # independent spec fold
        return max(v for v, ts in commit_ts.items() if ts <= probe)

    t0, day = commit_ts[0], commit_ts[1] - commit_ts[0]
    assert rows["mid_v0"]["version"] == resolve(t0 + day // 2) == 0
    assert rows["at_v2"]["version"] == resolve(commit_ts[2]) == 2
    assert rows["after_v3"]["version"] == resolve(commit_ts[3] + 3600000) == 3


def test_time_travel_read_path_branches_on_checkpoint(spark, sf_dir):
    """A version AT/AFTER the checkpoint is served from the checkpoint
    plus only the constructed tail (0 / 1 commits replayed); a version
    BEFORE it cannot use the checkpoint (it folds state at N=2) and
    replays commits 0..m — m+1 = 1 for v0. File counts come from
    DISTINCT _metadata.file_path inside each read."""
    df = _Q["scan_delta_time_travel_ts"](spark, sf_dir)
    rows = {r["probe"]: r for r in df.collect()}
    assert rows["mid_v0"]["n_commits_replayed"] == 1  # commits 0..0
    assert rows["at_v2"]["n_commits_replayed"] == 0  # checkpoint alone
    assert rows["after_v3"]["n_commits_replayed"] == 1  # tail commit 3
    assert rows["mid_v0"]["n_files"] == 4
    assert rows["at_v2"]["n_files"] == 3
    assert rows["after_v3"]["n_files"] == 5
    # content monotonicity: each later version appends rows
    assert (
        rows["mid_v0"]["n_rows"]
        < rows["at_v2"]["n_rows"]
        < rows["after_v3"]["n_rows"]
    )

    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "CartesianProduct" not in plan
    # the only join in the op is the broadcast probe-spine resolution,
    # which is collected before the reads; the fold itself is join-free
    assert "SortMergeJoin" not in plan


def _py_avro_union_encode(key, pri, delta):
    """Pure-Python spec encoder for record{key: long,
    priority: ["null", string], delta: ["null", long]} — the reference
    fn_avro_union_nullable's wire length is graded against."""

    def zz_varint(n):
        z = ((n << 1) ^ (n >> 63)) & ((1 << 64) - 1)
        b = bytearray()
        while True:
            lo = z & 0x7F
            z >>= 7
            b.append(lo | 0x80 if z else lo)
            if not z:
                return bytes(b)

    out = zz_varint(key)
    if pri is None:
        out += b"\x00"  # branch 0 = null, value = zero bytes
    else:
        out += b"\x02" + zz_varint(len(pri)) + pri.encode()
    if delta is None:
        out += b"\x00"
    else:
        out += b"\x02" + zz_varint(delta)
    return out


def test_avro_union_nullable_matches_python_encoder(spark, sf_dir):
    """The operator's decoded fields, null pattern, and wire length
    must agree row-for-row with the independent Python encoder: null
    priority iff key % 3 == 0, null delta iff key % 5 == 0, a null
    field costing exactly one 0x00 branch byte."""
    # orderBy before limit: an unordered limit is nondeterministic, so a
    # partitioning change could drop a null-combination from the sample
    # (r11 ADVICE); the lowest 300 keys deterministically cover all four
    # key%3 x key%5 combinations.
    out = {
        r["o_orderkey"]: r
        for r in _Q["fn_avro_union_nullable"](spark, sf_dir)
        .orderBy("o_orderkey")
        .limit(300)
        .collect()
    }
    assert out and all(r["union_ok"] for r in out.values())
    # the sample must actually exercise all four null combinations
    combos = {
        (r["priority"] is None, r["cents_delta"] is None) for r in out.values()
    }
    assert combos == {(False, False), (True, False), (False, True), (True, True)}

    from morphl_model_publishers_churning_users_spark.operators._shared import t

    sample = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderkey").isin(*list(out)[:60]))
        .select(
            "o_orderkey",
            "o_orderpriority",
            (
                F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint")
                - 200000
            ).alias("delta"),
        )
        .collect()
    )
    assert sample
    for r in sample:
        key = r["o_orderkey"]
        pri = None if key % 3 == 0 else r["o_orderpriority"]
        delta = None if key % 5 == 0 else r["delta"]
        wire = _py_avro_union_encode(key, pri, delta)
        got = out[key]
        assert got["priority"] == pri
        assert got["cents_delta"] == delta
        assert got["msg_len"] == len(wire)


def test_avro_union_nullable_plan_is_shuffle_free(spark, sf_dir):
    """The codec is a per-row positional walk: no join, no exchange —
    the zero-shuffle property that makes it free at 100 TB."""
    df = _Q["fn_avro_union_nullable"](spark, sf_dir)
    buf = io.StringIO()
    with redirect_stdout(buf):
        df.explain("formatted")
    plan = buf.getvalue()
    assert "Exchange" not in plan
    assert "SortMergeJoin" not in plan and "BroadcastHashJoin" not in plan
    assert "CartesianProduct" not in plan
