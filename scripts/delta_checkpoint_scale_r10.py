#!/usr/bin/env python
"""scan_delta_checkpoint cadence study (round 10).

The r9 study (delta_log_scale_r9.py) proved the binary claim: a
checkpointed read is flat in total log length (0.46 s at 1024 commits
vs 0.64 s full replay). This measures the remaining OPERATIONAL dial —
the checkpoint CADENCE: with the log fixed at 1024 commits, read cost
must track the TAIL (commits since the last checkpoint), and the
checkpoint WRITE cost must be O(live files), so a cadence of K commits
amortizes one fold over K reads.

Setup (same churn corpus as r9): 16 real parquet data files; commit 0
adds all 16, commit i removes file (i mod 16) and re-adds it —
constant live set, 2 actions/commit, 1024 commits total.

Measured per TAIL in {1, 16, 128, 1024}:
  read    checkpoint at version 1023-TAIL (pre-built) + replay of the
          trailing TAIL JSON commits (paths constructed from version
          numbers, no directory listing) + live-data aggregate.
TAIL=1024 degenerates to the full-log replay (no checkpoint) — the
r9 baseline, re-measured here as the curve's anchor.

Also measured once: checkpoint WRITE (fold 0..1023 + parquet write of
the 16-row live set) — the cost one commit in K pays.

Correctness gate: every read at every TAIL must produce the same
(n_files, n_rows, sum_total) triple as the direct read of the 16
files.

Run on an idle guest: python scripts/delta_checkpoint_scale_r10.py
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    ".scratch",
    "delta_ckpt_scale",
)
N = 1024
TAILS = (1, 16, 128, 1024)

from morphl_model_publishers_churning_users_spark.operators.scans import (  # noqa: E402
    DELTA_ACTION_SCHEMA as ACTION_SCHEMA,
)


def main() -> None:
    from morphl_model_publishers_churning_users_spark.session import build_session

    spark = build_session("delta-ckpt-scale")
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(OUT, ignore_errors=True)
    data_dir = os.path.join(OUT, "data")
    log_dir = os.path.join(OUT, "_delta_log")
    os.makedirs(log_dir)

    o = (
        spark.read.parquet(os.path.join(BASE, "orders.parquet"))
        .select("o_orderkey", F.round("o_totalprice", 6).alias("price"))
    )
    o.repartition(16).write.mode("overwrite").parquet(data_dir)
    files = sorted(
        os.path.relpath(r["p"].removeprefix("file:"), OUT)
        for r in spark.read.parquet(data_dir)
        .select(F.col("_metadata.file_path").alias("p"))
        .distinct()
        .collect()
    )
    assert len(files) == 16

    def add(p):
        return {"add": {"path": p, "size": os.path.getsize(os.path.join(OUT, p)),
                        "dataChange": True}}

    with open(os.path.join(log_dir, f"{0:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(add(p)) for p in files) + "\n")
    for i in range(1, N):
        p = files[i % 16]
        with open(os.path.join(log_dir, f"{i:020d}.json"), "w") as f:
            f.write(json.dumps({"remove": {"path": p, "dataChange": True}}) + "\n")
            f.write(json.dumps(add(p)) + "\n")

    truth = (
        spark.read.parquet(*[os.path.join(OUT, p) for p in files])
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("price").cast("decimal(38,6)")).cast("double").alias("sum_total"),
        )
        .collect()[0]
    )

    def fold_live(paths_versions_df):
        # ADVICE r10: commit i removes and re-adds the same path at the
        # SAME version, so ordering by version alone leaves liveness to
        # max_by's documented-nondeterministic tie-break. Order by
        # (version, is_add) instead: within a version the add (true)
        # outranks the remove (false) — Delta semantics, made explicit.
        return (
            paths_versions_df.groupBy("path")
            .agg(F.max_by("is_add", F.struct("version", "is_add")).alias("live"))
            .filter(F.col("live"))
        )

    def actions_df(paths):
        return (
            spark.read.schema(ACTION_SCHEMA)
            .json(paths)
            .select(
                F.regexp_extract(F.col("_metadata.file_path"), r"(\d{20})\.json$", 1)
                .cast("bigint")
                .alias("version"),
                F.coalesce(F.col("add.path"), F.col("remove.path")).alias("path"),
                F.col("add.path").isNotNull().alias("is_add"),
            )
            .filter(F.col("path").isNotNull())
        )

    # --- checkpoint WRITE cost (fold 0..N-1-tail once per cadence) ---
    ckpts = {}
    write_times = {}
    for tail in TAILS:
        if tail == N:
            continue  # no checkpoint in the degenerate arm
        at = N - 1 - tail
        t0 = time.perf_counter()
        live = fold_live(
            actions_df([os.path.join(log_dir, f"{v:020d}.json") for v in range(at + 1)])
        ).select("path")
        cp = os.path.join(log_dir, f"{at:020d}.checkpoint.parquet")
        live.write.mode("overwrite").parquet(cp)
        write_times[tail] = round(time.perf_counter() - t0, 3)
        ckpts[tail] = (at, cp)

    results = {}
    for tail in TAILS:
        for rep in range(3):
            t0 = time.perf_counter()
            if tail == N:
                state = actions_df(
                    [os.path.join(log_dir, f"{v:020d}.json") for v in range(N)]
                )
            else:
                at, cp = ckpts[tail]
                state = (
                    spark.read.parquet(cp)
                    .select(
                        F.lit(at).cast("bigint").alias("version"),
                        "path",
                        F.lit(True).alias("is_add"),
                    )
                    .unionByName(
                        actions_df(
                            [
                                os.path.join(log_dir, f"{v:020d}.json")
                                for v in range(at + 1, N)
                            ]
                        )
                    )
                )
            live = fold_live(state)
            paths = [os.path.join(OUT, r["path"]) for r in live.collect()]
            got = (
                spark.read.parquet(*paths)
                .agg(
                    F.count(F.lit(1)).cast("bigint").alias("n_rows"),
                    F.sum(F.col("price").cast("decimal(38,6)"))
                    .cast("double")
                    .alias("sum_total"),
                )
                .collect()[0]
            )
            dt = round(time.perf_counter() - t0, 3)
            assert len(paths) == 16
            assert (got["n_rows"], got["sum_total"]) == (
                truth["n_rows"],
                truth["sum_total"],
            ), f"tail={tail} rep={rep} mismatch"
            results.setdefault(tail, []).append(dt)

    print(json.dumps({
        "log_commits": N,
        "read_sec_by_tail": {str(t): min(v) for t, v in results.items()},
        "read_all_reps": {str(t): v for t, v in results.items()},
        "checkpoint_write_sec": write_times,
    }))
    spark.stop()


if __name__ == "__main__":
    main()
