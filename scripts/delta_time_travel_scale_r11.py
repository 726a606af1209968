#!/usr/bin/env python
"""scan_delta_time_travel_ts scale study (round 11).

The r9/r10 studies priced the version-read half: checkpointed reads are
flat in total log length and linear only in the tail. This measures the
half the r11 operator adds — TIMESTAMP->VERSION RESOLUTION — and proves
it composes with the checkpoint read path:

1. Resolution cost vs log length AND probe count: resolving a BATCH of
   8 probes is ONE schema'd pass over the commitInfo rows (broadcast
   probe spine + max(version) per probe), measured over logs of
   64 / 256 / 1024 commits. The pass is O(commits) metadata — at
   100 TB the log is thousands of rows, never the data — and the
   per-probe marginal cost is ~zero because the spine join amortizes
   the scan.

2. AS-OF read cost depends only on the TAIL from the nearest
   checkpoint, not on where the probe lands in history: with the
   1024-commit log checkpointed at version 767, probes resolving to
   versions 768 / 895 / 1023 pay tails of 1 / 128 / 256, and a probe
   resolving BEFORE the checkpoint (version 100) pays the documented
   pre-checkpoint branch (replay 0..100) — the checkpoint cannot serve
   an earlier version than it folds.

Setup (same churn corpus as r9/r10): 16 real parquet data files;
commit 0 adds all 16, commit i removes file (i mod 16) and re-adds it —
constant live set, so EVERY version read must hash-match the direct
16-file truth triple, which is the correctness gate on every timed rep.
Commit v carries commitInfo.timestamp = t0 + v minutes (epoch ms,
Delta's on-disk shape); probes land mid-gap so the `<=` resolution is
unambiguous, plus one probe EXACTLY on a commit time to pin the
boundary contract.

Run on an idle guest: python scripts/delta_time_travel_scale_r11.py
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
    "delta_tt_scale",
)
N = 1024
T0 = 1577836800000  # 2020-01-01T00:00:00Z
STEP = 60000  # one commit per minute
CKPT_AT = 767
READ_VERSIONS = (100, 768, 895, 1023)  # pre-ckpt, tail 1, 128, 256

from morphl_model_publishers_churning_users_spark.operators.scans import (  # noqa: E402
    DELTA_TS_ACTION_SCHEMA as ACTION_SCHEMA,
)


def main() -> None:
    from morphl_model_publishers_churning_users_spark.session import build_session

    spark = build_session("delta-tt-scale")
    spark.sparkContext.setLogLevel("ERROR")

    shutil.rmtree(OUT, ignore_errors=True)
    data_dir = os.path.join(OUT, "data")
    log_dir = os.path.join(OUT, "_delta_log")
    os.makedirs(log_dir)

    o = spark.read.parquet(os.path.join(BASE, "orders.parquet")).select(
        "o_orderkey", F.round("o_totalprice", 6).alias("price")
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
        return {
            "add": {
                "path": p,
                "size": os.path.getsize(os.path.join(OUT, p)),
                "dataChange": True,
            }
        }

    def info(v):
        return {"commitInfo": {"operation": "WRITE" if v == 0 else "REPLACE",
                               "timestamp": T0 + v * STEP}}

    with open(os.path.join(log_dir, f"{0:020d}.json"), "w") as f:
        f.write(json.dumps(info(0)) + "\n")
        f.write("\n".join(json.dumps(add(p)) for p in files) + "\n")
    for i in range(1, N):
        p = files[i % 16]
        with open(os.path.join(log_dir, f"{i:020d}.json"), "w") as f:
            f.write(json.dumps(info(i)) + "\n")
            f.write(json.dumps({"remove": {"path": p, "dataChange": True}}) + "\n")
            f.write(json.dumps(add(p)) + "\n")

    truth = (
        spark.read.parquet(*[os.path.join(OUT, p) for p in files])
        .agg(
            F.count(F.lit(1)).cast("bigint").alias("n_rows"),
            F.sum(F.col("price").cast("decimal(38,6)")).cast("double").alias(
                "sum_total"
            ),
        )
        .collect()[0]
    )

    def fold_live(df):
        # explicit (version, is_add) tie-break: add outranks remove
        # within a version (ADVICE r10)
        return (
            df.groupBy("path")
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

    # ---- arm 1: batch resolution cost vs log length --------------------
    # 8 probes resolved in ONE commitInfo pass; expected version is the
    # pure-Python fold. One probe lands EXACTLY on a commit time (the
    # `<=` boundary), the rest mid-gap.
    resolution = {}
    for n_commits in (64, 256, 1024):
        want = {}
        probes = []
        for j in range(8):
            m = (j + 1) * n_commits // 9
            ts = T0 + m * STEP + (0 if j == 0 else STEP // 2)
            probes.append((f"p{j}", ts))
            want[f"p{j}"] = m
        probe_df = spark.createDataFrame(probes, "probe string, probe_ts bigint")
        paths = [os.path.join(log_dir, f"{v:020d}.json") for v in range(n_commits)]
        reps = []
        for _ in range(3):
            t0 = time.perf_counter()
            commit_rows = (
                spark.read.schema(ACTION_SCHEMA)
                .json(paths)
                .filter(F.col("commitInfo").isNotNull())
                .select(
                    F.regexp_extract(
                        F.col("_metadata.file_path"), r"(\d{20})\.json$", 1
                    )
                    .cast("bigint")
                    .alias("version"),
                    F.col("commitInfo.timestamp").alias("commit_ts"),
                )
            )
            got = {
                r["probe"]: r["version"]
                for r in commit_rows.join(
                    F.broadcast(probe_df), F.col("commit_ts") <= F.col("probe_ts")
                )
                .groupBy("probe")
                .agg(F.max("version").alias("version"))
                .collect()
            }
            reps.append(round(time.perf_counter() - t0, 3))
            assert got == want, f"n={n_commits}: {got} != {want}"
        resolution[str(n_commits)] = {"min_sec_8_probes": min(reps), "reps": reps}

    # ---- checkpoint at 767 (written once, out of timing) ----------------
    cp = os.path.join(log_dir, f"{CKPT_AT:020d}.checkpoint.parquet")
    fold_live(
        actions_df([os.path.join(log_dir, f"{v:020d}.json") for v in range(CKPT_AT + 1)])
    ).select("path").write.mode("overwrite").parquet(cp)
    with open(os.path.join(log_dir, "_last_checkpoint"), "w") as f:
        f.write(json.dumps({"version": CKPT_AT, "size": 16}))

    # ---- arm 2: AS-OF read cost by resolved position --------------------
    reads = {}
    for m in READ_VERSIONS:
        probe_ts = T0 + m * STEP + STEP // 2
        reps = []
        for rep in range(3):
            t0 = time.perf_counter()
            # resolve (same one-pass shape, single probe)
            commit_rows = (
                spark.read.schema(ACTION_SCHEMA)
                .json(log_dir)
                .filter(F.col("commitInfo").isNotNull())
                .select(
                    F.regexp_extract(
                        F.col("_metadata.file_path"), r"(\d{20})\.json$", 1
                    )
                    .cast("bigint")
                    .alias("version"),
                    F.col("commitInfo.timestamp").alias("commit_ts"),
                )
            )
            got_m = commit_rows.filter(F.col("commit_ts") <= probe_ts).agg(
                F.max("version")
            ).collect()[0][0]
            assert got_m == m, f"resolved {got_m} != {m}"
            # read through the checkpoint branch
            if m >= CKPT_AT:
                tail = [
                    os.path.join(log_dir, f"{v:020d}.json")
                    for v in range(CKPT_AT + 1, m + 1)
                ]
                state = spark.read.parquet(cp).select(
                    F.lit(CKPT_AT).cast("bigint").alias("version"),
                    "path",
                    F.lit(True).alias("is_add"),
                )
                if tail:
                    state = state.unionByName(actions_df(tail))
                n_replayed = len(tail)
            else:
                tail = [
                    os.path.join(log_dir, f"{v:020d}.json") for v in range(m + 1)
                ]
                state = actions_df(tail)
                n_replayed = len(tail)
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
            ), f"m={m} rep={rep} mismatch"
            reps.append(dt)
        reads[str(m)] = {
            "tail_replayed": n_replayed,
            "min_sec": min(reps),
            "reps": reps,
        }

    print(
        json.dumps(
            {
                "log_commits": N,
                "checkpoint_at": CKPT_AT,
                "resolution_8probe_by_log_len": resolution,
                "asof_read_by_resolved_version": reads,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
