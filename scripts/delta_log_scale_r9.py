#!/usr/bin/env python
"""scan_delta_log commit-count scale study (round 9).

The operator's 100 TB claim is "version reads stay O(log), not
O(objects-in-bucket)" — this measures the actual curve as the LOG
grows, holding the DATA fixed, and then measures the checkpoint cut
that the staged round-10 `scan_delta_checkpoint` candidate would add.

Setup: 16 real parquet data files (one orders slice each). Commit 0
adds all 16; commit i >= 1 removes file (i mod 16) and re-adds it —
constant live set (the steady-state churn of a compacting table),
2 actions per commit, O(N) total actions.

Measured per N in {16, 128, 1024}:
  replay     full-log fold (spark.read.json over N commit files +
             max_by(is_add, version) per path) + live-data aggregate.
  ckpt       checkpointed read: a parquet checkpoint holds the folded
             live set as of version N-16; read = checkpoint rows +
             replay of ONLY the trailing 16 JSON commits. This is the
             r10 scan_delta_checkpoint design — wall should go flat
             in N while `replay` grows with the log.

Correctness gate: every variant at every N must produce the same
(n_files, n_rows, sum_total) triple as the direct read of the 16
files.

Run on an idle guest: python scripts/delta_log_scale_r9.py
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
    "delta_log_scale",
)
NS = (16, 128, 1024)
TAIL = 16  # commits replayed on top of the checkpoint


def _spark():
    from morphl_model_publishers_churning_users_spark.catalog import ensure_confs
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("delta-log-scale-r9")
        .getOrCreate()
    )
    ensure_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")
    return spark


def _actions_df(spark, log_dir):
    return (
        spark.read.schema(
            "add struct<path:string,size:bigint,dataChange:boolean>, "
            "remove struct<path:string,dataChange:boolean>, "
            "commitInfo struct<operation:string>"
        )
        .json(log_dir)
        .select(
            F.regexp_extract(F.col("_metadata.file_path"), r"(\d{20})\.json$", 1)
            .cast("bigint")
            .alias("version"),
            F.coalesce(F.col("add.path"), F.col("remove.path")).alias("path"),
            F.col("add.path").isNotNull().alias("is_add"),
        )
        .filter(F.col("path").isNotNull())
    )


def _fold_live(actions):
    return (
        actions.groupBy("path")
        .agg(F.max_by("is_add", "version").alias("live"))
        .filter(F.col("live"))
    )


def _read_live(spark, tbl, live_paths):
    df = spark.read.parquet(*[os.path.join(tbl, p) for p in live_paths])
    return df.agg(
        F.count_distinct(F.col("_metadata.file_path")).cast("bigint").alias("n_files"),
        F.count(F.lit(1)).cast("bigint").alias("n_rows"),
        F.sum(F.col("price").cast("decimal(38,6)")).cast("double").alias("sum_total"),
    ).collect()[0]


def main() -> None:
    from morphl_model_publishers_churning_users_spark.catalog import table

    spark = _spark()
    shutil.rmtree(OUT, ignore_errors=True)
    tbl = OUT
    os.makedirs(tbl)

    # 16 real data files, written once and shared by every N.
    o = table(spark, BASE, "orders").select(
        "o_orderkey", F.round("o_totalprice", 6).alias("price")
    )
    data_dir = os.path.join(tbl, "data")
    o.repartition(16).write.mode("overwrite").parquet(data_dir)
    files = sorted(
        os.path.relpath(r["p"].removeprefix("file:"), tbl)
        for r in spark.read.parquet(data_dir)
        .select(F.col("_metadata.file_path").alias("p"))
        .distinct()
        .collect()
    )
    assert len(files) == 16, files
    truth = _read_live(spark, tbl, files)
    print(f"truth: files={truth['n_files']} rows={truth['n_rows']} sum={truth['sum_total']}")

    def add(p):
        return {"add": {"path": p, "size": os.path.getsize(os.path.join(tbl, p)), "dataChange": True}}

    for n in NS:
        log_dir = os.path.join(tbl, f"_delta_log_{n}")
        shutil.rmtree(log_dir, ignore_errors=True)
        os.makedirs(log_dir)
        commits = {0: [{"commitInfo": {"operation": "WRITE"}}] + [add(p) for p in files]}
        for i in range(1, n):
            p = files[i % 16]
            commits[i] = [
                {"commitInfo": {"operation": "REWRITE"}},
                {"remove": {"path": p, "dataChange": False}},
                add(p),
            ]
        for v, actions in commits.items():
            with open(os.path.join(log_dir, f"{v:020d}.json"), "w") as f:
                f.write("\n".join(json.dumps(a) for a in actions) + "\n")

        # Checkpoint as of version n-TAIL-1: the folded live set, as parquet.
        ckpt_version = n - TAIL - 1
        ckpt_path = os.path.join(tbl, f"_ckpt_{n}")
        _fold_live(
            _actions_df(spark, log_dir).filter(F.col("version") <= ckpt_version)
        ).select("path").write.mode("overwrite").parquet(ckpt_path)

        for variant in ("replay", "ckpt"):
            times = []
            for _ in range(3):
                t0 = time.perf_counter()
                if variant == "replay":
                    live = _fold_live(_actions_df(spark, log_dir))
                    paths = [r["path"] for r in live.select("path").collect()]
                else:
                    ck = spark.read.parquet(ckpt_path).select(
                        F.lit(ckpt_version).alias("version"),
                        "path",
                        F.lit(True).alias("is_add"),
                    )
                    tail = _actions_df(spark, log_dir).filter(
                        F.col("version") > ckpt_version
                    )
                    live = _fold_live(ck.unionByName(tail))
                    paths = [r["path"] for r in live.select("path").collect()]
                got = _read_live(spark, tbl, sorted(paths))
                times.append(round(time.perf_counter() - t0, 3))
                assert (
                    got["n_files"] == truth["n_files"]
                    and got["n_rows"] == truth["n_rows"]
                    and got["sum_total"] == truth["sum_total"]
                ), (n, variant, got, truth)
            print(
                json.dumps(
                    {
                        "n_commits": n,
                        "variant": variant,
                        "min_s": min(times),
                        "runs": times,
                        "correct": True,
                    }
                ),
                flush=True,
            )
    spark.stop()


if __name__ == "__main__":
    main()
