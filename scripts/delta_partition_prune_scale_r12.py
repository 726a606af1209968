"""Round-12 scale study: partition pruning through the Delta log fold
must stay O(log) + O(selected files) as the PARTITION COUNT grows —
the property that lets a 100 TB daily-partitioned table answer a
one-day query without touching 10,000 irrelevant partitions.

Construction: a commit log with P partition add-entries (P = 64, 256,
1024), where ONLY the 2 in-range partitions reference real parquet
files — every out-of-range add points at a NONEXISTENT path. The
pruned read succeeding at all is therefore PROOF that pruning is pure
metadata: had the reader listed or opened any out-of-range file it
would have thrown. Timed: fold+prune (one pass over the log) and the
pruned 2-file read, per P.

Expected curve: fold time grows mildly with P (it is O(P) metadata on
a constant-overhead Spark job); the read term is flat (always 2
files). Run on an idle guest:

    python scripts/delta_partition_prune_scale_r12.py [sf_dir]

Record results in SURVEY §6 (round-12 log).
"""

import json
import os
import shutil
import sys
import time

sys.path.insert(0, "/root/repo")

import pyspark.sql.functions as F
from pyspark.sql import SparkSession

from morphl_model_publishers_churning_users_spark import catalog
from morphl_model_publishers_churning_users_spark.operators._shared import (
    scratch_dir,
    t,
)

SF = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"

spark = (
    SparkSession.builder.master("local[8]")
    .config("spark.sql.shuffle.partitions", "8")
    .config("spark.ui.showConsoleProgress", "false")
    .getOrCreate()
)
spark.sparkContext.setLogLevel("ERROR")
catalog.ensure_confs(spark)

from morphl_model_publishers_churning_users_spark.operators.scans import (
    DELTA_PV_ACTION_SCHEMA as ACTION_SCHEMA,
)


def build_fixture(p_total: int) -> str:
    """Log with p_total partition adds; only partitions 0 and 1 have
    real data files (a 2-file split of orders), the rest are phantom
    paths that would throw on any open."""
    tbl = scratch_dir(f"prune_scale_{p_total}")
    log_dir = os.path.join(tbl, "_delta_log")
    shutil.rmtree(tbl, ignore_errors=True)
    os.makedirs(log_dir)
    o = t(spark, SF, "orders").select("o_orderkey", "o_totalprice")
    real = {}
    for pv in (0, 1):
        path = os.path.join(tbl, "data", f"p={pv}")
        o.filter(F.col("o_orderkey") % 2 == pv).coalesce(1).write.mode(
            "overwrite"
        ).parquet(path)
        fname = [f for f in os.listdir(path) if f.endswith(".parquet")][0]
        real[pv] = os.path.relpath(os.path.join(path, fname), tbl)
    actions = [{"commitInfo": {"operation": "WRITE"}}]
    for pv in range(p_total):
        rel = real.get(pv, f"data/p={pv}/phantom-{pv:06d}.parquet")
        actions.append(
            {
                "add": {
                    "path": rel,
                    "partitionValues": {"p": str(pv)},
                    "size": 1,
                    "dataChange": True,
                }
            }
        )
    with open(os.path.join(log_dir, f"{0:020d}.json"), "w") as f:
        f.write("\n".join(json.dumps(a) for a in actions) + "\n")
    return tbl


def timed_prune_and_read(tbl: str):
    t0 = time.perf_counter()
    live = (
        spark.read.schema(ACTION_SCHEMA)
        .json(os.path.join(tbl, "_delta_log"))
        .select(
            F.col("add.path").alias("path"),
            F.col("add.partitionValues")["p"].cast("int").alias("pv"),
        )
        .filter(F.col("path").isNotNull())
        .filter(F.col("pv") < 2)  # the partition predicate: 2 of P
        .collect()
    )
    t_prune = time.perf_counter() - t0
    assert len(live) == 2
    t0 = time.perf_counter()
    n = spark.read.parquet(*[os.path.join(tbl, r["path"]) for r in live]).count()
    t_read = time.perf_counter() - t0
    return t_prune, t_read, n


results = {}
for p_total in (64, 256, 1024):
    tbl = build_fixture(p_total)
    best = (1e9, 1e9)
    n = None
    for _ in range(3):
        t_prune, t_read, n = timed_prune_and_read(tbl)
        best = (min(best[0], t_prune), min(best[1], t_read))
    results[p_total] = {
        "prune_s": round(best[0], 3),
        "read_s": round(best[1], 3),
        "rows": n,
    }
    print(
        f"P={p_total:5d}: prune {best[0]:6.3f}s  read {best[1]:6.3f}s  "
        f"rows {n}  (1022+ phantom files never opened)" if p_total == 1024 else
        f"P={p_total:5d}: prune {best[0]:6.3f}s  read {best[1]:6.3f}s  rows {n}",
        flush=True,
    )

print(json.dumps({"sf": SF, "results": results}))
