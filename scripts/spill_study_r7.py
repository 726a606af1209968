#!/usr/bin/env python
"""Spill-aware partition sizing, measured (SURVEY §6).

The brief's sizing rule — "size spark.sql.shuffle.partitions so
partitions fit in executor memory" — demonstrated with numbers: the
same global sort of an ~800MB dataset run on a memory-constrained
driver (2g heap) with the shuffle deliberately UNDER-partitioned
(2 partitions → ~400MB per sort task → external-sort spill) and then
sized (64 partitions → ~12MB per task → in-memory). Spill bytes are
read from the Spark UI REST API per run; the wall-clock and spill
columns tell the story together.

Writes land on the noop sink so the sort actually materializes
(count() would prune it) without I/O noise.
"""

from __future__ import annotations

import json
import os
import sys
import time
import urllib.request

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

OUT = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))), ".scratch", "spill_r7"
)
N = 6_000_000


def build() -> None:
    os.makedirs(OUT, exist_ok=True)
    if not os.path.exists(f"{OUT}/fact.parquet"):
        duckdb.connect().execute(
            f"""
            COPY (
                SELECT CAST(floor(random() * 1e12) AS BIGINT) AS k,
                       repeat('x', 120) AS payload
                FROM range({N})
            ) TO '{OUT}/fact.parquet' (FORMAT PARQUET)
            """
        )


def spill_bytes(ui: str) -> tuple[int, int]:
    apps = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications"))
    app_id = apps[0]["id"]
    stages = json.load(urllib.request.urlopen(f"{ui}/api/v1/applications/{app_id}/stages"))
    mem = sum(s.get("memoryBytesSpilled", 0) for s in stages)
    disk = sum(s.get("diskBytesSpilled", 0) for s in stages)
    return mem, disk


def main() -> None:
    build()
    from pyspark.sql import SparkSession

    results = {}
    for label, parts in (("under_partitioned", 2), ("sized", 64)):
        spark = (
            SparkSession.builder.master("local[8]")
            .appName(f"spill-{label}")
            .config("spark.driver.memory", "2g")
            .config("spark.sql.shuffle.partitions", str(parts))
            .config("spark.ui.enabled", "true")
            .config("spark.ui.port", "4049")
            .getOrCreate()
        )
        spark.sparkContext.setLogLevel("ERROR")
        df = spark.read.parquet(f"{OUT}/fact.parquet")
        q = df.repartitionByRange(parts, "k").sortWithinPartitions("k")
        q.write.format("noop").mode("overwrite").save()  # warm
        # Snapshot spill AFTER the warm pass so the reported numbers are
        # the timed run's delta only (ADVICE r7: summing all app stages
        # counted the warm pass too and roughly doubled the figures).
        mem0, disk0 = spill_bytes("http://localhost:4049")
        t0 = time.perf_counter()
        q.write.format("noop").mode("overwrite").save()
        wall = round(time.perf_counter() - t0, 2)
        mem1, disk1 = spill_bytes("http://localhost:4049")
        mem, disk = mem1 - mem0, disk1 - disk0
        results[label] = {
            "partitions": parts,
            "wall_s": wall,
            "memory_spill_mb": round(mem / 1e6),
            "disk_spill_mb": round(disk / 1e6),
        }
        print(json.dumps({label: results[label]}), flush=True)
        spark.stop()
    print(json.dumps({"study": "spill_sizing_r7", "results": results}))


if __name__ == "__main__":
    main()
