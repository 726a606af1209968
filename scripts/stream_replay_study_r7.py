#!/usr/bin/env python
"""Streaming exactly-once replay study (SURVEY §6).

The claim behind every §2.H streaming op — checkpoint + file-sink
manifest give exactly-once across failures — demonstrated by actually
failing: events staged as 16 files, streamed with maxFilesPerTrigger=2
(8 micro-batches) into a parquet sink; the query is KILLED after the
first few batches (mid-stream, arbitrary point), then restarted with
the SAME checkpoint and drained with Trigger.AvailableNow. Pass = the
sink holds exactly the batch row count with zero duplicate event_ids —
the restart resumed from the checkpointed offset and the manifest hid
any half-written files.

Prints one JSON line with counts from both runs.
"""

from __future__ import annotations

import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.operators._shared import scratch_dir, t
from morphl_model_publishers_churning_users_spark.session import build_session

SF = "/root/testdata/sf0.1"


def main() -> None:
    spark = build_session("stream-replay-r7", cpus=16)
    src = scratch_dir("replay_src")
    sink = scratch_dir("replay_sink")
    ckpt = scratch_dir("replay_ckpt")
    for d in (src, sink, ckpt):
        shutil.rmtree(d, ignore_errors=True)
        os.makedirs(d, exist_ok=True)

    ev = t(spark, SF, "events").select("event_id", "event_type", "user_id", "value")
    ev.repartition(16).write.mode("overwrite").parquet(src)
    n_expected = spark.read.parquet(src).count()
    schema = spark.read.parquet(src).schema

    def start(trigger_kwargs):
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", 2)
            .format("parquet")
            .load(src)
        )
        return (
            sdf.writeStream.format("parquet")
            .option("path", sink)
            .option("checkpointLocation", ckpt)
            .outputMode("append")
            .trigger(**trigger_kwargs)
            .start()
        )

    # Phase 1: continuous micro-batches, killed mid-stream.
    q = start({"processingTime": "0 seconds"})
    while True:
        done = [p.get("batchId") for p in q.recentProgress]
        if len(done) >= 3:
            break
        time.sleep(0.2)
    q.stop()  # the "failure": an abrupt stop between micro-batches
    q.awaitTermination()
    partial = spark.read.parquet(sink).count()

    # Phase 2: restart from the SAME checkpoint, drain to completion.
    q2 = start({"availableNow": True})
    q2.awaitTermination()

    final = spark.read.parquet(sink)
    n_final = final.count()
    n_dupes = (
        final.groupBy("event_id").count().filter(F.col("count") > 1).count()
    )
    out = {
        "study": "stream_replay_r7",
        "expected_rows": n_expected,
        "rows_before_kill": partial,
        "rows_after_restart": n_final,
        "duplicate_event_ids": n_dupes,
        "exactly_once": bool(n_final == n_expected and n_dupes == 0 and partial < n_expected),
    }
    print(json.dumps(out))
    assert out["exactly_once"], out


if __name__ == "__main__":
    main()
