"""§2.A `source_stream` — the batch pipeline re-bound to Structured
Streaming with Trigger.AvailableNow (the reference's daily-cron semantics
made incremental: process everything available, then stop).

Batch-equivalence is the correctness bar: the streamed aggregate must
equal the batch aggregate over the same bounded input, which is exactly
what the oracle checks.
"""

from __future__ import annotations

import uuid

import pyspark.sql.functions as F

from ..catalog import ensure_confs
from ..operators._shared import scratch_dir
from ..registry import register


def stage_events_dir(spark, sf_dir: str) -> str:
    """Stage events into a scratch *directory* (streaming file sources
    list directories, and the staging write normalizes the nanos
    timestamp to µs). In production the landing zone is already a
    partitioned directory; this mirrors that layout."""
    ensure_confs(spark)
    from ._staging import ensure_staged

    return ensure_staged(spark, sf_dir)


def _stream_events(spark, sf_dir):
    """readStream over the staged events directory (schema pinned; a
    streaming source never infers)."""
    path = stage_events_dir(spark, sf_dir)
    schema = spark.read.parquet(path).schema
    return spark.readStream.schema(schema).format("parquet").load(path)


def run_available_now(sdf, name_prefix: str, output_mode: str = "complete"):
    """Run a streaming DataFrame to completion into a memory sink and
    return the result table. AvailableNow = bounded incremental run.

    State-parallelism policy: a streaming query's state partition count
    is pinned into its checkpoint at first start and is an explicit
    operational choice — it must NOT blindly inherit a batch-tuned
    extreme from ``spark.sql.shuffle.partitions``. Measured on this
    build (r11 config-axis sweep at 2001 partitions): a stream-stream
    join materializes FOUR state-store instances per partition (8004
    providers), which trips an HDFSBackedStateStoreProvider tracking
    race ("ConcurrentHashMap.get(Object) is null" in state tasks) and
    pushes the memory sink's per-task result envelope past
    spark.driver.maxResultSize (~1.4 MiB x 2001 tasks > 1 GiB). So when
    the session arrives with more than max(4x defaultParallelism, 64)
    shuffle partitions, the streaming run caps state partitioning at
    that bound and restores the batch setting afterwards — exactly what
    a production operator does by tuning the streaming job separately.
    Results are partition-count-independent (config-axis matrix), so
    the cap is semantics-preserving by construction; at default confs
    the branch never engages and the query plan is byte-identical.

    Concurrency caveat (r11 ADVICE): the cap mutates the session-global
    conf around the stream, so a BATCH query planned concurrently in
    the same session during awaitTermination would silently pick up the
    capped value. Fine for this serial op harness; if concurrent batch
    planning ever appears, scope the cap via ``spark.newSession()`` (a
    cloned session shares the catalog but owns its conf). Note also
    that ``prev.isdigit()`` deliberately skips the cap for any
    non-plain-integer conf value (e.g. whitespace, "auto") — safe but
    silent.
    """
    spark = sdf.sparkSession
    name = f"{name_prefix}_{uuid.uuid4().hex[:8]}"
    conf_key = "spark.sql.shuffle.partitions"
    prev = spark.conf.get(conf_key)
    cap = max(4 * spark.sparkContext.defaultParallelism, 64)
    capped = prev is not None and prev.isdigit() and int(prev) > cap
    if capped:
        spark.conf.set(conf_key, str(cap))
    try:
        q = (
            sdf.writeStream.format("memory")
            .queryName(name)
            .outputMode(output_mode)
            .option("checkpointLocation", scratch_dir(f"ckpt_{name}"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    finally:
        if capped:
            spark.conf.set(conf_key, prev)
    return spark.table(name)


@register(
    "source_stream",
    oracle="SELECT event_type, COUNT(*) AS n_events FROM events GROUP BY event_type",
)
def source_stream(spark, sf_dir):
    """File-stream source: the events table consumed via readStream with Trigger.AvailableNow and written to an exactly-once sink — batch parity on bounded input."""
    sdf = _stream_events(spark, sf_dir)
    agg = sdf.groupBy("event_type").agg(F.count(F.lit(1)).alias("n_events"))
    return run_available_now(agg, "source_stream")
