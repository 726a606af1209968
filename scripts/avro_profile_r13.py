"""Round-13 optimization: decompose the fn_avro_* codec ops into
encode-side vs full-op wall time at sf0.1 (guide §1: measure first).

For each op we time, with the noop sink (guide §1.4):
  * full     — the registered query end to end
  * encode   — the encode+checkpoint subchain alone (re-built inline,
               same expressions), i.e. the part a decode rewrite would
               keep untouched

The difference bounds what a decode-path rewrite can recover.
Run on an idle host; min of N passes per measurement.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402

from morphl_model_publishers_churning_users_spark.session import build_session  # noqa: E402
from morphl_model_publishers_churning_users_spark.registry import get_queries  # noqa: E402
from morphl_model_publishers_churning_users_spark.catalog import table as t  # noqa: E402
from morphl_model_publishers_churning_users_spark.functions.scalar import (  # noqa: E402
    _avro_container_frames,
    _avro_zigzag,
    _pb_byte,
    _pb_varint_u64,
)

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("PASSES", "3"))


def noop(df) -> None:
    df.write.format("noop").mode("overwrite").save()


def timeit(spark, label: str, build) -> float:
    best = float("inf")
    for i in range(PASSES):
        spark.sparkContext.setJobDescription(f"{label} pass {i}")
        t0 = time.perf_counter()
        noop(build())
        best = min(best, time.perf_counter() - t0)
        spark.sparkContext.setJobDescription(None)
    return best


def orders_wire(spark):
    """fn_avro_wire / schema_evolution / (union variant differs) encode chain."""
    enc = t(spark, SF_DIR, "orders").select(
        F.col("o_orderkey").alias("key_in"),
        F.col("o_orderpriority").alias("pri_in"),
        (F.floor(F.col("o_totalprice") * 100 + F.lit(0.5)).cast("bigint") - 200000).alias(
            "delta_in"
        ),
    )
    return enc.select(
        "key_in",
        "pri_in",
        "delta_in",
        F.concat(
            _pb_varint_u64(_avro_zigzag(F.col("key_in"))),
            _pb_varint_u64(_avro_zigzag(F.octet_length("pri_in").cast("bigint"))),
            F.col("pri_in").cast("binary"),
            _pb_varint_u64(_avro_zigzag(F.col("delta_in"))),
        ).alias("payload"),
    )


def array_blocks_wire(spark):
    enc_item = lambda x: _pb_varint_u64(_avro_zigzag(x))
    items = (
        t(spark, SF_DIR, "lineitem")
        .select(
            F.col("l_orderkey").cast("bigint").alias("key_in"),
            "l_linenumber",
            (
                F.floor(F.col("l_extendedprice") * 100 + F.lit(0.5)).cast("bigint")
                - 5000000
            ).alias("val"),
        )
        .groupBy("key_in")
        .agg(
            F.transform(
                F.array_sort(F.collect_list(F.struct("l_linenumber", "val"))),
                lambda s: s["val"],
            ).alias("items")
        )
    )
    empty = F.lit(b"")
    cat_items = lambda arr: F.aggregate(
        arr, empty, lambda acc, x: F.concat(acc, enc_item(x))
    )
    staged = items.select(
        "key_in",
        "items",
        F.size("items").cast("bigint").alias("n_in"),
        F.least(F.size("items"), F.lit(2)).cast("bigint").alias("c1_in"),
        cat_items(F.slice("items", 1, 2)).alias("b1_bytes"),
        cat_items(
            F.slice(F.col("items"), F.lit(3), F.greatest(F.size("items") - 2, F.lit(0)))
        ).alias("b2_bytes"),
    )
    return staged.select(
        "key_in",
        "items",
        "n_in",
        F.concat(
            enc_item(F.col("key_in")),
            enc_item(F.col("c1_in")),
            F.col("b1_bytes"),
            F.when(
                F.col("n_in") > 2,
                F.concat(
                    enc_item(-(F.col("n_in") - F.col("c1_in"))),
                    enc_item(F.octet_length("b2_bytes").cast("bigint")),
                    F.col("b2_bytes"),
                ),
            ).otherwise(empty),
            _pb_byte(F.lit(0)),
        ).alias("payload"),
    )


def main() -> None:
    spark = build_session("avro-profile-r13")
    q = get_queries()
    targets = [
        "fn_avro_wire",
        "fn_avro_container",
        "fn_avro_schema_evolution",
        "fn_avro_union_nullable",
        "fn_avro_array_blocks",
        "fn_avro_map_blocks",
    ]
    # Warm each plan shape once at sf0.001 (bench discipline).
    for k in targets:
        q[k](spark, "/root/testdata/sf0.001").count()

    results: dict[str, float] = {}
    for k in targets:
        results[f"{k}:full"] = timeit(spark, k, lambda k=k: q[k](spark, SF_DIR))
        print(f"{k:32s} full   {results[f'{k}:full']:7.2f}s", flush=True)

    # Encode-only chains (the part a decode rewrite keeps).
    results["orders_wire:encode"] = timeit(spark, "orders_wire", lambda: orders_wire(spark))
    print(f"{'orders_wire (wire/schema_evo)':32s} encode {results['orders_wire:encode']:7.2f}s", flush=True)
    results["container_frames:encode"] = timeit(
        spark, "container_frames", lambda: _avro_container_frames(spark, SF_DIR)
    )
    print(f"{'container frames':32s} encode {results['container_frames:encode']:7.2f}s", flush=True)
    results["array_blocks:encode"] = timeit(
        spark, "array_blocks_wire", lambda: array_blocks_wire(spark)
    )
    print(f"{'array_blocks wire':32s} encode {results['array_blocks:encode']:7.2f}s", flush=True)

    print({k: round(v, 3) for k, v in sorted(results.items())})
    spark.stop()


if __name__ == "__main__":
    main()
