#!/usr/bin/env python
"""Wire-codec throughput at scale (SURVEY §6, 100 TB interchange story).

fn_protobuf_wire / fn_avro_wire are pure-codegen encode/decode paths;
this probe measures their sustained row rate on a synthetic frame far
larger than the fixtures (default 20M rows ≈ 128x sf0.1's orders) so
the per-row cost — not job overhead — dominates. Encode writes to the
noop sink (forces materialization, no I/O noise); decode reads the
checkpointed wire frame back through the positional walk and validates
the roundtrip flag. Run on an idle guest:

    python scripts/codec_throughput_r8.py [n_rows]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F  # noqa: E402


def main() -> None:
    n = int(sys.argv[1]) if len(sys.argv) > 1 else 20_000_000
    from morphl_model_publishers_churning_users_spark.catalog import ensure_confs
    from morphl_model_publishers_churning_users_spark.functions.scalar import (
        _avro_unzigzag,
        _avro_zigzag,
        _pb_byte,
        _pb_varint,
        _pb_vlen,
        _pb_vval,
    )
    from pyspark.sql import SparkSession

    spark = (
        SparkSession.builder.master(f"local[{os.environ.get('SPARK_GRAFT_CPUS', '32')}]")
        .appName("codec-throughput-r8")
        .getOrCreate()
    )
    ensure_confs(spark)
    spark.sparkContext.setLogLevel("ERROR")

    # Synthetic message fields spanning 1-5 varint limbs, pos+neg deltas.
    src = spark.range(n).select(
        (F.col("id") * 7919 % F.lit(1 << 34)).alias("key"),
        F.concat(F.lit("PRIO-"), (F.col("id") % 5).cast("string")).alias("pri"),
        ((F.col("id") * 104729 % F.lit(1 << 21)) - F.lit(1 << 20)).alias("delta"),
    )

    results = {}
    for name, enc_cols in (
        (
            "protobuf",
            lambda d: F.concat(
                _pb_byte(F.lit(0x08)),
                _pb_varint(F.col("key")),
                _pb_byte(F.lit(0x12)),
                _pb_byte(F.length("pri")),
                F.col("pri").cast("binary"),
                _pb_byte(F.lit(0x18)),
                _pb_varint(F.col("delta") + F.lit(1 << 20)),  # pb is unsigned
            ),
        ),
        (
            "avro",
            lambda d: F.concat(
                _pb_varint(_avro_zigzag(F.col("key"))),
                _pb_varint(_avro_zigzag(F.length("pri").cast("bigint"))),
                F.col("pri").cast("binary"),
                _pb_varint(_avro_zigzag(F.col("delta"))),
            ),
        ),
    ):
        enc = src.select("key", "pri", "delta", enc_cols(None).alias("payload"))
        enc.write.format("noop").mode("overwrite").save()  # warm
        t0 = time.perf_counter()
        enc.write.format("noop").mode("overwrite").save()
        t_enc = time.perf_counter() - t0

        wire = enc.localCheckpoint(eager=True)
        if name == "avro":
            d = wire.withColumn("p2", F.lit(1) + _pb_vlen(F.lit(1)))
            d = d.withColumn("slen", _avro_unzigzag(_pb_vval(F.col("p2"))))
            d = d.withColumn("p3", F.col("p2") + _pb_vlen(F.col("p2")) + F.col("slen"))
            d = d.localCheckpoint(eager=True)
            dec = d.select(
                (_avro_unzigzag(_pb_vval(F.lit(1))) == F.col("key")).alias("ok")
            )
        else:
            dec = wire.select(
                (_pb_vval(F.lit(2)) == F.col("key")).alias("ok")
            )
        dec.filter(~F.col("ok")).count()  # warm + validate path
        t0 = time.perf_counter()
        bad = dec.filter(~F.col("ok")).count()
        t_dec = time.perf_counter() - t0
        assert bad == 0, (name, bad)
        results[name] = {
            "rows": n,
            "encode_s": round(t_enc, 2),
            "encode_mrows_per_s": round(n / t_enc / 1e6, 1),
            "decode_s": round(t_dec, 2),
            "decode_mrows_per_s": round(n / t_dec / 1e6, 1),
        }
        print(results[name], flush=True)

    import json

    print(json.dumps({"study": "codec_throughput_r8", "results": results}))
    spark.stop()


if __name__ == "__main__":
    main()
