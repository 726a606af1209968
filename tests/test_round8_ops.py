"""Round-8 operator invariants: Avro wire round-trip and Iceberg-style
manifest snapshot isolation."""

from __future__ import annotations

import os

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.registry import get_queries

_Q = get_queries()


def test_avro_wire_roundtrip_every_row(spark, sf_dir):
    out = _Q["fn_avro_wire"](spark, sf_dir)
    n = out.count()
    assert n > 0
    assert out.filter(~F.col("roundtrip_ok")).count() == 0
    # The delta field must actually exercise BOTH zigzag halves on the
    # fixture, or the negative path is dead code in practice.
    assert out.filter(F.col("cents_delta") < 0).count() > 0
    assert out.filter(F.col("cents_delta") > 0).count() > 0


def test_avro_zigzag_varint_boundaries(spark):
    """"fn_avro_wire" roundtrip_ok backing invariant: zigzag + varint
    encode/decode against a reference Python Avro long codec at the
    sign boundaries and every limb boundary, both signs, over the FULL
    int64 domain — including the 10-limb varints for |n| >= 2^62
    (r8 ADVICE: the previous ±2^62 restriction is lifted)."""
    from morphl_model_publishers_churning_users_spark.functions.scalar import (
        _avro_unzigzag,
        _avro_zigzag,
        _pb_varint_u64,
        _pb_vval10,
    )

    vals = [0, -1, 1, -2, 2, 63, -64, 64, -65, 8191, -8192, 8192]
    for k in range(2, 10):  # zigzag limb boundaries: |zz| around 2^(7k)
        b = 1 << (7 * k - 1)
        vals += [b - 1, -b, b, -b - 1]
    vals += [(1 << 61), -(1 << 61), (1 << 62) - 1, -(1 << 62)]
    vals += [(1 << 62), -(1 << 62) - 1, (1 << 63) - 1, -(1 << 63)]
    vals = sorted(set(vals))
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    out = df.select(
        "v", _pb_varint_u64(_avro_zigzag(F.col("v"))).alias("payload")
    ).select(
        "v",
        "payload",
        _avro_unzigzag(_pb_vval10(F.lit(1))).alias("back"),
    )
    got = {r["v"]: r for r in out.collect()}

    def ref_avro_long(n):  # reference: zigzag then base-128 varint
        z = (n << 1) ^ (n >> 63) if n < 0 else n << 1
        z &= (1 << 64) - 1
        out = bytearray()
        while True:
            b = z & 0x7F
            z >>= 7
            if z:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    for n in vals:
        r = got[n]
        assert bytes(r["payload"]) == ref_avro_long(n), n
        assert r["back"] == n, (n, r["back"])


def test_wire_codecs_against_reference_on_random_domain_sweep(spark):
    """Bulk randomized cross-check of BOTH wire codecs in one Spark job:
    10k seeded random longs log-uniform across the full magnitude range
    (every limb count represented) — protobuf varint on the
    non-negative half, Avro zigzag varint over the FULL int64 domain
    (10-limb wires included) — each
    encoded byte string and decoded value must match the Python
    reference exactly. Complements the hand-picked boundary tests with
    breadth; the seed is fixed so failures reproduce."""
    import random

    from morphl_model_publishers_churning_users_spark.functions.scalar import (
        _avro_unzigzag,
        _avro_zigzag,
        _pb_varint,
        _pb_varint_u64,
        _pb_vval10,
    )

    rng = random.Random(2024_08)
    vals = set()
    while len(vals) < 10_000:
        bits = rng.randint(0, 63)
        v = rng.randint(0, (1 << bits)) if bits else rng.randint(0, 1)
        if rng.random() < 0.5:
            v = -v - (1 if rng.random() < 0.5 else 0)
        if -(1 << 63) <= v <= (1 << 63) - 1:
            vals.add(v)
    vals = sorted(vals)

    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    out = (
        df.select(
            "v",
            _pb_varint_u64(_avro_zigzag(F.col("v"))).alias("payload"),
            F.when(
                F.col("v") >= 0, _pb_varint(F.col("v"))
            ).alias("pb_payload"),
        )
        .select(
            "v",
            "payload",
            "pb_payload",
            _avro_unzigzag(_pb_vval10(F.lit(1))).alias("avro_back"),
        )
        .collect()
    )

    def ref_varint(z):
        b = bytearray()
        while True:
            lo = z & 0x7F
            z >>= 7
            if z:
                b.append(lo | 0x80)
            else:
                b.append(lo)
                return bytes(b)

    bad = []
    for r in out:
        v = r["v"]
        zz = ((v << 1) ^ (v >> 63)) & ((1 << 64) - 1)
        if bytes(r["payload"]) != ref_varint(zz) or r["avro_back"] != v:
            bad.append(("avro", v))
        if v >= 0 and bytes(r["pb_payload"]) != ref_varint(v):
            bad.append(("pb", v))
    assert bad == [], bad[:10]


def test_iceberg_snapshot_isolation_and_compaction_equivalence(spark, sf_dir):
    """Three invariants computed from the on-disk manifests, not the
    operator's own aggregates: (1) v1's manifest lists only base files
    and reading it returns EXACTLY the pre-2000 orders even though the
    appended files already share the data tree; (2) the compacted v3
    reads different files than v2 but identical content; (3) the op's
    reported file counts match the manifests."""
    from morphl_model_publishers_churning_users_spark.operators._shared import (
        scratch_dir,
        t,
    )

    out = {r["snapshot"]: r for r in _Q["scan_iceberg_snapshot"](spark, sf_dir).collect()}
    tbl = scratch_dir("iceberg_snapshot")
    paths = {}
    for s in (1, 2, 3):
        paths[s] = sorted(
            r["path"] for r in spark.read.parquet(os.path.join(tbl, "manifests", f"v{s}")).collect()
        )
    assert len(paths[1]) == 4 and all("/data/b1/" in p for p in paths[1])
    assert len(paths[2]) == 6 and set(paths[1]) < set(paths[2])
    assert len(paths[3]) == 3 and not any("/data/b1/" in p for p in paths[3])

    # (1) time travel: v1 read == independent pre-2000 recomputation,
    # despite b2/c1 files existing alongside in the same tree.
    v1 = spark.read.parquet(*paths[1])
    base_n = (
        t(spark, sf_dir, "orders")
        .filter(F.col("o_orderdate") < F.lit("2000-01-01").cast("timestamp_ntz"))
        .count()
    )
    assert v1.count() == base_n == out[1]["n_rows"]

    # (2) compaction is metadata-only: different files, same rows.
    v2 = spark.read.parquet(*paths[2]).groupBy("o_orderkey").agg(F.sum("price").alias("s"))
    v3 = spark.read.parquet(*paths[3]).groupBy("o_orderkey").agg(F.sum("price").alias("s"))
    assert v2.exceptAll(v3).count() == 0 and v3.exceptAll(v2).count() == 0
    assert out[2]["n_rows"] == out[3]["n_rows"]
    assert out[2]["sum_total"] == out[3]["sum_total"]

    # (3) reported file counts came from _metadata.file_path inside the
    # snapshot reads and must equal the manifest lengths.
    for s in (1, 2, 3):
        assert out[s]["n_files"] == len(paths[s]), s
