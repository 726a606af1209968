"""Round-13 optimization: the codec ops' decode side moved from Catalyst
expression ladders to Arrow-batch Python walks (functions/avro_arrow).
These tests pin the new decoder internals cross-implementation: the wire
is built by the UNCHANGED JVM encode expressions, and the Python readers
must invert it exactly at every limb/sign boundary of the int64 domain —
the same adversarial grid the retired expression decoders were pinned on
(test_round7/8_ops varint boundary tests, which keep covering the JVM
ladder helpers themselves).
"""

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.functions.avro_arrow import (
    _read_uvarint,
    _read_varint,
)
from morphl_model_publishers_churning_users_spark.functions.scalar import (
    _avro_zigzag,
    _pb_varint,
    _pb_varint_u64,
)


def _zigzag_boundary_vals():
    vals = [0, -1, 1, -2, 2, 63, -64, 64, -65, 8191, -8192, 8192]
    for k in range(2, 10):  # zigzag limb boundaries: |zz| around 2^(7k)
        b = 1 << (7 * k - 1)
        vals += [b - 1, -b, b, -b - 1]
    vals += [(1 << 61), -(1 << 61), (1 << 62) - 1, -(1 << 62)]
    # the 10-limb domain the 9-limb ladders could not reach
    vals += [(1 << 62), -(1 << 62) - 1, (1 << 63) - 1, -(1 << 63)]
    return sorted(set(vals))


def test_read_varint_inverts_jvm_avro_encode_at_all_boundaries(spark):
    """JVM zigzag+varint encode -> avro_arrow._read_varint decode must be
    the identity over the FULL int64 domain including 10-limb wires, and
    the returned cursor must land exactly at end-of-wire (tiling)."""
    vals = _zigzag_boundary_vals()
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    rows = df.select(
        "v", _pb_varint_u64(_avro_zigzag(F.col("v"))).alias("payload")
    ).collect()
    assert len(rows) == len(vals)
    for r in rows:
        back, pos = _read_varint(r["payload"], 0)
        assert back == r["v"], (r["v"], back)
        assert pos == len(r["payload"]), (r["v"], pos, len(r["payload"]))


def test_read_uvarint_inverts_jvm_proto_encode_at_all_boundaries(spark):
    """JVM proto3 varint encode -> avro_arrow._read_uvarint decode must
    be the identity over the non-negative bigint domain (1..9 limbs)."""
    vals = [0, 1, 127, 128, 16383, 16384, 2097151, 2097152]
    for k in range(4, 9):
        vals += [(1 << (7 * k)) - 1, 1 << (7 * k)]
    vals += [1 << 28, (1 << 35) - 1, 1 << 62, (1 << 63) - 1]
    vals = sorted(set(vals))
    df = spark.createDataFrame([(v,) for v in vals], "v bigint")
    rows = df.select("v", _pb_varint(F.col("v")).alias("payload")).collect()
    assert len(rows) == len(vals)
    for r in rows:
        back, pos = _read_uvarint(r["payload"], 0)
        assert back == r["v"], (r["v"], back)
        assert pos == len(r["payload"])


def test_wire_op_roundtrip_flag_true_on_fixture(spark, sf_dir):
    """"fn_avro_wire" / "fn_protobuf_wire" end to end on the fixture:
    every row's ok-flag must hold with the Arrow decode in the loop —
    JVM encoder and Python decoder are independent implementations, so
    a desync in either flips the flag."""
    from morphl_model_publishers_churning_users_spark.registry import get_queries

    q = get_queries()
    avro = q["fn_avro_wire"](spark, sf_dir)
    assert avro.filter(~F.col("roundtrip_ok")).count() == 0
    proto = q["fn_protobuf_wire"](spark, sf_dir)
    assert proto.filter(~F.col("roundtrip_ok")).count() == 0
