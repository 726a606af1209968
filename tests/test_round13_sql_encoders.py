"""Round-13 optimization pin: the SQL-text varint encoders
(functions/scalar._vu64_sql/_v9n_sql/_zz_sql/_vzz_sql) must emit bytes
IDENTICAL to the Column-ladder reference implementations they replaced
in the codec ops' encode paths (_pb_varint_u64/_pb_varint/_avro_zigzag)
— at every limb boundary, both signs, the 10-limb negative-carrier
domain, NULL, and inside higher-order-function lambdas (the
array/map-block item folds). An optimization changed operator internals,
so this test pins the changed boundary (guide §1/§4 discipline)."""

from __future__ import annotations

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.functions import scalar as S

_I64 = 1 << 63


def _clamp(v: int) -> int:
    return ((v + _I64) % (1 << 64)) - _I64


def _domain() -> list[int]:
    vals = {0, 1, -1, 2, -2, 63, 64, 127, 128, 129, -127, -128, -129,
            5000000, -5000000, 200000, -200000,
            987654321987654321, -123456789012345678}
    for k in range(1, 10):
        b = 1 << (7 * k)
        vals.update(_clamp(x) for x in (b - 1, b, b + 1, -b, -b + 1, -b - 1))
    vals.update(
        _clamp(x)
        for x in ((1 << 62) - 1, 1 << 62, (1 << 62) + 1, -(1 << 62),
                  -(1 << 62) - 1, (1 << 63) - 1, -_I64, -_I64 + 1)
    )
    return sorted(vals)


def test_sql_encoders_bit_identical_to_ladders(spark):
    df = spark.createDataFrame([(v,) for v in _domain()], "v bigint")
    rows = df.select(
        "v",
        S._pb_varint_u64(F.col("v")).alias("lad_u64"),
        F.expr(S._vu64_sql("v")).alias("sql_u64"),
        S._pb_varint(F.col("v")).alias("lad_9n"),
        F.expr(S._v9n_sql("v")).alias("sql_9n"),
        S._avro_zigzag(F.col("v")).alias("lad_zz"),
        F.expr(S._zz_sql("v")).alias("sql_zz"),
        S._pb_varint_u64(S._avro_zigzag(F.col("v"))).alias("lad_vzz"),
        F.expr(S._vzz_sql("v")).alias("sql_vzz"),
    ).collect()
    assert rows, "empty domain"
    for r in rows:
        assert r.lad_u64 == r.sql_u64, f"u64 mismatch at {r.v}"
        assert r.lad_9n == r.sql_9n, f"9-limb/NULL mismatch at {r.v}"
        assert r.lad_zz == r.sql_zz, f"zigzag mismatch at {r.v}"
        assert r.lad_vzz == r.sql_vzz, f"zz+varint mismatch at {r.v}"


def test_sql_encoder_null_propagates(spark):
    row = spark.createDataFrame([(None,)], "v bigint").select(
        F.expr(S._vu64_sql("v")).alias("u64"),
        F.expr(S._v9n_sql("v")).alias("n9"),
        F.expr(S._vzz_sql("v")).alias("vzz"),
    ).collect()[0]
    assert row.u64 is None and row.n9 is None and row.vzz is None


def test_sql_encoder_inside_hof_fold_matches_ladder(spark):
    arr = [1, -5000000, _clamp((1 << 62) + 3), 0, -1, (1 << 62) - 1]
    row = spark.createDataFrame([(arr,)], "arr array<bigint>").select(
        F.aggregate(
            "arr",
            F.lit(b""),
            lambda acc, x: F.concat(acc, S._pb_varint_u64(S._avro_zigzag(x))),
        ).alias("lad"),
        F.expr(
            f"aggregate(arr, X'', (acc, x) -> concat(acc, {S._vzz_sql('x')}))"
        ).alias("sql"),
    ).collect()[0]
    assert bytes(row.lad) == bytes(row.sql)
