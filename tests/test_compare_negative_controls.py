"""Negative controls for the oracle-compare harness itself (round 9).

Every green in this repo flows through ``tests/oracle_utils.compare`` —
if THAT function were unable to fail, 560 keys × 10 config axes of
"hash-green" would be vacuous. These controls corrupt a known-good
result one defect class at a time and assert compare RAISES, covering
exactly the mismatch classes the driver's history produced:

  * a single cell value off (beyond 6-decimal rounding),
  * a float off only in the 7th decimal (must PASS — rounding contract),
  * a dropped row / duplicated row (multiset, not set, semantics),
  * a renamed column,
  * dtype-class drift: int64 result vs float-typed oracle of equal value
    (the agg_topn_array r1 / ts_interval_merge r2 driver-only failure
    class — numerically equal, must STILL fail),
  * raw complex-typed output (driver canonicalizer would crash — the
    harness must refuse it up front).
"""

from __future__ import annotations

import pytest
import pyspark.sql.functions as F

from .oracle_utils import compare


def _base(spark):
    return spark.range(1, 4).select(
        F.col("id").cast("bigint").alias("k"),
        (F.col("id") * 10).cast("bigint").alias("v"),
    )


BASE_SQL = "SELECT CAST(x AS BIGINT) AS k, CAST(x * 10 AS BIGINT) AS v FROM (VALUES (1), (2), (3)) t(x)"


def test_identical_passes(spark, sf_dir):
    compare(_base(spark), BASE_SQL, sf_dir)


def test_single_cell_off_fails(spark, sf_dir):
    bad = _base(spark).withColumn(
        "v", F.when(F.col("k") == 2, F.lit(21).cast("bigint")).otherwise(F.col("v"))
    )
    with pytest.raises(AssertionError, match="value mismatch"):
        compare(bad, BASE_SQL, sf_dir)


def test_seventh_decimal_passes_sixth_fails(spark, sf_dir):
    # Rounding contract: both sides round floats to 6 decimals.
    f = spark.range(1).select((F.lit(1.0000001) + F.col("id")).alias("x"))
    compare(f, "SELECT 1.0 AS x", sf_dir)  # 7th decimal: equal after rounding
    f6 = spark.range(1).select((F.lit(1.000001) + F.col("id")).alias("x"))
    with pytest.raises(AssertionError, match="value mismatch"):
        compare(f6, "SELECT 1.0 AS x", sf_dir)


def test_missing_row_fails(spark, sf_dir):
    with pytest.raises(AssertionError, match="row count"):
        compare(_base(spark).filter(F.col("k") < 3), BASE_SQL, sf_dir)


def test_duplicated_row_fails(spark, sf_dir):
    dup = _base(spark).unionAll(_base(spark).filter(F.col("k") == 1))
    with pytest.raises(AssertionError, match="row count"):
        compare(dup, BASE_SQL, sf_dir)


def test_same_count_different_multiset_fails(spark, sf_dir):
    # Same row COUNT, but one row duplicated and another dropped — only
    # multiset comparison catches this.
    skew = _base(spark).filter(F.col("k") < 3).unionAll(
        _base(spark).filter(F.col("k") == 1)
    )
    with pytest.raises(AssertionError, match="value mismatch"):
        compare(skew, BASE_SQL, sf_dir)


def test_renamed_column_fails(spark, sf_dir):
    with pytest.raises(AssertionError, match="columns differ"):
        compare(_base(spark).withColumnRenamed("v", "val"), BASE_SQL, sf_dir)


def test_dtype_class_drift_fails(spark, sf_dir):
    # Numerically equal, int64 vs float64 — the r1/r2 driver-only
    # failure class; the dtype-sensitive canon must still fail it.
    with pytest.raises(AssertionError, match="value mismatch"):
        compare(
            _base(spark),
            "SELECT CAST(x AS BIGINT) AS k, CAST(x * 10 AS DOUBLE) AS v "
            "FROM (VALUES (1), (2), (3)) t(x)",
            sf_dir,
        )


def test_raw_complex_column_refused(spark, sf_dir):
    arr = spark.range(1).select(F.array(F.lit(1), F.lit(2)).alias("a"))
    with pytest.raises(AssertionError, match="complex-typed"):
        compare(arr, "SELECT [1, 2] AS a", sf_dir)
