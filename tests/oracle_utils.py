"""Mirror of the driver's differential-oracle check (SURVEY.md §5.1).

Runs the Spark query and the DuckDB oracle SQL on the same parquet, then
compares row count + column-name set + an order-insensitive multiset of
canonicalized rows.

Both sides are materialized THROUGH PANDAS (Spark ``toPandas()``, DuckDB
``.df()``) exactly as the driver does, and canonicalization is
dtype-class-sensitive: an int64 on one side and a float64 on the other is
a MISMATCH even when the values are numerically equal.  Both historical
driver-only failures (agg_topn_array r1, ts_interval_merge r2) were this
class — DuckDB promoting integer arithmetic to HUGEINT, which pandas
materializes as float64 while Spark emits int64.  The old compare worked
at Python-value level where ``150 == 150.0``, so it could not catch them.

Equivalences the driver's history shows ARE allowed (and kept here):
  * Decimal ≡ float (DuckDB .df() turns DECIMAL into float64; Spark's
    DECIMAL(38,6) money sums arrive as decimal.Decimal — these hash-match
    in every green round), both rounded to 6 decimals;
  * integer widths (DuckDB emits int32 for literals, Spark int64);
  * date ≡ midnight timestamp (DuckDB .df() turns DATE into datetime64).
"""

from __future__ import annotations

import datetime as _dt
import decimal as _decimal
import math
from collections import Counter

import duckdb
import numpy as np
import pandas as pd

from morphl_model_publishers_churning_users_spark.catalog import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')"
        )
    return con


def _canon_value(v):
    """Canonicalize one cell to a (type-class, value) pair.

    The type-class tag is what makes the compare dtype-sensitive: int and
    float canonicalize to DIFFERENT tags, so engine-side type promotion
    (HUGEINT→float64) fails here the way it fails in the driver.
    """
    # --- nulls (None, NaN, NaT) ---
    if v is None:
        return None
    if isinstance(v, float) and math.isnan(v):
        return None
    if v is pd.NaT:
        return None
    # --- numpy scalar unwrap (keeps the dtype class) ---
    if isinstance(v, np.bool_):
        return ("b", bool(v))
    if isinstance(v, np.integer):
        return ("i", int(v))
    if isinstance(v, np.floating):
        f = float(v)
        if math.isnan(f):
            return None
        return ("f", round(f, 6) + 0.0)
    # --- python scalars ---
    if isinstance(v, bool):
        return ("b", v)
    if isinstance(v, int):
        return ("i", v)
    if isinstance(v, float):
        return ("f", round(v, 6) + 0.0)
    if isinstance(v, _decimal.Decimal):
        # DuckDB .df() materializes DECIMAL as float64; Spark keeps
        # decimal.Decimal objects. The driver hash-matches these, so both
        # canonicalize to the float class rounded to 6 decimals.
        return ("f", round(float(v), 6) + 0.0)
    # --- temporal ---
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, _dt.datetime):
        return ("t", v.replace(tzinfo=None).isoformat())
    if isinstance(v, _dt.date):
        # DuckDB .df() gives DATE back as midnight datetime64 — unify.
        return ("t", _dt.datetime(v.year, v.month, v.day).isoformat())
    # --- nested ---
    if isinstance(v, np.ndarray):
        return ("a", tuple(_canon_value(x) for x in v.tolist()))
    if isinstance(v, (list, tuple)):
        return ("a", tuple(_canon_value(x) for x in v))
    if isinstance(v, dict):
        return ("m", tuple(sorted((k, _canon_value(x)) for k, x in v.items())))
    if isinstance(v, (bytes, bytearray)):
        return ("y", bytes(v))
    if hasattr(v, "asDict"):  # pyspark Row (struct column without Arrow)
        return ("m", tuple(sorted((k, _canon_value(x)) for k, x in v.asDict().items())))
    return ("s", str(v)) if not isinstance(v, str) else ("s", v)


def _canon_frame(df: pd.DataFrame) -> Counter:
    cols = sorted(df.columns)
    out = Counter()
    for row in df[cols].itertuples(index=False, name=None):
        out[tuple(_canon_value(v) for v in row)] += 1
    return out


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    # Driver-canonicalizer guard (VERDICT r3 item 9): the driver sorts
    # result rows with pandas sort_values before hashing, which CRASHES
    # on raw array/map/struct cells (unhashable ndarray — the r3
    # fn_array_setops failure). Any oracle-twinned query must serialize
    # complex columns (array_join / to_json) before returning.
    import pyspark.sql.types as _T

    complex_cols = [
        f.name
        for f in spark_df.schema.fields
        if isinstance(f.dataType, (_T.ArrayType, _T.MapType, _T.StructType))
    ]
    assert not complex_cols, (
        f"oracle-twinned query emits raw complex-typed columns {complex_cols}; "
        "serialize them (array_join/to_json) or the driver harness will crash"
    )

    con = duck_connect(sf_dir)
    try:
        o_df = con.execute(oracle_sql).df()
    finally:
        con.close()

    s_df = spark_df.toPandas()

    assert sorted(s_df.columns) == sorted(o_df.columns), (
        f"columns differ: spark={sorted(s_df.columns)} oracle={sorted(o_df.columns)}"
    )
    assert len(s_df) == len(o_df), (
        f"row count differs: spark={len(s_df)} oracle={len(o_df)}"
    )

    s_multi = _canon_frame(s_df)
    o_multi = _canon_frame(o_df)
    if s_multi != o_multi:
        only_spark = list((s_multi - o_multi).items())[:5]
        only_oracle = list((o_multi - s_multi).items())[:5]
        raise AssertionError(
            f"value mismatch\n  only in spark: {only_spark}\n  only in oracle: {only_oracle}"
        )
