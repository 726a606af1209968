"""Mirror of the driver's differential-oracle check (SURVEY.md §5.1).

Runs the Spark query and the DuckDB oracle SQL on the same parquet, then
compares row count + column-name set + an order-insensitive multiset of
canonicalized rows (floats rounded to 6 decimals, timestamps → isoformat).
Failures here should predict failures in CORRECTNESS_r{N}.json.
"""

from __future__ import annotations

import datetime as _dt
import math
from collections import Counter

import duckdb

from morphl_model_publishers_churning_users_spark.catalog import TABLES


def duck_connect(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for tbl in TABLES:
        con.execute(
            f"CREATE VIEW {tbl} AS SELECT * FROM read_parquet('{sf_dir}/{tbl}.parquet')"
        )
    return con


def _canon_value(v):
    if v is None:
        return None
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return round(v, 6) + 0.0  # -0.0 → 0.0
    if isinstance(v, _dt.datetime):
        return v.replace(tzinfo=None).isoformat()
    if isinstance(v, _dt.date):
        return v.isoformat()
    if isinstance(v, (list, tuple)):
        return tuple(_canon_value(x) for x in v)
    if hasattr(v, "item"):  # numpy scalar
        return _canon_value(v.item())
    return v


def _canon_rows(columns: list[str], rows) -> Counter:
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    return Counter(tuple(_canon_value(row[i]) for i in order) for row in rows)


def compare(spark_df, oracle_sql: str, sf_dir: str) -> None:
    con = duck_connect(sf_dir)
    try:
        res = con.execute(oracle_sql)
        o_cols = [d[0] for d in res.description]
        o_rows = res.fetchall()
    finally:
        con.close()

    s_rows = spark_df.collect()
    s_cols = spark_df.columns

    assert sorted(s_cols) == sorted(o_cols), f"columns differ: spark={sorted(s_cols)} oracle={sorted(o_cols)}"
    assert len(s_rows) == len(o_rows), f"row count differs: spark={len(s_rows)} oracle={len(o_rows)}"

    s_multi = _canon_rows(s_cols, [[row[c] for c in s_cols] for row in s_rows])
    o_multi = _canon_rows(o_cols, o_rows)
    if s_multi != o_multi:
        only_spark = list((s_multi - o_multi).items())[:5]
        only_oracle = list((o_multi - s_multi).items())[:5]
        raise AssertionError(
            f"value mismatch\n  only in spark: {only_spark}\n  only in oracle: {only_oracle}"
        )
