"""Operator registry — the driver-contract surface.

Every SURVEY.md §2 operator registers:
  * a query callable ``(spark, sf_dir) -> DataFrame`` (exposed through
    ``__spark_entry__.queries()``), and
  * optionally a DuckDB oracle SQL twin (``__spark_entry__.oracle_sql()``).

Oracle discipline (SURVEY.md §5.1):
  * alias every computed column identically in Spark and SQL — the driver
    sorts columns BY NAME before hashing;
  * round floating outputs to 6 decimals on both sides;
  * money-style SUMs go through DECIMAL(38,6) so the result is exact and
    partition-order-independent (double summation order differs between
    engines and can flip the 6th decimal on ~1e9-magnitude totals).
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Optional

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLES: dict[str, str] = {}


def register(key: str, oracle: Optional[str] = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator registering a §2 operator query (and its oracle twin)."""

    def deco(fn: QueryFn) -> QueryFn:
        if key in QUERIES:
            raise ValueError(f"duplicate operator key: {key}")
        QUERIES[key] = fn
        if oracle is not None:
            ORACLES[key] = oracle
        return fn

    return deco


def get_queries() -> dict[str, QueryFn]:
    from . import load_all_operators

    load_all_operators()
    return dict(QUERIES)


def get_oracles() -> dict[str, str]:
    from . import load_all_operators

    load_all_operators()
    return dict(ORACLES)
