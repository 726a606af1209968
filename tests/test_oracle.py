"""Differential oracle tests — every registered operator with an oracle
twin is checked Spark-vs-DuckDB exactly the way the driver does."""

from __future__ import annotations

import pytest

from morphl_model_publishers_churning_users_spark.registry import get_oracles, get_queries

from .oracle_utils import compare

_QUERIES = get_queries()
_ORACLES = get_oracles()


@pytest.mark.parametrize("key", sorted(_ORACLES))
def test_oracle_parity(spark, sf_dir, key):
    compare(_QUERIES[key](spark, sf_dir), _ORACLES[key], sf_dir)


@pytest.mark.parametrize("key", sorted(set(_QUERIES) - set(_ORACLES)))
def test_rows_only_runs(spark, sf_dir, key):
    """Rows-only ops must at least run and produce a stable schema."""
    df = _QUERIES[key](spark, sf_dir)
    rows = df.collect()
    assert df.columns, key
    assert rows is not None


def test_no_duplicate_output_columns(spark, sf_dir):
    """The driver canonicalizer sorts result columns BY NAME before
    hashing — duplicate names would silently mis-pair values. Sweep
    every registered query's analyzed schema."""
    bad = {}
    for key, fn in _QUERIES.items():
        cols = fn(spark, sf_dir).columns
        if len(cols) != len(set(cols)):
            bad[key] = cols
    assert not bad, bad


# NOTE: no table-name lint for the oracle SQL — test_oracle_parity
# executes every twin against the driver's exact DuckDB view set, which
# proves table resolution far more reliably than a regex could.
