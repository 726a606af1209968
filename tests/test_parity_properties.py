"""Property tests for the cross-engine parity primitives.

The repo's entire oracle discipline rests on two mechanisms:
  * half-up quantization  floor(x * 1eK + 0.5)  evaluating identically
    in Spark and DuckDB on identical doubles, and
  * DECIMAL accumulation being order-independent.
Hypothesis drives both against DuckDB directly (no Spark session —
these are pure engine-boundary checks; Spark's side is covered by the
556-key oracle suite, here we pin the DuckDB half of the contract and
the Python reference semantics the docstrings claim).
"""

from __future__ import annotations

import math

import duckdb
from hypothesis import given, settings
from hypothesis import strategies as st

_con = duckdb.connect()


def _duck_q6(x: float) -> float:
    return _con.execute(
        "SELECT FLOOR(? * 1e6 + 0.5) / 1e6", [x]
    ).fetchone()[0]


@given(st.floats(min_value=-1e9, max_value=1e9, allow_nan=False, allow_infinity=False))
@settings(max_examples=300, deadline=None)
def test_half_up_quantization_matches_python_reference(x):
    """floor(x*1e6 + 0.5)/1e6 in DuckDB == the same arithmetic done in
    Python on the same IEEE double — the exact expression every oracle
    twin uses. (Spark evaluates the identical double expression; the
    556-key suite pins that side.)"""
    expect = math.floor(x * 1e6 + 0.5) / 1e6
    assert _duck_q6(x) == expect


@given(
    st.lists(
        st.floats(min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False),
        min_size=1,
        max_size=50,
    )
)
@settings(max_examples=200, deadline=None)
def test_decimal_sum_is_order_independent(xs):
    """SUM(CAST(FLOOR(x*1e6+0.5) AS DECIMAL(38,6))) yields the same
    value for any permutation — the property double summation lacks and
    the reason every money-style aggregate quantizes into DECIMAL."""
    import pandas as pd

    q = (
        "SELECT CAST(SUM(CAST(FLOOR(col0 * 1e6 + 0.5) AS DECIMAL(38,6))) AS VARCHAR) "
        "FROM df"
    )
    _con.register("df", pd.DataFrame({"col0": xs}))
    fwd = _con.execute(q).fetchone()[0]
    _con.register("df", pd.DataFrame({"col0": list(reversed(xs))}))
    rev = _con.execute(q).fetchone()[0]
    assert fwd == rev


@given(st.integers(min_value=0, max_value=(1 << 28) - 1))
@settings(max_examples=300, deadline=None)
def test_varint_case_ladder_matches_wire_spec(v):
    """The fn_protobuf_wire varint CASE ladder == the protobuf wire
    spec's LEB128 for every value < 2^28 (the op's documented range)."""

    def ladder(x):
        if x < 128:
            return bytes([x])
        if x < 16384:
            return bytes([x % 128 + 128, x // 128])
        if x < 2097152:
            return bytes([x % 128 + 128, (x // 128) % 128 + 128, x // 16384])
        return bytes(
            [x % 128 + 128, (x // 128) % 128 + 128, (x // 16384) % 128 + 128, x // 2097152]
        )

    def leb128(x):
        out = bytearray()
        while True:
            b = x & 0x7F
            x >>= 7
            if x:
                out.append(b | 0x80)
            else:
                out.append(b)
                return bytes(out)

    assert ladder(v) == leb128(v)
