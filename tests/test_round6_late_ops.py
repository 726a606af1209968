"""Invariant tests for the late-round-6 operators — algorithmic
properties the oracle hash can't see (it proves cross-engine equality,
not that the algorithm satisfies its own theory)."""

from __future__ import annotations

import pytest

from morphl_model_publishers_churning_users_spark.registry import get_queries

_Q = get_queries()


def test_lsh_curve_is_monotone(spark, sf_dir):
    """More rows per band ⇒ stricter candidates: candidate count and
    recall must both be non-increasing in r (the S-curve's direction).
    NOTE: recall == 1.0 even at r=1 is NOT an LSH invariant (a true
    pair misses all 8 single-hash bands w.p. (1-J)^8), so only the
    monotone shape is asserted."""
    rows = {r["rows_per_band"]: r for r in _Q["llm_lsh_tuning_curve"](spark, sf_dir).collect()}
    rs = sorted(rows)
    for a, b in zip(rs, rs[1:]):
        assert rows[a]["n_candidates"] >= rows[b]["n_candidates"], (a, b)
        assert rows[a]["recall"] >= rows[b]["recall"], (a, b)


def test_isotonic_fit_is_monotone_and_bounded(spark, sf_dir):
    """PAV output must be non-decreasing in bin order, bounded by the
    raw rates' range, and equal to the raw rate wherever the raw curve
    is already isotone end-to-end."""
    rows = sorted(
        _Q["ml_isotonic_pav"](spark, sf_dir).collect(), key=lambda r: r["bin"]
    )
    iso = [r["iso_rate"] for r in rows]
    raw = [r["raw_rate"] for r in rows]
    assert all(a <= b + 1e-9 for a, b in zip(iso, iso[1:]))
    assert min(raw) - 1e-9 <= min(iso) and max(iso) <= max(raw) + 1e-9


def test_km_curve_decreasing_with_sane_se(spark, sf_dir):
    """S(t) must be non-increasing from 1.0, and Greenwood SE must be
    non-negative and zero before the first death."""
    rows = sorted(
        _Q["ml_km_greenwood"](spark, sf_dir).collect(), key=lambda r: r["day_n"]
    )
    s = [r["s_km"] for r in rows]
    assert all(a >= b - 1e-9 for a, b in zip(s, s[1:]))
    assert s[0] <= 1.0 + 1e-9
    assert all(r["se_greenwood"] >= 0 for r in rows)


def test_haar_energy_nonnegative_and_coeff_counts(spark, sf_dir):
    """Energies are sums of squares (≥ 0) and the dyadic cascade halves
    the coefficient count per level (24 → 12 → 6 → 3)."""
    rows = {r["level"]: r for r in _Q["ts_haar_energy"](spark, sf_dir).collect()}
    assert rows[1]["n_coeffs"] == 12
    assert rows[2]["n_coeffs"] == 6
    assert rows[3]["n_coeffs"] == 3
    assert all(r["energy"] >= 0 for r in rows.values())


def test_bitmap_algebra_consistent(spark, sf_dir):
    """Inclusion-exclusion must hold exactly on the popcounts:
    |A|+|B| = |A∩B|+|A∪B|."""
    r = _Q["agg_bitmap_sets"](spark, sf_dir).collect()[0]
    assert r["n_buyers"] + r["n_erred"] == r["n_both"] + r["n_either"]
    assert r["n_both"] <= min(r["n_buyers"], r["n_erred"])


def test_qq_theory_quantiles_symmetric(spark, sf_dir):
    """The Acklam probit must be antisymmetric around the median:
    z(p) = -z(1-p), and z(0.5) = 0."""
    rows = {round(r["p"], 1): r["z_theory"] for r in _Q["agg_qq_normal"](spark, sf_dir).collect()}
    assert rows[0.5] == pytest.approx(0.0, abs=1e-6)
    for p in (0.1, 0.2, 0.3, 0.4):
        assert rows[p] == pytest.approx(-rows[round(1 - p, 1)], abs=1e-6)


def test_hash_walks_stay_on_edges(spark, sf_dir):
    """Every consecutive hop of every walk must be a real edge of the
    symmetrized co-purchase graph (the walker can't teleport)."""
    from morphl_model_publishers_churning_users_spark.operators.graph import (
        _copurchase_edges,
        _sym,
    )

    walks = _Q["graph_hash_walks"](spark, sf_dir)
    sym = _sym(_copurchase_edges(spark, sf_dir))
    for a, b in (("start", "hop1"), ("hop1", "hop2"), ("hop2", "hop3")):
        bad = (
            walks.select(walks[a].alias("src"), walks[b].alias("dst"))
            .join(sym, ["src", "dst"], "left_anti")
            .count()
        )
        assert bad == 0, (a, b)


def test_delong_se_shrinks_with_scale(spark):
    """DeLong SE must shrink as the sample grows (≈ 1/√n)."""
    se = {}
    for sf in ("/root/testdata/sf0.001", "/root/testdata/sf0.01"):
        se[sf] = _Q["ml_auc_delong_se"](spark, sf).collect()[0]["se_delong"]
    if se["/root/testdata/sf0.001"] is not None:
        assert se["/root/testdata/sf0.01"] < se["/root/testdata/sf0.001"]


def test_adaptive_sessions_partition_events(spark, sf_dir):
    """Adaptive sessionization must conserve events: per-user session
    event counts sum to the user's event count (for included users)."""
    import pyspark.sql.functions as F
    from morphl_model_publishers_churning_users_spark.operators._shared import t as tbl

    out = _Q["ts_session_adaptive"](spark, sf_dir)
    ev = tbl(spark, sf_dir, "events").groupBy("user_id").agg(F.count(F.lit(1)).alias("n"))
    bad = (
        out.join(ev, "user_id")
        .filter(F.col("n_events") != F.col("n"))
        .count()
    )
    assert bad == 0
