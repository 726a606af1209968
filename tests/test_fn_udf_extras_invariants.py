"""Semantic invariants for the fn_* extras (url/variant/bitwise/
string-distance/mask/array-setops) and the two Arrow UDF keys — all
driver-green since rounds 3-4 but untested between canary re-touches.
Each contract is re-derived with pure-Python bit math, urllib parsing,
or Levenshtein recomputation on a sample, so both-engines-wrong drift
fails locally."""

from __future__ import annotations

from urllib.parse import parse_qs, urlparse

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.operators._shared import t
from morphl_model_publishers_churning_users_spark.registry import get_queries

_Q = get_queries()


def _df(spark, sf_dir, key):
    return _Q[key](spark, sf_dir)


def _lev(a, b):
    m, n = len(a), len(b)
    prev = list(range(n + 1))
    for i in range(1, m + 1):
        cur = [i] + [0] * n
        for j in range(1, n + 1):
            cur[j] = min(
                prev[j] + 1, cur[j - 1] + 1, prev[j - 1] + (a[i - 1] != b[j - 1])
            )
        prev = cur
    return prev[n]


def test_fn_url_parses_like_urllib(spark, sf_dir):
    rows = _df(spark, sf_dir, "fn_url").limit(100).collect()
    assert len(rows) >= 1
    for r in rows:
        p = urlparse(r["url"])
        q = parse_qs(p.query)
        assert r["host"] == p.hostname
        assert r["path"] == p.path
        assert r["seg"] == q.get("seg", [None])[0]
        assert r["n_param"] == q.get("n", [None])[0]


def test_fn_variant_bucket_is_mod10_of_typed_extract(spark, sf_dir):
    d = _df(spark, sf_dir, "fn_variant")
    ev = t(spark, sf_dir, "events")
    assert d.count() == ev.count()
    assert d.filter(
        F.col("k").isNotNull() & (F.col("k_bucket") != F.col("k") % 10)
    ).count() == 0
    # Cross-check the typed extract against an independent JVM path.
    j = d.alias("v").join(ev.alias("e"), F.col("v.event_id") == F.col("e.event_id"))
    assert j.filter(
        F.col("k") != F.get_json_object("e.props", "$.k").cast("int")
    ).count() == 0


def test_fn_bitwise_matches_python_bit_math(spark, sf_dir):
    rows = _df(spark, sf_dir, "fn_bitwise").limit(300).collect()
    for r in rows:
        k = r["o_orderkey"]
        assert r["band"] == k & 255
        assert r["bor"] == k | 4096
        assert r["bxor"] == k ^ 255
        assert r["shl"] == k << 2
        assert r["shr"] == k >> 3
        assert r["popcnt"] == bin(k).count("1")


def test_fn_string_distance_matches_python_levenshtein(spark, sf_dir):
    d = _df(spark, sf_dir, "fn_string_distance").alias("s")
    part = t(spark, sf_dir, "part").alias("p")
    rows = (
        d.join(part, F.col("s.p_partkey") == F.col("p.p_partkey"))
        .select("name_type_dist", "brand_rev", "brand_clean", "name_head", "type_tail", "p.p_name", "p.p_type", "p.p_brand")
        .limit(100)
        .collect()
    )
    for r in rows:
        assert r["name_type_dist"] == _lev(r["p_name"][:10], r["p_type"][:10])
        assert r["brand_rev"] == r["p_brand"][::-1]
        assert r["brand_clean"] == r["p_brand"].replace("#", "-")
        assert r["name_head"] == r["p_name"][:5]
        assert r["type_tail"] == r["p_type"][-4:]


def test_fn_mask_redacts_every_alnum(spark, sf_dir):
    d = _df(spark, sf_dir, "fn_mask").alias("m")
    part = t(spark, sf_dir, "part").alias("p")
    rows = (
        d.join(part, F.col("m.p_partkey") == F.col("p.p_partkey"))
        .select("name_masked", "brand_digits_masked", "p.p_name", "p.p_brand")
        .limit(200)
        .collect()
    )
    for r in rows:
        # Shape-preserving mask: same length, no original letters
        # survive, separators stay put.
        assert len(r["name_masked"]) == len(r["p_name"])
        assert not any(c.isdigit() for c in r["name_masked"])
        assert all(
            (mc == " ") == (oc == " ") for mc, oc in zip(r["name_masked"], r["p_name"])
        )
        # Digit-only mask keeps the brand prefix readable.
        assert r["brand_digits_masked"].startswith("Brand")
        assert not any(c.isdigit() for c in r["brand_digits_masked"])


def test_fn_array_setops_obey_set_algebra(spark, sf_dir):
    rows = _df(spark, sf_dir, "fn_array_setops").collect()
    for r in rows:
        both = set(r["both_periods"].split(",")) - {""}
        only_first = set(r["only_first"].split(",")) - {""}
        all_types = set(r["all_types"].split(",")) - {""}
        # intersection and difference are disjoint, and both are
        # subsets of the union.
        assert both & only_first == set()
        assert both <= all_types
        assert only_first <= all_types


def test_udf_arrow_affine_transform_inverts(spark, sf_dir):
    d = _df(spark, sf_dir, "udf_arrow").alias("a")
    ev = t(spark, sf_dir, "events").alias("e")
    assert d.count() == ev.count()
    j = d.join(ev, F.col("a.event_id") == F.col("e.event_id"))
    # boosted = 2v + 1: invert through JVM arithmetic.
    assert j.filter(
        F.abs((F.col("boosted") - 1.0) / 2.0 - F.col("e.value")) > 1e-4
    ).count() == 0


def test_udf_python_arrow_tag_and_doubling(spark, sf_dir):
    d = _df(spark, sf_dir, "udf_python_arrow").alias("u")
    docs = t(spark, sf_dir, "documents").alias("d")
    assert d.count() == docs.count()
    j = d.join(docs, F.col("u.doc_id") == F.col("d.doc_id"))
    assert j.filter(
        F.col("tag")
        != F.concat_ws("/", F.col("d.lang"), F.col("d.n_chars").cast("string"))
    ).count() == 0
    assert j.filter(F.col("doubled") != 2 * F.col("d.n_chars")).count() == 0
