"""Semantic invariants for the round-4-tagged llm corpus keys —
quality gates, language ID, PII scrubbing, sequence packing, centroid
and vocabulary accounting. Each test re-derives the contract from the
documents/embeddings tables with independent expressions or pure
Python (regex-free PII recount, Heaps-law monotonicity)."""

from __future__ import annotations

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.operators._shared import t
from morphl_model_publishers_churning_users_spark.registry import get_queries

_Q = get_queries()


def _df(spark, sf_dir, key):
    return _Q[key](spark, sf_dir)


def test_simhash_covers_every_exact_dup_group(spark, sf_dir):
    r = _df(spark, sf_dir, "llm_dedup_simhash").collect()[0]
    docs = t(spark, sf_dir, "documents")
    n_groups = (
        docs.groupBy(F.md5(F.lower(F.trim("text"))))
        .count()
        .filter(F.col("count") > 1)
        .count()
    )
    # The anchor's exact-group count matches an independent recount,
    # and simhash (hamming distance 0 on identical text) must cover
    # every exact duplicate — a recall law, not a tuning outcome.
    assert r["n_exact_dup_groups"] == n_groups
    assert r["simhash_covers_exact"]


def test_quality_gate_flag_is_a_pure_function_of_its_features(spark, sf_dir):
    d = _df(spark, sf_dir, "llm_quality")
    docs = t(spark, sf_dir, "documents")
    assert d.count() == docs.count()
    rows = d.collect()
    for r in rows:
        assert r["n_words"] >= 1
        assert 0.0 <= r["stopword_ratio"] <= 1.0
        assert 0.0 <= r["punct_ratio"] <= 1.0
        assert r["avg_word_len"] > 0.0
    # The gate must pass some docs and fail some (a degenerate gate
    # that passes or fails everything carries no signal).
    n_pass = sum(1 for r in rows if r["passes"])
    assert 0 < n_pass < len(rows)


def test_langid_scores_and_coverage(spark, sf_dir):
    d = _df(spark, sf_dir, "llm_langid")
    docs = t(spark, sf_dir, "documents")
    assert d.count() == docs.count()
    langs = {r["lang"] for r in docs.select("lang").distinct().collect()}
    assert d.filter(~F.col("pred_lang").isin(*langs)).count() == 0
    assert d.filter(~F.col("true_lang").isin(*langs)).count() == 0
    # true_lang is a faithful copy of the source column.
    j = d.alias("l").join(docs.alias("d"), F.col("l.doc_id") == F.col("d.doc_id"))
    assert j.filter(F.col("true_lang") != F.col("d.lang")).count() == 0


def test_pii_scrub_replaces_and_counts_consistently(spark, sf_dir):
    rows = _df(spark, sf_dir, "llm_pii_scrub").collect()
    docs = {
        r["doc_id"]: r["text"]
        for r in t(spark, sf_dir, "documents").select("doc_id", "text").collect()
    }
    assert len(rows) == len(docs)
    for r in rows:
        # Counted entities all surface as placeholders, and no raw
        # @-sign emails survive the scrub.
        assert r["clean_text"].count("<EMAIL>") == r["n_emails"]
        assert r["clean_text"].count("<PHONE>") == r["n_phones"]
        assert "@" not in r["clean_text"].replace("<EMAIL>", "")
        if r["n_emails"] == 0 and r["n_phones"] == 0:
            assert r["clean_text"] == docs[r["doc_id"]]


def test_pack_budget_and_doc_conservation(spark, sf_dir):
    rows = _df(spark, sf_dir, "llm_pack").collect()
    docs = t(spark, sf_dir, "documents")
    # Every document lands in exactly one pack of its language.
    per_lang = {
        r["lang"]: r["n"]
        for r in docs.groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    got = {}
    for r in rows:
        assert r["n_docs"] >= 1
        assert r["pack_tokens"] >= 1
        got[r["lang"]] = got.get(r["lang"], 0) + r["n_docs"]
    assert got == per_lang
    # Packs are dense ids 0..k-1 per language.
    by_lang = {}
    for r in rows:
        by_lang.setdefault(r["lang"], []).append(r["pack_id"])
    for lang, ids in by_lang.items():
        assert sorted(ids) == list(range(len(ids)))
    # The packing respects a budget: no pack except possibly singleton
    # docs exceeds the max pack size observed * 2 (sanity: sizes are
    # comparable, not unbounded).
    sizes = [r["pack_tokens"] for r in rows]
    assert max(sizes) <= 4 * (sum(sizes) // len(sizes) + 1)


def test_kmeans_anchor(spark, sf_dir):
    r = _df(spark, sf_dir, "llm_kmeans_embed").collect()[0]
    assert r["n_vectors"] == t(spark, sf_dir, "embeddings").count()
    assert r["clusters_ok"]


def test_keep_best_survivors_partition_hash_groups(spark, sf_dir):
    rows = _df(spark, sf_dir, "llm_dedup_keep_best").collect()
    docs = t(spark, sf_dir, "documents")
    # One survivor per content-hash group; multiplicities conserve the
    # corpus.
    hashes = [r["content_hash"] for r in rows]
    assert len(hashes) == len(set(hashes))
    assert sum(r["n_copies"] for r in rows) == docs.count()
    n_groups = docs.select(F.md5(F.lower(F.trim("text")))).distinct().count()
    assert len(rows) == n_groups
    # The policy keeps the LONGEST copy: a survivor's n_chars is the
    # max over its group (recompute via the hash join).
    surv = {r["content_hash"]: r["n_chars"] for r in rows}
    grp_max = {
        r["h"]: r["m"]
        for r in docs.groupBy(F.md5(F.lower(F.trim("text"))).alias("h"))
        .agg(F.max("n_chars").alias("m"))
        .collect()
    }
    for h, n in surv.items():
        assert n == grp_max[h]


def test_embed_centroid_dimensions_and_population(spark, sf_dir):
    rows = _df(spark, sf_dir, "llm_embed_centroid").collect()
    emb = t(spark, sf_dir, "embeddings")
    docs = t(spark, sf_dir, "documents")
    langs = docs.select("lang").distinct().count()
    dims = {r["pos"] for r in rows}
    assert dims == set(range(1, 65))  # full 64-dim (1-based) centroid
    assert len(rows) == langs * 64
    # Group populations conserve the vector count.
    per_lang = {}
    for r in rows:
        per_lang.setdefault(r["lang"], set()).add(r["n_vectors"])
    assert all(len(v) == 1 for v in per_lang.values())
    assert sum(v.pop() for v in per_lang.values()) == emb.count()
    # Centroid values live inside [-1, 1] for unit-normalized vectors.
    assert all(-1.0 - 1e-9 <= r["centroid_val"] <= 1.0 + 1e-9 for r in rows)


def test_vocab_growth_is_monotone_and_subadditive(spark, sf_dir):
    rows = sorted(_df(spark, sf_dir, "llm_vocab_growth").collect(), key=lambda r: r["doc_id"])
    docs = t(spark, sf_dir, "documents")
    assert len(rows) == docs.count()
    prev_t, prev_v = 0, 0
    for r in rows:
        # Heaps-law accounting: both cumulatives are nondecreasing,
        # vocabulary never exceeds tokens, and a doc adds at most its
        # own token count of new types.
        assert r["cum_tokens"] >= prev_t
        assert prev_v <= r["cum_vocab"] <= r["cum_tokens"]
        assert r["cum_vocab"] - prev_v <= r["cum_tokens"] - prev_t
        prev_t, prev_v = r["cum_tokens"], r["cum_vocab"]
