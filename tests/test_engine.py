"""Engine facade: the three SURVEY.md §3.2 entry points converge."""

from __future__ import annotations

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.engine import Engine


def test_sql_and_builder_agree(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    via_sql = eng.sql(
        "SELECT l_returnflag, COUNT(*) AS n FROM lineitem GROUP BY l_returnflag"
    )
    via_builder = (
        eng.table("lineitem").groupBy("l_returnflag").agg(F.count(F.lit(1)).alias("n"))
    )
    assert {(r.l_returnflag, r.n) for r in via_sql.collect()} == {
        (r.l_returnflag, r.n) for r in via_builder.collect()
    }


def test_named_operator_dispatch(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    assert "join_star" in eng.operators()
    assert eng.query("join_star").count() > 0
    assert eng.oracle("join_star") is not None
    # since round 3 every registered key carries an oracle twin (the
    # non-SQL-expressible ops use exact-anchor + ok-flag contracts)
    assert eng.oracle("sample_rows") is not None
    assert eng.oracle("ml_features") is not None


def test_llm_corpus_pipeline(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    curated = eng.run_pipeline("llm_corpus")
    n = curated.count()
    assert 0 < n <= eng.table("documents").count()
    # dedup is idempotent: all surviving hashes unique
    assert curated.select("content_hash").distinct().count() == n
    # sampling stage: deterministic membership, non-empty sample, and
    # a second run keeps exactly the same docs
    sampled = curated.filter("is_sampled")
    assert 0 < sampled.count() <= n
    again = eng.run_pipeline("llm_corpus").filter("is_sampled")
    assert sampled.select("doc_id").subtract(again.select("doc_id")).count() == 0
    assert again.select("doc_id").subtract(sampled.select("doc_id")).count() == 0


def test_churn_pipeline(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    scored = eng.run_pipeline("churn")
    assert set(scored.columns) == {"user_id", "churned", "churn_prob"}
    assert scored.count() > 0


def test_hll_sketch_within_5pct_of_exact(spark, sf_dir):
    """Merged HLL partials must land within ±5% of exact distinct counts
    (the SURVEY §5.3 property bar for approximate ops)."""
    from morphl_model_publishers_churning_users_spark.registry import get_queries
    from morphl_model_publishers_churning_users_spark.catalog import table
    import pyspark.sql.functions as F

    rows = get_queries()["agg_sketch_hll"](spark, sf_dir).collect()
    exact = {
        r["event_type"]: r["n"]
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {r["event_type"] for r in rows} == set(exact)
    for r in rows:
        assert r["exact_users"] == exact[r["event_type"]]
        assert r["approx_ok"], (r["event_type"], r["exact_users"])


def test_stratified_sample_proportions(spark, sf_dir):
    """Each stratum's realized sampling rate must track its requested
    fraction (binomial tolerance); fraction-1.0 strata must be kept
    whole — that's the rare-class guarantee the op exists for."""
    from morphl_model_publishers_churning_users_spark.registry import get_queries
    from morphl_model_publishers_churning_users_spark.catalog import table
    import pyspark.sql.functions as F

    from morphl_model_publishers_churning_users_spark.operators.rowops import (
        STRATIFIED_FRACTIONS as fractions,
        draw_stratified,
    )

    got = {
        r["event_type"]: r["n"]
        for r in draw_stratified(spark, sf_dir)
        .groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    total = {
        r["event_type"]: r["n"]
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type").agg(F.count("*").alias("n")).collect()
    }
    for et, frac in fractions.items():
        n, k = total.get(et, 0), got.get(et, 0)
        if n == 0:
            continue
        if frac == 1.0:
            assert k == n, (et, k, n)  # rare classes kept whole
        else:
            sd = (n * frac * (1 - frac)) ** 0.5
            assert abs(k - n * frac) <= max(5, 5 * sd), (et, k, n, frac)


def test_hll_union_rollup_accuracy(spark, sf_dir):
    """Unioned per-day HLL partials must land within ±5% of the exact
    per-type distinct-user counts — merging partials must not degrade
    the estimate beyond the sketch's intrinsic error."""
    from morphl_model_publishers_churning_users_spark.registry import get_queries
    from morphl_model_publishers_churning_users_spark.catalog import table
    import pyspark.sql.functions as F

    rows = get_queries()["agg_hll_union"](spark, sf_dir).collect()
    exact = {
        r["event_type"]: r["n"]
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(F.countDistinct("user_id").alias("n"))
        .collect()
    }
    assert {r["event_type"] for r in rows} == set(exact)
    for r in rows:
        assert r["exact_users"] == exact[r["event_type"]]
        assert r["approx_ok"], (r["event_type"], r["exact_users"])


def test_percentile_approx_tracks_exact(spark, sf_dir):
    """At accuracy=10000 the sketch's p50/p90 must track the exact
    interpolated percentiles within 3% relative error (the sketch
    returns a real sample, the exact form interpolates — discreteness
    alone accounts for ~one inter-sample gap)."""
    from morphl_model_publishers_churning_users_spark.registry import get_queries
    from morphl_model_publishers_churning_users_spark.catalog import table
    import pyspark.sql.functions as F

    rows = get_queries()["agg_percentile_approx"](spark, sf_dir).collect()
    exact = {
        r["event_type"]: (r["p50"], r["p90"])
        for r in table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.expr("percentile(value, 0.5D)").alias("p50"),
            F.expr("percentile(value, 0.9D)").alias("p90"),
        )
        .collect()
    }
    for r in rows:
        p50, p90 = exact[r["event_type"]]
        assert abs(r["p50_exact"] - p50) <= 1e-6 + abs(p50) * 1e-9
        assert abs(r["p90_exact"] - p90) <= 1e-6 + abs(p90) * 1e-9
        assert r["approx_ok"], (r["event_type"], r["p50_exact"], r["p90_exact"])


def test_rf_importances_valid(spark, sf_dir):
    """Gini importances: one row per feature, non-negative, summing to ~1
    (or all-zero on a degenerate single-class fit at tiny sf)."""
    from morphl_model_publishers_churning_users_spark.operators.ml import (
        raw_rf_importances,
    )
    from morphl_model_publishers_churning_users_spark.plans.churn import FEATURE_COLS

    rows = raw_rf_importances(spark, sf_dir).collect()
    assert {r["feature"] for r in rows} == set(FEATURE_COLS)
    total = sum(r["importance"] for r in rows)
    assert all(r["importance"] >= 0 for r in rows)
    assert total == 0 or abs(total - 1.0) < 0.01, total


def test_python_datasource_reads_distributed(spark, sf_dir):
    """The custom Python DataSource must fan out as its declared
    partitions (8 executor tasks), not one driver-side generator."""
    from morphl_model_publishers_churning_users_spark.registry import get_queries

    df = get_queries()["source_python_ds"](spark, sf_dir)
    assert df.rdd.getNumPartitions() == 8
    assert df.count() == 20000


def test_kmeans_embed_partitions_all_vectors(spark, sf_dir):
    """Every embedding lands in exactly one of the k=4 clusters and no
    cluster is empty at test scale (seeded init on dense synthetic
    vectors must not collapse)."""
    from morphl_model_publishers_churning_users_spark.operators.llm import (
        raw_kmeans_embed,
    )
    from morphl_model_publishers_churning_users_spark.catalog import table

    rows = raw_kmeans_embed(spark, sf_dir).collect()
    total = table(spark, sf_dir, "embeddings").count()
    assert sum(r["n_vectors"] for r in rows) == total
    assert len(rows) <= 4 and all(r["n_vectors"] > 0 for r in rows)


def test_pca_variance_spectrum_valid(spark, sf_dir):
    """Explained-variance ratios must be non-negative, non-increasing,
    and sum to ≤ 1 — the invariants of any correct eigensolve."""
    from morphl_model_publishers_churning_users_spark.operators.ml import (
        raw_pca_spectrum,
    )

    vals = [v for _, v in raw_pca_spectrum(spark, sf_dir)]
    assert len(vals) == 8
    assert all(v >= 0 for v in vals)
    assert all(vals[i] >= vals[i + 1] - 1e-9 for i in range(len(vals) - 1))
    assert sum(vals) <= 1.0 + 1e-6


def test_dedup_cluster_releases_caches(spark, sf_dir):
    """llm_dedup_cluster persists intermediates during label propagation;
    every iteration cache must be released before the result is returned —
    leaked cache evicts working memory at scale. Snapshot the persistent
    RDD ids first (the session is shared across tests; MLlib and other
    ops may legitimately hold blocks), and allow exactly the op's own
    localCheckpoint blocks — that is the RESULT's lineage-truncated
    storage, deliberately retained so the caller's first action does not
    replay 12 rounds of label propagation."""
    from morphl_model_publishers_churning_users_spark.registry import get_queries

    def _ids():
        it = spark.sparkContext._jsc.getPersistentRDDs().keySet().iterator()
        out = set()
        while it.hasNext():
            out.add(it.next())
        return out

    before = _ids()
    df = get_queries()["llm_dedup_cluster"](spark, sf_dir)
    assert df.count() > 0
    new = _ids() - before
    # One localCheckpoint (its blocks may span a couple of RDD ids in the
    # JVM accounting) is expected; leaked per-iteration persists would show
    # up as many more.
    assert len(new) <= 2, f"{len(new)} new RDD blocks still cached: {sorted(new)}"


def test_dedup_cosine_blocking_bits_bound_buckets(spark, sf_dir):
    """The sign-LSH bit count is llm_dedup_cosine's scale knob: at
    bits=8 the largest candidate bucket must shrink vs bits=4 (the
    within-bucket pair term is quadratic in that size), every bits=8
    pair must also be a bits=4 pair (the first 4 hyperplanes are a
    prefix of the 8 — blocking only ever gets stricter), and the
    default bits=4 result must be unchanged."""
    import pyspark.sql.functions as F

    from morphl_model_publishers_churning_users_spark.catalog import table
    from morphl_model_publishers_churning_users_spark.operators.llm import (
        _sign_bucket_spark,
        llm_dedup_cosine,
    )

    e = table(spark, sf_dir, "embeddings")

    def max_bucket(bits):
        return (
            e.select(F.expr(_sign_bucket_spark(bits)).alias("b"))
            .groupBy("b")
            .count()
            .agg(F.max("count").alias("m"))
            .collect()[0]["m"]
        )

    m4, m8 = max_bucket(4), max_bucket(8)
    assert m8 < m4, (m4, m8)

    pairs4 = {
        (r["vec_a"], r["vec_b"]) for r in llm_dedup_cosine(spark, sf_dir).collect()
    }
    pairs8 = {
        (r["vec_a"], r["vec_b"])
        for r in llm_dedup_cosine(spark, sf_dir, bits=8).collect()
    }
    assert pairs8 <= pairs4


def test_multimodal_decode_roundtrip_and_corruption():
    """The SY1 container decode is real: round-trips every modality's
    header + body, and rejects corrupt magic / truncated bodies — the
    quarantine path a production media pipeline routes on."""
    import pytest

    from morphl_model_publishers_churning_users_spark.operators.multimodal import (
        decode_media,
        encode_synthetic,
    )

    for doc_id in range(12):
        payload, modality = encode_synthetic(doc_id)
        dec = decode_media(payload)
        assert dec["modality"] == modality
        assert len(dec["samples"]) > 0
        if modality == "image":
            w, h = dec["dims"]
            assert len(dec["samples"]) == w * h
        elif modality == "video":
            nf, fw, fh = dec["dims"]
            assert len(dec["samples"]) == nf * fw * fh

    with pytest.raises(ValueError, match="bad magic"):
        decode_media(b"XXXI" + b"\x00" * 8)
    good, _ = encode_synthetic(3)
    with pytest.raises(ValueError, match="body"):
        decode_media(good[:-1])


def test_ewma_compose_seeds_from_first_day(spark):
    """Regression: Spark SQL's [] operator is 0-based, so the segmented
    EWMA compose once seeded from the SECOND day's fresh value (masked on
    the fixtures by 0.5^n decay, and an ANSI index crash for single-day
    series). The fixed element_at seed must reproduce the hand-computed
    recurrence on a 2-day, 1-event-per-day series."""
    import pyspark.sql.functions as F

    df = spark.createDataFrame(
        [("d1", 1, 1.0, 2.0), ("d2", 1, 2.0, 4.0)],
        "day string, n int, b_lin double, y double",
    )
    compose = (
        "aggregate(slice(days, 2, greatest(size(days) - 1, 0)),"
        " element_at(days, 1).y,"
        " (acc, x) -> pow(0.5D, CAST(x.n AS DOUBLE)) * acc + x.b_lin)"
    )
    out = (
        df.agg(F.expr("sort_array(collect_list(struct(day, n, b_lin, y)))").alias("days"))
        .select(F.expr(compose).alias("e"))
        .collect()[0]["e"]
    )
    # y1 = 2.0 (fresh), y2 = 0.5^1 * 2.0 + 2.0 = 3.0
    assert out == 3.0
    # single-day series: empty slice, seed passes through (no ANSI crash)
    one = (
        df.filter("day = 'd1'")
        .agg(F.expr("sort_array(collect_list(struct(day, n, b_lin, y)))").alias("days"))
        .select(F.expr(compose).alias("e"))
        .collect()[0]["e"]
    )
    assert one == 2.0


def test_minhash_banding_recall_on_known_near_dups(spark, sf_dir, tmp_path):
    """LSH quality property: plant near-identical document pairs (rotated
    word order, shingle Jaccard ≈ 0.9) and require the banding to
    recover ≥ 90% of them — P(candidate | J=0.9) = 1-(1-J²)⁴ ≈ 0.999,
    so missing more than a few planted pairs means the band/row math or
    the hash family is broken, not bad luck."""
    import os
    import shutil

    import pyspark.sql.functions as F

    from morphl_model_publishers_churning_users_spark.catalog import TABLES
    from morphl_model_publishers_churning_users_spark.registry import get_queries

    d = str(tmp_path / "planted")
    os.makedirs(d, exist_ok=True)
    for tbl in TABLES:
        if tbl != "documents":
            shutil.copy(os.path.join(sf_dir, f"{tbl}.parquet"), d)
    docs = spark.read.parquet(os.path.join(sf_dir, "documents.parquet"))
    # rotate each doc's words by one position: shares all interior
    # shingles with the original (J well above 0.8 for 30+ word docs)
    rotated = docs.filter(F.size(F.split("text", " ")) >= 20).select(
        (F.col("doc_id") + 1000000).alias("doc_id"),
        F.array_join(
            F.expr("concat(slice(split(text, ' '), 2, 100000), slice(split(text, ' '), 1, 1))"),
            " ",
        ).alias("text"),
        "lang",
        "source",
        "n_chars",
    )
    planted = docs.unionByName(rotated)
    planted.write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    pairs = get_queries()["llm_dedup_minhash_sql"](spark, d)
    found = {
        (r["doc_a"], r["doc_b"]) for r in pairs.filter("jaccard >= 0.8").collect()
    }
    expected = {
        (r["doc_id"], r["doc_id"] + 1000000)
        for r in docs.filter(F.size(F.split("text", " ")) >= 20).collect()
    }
    recall = len(found & expected) / len(expected)
    assert recall >= 0.9, f"banding recall {recall:.2f} on planted near-dups"


def test_incremental_dedup_partitions_batch_exactly(spark, sf_dir):
    """Every batch doc gets exactly one status; the 'new' survivors are
    disjoint from the index hashes AND unique among themselves — i.e.
    appending them to the index keeps it duplicate-free (the invariant
    the daily ingest relies on)."""
    import pyspark.sql.functions as F

    from morphl_model_publishers_churning_users_spark.catalog import table
    from morphl_model_publishers_churning_users_spark.registry import get_queries

    out = get_queries()["llm_dedup_incremental"](spark, sf_dir)
    docs = table(spark, sf_dir, "documents")
    n_batch = docs.filter("doc_id % 2 = 1").count()
    assert out.count() == n_batch  # exactly one row per batch doc
    new = out.filter("status = 'new'")
    # new hashes unique within the batch
    assert new.select("content_hash").distinct().count() == new.count()
    # and absent from the index
    index_hashes = docs.filter("doc_id % 2 = 0").select(
        F.md5(F.lower(F.trim("text"))).alias("content_hash")
    ).distinct()
    assert new.join(index_hashes, "content_hash", "inner").count() == 0


def test_sample_weighted_rate_tracks_keep_probability(spark, sf_dir):
    """Per-source realized sampling rate must sit inside a 5-sigma
    binomial band around keep_w, and full-weight sources must be kept
    whole — the md5-uniform is a real uniform, not a biased hash."""
    from morphl_model_publishers_churning_users_spark.registry import get_queries

    rows = get_queries()["llm_sample_weighted"](spark, sf_dir).collect()
    by_src = {}
    for r in rows:
        n, k, w = by_src.get(r["source"], (0, 0, r["keep_w"]))
        by_src[r["source"]] = (n + 1, k + (1 if r["is_sampled"] else 0), r["keep_w"])
    for src, (n, k, w) in by_src.items():
        if w >= 0.999999:
            assert k == n, (src, k, n)
        else:
            sd = (n * w * (1 - w)) ** 0.5
            assert abs(k - n * w) <= 5 * sd + 3, (src, k, n, w)


def test_winnowing_guarantee_shared_runs_share_fingerprints(spark, sf_dir, tmp_path):
    """Winnowing's defining guarantee (Schleimer et al.): with 3-word
    k-grams and window 4, ANY shared run of >= 6 words yields at least
    one shared fingerprint. Plant seeded-random doc pairs sharing a
    6-12 word run at random positions and assert every pair collides."""
    import os
    import random
    import shutil

    import pyspark.sql.functions as F

    from morphl_model_publishers_churning_users_spark.catalog import TABLES
    from morphl_model_publishers_churning_users_spark.registry import get_queries

    rng = random.Random(42)
    vocab = [f"w{i}" for i in range(200)]

    def words(n):
        return [rng.choice(vocab) for _ in range(n)]

    rows = []
    n_pairs = 20
    for i in range(n_pairs):
        shared = words(rng.randint(6, 12))
        a = words(rng.randint(5, 30)) + shared + words(rng.randint(5, 30))
        b = words(rng.randint(5, 30)) + shared + words(rng.randint(5, 30))
        rows.append((2 * i, " ".join(a), "en", "prop", len(" ".join(a))))
        rows.append((2 * i + 1, " ".join(b), "en", "prop", len(" ".join(b))))

    d = str(tmp_path / "winnow")
    os.makedirs(d, exist_ok=True)
    for tbl in TABLES:
        if tbl != "documents":
            shutil.copy(os.path.join(sf_dir, f"{tbl}.parquet"), d)
    spark.createDataFrame(
        rows, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    # fp_head only exposes 3 fingerprints; recompute the full fingerprint
    # set with the operator's own expressions to test the guarantee.
    docs = spark.read.parquet(os.path.join(d, "documents.parquet")).select(
        "doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("w")
    )
    kg = docs.select(
        "doc_id",
        F.expr(
            "transform(sequence(1, size(w) - 2),"
            " i -> md5(concat_ws(' ', element_at(w, i), element_at(w, i + 1),"
            " element_at(w, i + 2))))"
        ).alias("kgs"),
    )
    fp = kg.select(
        "doc_id",
        F.explode(
            F.when(
                F.size("kgs") >= 4,
                F.expr("transform(sequence(1, size(kgs) - 3), i -> array_min(slice(kgs, i, 4)))"),
            ).otherwise(F.array(F.array_min("kgs")))
        ).alias("f"),
    ).distinct()
    a = fp.filter("doc_id % 2 = 0").select((F.col("doc_id") / 2).cast("long").alias("pair"), "f")
    b = fp.filter("doc_id % 2 = 1").select(((F.col("doc_id") - 1) / 2).cast("long").alias("pair"), "f")
    collided = a.join(b, ["pair", "f"]).select("pair").distinct().count()
    assert collided == n_pairs, f"only {collided}/{n_pairs} planted pairs share a fingerprint"


def test_semdedup_survivor_soundness(spark, sf_dir):
    """Survivor-policy soundness: every DROPPED vector must have a KEPT
    near-duplicate with a lower id in its bucket (the representative it
    was deduplicated against) — dropping without a surviving witness
    would lose data, not deduplicate it."""
    import pyspark.sql.functions as F

    from morphl_model_publishers_churning_users_spark.registry import get_queries

    out = get_queries()["llm_semdedup"](spark, sf_dir)
    dropped = out.filter("NOT is_kept")
    if dropped.count() == 0:
        return  # nothing deduplicated at this sf — vacuously sound
    # a dropped vec must share its bucket with at least one lower-id vec
    # (its pair partner; the partner chain always bottoms out at a kept
    # minimum because every bucket's lowest id can never be dropped)
    lower = out.alias("w").join(
        dropped.alias("d"),
        (F.col("w.bucket") == F.col("d.bucket")) & (F.col("w.vec_id") < F.col("d.vec_id")),
    ).select(F.col("d.vec_id").alias("vec_id")).distinct()
    orphans = dropped.join(lower, "vec_id", "left_anti").count()
    assert orphans == 0
    # and the minimum id of every bucket is always kept
    mins = out.groupBy("bucket").agg(F.min("vec_id").alias("vec_id"))
    assert out.join(mins, ["bucket", "vec_id"]).filter("NOT is_kept").count() == 0


def test_bm25_rewards_term_frequency(spark, sf_dir, tmp_path):
    """BM25 sanity: with equal doc length, a doc with more query-term
    occurrences must score at least as high; and every result doc must
    actually contain a query term."""
    import os
    import shutil

    from morphl_model_publishers_churning_users_spark.catalog import TABLES
    from morphl_model_publishers_churning_users_spark.operators.llm import _BM25_TERMS
    from morphl_model_publishers_churning_users_spark.registry import get_queries

    filler = ["alpha", "beta", "gamma", "delta"]
    docs = []
    # doc i contains the first query term i times, padded to length 12
    for i in range(6):
        body = [_BM25_TERMS[0]] * i + filler * 3
        docs.append((i, " ".join(body[:12]), "en", "bm", 60))
    d = str(tmp_path / "bm25")
    os.makedirs(d, exist_ok=True)
    for tbl in TABLES:
        if tbl != "documents":
            shutil.copy(os.path.join(sf_dir, f"{tbl}.parquet"), d)
    spark.createDataFrame(
        docs, "doc_id long, text string, lang string, source string, n_chars long"
    ).write.mode("overwrite").parquet(os.path.join(d, "documents.parquet"))

    rows = {r["doc_id"]: r["bm25"] for r in get_queries()["llm_bm25"](spark, d).collect()}
    assert 0 not in rows  # zero-occurrence doc never scores
    scored = [rows[i] for i in sorted(rows)]
    assert all(a <= b + 1e-9 for a, b in zip(scored, scored[1:])), scored
