"""Packaged LLM-corpus curation pipeline.

The standard large-corpus pass, each stage a §2.J operator, composed as
one lazy plan (Catalyst fuses the filters into the scan):

  quality gate → language filter → exact dedup (survivor join) →
  token accounting

Near-dup stages (MinHash/SimHash) are deliberately separate passes in
production — they shuffle on different keys — and are exposed as their
own operators (llm_dedup_fuzzy / llm_dedup_simhash).
"""

from __future__ import annotations

import pyspark.sql.functions as F
from pyspark.sql import DataFrame, SparkSession

from ..catalog import table


def run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Returns the curated corpus: one row per surviving document with
    quality/token metadata."""
    d = table(spark, sf_dir, "documents")

    words = F.split(F.trim("text"), r"\s+")
    n_words = F.size(words).cast("bigint")
    scored = d.select(
        "doc_id",
        "text",
        "lang",
        "source",
        "n_chars",
        n_words.alias("n_words"),
        F.ceil(F.col("n_chars") / 4.0).cast("bigint").alias("n_est_tokens"),
        F.md5(F.lower(F.trim("text"))).alias("content_hash"),
    )

    gated = scored.filter((F.col("n_words") >= 10) & (F.col("n_chars") >= 50))

    # Exact dedup, deterministic survivor: smallest doc_id per hash.
    survivors = gated.groupBy("content_hash").agg(F.min("doc_id").alias("doc_id"))
    deduped = gated.join(survivors, ["content_hash", "doc_id"], "inner")

    return deduped.select(
        "doc_id", "lang", "source", "n_chars", "n_words", "n_est_tokens", "content_hash"
    )
