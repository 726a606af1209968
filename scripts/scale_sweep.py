#!/usr/bin/env python
"""Scale-out evidence sweep for llm_semdedup and llm_bm25 (SURVEY §6).

Drives both operators at 1x/4x/16x the sf0.1 corpus and records the numbers
that back their 100 TB design claims:

* llm_semdedup — candidate-pair count and wall time with the bucket
  bit-count FIXED at the bench value (4 bits), then at 16x with the knob
  grown by log2(scale) to 8 bits. The claim under test: per-bucket pair
  work is Σ|b|² and the bit-count is the scale knob that keeps pairs/doc
  bounded; a fixed bit-count must show superlinear candidate growth and
  the grown bit-count must pull pairs/doc back to ~1x levels.
* llm_bm25 — wall time only (the plan is a narrow per-doc array_filter +
  one grouped sum; the claim is linear cost in corpus size).

Scaled copies are NON-duplicates of the originals by construction:
embeddings get a copy-specific dimension rotation (roll), which preserves
in-copy geometry and norms but decorrelates cross-copy cosines; documents
get a copy-specific token prefix, making vocabularies disjoint (copy 0
stays pristine so the BM25 query terms still match).

Writes scaled parquet under .scratch/scale_sweep/ and prints one JSON
summary line at the end.
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from morphl_model_publishers_churning_users_spark.operators.llm import (
    _NORM,
    _DOT,
    _sign_bucket_spark,
    llm_bm25,
    llm_dedup_substring,
)
from morphl_model_publishers_churning_users_spark.catalog import table as t
from morphl_model_publishers_churning_users_spark.session import build_session

BASE = "/root/testdata/sf0.1"
OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   ".scratch", "scale_sweep")
SCALES = (1, 4, 16)


def build_scaled() -> None:
    emb = pq.read_table(f"{BASE}/embeddings.parquet")
    vec_id = emb.column("vec_id").to_numpy()
    mat = np.array(emb.column("embedding").to_pylist(), dtype=np.float32)
    label = emb.column("label").to_numpy()
    n, dim = mat.shape

    docs = pq.read_table(f"{BASE}/documents.parquet").to_pandas()

    for s in SCALES:
        d = f"{OUT}/x{s}"
        os.makedirs(d, exist_ok=True)
        if not os.path.exists(f"{d}/embeddings.parquet"):
            ids, vecs, labs = [], [], []
            for c in range(s):
                ids.append(vec_id + c * n)
                # dimension roll: in-copy geometry identical, cross-copy
                # cosines decorrelated (and sign buckets re-randomized).
                vecs.append(np.roll(mat, shift=7 * c, axis=1))
                labs.append(label)
            pq.write_table(
                pa.table({
                    "vec_id": np.concatenate(ids),
                    "embedding": pa.array(
                        list(np.concatenate(vecs)), pa.list_(pa.float32())
                    ),
                    "label": np.concatenate(labs),
                }),
                f"{d}/embeddings.parquet",
            )
        if not os.path.exists(f"{d}/documents.parquet"):
            parts = []
            for c in range(s):
                p = docs.copy()
                p["doc_id"] = p["doc_id"] + c * len(docs)
                if c > 0:  # disjoint vocab per copy; copy 0 pristine
                    p["text"] = p["text"].str.replace(
                        r"(\S+)", rf"c{c}\1", regex=True
                    )
                parts.append(p)
            import pandas as pd

            pq.write_table(
                pa.Table.from_pandas(pd.concat(parts), preserve_index=False),
                f"{d}/documents.parquet",
            )


def semdedup_core(spark, sf_dir: str, bits: int):
    """llm_semdedup's engine path with the bucket bit-count exposed."""
    e = t(spark, sf_dir, "embeddings")
    sig = e.select(
        "vec_id", "embedding", F.expr(_sign_bucket_spark(bits)).alias("bucket")
    )
    a = sig.select(
        F.col("vec_id").alias("vec_a"),
        F.col("embedding").alias("qe"),
        F.expr(_NORM.format(c="embedding")).alias("na"),
        "bucket",
    )
    b = sig.select(
        F.col("vec_id").alias("vec_b"),
        F.col("embedding").alias("ce"),
        F.expr(_NORM.format(c="embedding")).alias("nb"),
        "bucket",
    )
    cand = a.join(b, "bucket").filter(F.col("vec_a") < F.col("vec_b"))
    cos = F.round(F.expr(_DOT) / (F.col("na") * F.col("nb")), 6)
    dropped = (
        cand.filter(cos >= 0.3)
        .select(F.col("vec_b").alias("vec_id"))
        .distinct()
        .withColumn("is_dropped", F.lit(True))
    )
    kept = sig.join(dropped, "vec_id", "left").select(
        "vec_id", "bucket", F.col("is_dropped").isNull().alias("is_kept")
    )
    return cand, kept


def main() -> None:
    build_scaled()
    spark = build_session("mpcu-scale-sweep")
    out = {"semdedup": [], "bm25": []}

    # warmup (codegen compile) at the smallest scale
    semdedup_core(spark, f"{OUT}/x1", 4)[1].count()
    llm_bm25(spark, f"{OUT}/x1").count()

    runs = [(s, 4) for s in SCALES] + [(16, 8)]
    for s, bits in runs:
        d = f"{OUT}/x{s}"
        cand, kept = semdedup_core(spark, d, bits)
        # Force the survivor flags, not a bare count(): count() of the
        # left join lets Catalyst eliminate the (distinct-keyed) dropped
        # side entirely, skipping the cosine work being measured.
        t0 = time.perf_counter()
        n_kept = kept.agg(F.sum(F.col("is_kept").cast("int"))).collect()[0][0]
        wall = time.perf_counter() - t0
        n_cand = cand.count()
        n_docs = 2000 * s
        out["semdedup"].append({
            "scale": s, "bits": bits, "docs": n_docs,
            "candidate_pairs": n_cand,
            "pairs_per_doc": round(n_cand / n_docs, 3),
            "kept_rows": n_kept, "wall_s": round(wall, 2),
        })
        print(out["semdedup"][-1], flush=True)

    for s in SCALES:
        d = f"{OUT}/x{s}"
        t0 = time.perf_counter()
        n = llm_bm25(spark, d).count()
        wall = time.perf_counter() - t0
        out["bm25"].append({
            "scale": s, "docs": 5000 * s, "rows": n, "wall_s": round(wall, 2)
        })
        print(out["bm25"][-1], flush=True)

    # Exact-substring dedup: copies have disjoint vocabularies, so true
    # duplicate pairs exist only within each copy — pair OUTPUT should
    # grow linearly with scale (pairs/doc constant) and wall time with
    # the window-table size, never corpus².
    out["dedup_substring"] = []
    for s in SCALES:
        d = f"{OUT}/x{s}"
        t0 = time.perf_counter()
        n_pairs = llm_dedup_substring(spark, d).count()
        wall = time.perf_counter() - t0
        out["dedup_substring"].append({
            "scale": s, "docs": 5000 * s, "pairs": n_pairs,
            "pairs_per_kdoc": round(n_pairs / (5.0 * s), 2),
            "wall_s": round(wall, 2),
        })
        print(out["dedup_substring"][-1], flush=True)

    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
