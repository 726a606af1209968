"""Round-13: decompose llm_lsh_tuning_curve construction vs action cost.

The op eagerly checkpoints three intermediates at construction time
(doc_sh, sig, truth) — so op wall time = ckpt jobs + final action. This
script times each stage separately (min of PASSES) to find where the
6.5 s in-bench cost actually lives before touching anything.

Usage: [PASSES=3] python scripts/lsh_curve_profile_r13.py
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from morphl_model_publishers_churning_users_spark.operators._shared import t  # noqa: E402
from morphl_model_publishers_churning_users_spark.operators.llm import (  # noqa: E402
    _NGRAM_SH_SPARK,
)
from morphl_model_publishers_churning_users_spark.registry import get_queries  # noqa: E402
from morphl_model_publishers_churning_users_spark.session import build_session  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
PASSES = int(os.environ.get("PASSES", "3"))
M = 4503599627370496


def stages(spark, sf_dir):
    """Re-create the op's construction stage by stage, timing each."""
    out = {}

    t0 = time.perf_counter()
    d = (
        t(spark, sf_dir, "documents")
        .select("doc_id", F.split(F.lower(F.trim("text")), r"\s+").alias("w"))
        .filter(F.size("w") >= 3)
    )
    doc_sh = (
        d.select("doc_id", F.array_distinct(F.expr(_NGRAM_SH_SPARK)).alias("sarr"))
        .select(
            "doc_id",
            "sarr",
            F.size("sarr").cast("bigint").alias("sz"),
            F.expr(
                "transform(sarr, s -> named_struct("
                " 'x1', cast(conv(substr(md5(s), 1, 13), 16, 10) as bigint),"
                " 'x2', cast(conv(substr(md5(s), 17, 13), 16, 10) as bigint) | 1L))"
            ).alias("xs"),
        )
        .localCheckpoint(eager=True)
    )
    out["ckpt_doc_sh"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    sig = doc_sh.select(
        "doc_id",
        F.expr(
            f"transform(sequence(0, 7), i -> "
            f"array_min(transform(xs, p -> (p.x1 + i * p.x2) % {M}L)))"
        ).alias("h"),
    ).localCheckpoint(eager=True)
    out["ckpt_sig"] = time.perf_counter() - t0

    t0 = time.perf_counter()
    grams = doc_sh.select("doc_id", "sz", F.explode("sarr").alias("g"))
    ga = grams.select(F.col("doc_id").alias("doc_a"), F.col("sz").alias("sz_a"), "g")
    gb = grams.select(F.col("doc_id").alias("doc_b"), F.col("sz").alias("sz_b"), "g")
    inter = (
        ga.join(gb, "g")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b", "sz_a", "sz_b")
        .agg(F.count(F.lit(1)).alias("nc"))
    )
    truth = (
        inter.filter(
            F.col("nc").cast("double") / (F.col("sz_a") + F.col("sz_b") - F.col("nc"))
            >= 0.4
        )
        .select("doc_a", "doc_b")
        .localCheckpoint(eager=True)
    )
    out["ckpt_truth"] = time.perf_counter() - t0
    return out, sig, truth


def main() -> None:
    spark = build_session("lsh-curve-profile-r13")
    q = get_queries()

    def noop(df):
        df.write.format("noop").mode("overwrite").save()

    # Warm plan shapes once at sf0.001.
    noop(q["llm_lsh_tuning_curve"](spark, "/root/testdata/sf0.001"))

    best: dict[str, float] = {}
    for i in range(PASSES):
        spark.sparkContext.setJobDescription(f"lsh stage decomposition pass {i}")
        out, sig, truth = stages(spark, SF_DIR)
        # Final action: band join + per_cfg agg over the checkpointed inputs.
        t0 = time.perf_counter()
        df = q["llm_lsh_tuning_curve"](spark, SF_DIR)
        out["full_op"] = time.perf_counter() - t0  # construction (incl. 3 ckpts)
        t0 = time.perf_counter()
        noop(df)
        out["final_action"] = time.perf_counter() - t0
        for k, v in out.items():
            best[k] = min(best.get(k, float("inf")), v)
        spark.sparkContext.setJobDescription(None)

    for k, v in best.items():
        print(f"{k:16s} {v:7.2f}s", flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
