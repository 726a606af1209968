"""r14 prototype: SymDelete (Mor-Fraenkel deletion-neighborhood) candidate
generation for join_fuzzy_blocked.

Soundness: if lev(a, b) <= 2 then fixing an optimal alignment and deleting
from `a` every position involved in a substitution or deletion (<= 2 of
them) and from `b` every position involved in a substitution or insertion
(<= 2) leaves two IDENTICAL strings. Hence every true pair shares at least
one member of del<=2(a) x del<=2(b) with equal text — joining the deletion
neighborhoods on exact text is a candidate superset with NO false
negatives; the unchanged banded levenshtein filter then reproduces the
exact output.

This script measures, per sf: the old candidate count (all within-nation
a<b pairs), the new candidate count (distinct pairs sharing a deletion
variant), and checks output equality old-vs-new.

Usage: python scripts/fuzzy_symdel_proto_r14.py [sf_dir ...]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import pyspark.sql.functions as F

from morphl_model_publishers_churning_users_spark.operators._shared import t
from morphl_model_publishers_churning_users_spark.session import build_session

# del<=2 neighborhood: the string itself, all single deletions, all
# ordered double deletions (i < j on the ORIGINAL string = delete j first
# then i, or equivalently one expression over (i, j) pairs).
_VARIANTS_SQL = """
array_union(
  array_union(
    array(c_name),
    transform(sequence(1, length(c_name)),
              i -> concat(substring(c_name, 1, i - 1), substring(c_name, i + 1)))
  ),
  flatten(transform(sequence(1, length(c_name) - 1),
    i -> transform(sequence(i + 1, length(c_name)),
      j -> concat(substring(c_name, 1, i - 1),
                  substring(c_name, i + 1, j - i - 1),
                  substring(c_name, j + 1)))))
)
"""


def candidates_symdel(spark, sf_dir):
    c = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
    v = c.select(
        "c_custkey",
        "c_name",
        "c_nationkey",
        F.explode(F.expr(_VARIANTS_SQL)).alias("v"),
    )
    a = v.alias("a")
    b = v.alias("b")
    return (
        a.join(
            b,
            (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
            & (F.col("a.v") == F.col("b.v"))
            & (F.col("a.c_custkey") < F.col("b.c_custkey")),
        )
        .select(
            F.col("a.c_custkey").alias("key_a"),
            F.col("b.c_custkey").alias("key_b"),
            F.col("a.c_name").alias("name_a"),
            F.col("b.c_name").alias("name_b"),
        )
        .distinct()
    )


def main():
    spark = build_session("fuzzy-symdel-r14")
    for sf_dir in sys.argv[1:] or ["/root/testdata/sf0.001", "/root/testdata/sf0.01"]:
        c = t(spark, sf_dir, "customer").select("c_custkey", "c_name", "c_nationkey")
        old_cand = (
            c.alias("a")
            .join(
                c.alias("b"),
                (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
                & (F.col("a.c_custkey") < F.col("b.c_custkey")),
            )
            .count()
        )
        t0 = time.perf_counter()
        cand = candidates_symdel(spark, sf_dir)
        new_cand = cand.count()
        t_cand = time.perf_counter() - t0
        dist = F.levenshtein(F.col("name_a"), F.col("name_b"), 2)
        new_out = (
            cand.select("key_a", "key_b", dist.alias("d"))
            .filter((F.col("d") >= 0) & (F.col("d") <= 2))
        )
        dist_old = F.levenshtein(F.col("a.c_name"), F.col("b.c_name"), 2)
        old_out = (
            c.alias("a")
            .join(
                c.alias("b"),
                (F.col("a.c_nationkey") == F.col("b.c_nationkey"))
                & (F.col("a.c_custkey") < F.col("b.c_custkey"))
                & (dist_old >= 0)
                & (dist_old <= 2),
            )
            .select(
                F.col("a.c_custkey").alias("key_a"),
                F.col("b.c_custkey").alias("key_b"),
                dist_old.alias("d"),
            )
        )
        diff = new_out.exceptAll(old_out).count() + old_out.exceptAll(new_out).count()
        n_true = old_out.count()
        print(
            f"{sf_dir}: old_candidates={old_cand} new_candidates={new_cand} "
            f"(x{old_cand / max(new_cand,1):.0f} cut) true_pairs={n_true} "
            f"output_diff={diff} cand_wall={t_cand:.2f}s"
        )
    spark.stop()


if __name__ == "__main__":
    main()
