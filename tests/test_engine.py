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
    assert eng.oracle("sample_rows") is None


def test_llm_corpus_pipeline(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    curated = eng.run_pipeline("llm_corpus")
    n = curated.count()
    assert 0 < n <= eng.table("documents").count()
    # dedup is idempotent: all surviving hashes unique
    assert curated.select("content_hash").distinct().count() == n


def test_churn_pipeline(spark, sf_dir):
    eng = Engine(spark, sf_dir)
    scored = eng.run_pipeline("churn")
    assert set(scored.columns) == {"user_id", "churned", "churn_prob"}
    assert scored.count() > 0
