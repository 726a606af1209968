"""User-facing engine facade — the three entry points of SURVEY.md §3.2.

    from morphl_model_publishers_churning_users_spark.engine import Engine

    eng = Engine.create(sf_dir="/root/testdata/sf0.01")
    eng.sql("SELECT count(*) FROM lineitem")          # SQL entry point
    eng.table("events").filter(...).groupBy(...)      # DataFrame builder
    eng.run_pipeline("churn")                         # packaged flows
    eng.query("join_star")                            # any §2 operator

Everything converges on Catalyst: SQL goes through the parser, the
builder appends to the logical plan lazily, and pipelines are plain
DataFrame programs — one optimizer, one executor, no private IR.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from . import catalog
from .registry import get_oracles, get_queries


class Engine:
    def __init__(self, spark: SparkSession, sf_dir: str):
        self.spark = spark
        self.sf_dir = sf_dir
        catalog.ensure_confs(spark)

    @classmethod
    def create(cls, sf_dir: str, app_name: str = "mpcu-engine", cpus: int | None = None) -> "Engine":
        from .session import build_session

        return cls(build_session(app_name, cpus=cpus), sf_dir)

    # -- catalog ----------------------------------------------------------
    def table(self, name: str) -> DataFrame:
        """DataFrame builder entry point (lazy logical plan)."""
        return catalog.table(self.spark, self.sf_dir, name)

    def register_views(self) -> None:
        catalog.register_views(self.spark, self.sf_dir)

    # -- SQL --------------------------------------------------------------
    def sql(self, query: str) -> DataFrame:
        """SQL entry point over the registered fixture views."""
        self.register_views()
        return self.spark.sql(query)

    # -- operators --------------------------------------------------------
    def query(self, key: str) -> DataFrame:
        """Run a named operator from the SURVEY.md §2 inventory."""
        return get_queries()[key](self.spark, self.sf_dir)

    def operators(self) -> list[str]:
        return sorted(get_queries())

    def oracle(self, key: str) -> str | None:
        return get_oracles().get(key)

    # -- pipelines --------------------------------------------------------
    def run_pipeline(self, name: str) -> DataFrame:
        if name == "churn":
            from .plans import churn

            return churn.run(self.spark, self.sf_dir)
        if name == "llm_corpus":
            from .plans import llm_corpus

            return llm_corpus.run(self.spark, self.sf_dir)
        raise KeyError(f"unknown pipeline: {name!r} (have: churn, llm_corpus)")
