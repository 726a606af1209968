"""PySpark-native analytics engine with the query/data-processing
capabilities of the MorphL publishers-churning-users pipeline, rebuilt
Spark-first (DataFrame/Catalyst, no RDDs) and designed for 100 TB scale.

Layout:
  catalog.py    fixture-table registry (parquet → DataFrame, nanos-ts fixup)
  session.py    SparkSession factory with scale-oriented defaults
  registry.py   operator registry: every SURVEY.md §2 operator registers a
                (spark, sf_dir) -> DataFrame callable + a DuckDB oracle twin
  operators/    one module per SURVEY.md §2 group
  functions/    scalar function surface (§2.G)
  sources/      json + streaming sources (§2.A)
  streaming/    structured-streaming ops (§2.H)
  plans/        packaged pipelines (churn ETL+ML, LLM corpus)
"""

from . import registry  # noqa: F401


def load_all_operators() -> None:
    """Import every operator module so registration side-effects run."""
    from . import functions, operators, sources, streaming  # noqa: F401
    from .operators import (  # noqa: F401
        aggregates,
        analytics,
        graph,
        joins,
        llm,
        ml,
        multimodal,
        rowops,
        scans,
        setops,
        timeseries,
        udfs,
        windows,
    )
    from .functions import scalar  # noqa: F401
    from .sources import (  # noqa: F401
        csv_source,
        ga_source,
        json_source,
        orc_source,
        python_ds,
        stream_source,
    )
    from .streaming import ops as streaming_ops  # noqa: F401
