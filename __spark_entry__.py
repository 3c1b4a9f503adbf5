"""Driver contract for the spark-graft builder (PySpark target).

Thin shim over the engine's query registry
(``spark_etl_pipeline_spark.plans.registry``): every operator registers a
Spark builder + its DuckDB oracle SQL in one place, and this module just
re-exports them in the driver's shape.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from spark_etl_pipeline_spark.plans import registry

SF0001 = "/root/testdata/sf0.001"


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query (TPC-H-Q1-shaped pricing summary) on sf0.001."""
    from spark_etl_pipeline_spark.plans.relational import q1_pricing_summary

    return q1_pricing_summary(spark, SF0001)


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ extensions)."""
    return registry.queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB twin for every SQL-expressible query in ``queries()``."""
    return registry.oracles()
