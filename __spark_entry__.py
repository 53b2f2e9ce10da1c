"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over ``terminus_server_spark.registry``: every
implemented capability from SURVEY.md §2 registers a (spark, sf_dir)
-> DataFrame callable and (where SQL-expressible) a DuckDB oracle.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from terminus_server_spark import registry


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query: Q5-shaped star join over the knowledge graph at
    sf0.001 (6 tables, broadcast dims, decimal-stable aggregate)."""
    return registry.QUERIES["q5_local_supplier"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return dict(registry.QUERIES)


def oracle_sql() -> dict[str, str]:
    return dict(registry.ORACLES)
