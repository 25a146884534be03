"""Driver contract for the spark-graft builder (PySpark target).

Thin adapter over :mod:`hadoop_2_7_1_spark.queries` — the declared query
registry (one entry per implemented operator from SURVEY.md §2, each with its
DuckDB oracle SQL where SQL-expressible).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from hadoop_2_7_1_spark import queries as _q


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1 pricing summary."""
    return _q.REGISTRY["tq1_pricing_summary"].fn(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    return _q.queries()


def oracle_sql() -> dict[str, str]:
    return _q.oracle_sql()
