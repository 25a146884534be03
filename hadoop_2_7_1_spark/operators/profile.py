"""Column profiling: one pass, one row of stats per column.

Data-engineering addition (no reference analogue beyond counters): null
rate, distinct count, min/max per column — the pre-flight check before a
100 TB job. All columns profile in a single aggregate over one scan (Spark
computes every stat in the same HashAggregate), then one narrow unpivot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_null, n_distinct, min_val, max_val) per column;
    min/max stringified so heterogeneous columns share one schema."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_null_{c}"),
            F.countDistinct(c).alias(f"_dist_{c}"),
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
        ]
    wide = df.agg(*aggs)
    stacks = []
    for c in cols:
        stacks.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").cast("bigint").alias("n_rows"),
                F.col(f"_null_{c}").cast("bigint").alias("n_null"),
                F.col(f"_dist_{c}").cast("bigint").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_val"),
                F.col(f"_max_{c}").alias("max_val"),
            )
        )
    return wide.select(F.explode(F.array(*stacks)).alias("s")).select("s.*")


def oracle_profile(table: str, cols: list[str]) -> str:
    """DuckDB twin: UNION ALL of per-column stat rows."""
    parts = [
        f"""
        SELECT '{c}' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_val,
               CAST(max({c}) AS VARCHAR) AS max_val
        FROM {table}
        """
        for c in cols
    ]
    return " UNION ALL ".join(parts)
