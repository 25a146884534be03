"""Deterministic distinct-count sketching (KMV / k-minimum-values).

Spark's production path for approximate distinct counts is the built-in
HyperLogLog++ (`approx_count_distinct`), but its estimate is
engine-specific, so it cannot be oracle-checked across engines. KMV over a
content hash is fully deterministic: hash every value to a uniform fraction
with md5, keep the k smallest per group, estimate distinct = (k-1)/h_(k).
Any engine that hashes the same bytes produces the same sketch — which also
makes the sketch *mergeable* (the union's sketch is the k smallest of the
concatenated sketches), the property that matters for partial aggregation
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 15 hex chars = 60 bits, safely inside a signed 64-bit integer.
_TWO_60 = float(1 << 60)


def _frac(col: str) -> F.Column:
    """md5(value) mapped to a uniform double in [0, 1)."""
    return (
        F.conv(F.substring(F.md5(F.col(col).cast("string").cast("binary")), 1, 15), 16, 10)
        .cast("bigint")
        / F.lit(_TWO_60)
    )


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV distinct estimate alongside the exact count.

    Output: (group, n_exact, kmv_estimate, n_seen). Groups with fewer than
    k distinct values are exact by construction (the sketch holds them all).

    Scale shape: one distinct on (group, value) with map-side partial, then
    a group-keyed window that keeps k rows per group — never a per-group
    array in memory. A production streaming variant folds the same min-k
    merge into a partial-aggregate UDAF; the estimator and its determinism
    are identical.
    """
    # NULL values hash to NULL and would rank NULLS FIRST in Spark but
    # NULLS LAST in the oracle — exclude them on both engines
    d = df.select(group_col, value_col).filter(F.col(value_col).isNotNull()).distinct()
    hashed = d.withColumn("__frac", _frac(value_col))
    w = Window.partitionBy(group_col).orderBy("__frac")
    topk = hashed.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    sketch = topk.groupBy(group_col).agg(
        F.count("*").cast("bigint").alias("n_seen"),
        F.max("__frac").alias("__kth"),
    )
    exact = d.groupBy(group_col).agg(F.count("*").cast("bigint").alias("n_exact"))
    return (
        exact.join(sketch, group_col)
        .select(
            group_col,
            "n_exact",
            F.when(F.col("n_seen") < k, F.col("n_seen").cast("double"))
            .otherwise(F.lit(float(k - 1)) / F.col("__kth"))
            .cast("double")
            .alias("kmv_estimate"),
            "n_seen",
        )
    )


def merge_kmv(sketches: list[list[float]], k: int) -> list[float]:
    """Driver-side union of KMV sketches: the k smallest of the union —
    used by tests to prove mergeability; distributed partial aggregation
    applies the same fold."""
    return sorted(set().union(*map(set, sketches)))[:k]


def oracle_kmv_distinct(table: str, group_col: str, value_col: str, k: int = 64) -> str:
    frac = (
        f"CAST(('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15)) AS BIGINT)"
        f" / {float(1 << 60)!r}"
    )
    return f"""
    WITH d AS (
      SELECT DISTINCT {group_col}, {value_col} FROM {table}
      WHERE {value_col} IS NOT NULL
    ), h AS (
      SELECT {group_col}, {frac} AS frac FROM d
    ), r AS (
      SELECT {group_col}, frac,
             row_number() OVER (PARTITION BY {group_col} ORDER BY frac) AS rn
      FROM h
    ), sk AS (
      SELECT {group_col}, count(*) AS n_seen, max(frac) AS kth
      FROM r WHERE rn <= {k} GROUP BY {group_col}
    ), ex AS (
      SELECT {group_col}, count(*) AS n_exact FROM d GROUP BY {group_col}
    )
    SELECT ex.{group_col}, CAST(n_exact AS BIGINT) AS n_exact,
           CAST(CASE WHEN n_seen < {k} THEN n_seen
                     ELSE ({k} - 1) / kth END AS DOUBLE) AS kmv_estimate,
           CAST(n_seen AS BIGINT) AS n_seen
    FROM ex JOIN sk USING ({group_col})
    """
