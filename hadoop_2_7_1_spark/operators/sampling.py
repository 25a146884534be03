"""Deterministic sampling for dataset curation.

Spark's `sample`/`sampleBy` are seeded but engine-specific (their RNG stream
is not reproducible outside Spark). Curation pipelines want *content-stable*
sampling: whether a row is kept depends only on its key, so reruns,
backfills, and other engines (the DuckDB oracle, a downstream trainer)
agree row-for-row. All operators here threshold the md5-derived 32-bit hash
from :mod:`..functions` — the same trick as the reference's MD5-based
`SequenceFileInputFilter` (SequenceFileInputFilter.java:202), generalized.

Everything is a filter/withColumn — pushes into the scan, no shuffle.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import hex_hash32

HASH_SPACE = 1 << 32


def deterministic_sample(df: DataFrame, key_col: str, fraction: float) -> DataFrame:
    """Keep ~fraction of rows, decided by hash(key) alone."""
    return df.filter(hex_hash32(key_col) < int(fraction * HASH_SPACE))


def stratified_sample(
    df: DataFrame, key_col: str, strata_col: str, fractions: dict[str, float]
) -> DataFrame:
    """Per-stratum deterministic sampling (e.g. per-language doc quotas).

    Strata absent from ``fractions`` are dropped (matching `sampleBy`).
    """
    thresh = F.lit(None).cast("bigint")
    expr: Column = thresh
    for value, frac in fractions.items():
        expr = F.when(F.col(strata_col) == value, int(frac * HASH_SPACE)).otherwise(expr)
    return df.withColumn("_t", expr).filter(hex_hash32(key_col) < F.col("_t")).drop("_t")


def train_test_split(
    df: DataFrame, key_col: str, test_fraction: float = 0.1, split_col: str = "split"
) -> DataFrame:
    """Adds 'train'/'test' label; assignment is stable under reruns and
    unaffected by row order or partitioning."""
    return df.withColumn(
        split_col,
        F.when(hex_hash32(key_col) < int(test_fraction * HASH_SPACE), "test").otherwise(
            "train"
        ),
    )


def oracle_hash_threshold(key_expr: str, fraction: float) -> str:
    """DuckDB predicate matching deterministic_sample."""
    return (
        f"CAST(('0x' || substr(md5(CAST({key_expr} AS VARCHAR)), 1, 8)) AS BIGINT)"
        f" < {int(fraction * HASH_SPACE)}"
    )
