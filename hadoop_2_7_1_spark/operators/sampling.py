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


def sample_mixture(
    df: DataFrame, key_col: str, source_col: str, weights: dict[str, float]
) -> DataFrame:
    """Down-sample per-source so the surviving corpus matches a target
    mixture (the domain-mixing step of a training-data pipeline), keeping as
    much data as possible: the most over-asked source is kept whole and
    every other source is hash-thresholded to its proportional share.

    Deterministic (content-stable md5 on ``key_col``), so reruns and other
    engines select identical rows. Sources absent from ``weights`` are
    dropped. The per-source scaling factors live on a sources-sized
    aggregate that broadcasts; the data pass is one scan + filter.
    """
    import itertools

    w = F.create_map(
        *itertools.chain.from_iterable(
            (F.lit(s), F.lit(wt)) for s, wt in weights.items()
        )
    )
    counts = (
        df.filter(F.col(source_col).isin(*weights))
        .groupBy(source_col)
        .agg(F.count("*").alias("__cnt"))
        .withColumn("__wt", w[F.col(source_col)])
    )
    # T = min over sources of count/weight; target_s = T * w_s
    t = counts.agg(F.min(F.col("__cnt") / F.col("__wt")).alias("__T"))
    fracs = counts.crossJoin(F.broadcast(t)).select(
        source_col,
        (F.col("__T") * F.col("__wt") / F.col("__cnt")).alias("__frac"),
    )
    return (
        df.join(F.broadcast(fracs), source_col)
        .filter(hex_hash32(key_col) < F.col("__frac") * HASH_SPACE)
        .drop("__frac")
    )


def oracle_sample_mixture(
    table: str, key_col: str, source_col: str, weights: dict[str, float]
) -> str:
    """DuckDB twin of sample_mixture (same md5 thresholds, same T)."""
    values = ", ".join(f"('{s}', CAST({wt} AS DOUBLE))" for s, wt in weights.items())
    hash32 = f"CAST(('0x' || substr(md5(CAST({key_col} AS VARCHAR)), 1, 8)) AS BIGINT)"
    return f"""
    WITH w(src, wt) AS (VALUES {values}),
    c AS (
      SELECT {source_col} AS src, count(*) AS cnt
      FROM {table} WHERE {source_col} IN (SELECT src FROM w)
      GROUP BY 1
    ),
    f AS (
      SELECT c.src, (SELECT min(cnt / wt) FROM c JOIN w ON c.src = w.src) * wt / cnt AS frac
      FROM c JOIN w ON c.src = w.src
    )
    SELECT t.* FROM {table} t JOIN f ON t.{source_col} = f.src
    WHERE {hash32} < frac * {HASH_SPACE}
    """
