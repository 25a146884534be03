"""Skew-mitigation for aggregations.

AQE splits skewed *join* partitions, but a `groupBy` over a hot key (think
`event_type` with 5 values across 100 TB of events) still funnels each key
through one reducer. Salted two-phase aggregation restores balance:

  phase 1: groupBy(key, salt = hash-derived bucket) — partial aggregates,
           hot keys spread over `salt_buckets` reducers
  phase 2: groupBy(key) — merge the partials (sum of sums, sum of counts,
           min of mins, …)

Exact for any algebraic aggregate (sum/count/min/max/avg-decomposed).
Catalyst's map-side partial aggregation already does the same thing *within*
a task; salting extends it across reducers when key cardinality < cores.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def salted_aggregate(
    df: DataFrame,
    keys: list[str],
    aggs: dict[str, tuple[str, Column]],
    salt_buckets: int = 32,
    salt_source: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation.

    ``aggs`` maps output name -> (merge_fn_name, partial_agg_column) where
    merge_fn_name in {"sum", "min", "max"} merges the per-salt partials.
    Example::

        salted_aggregate(events, ["event_type"],
                         {"n": ("sum", F.count("*")),
                          "sum_value": ("sum", F.sum("value")),
                          "max_value": ("max", F.max("value"))})
    """
    salt_col = (
        F.abs(F.hash(salt_source)) % salt_buckets
        if salt_source is not None
        else (F.monotonically_increasing_id() % salt_buckets)
    )
    partial = (
        df.withColumn("_salt", salt_col)
        .groupBy(*keys, "_salt")
        .agg(*[col.alias(f"_p_{name}") for name, (_, col) in aggs.items()])
    )
    merge = {"sum": F.sum, "min": F.min, "max": F.max}
    return partial.groupBy(*keys).agg(
        *[merge[fn](f"_p_{name}").alias(name) for name, (fn, _) in aggs.items()]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    key: str,
    salt_buckets: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join when the small side is too large to broadcast
    and the big side has hot keys: salt the big side's rows into
    ``salt_buckets`` sub-keys and replicate every small-side row across all
    buckets, so one hot key spreads over ``salt_buckets`` reducers instead
    of funneling through one.

    Cost model: small side shuffles ``salt_buckets×`` its size — worth it
    exactly when the hot key's partition would otherwise dominate the stage
    (AQE's skew-join split handles moderate skew automatically; salting is
    the deterministic fix when one key exceeds a whole executor's capacity).
    Exact for inner/left joins on any key distribution.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (replication-safe)")
    # pmod, not abs(hash) % n: abs(Int.MinValue) overflows back to MinValue
    # and would produce a negative salt with no small-side partner
    salted_big = big.withColumn(
        "_salt", F.pmod(F.hash(F.monotonically_increasing_id()), F.lit(salt_buckets))
    )
    salted_small = small.join(
        F.broadcast(
            small.sparkSession.range(salt_buckets).select(
                F.col("id").cast("int").alias("_salt")
            )
        )
    )
    out = salted_big.join(salted_small, [key, "_salt"], how)
    return out.drop("_salt")
