"""Join operators (SURVEY.md §2.5).

The reference's map-side merge-join framework (mapreduce/lib/join/
CompositeInputFormat.java:85, expression DSL ``inner(tbl(...),tbl(...))``)
requires identically-partitioned, key-sorted inputs and streams a k-way
merge. On Spark the same physical plan is sort-merge join; co-partitioned
pre-sorted inputs correspond to bucketed tables. We expose the DSL verbs as
functions; Catalyst/AQE pick merge vs broadcast-hash per side size.

- inner_join        InnerJoinRecordReader.java:45  (all sources have key)
- full_outer_join   OuterJoinRecordReader.java:45  (any source has key)
- override_join     OverrideRecordReader.java:36   (rightmost source wins)
- semi/anti         not reference operators; exposed as engine extras
- broadcast_join    DistributedCache map-side hash join pattern
                    (filecache/DistributedCache.java:134)
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def inner_join(dfs: list[DataFrame], key: str) -> DataFrame:
    """N-way equi inner join: emit combined row iff every source has the key."""
    return reduce(lambda a, b: a.join(b, key, "inner"), dfs)


def full_outer_join(dfs: list[DataFrame], key: str) -> DataFrame:
    """N-way full outer: emit row if any source has the key; absent slots null
    (TupleWritable per-slot presence bits ≈ nullable columns)."""
    return reduce(lambda a, b: a.join(b, key, "full_outer"), dfs)


def override_join(dfs: list[DataFrame], key: str, value_col: str, out_col: str = "value") -> DataFrame:
    """Per key emit the value from the RIGHTMOST source that has it.

    OverrideRecordReader.java:36-56: priority coalesce across sources; later
    (rightmost) inputs override earlier ones.
    """
    renamed = [
        df.select(F.col(key), F.col(value_col).alias(f"__v{i}")) for i, df in enumerate(dfs)
    ]
    joined = reduce(lambda a, b: a.join(b, key, "full_outer"), renamed)
    pref = [F.col(f"__v{i}") for i in reversed(range(len(dfs)))]
    return joined.select(F.col(key), F.coalesce(*pref).alias(out_col))


def semi_join(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    return left.join(right, key, "left_semi")


def anti_join(left: DataFrame, right: DataFrame, key: str) -> DataFrame:
    return left.join(right, key, "left_anti")


def broadcast_join(big: DataFrame, small: DataFrame, on, how: str = "inner") -> DataFrame:
    """Map-side hash join: ship the small table to every task, as the
    reference does via DistributedCache, minus the shuffle entirely."""
    return big.join(F.broadcast(small), on, how)
