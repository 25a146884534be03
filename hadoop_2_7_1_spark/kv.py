"""KVDataset — the MR-shaped facade (SURVEY.md §7 design stance).

A thin veneer giving users of the reference the familiar verbs — map /
combine / partition-sort-group / reduce / pipe — while every verb lowers to
declarative DataFrame ops so Catalyst still sees the whole plan:

  map_kv / flat_map_kv   Mapper.java:123 (1→1 / 1→N record transform)
  reduce_by_key          Reducer.java:147 + combiner (partial agg is
                         automatic: HashAggregate(partial→final))
  group_sorted           ReduceContextImpl.java:113 grouping-comparator
                         semantics: (key, values sorted by a secondary key)
  partition_sort         repartition + sortWithinPartitions (§2.3 hooks)
  pipe                   Hadoop Streaming line protocol (operators/pipes.py)

No RDDs anywhere; "keys" are just columns.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


class KVDataset:
    def __init__(self, df: DataFrame, key: str = "key", value: str = "value"):
        self.df = df
        self.key = key
        self.value = value

    # -- map side -----------------------------------------------------------

    def map_kv(self, key_expr: Column, value_expr: Column) -> "KVDataset":
        return KVDataset(
            self.df.select(key_expr.alias(self.key), value_expr.alias(self.value)),
            self.key,
            self.value,
        )

    def flat_map_values(self, explode_expr: Column) -> "KVDataset":
        """1→N on the value side (e.g. tokenize): explode an array expr."""
        return KVDataset(
            self.df.select(F.col(self.key), F.explode(explode_expr).alias(self.value)),
            self.key,
            self.value,
        )

    def filter(self, cond: Column | str) -> "KVDataset":
        return KVDataset(self.df.filter(cond), self.key, self.value)

    # -- shuffle side -------------------------------------------------------

    def reduce_by_key(self, agg: Column, out_name: str = "value") -> "KVDataset":
        """groupBy(key).agg(...) — combiner (map-side partial agg) included
        by Catalyst automatically."""
        return KVDataset(
            self.df.groupBy(self.key).agg(agg.alias(out_name)), self.key, out_name
        )

    def group_sorted(self, sort_key: str) -> DataFrame:
        """(key, values ordered by sort_key) — secondary-sort semantics."""
        from .operators.secondary_sort import grouped_sorted_values

        return grouped_sorted_values(self.df, self.key, sort_key, self.value)

    def partition_sort(self, num_partitions: int, *sort_cols: str) -> "KVDataset":
        cols = list(sort_cols) or [self.key]
        return KVDataset(
            self.df.repartition(num_partitions, self.key).sortWithinPartitions(*cols),
            self.key,
            self.value,
        )

    # -- UDF surface --------------------------------------------------------

    def pipe(self, cmd: list[str], sep: str = "\t") -> "KVDataset":
        from .operators.pipes import pipe_transform

        return KVDataset(pipe_transform(self.df, cmd, sep=sep), "key", "value")

    def to_df(self) -> DataFrame:
        return self.df


def kv(df: DataFrame, key_expr: Column, value_expr: Column) -> KVDataset:
    return KVDataset(
        df.select(key_expr.alias("key"), value_expr.alias("value"))
    )
