"""Changelog compaction (CDC upsert/delete merge).

The standard merge-on-read compaction shape (what Hudi/Iceberg/Delta MERGE
does under the hood): reduce the changelog to latest-per-key with a keyed
window, then resolve against the base snapshot with one co-partitioned
full-outer join. Both shuffles key on the merge key — balanced, and the
same plan at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def merge_changelog(
    base: DataFrame,
    changes: DataFrame,
    key: str,
    order_by: list[str],
    val_col: str,
    delete_col: str,
) -> DataFrame:
    """Apply a changelog to a base snapshot, latest-per-key wins.

    ``changes`` rows carry (key, new value, is-delete flag); ``order_by``
    columns (descending, in order) pick the winning change per key and must
    form a total order within a key for determinism. Output rows:
    (key, val, src) with src in {kept, updated, inserted}; keys whose
    winning change is a delete are dropped.
    """
    w = Window.partitionBy(key).orderBy(*[F.col(c).desc() for c in order_by])
    latest = (
        changes.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .select(
            F.col(key).alias("__k"),
            F.col(val_col).alias("__new_val"),
            F.col(delete_col).alias("__del"),
        )
    )
    merged = base.join(latest, base[key] == latest["__k"], "full_outer")
    return (
        merged.filter(~F.coalesce(F.col("__del"), F.lit(False)))
        .select(
            F.coalesce(base[key], F.col("__k")).cast("bigint").alias(key),
            F.coalesce(F.col("__new_val"), base[val_col]).cast("double").alias(val_col),
            F.when(F.col("__k").isNull(), "kept")
            .when(base[key].isNull(), "inserted")
            .otherwise("updated")
            .alias("src"),
        )
    )
