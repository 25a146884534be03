"""Event-sequence analytics: conversion funnels and cohort retention.

Both are pure keyed-aggregate pipelines — every shuffle keys on user_id (or
the cohort pair), so partitions stay balanced whenever user cardinality
exceeds core count, which is always true at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def funnel(
    events: DataFrame,
    steps: list[str],
    user_col: str = "user_id",
    type_col: str = "event_type",
    ts_col: str = "ts",
) -> DataFrame:
    """Ordered conversion funnel: a user reaches step k at the earliest
    event of type steps[k] strictly after their step-(k-1) time.

    Output: (stage, step, n_users) — stage is 1-based. Each stage is one
    filter + user-keyed min + co-partitioned join; nothing is ever sorted
    per user, so there is no per-user state beyond one timestamp. Each
    stage's frontier is checkpointed so stage k's count does not re-execute
    stages 1..k-1's scans (k scans total, not k²/2).
    """
    reached = None
    stage_counts = []
    for i, step in enumerate(steps):
        sel = events.filter(F.col(type_col) == step).select(
            F.col(user_col).alias("u"), F.col(ts_col).alias("t")
        )
        if reached is None:
            reached = sel.groupBy("u").agg(F.min("t").alias("t_prev"))
        else:
            reached = (
                sel.join(reached, "u")
                .filter(F.col("t") > F.col("t_prev"))
                .groupBy("u")
                .agg(F.min("t").alias("t_prev"))
            )
        reached = reached.localCheckpoint()
        stage_counts.append(
            reached.agg(
                F.lit(i + 1).cast("bigint").alias("stage"),
                F.lit(step).alias("step"),
                F.count("*").cast("bigint").alias("n_users"),
            )
        )
    out = stage_counts[0]
    for df in stage_counts[1:]:
        out = out.unionByName(df)
    return out


def oracle_funnel(table: str, steps: list[str]) -> str:
    ctes = []
    prev = None
    for i, step in enumerate(steps):
        name = f"s{i}"
        if prev is None:
            ctes.append(
                f"{name} AS (SELECT user_id AS u, min(ts) AS t_prev"
                f" FROM {table} WHERE event_type = '{step}' GROUP BY user_id)"
            )
        else:
            ctes.append(
                f"{name} AS (SELECT e.user_id AS u, min(e.ts) AS t_prev"
                f" FROM {table} e JOIN {prev} p ON e.user_id = p.u"
                f" WHERE e.event_type = '{step}' AND e.ts > p.t_prev"
                f" GROUP BY e.user_id)"
            )
        prev = name
    selects = " UNION ALL ".join(
        f"SELECT CAST({i + 1} AS BIGINT) AS stage, '{step}' AS step,"
        f" CAST((SELECT count(*) FROM s{i}) AS BIGINT) AS n_users"
        for i, step in enumerate(steps)
    )
    return f"WITH {', '.join(ctes)} {selects}"


def retention(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    period: str = "month",
) -> DataFrame:
    """Cohort retention: users grouped by the period of their first event;
    for each (cohort, activity period), how many of them were active.

    Output: (cohort_ts, active_ts, n_users). Two user-keyed aggregates and
    one (cohort, period)-keyed count — the cohort matrix itself is
    periods², metadata-sized.
    """
    cohort = events.groupBy(F.col(user_col).alias("u")).agg(
        F.date_trunc(period, F.min(ts_col)).alias("cohort_ts")
    )
    active = events.select(
        F.col(user_col).alias("u"), F.date_trunc(period, F.col(ts_col)).alias("active_ts")
    ).distinct()
    return (
        active.join(cohort, "u")
        .groupBy("cohort_ts", "active_ts")
        .agg(F.count("*").cast("bigint").alias("n_users"))
    )


def oracle_retention(table: str, period: str = "month") -> str:
    return f"""
    WITH cohort AS (
      SELECT user_id AS u, date_trunc('{period}', min(ts)) AS cohort_ts
      FROM {table} GROUP BY user_id
    ), active AS (
      SELECT DISTINCT user_id AS u, date_trunc('{period}', ts) AS active_ts
      FROM {table}
    )
    SELECT cohort_ts, active_ts, CAST(count(*) AS BIGINT) AS n_users
    FROM active JOIN cohort USING (u)
    GROUP BY cohort_ts, active_ts
    """


def ohlc_bars(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    width: str = "hour",
) -> DataFrame:
    """Time-series OHLC rollup: per (key, time bucket) the opening/closing
    values (first/last by event time, event_id tie-break) plus high, low,
    count and a decimal-accumulated volume — the hypertable
    continuous-aggregate shape.

    One shuffle, one sort: first/last come from a single ascending
    row_number per bucket; the "last" rank is derived as n - rank + 1 from
    an unordered count over the same partition, so no second descending
    sort. At 100 TB the bucket key is (key, hour) — naturally bounded
    cardinality, no skew salt needed.
    """
    w_sort = Window.partitionBy("bucket", key_col).orderBy(ts_col, "event_id")
    w_all = Window.partitionBy("bucket", key_col)
    b = (
        events.withColumn("bucket", F.date_trunc(width, F.col(ts_col)))
        .withColumn("ra", F.row_number().over(w_sort))
        .withColumn("nn", F.count("*").over(w_all))
    )
    return b.groupBy("bucket", key_col).agg(
        F.min(F.when(F.col("ra") == 1, F.col(value_col))).cast("double").alias("open"),
        F.max(F.col(value_col)).cast("double").alias("high"),
        F.min(F.col(value_col)).cast("double").alias("low"),
        F.min(F.when(F.col("ra") == F.col("nn"), F.col(value_col)))
        .cast("double")
        .alias("close"),
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.col(value_col).cast("decimal(38,6)")).cast("double").alias("volume"),
    )


def oracle_ohlc_bars(
    table: str,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
    width: str = "hour",
) -> str:
    return f"""
    WITH b AS (
      SELECT date_trunc('{width}', {ts_col}) AS bucket, {key_col}, {ts_col},
             event_id, {value_col},
             row_number() OVER (PARTITION BY date_trunc('{width}', {ts_col}), {key_col}
                                ORDER BY {ts_col}, event_id) AS ra,
             count(*) OVER (PARTITION BY date_trunc('{width}', {ts_col}), {key_col}) AS nn
      FROM {table}
    )
    SELECT bucket, {key_col},
           CAST(min(CASE WHEN ra = 1 THEN {value_col} END) AS DOUBLE) AS open,
           CAST(max({value_col}) AS DOUBLE) AS high,
           CAST(min({value_col}) AS DOUBLE) AS low,
           CAST(min(CASE WHEN ra = nn THEN {value_col} END) AS DOUBLE) AS close,
           CAST(count(*) AS BIGINT) AS n,
           CAST(sum(CAST({value_col} AS DECIMAL(38,6))) AS DOUBLE) AS volume
    FROM b GROUP BY bucket, {key_col}
    """
