"""Event-sequence analytics: conversion funnels and cohort retention.

Both are pure keyed-aggregate pipelines — every shuffle keys on user_id (or
the cohort pair), so partitions stay balanced whenever user cardinality
exceeds core count, which is always true at corpus scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
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
