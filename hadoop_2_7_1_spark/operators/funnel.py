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
    id_col: str = "event_id",
) -> DataFrame:
    """Time-series OHLC rollup: per (key, time bucket) the opening/closing
    values (first/last by event time, ``id_col`` tie-break) plus high, low,
    count and a decimal-accumulated volume — the hypertable
    continuous-aggregate shape.

    One shuffle, one sort: first/last come from a single ascending
    row_number per bucket; the "last" rank is derived as n - rank + 1 from
    an unordered count over the same partition, so no second descending
    sort. At 100 TB the bucket key is (key, hour) — naturally bounded
    cardinality, no skew salt needed.
    """
    w_sort = Window.partitionBy("bucket", key_col).orderBy(ts_col, id_col)
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
    id_col: str = "event_id",
) -> str:
    return f"""
    WITH b AS (
      SELECT date_trunc('{width}', {ts_col}) AS bucket, {key_col}, {ts_col},
             {id_col}, {value_col},
             row_number() OVER (PARTITION BY date_trunc('{width}', {ts_col}), {key_col}
                                ORDER BY {ts_col}, {id_col}) AS ra,
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


def trend_ols(
    events: DataFrame,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Per-group ordinary-least-squares trend (slope per second + intercept)
    of value over time, from exact decimal sufficient statistics.

    Closed form: slope = (n·Σxy − Σx·Σy) / (n·Σx² − (Σx)²). The x axis is
    epoch seconds re-based to the corpus minimum (broadcast scalar), which
    keeps every decimal product inside 38 digits, so all four sums and both
    closed-form combinations are EXACT integer arithmetic — bit-identical
    at any parallelism — with doubles appearing only in the final division
    (then rounded to 6 decimals). One scan + one group agg; the regression
    itself costs nothing beyond the sums.
    """
    x0 = events.agg(
        F.min(F.unix_timestamp(ts_col)).alias("x0")
    )
    rows = events.crossJoin(F.broadcast(x0)).select(
        F.col(key_col),
        (F.unix_timestamp(ts_col) - F.col("x0")).alias("xr"),
        F.col(value_col).alias("yr"),
    )
    g = rows.groupBy(key_col).agg(
        F.count("*").cast("decimal(10,0)").alias("n"),
        F.sum(F.col("xr").cast("decimal(18,0)")).cast("decimal(18,0)").alias("sx"),
        F.sum((F.col("xr") * F.col("xr")).cast("decimal(28,0)"))
        .cast("decimal(28,0)")
        .alias("sxx"),
        F.sum(F.col("yr").cast("decimal(19,6)")).cast("decimal(19,6)").alias("sy"),
        F.sum((F.col("xr") * F.col("yr")).cast("decimal(25,6)"))
        .cast("decimal(25,6)")
        .alias("sxy"),
    )
    # Sums are EXACT decimals; the closed-form combination runs in double
    # (identical operation order on both engines) and the result rounds to
    # 6 decimals — the same discipline as the ln()-based scorers. Doing the
    # combination in decimal instead trips DuckDB's decimal-width rules.
    n_d = F.col("n").cast("double")
    sx_d = F.col("sx").cast("double")
    sxx_d = F.col("sxx").cast("double")
    sy_d = F.col("sy").cast("double")
    sxy_d = F.col("sxy").cast("double")
    slope = F.round((n_d * sxy_d - sx_d * sy_d) / (n_d * sxx_d - sx_d * sx_d), 6)
    intercept = F.round((sy_d - slope * sx_d) / n_d, 6)
    return g.select(
        key_col,
        F.col("n").cast("bigint").alias("n"),
        slope.alias("slope_per_sec"),
        intercept.alias("intercept"),
    )


def oracle_trend_ols(
    table: str,
    key_col: str = "event_type",
    ts_col: str = "ts",
    value_col: str = "value",
) -> str:
    return f"""
    WITH bnds AS (
      -- floor to whole seconds: Spark's unix_timestamp truncates, DuckDB's
      -- epoch() keeps the fraction as DOUBLE
      SELECT min(CAST(floor(epoch({ts_col})) AS BIGINT)) AS tmin FROM {table}
    ),
    rows_ AS (
      SELECT {key_col}, CAST(floor(epoch({ts_col})) AS BIGINT) - bnds.tmin AS xr,
             {value_col} AS yr
      FROM {table}, bnds
    ), g AS (
      SELECT {key_col},
             CAST(count(*) AS DECIMAL(10,0)) AS n,
             CAST(sum(CAST(xr AS DECIMAL(18,0))) AS DECIMAL(18,0)) AS sx,
             CAST(sum(CAST(xr * xr AS DECIMAL(28,0))) AS DECIMAL(28,0)) AS sxx,
             CAST(sum(CAST(yr AS DECIMAL(19,6))) AS DECIMAL(19,6)) AS sy,
             CAST(sum(CAST(xr * yr AS DECIMAL(25,6))) AS DECIMAL(25,6)) AS sxy
      FROM rows_ GROUP BY {key_col}
    )
    SELECT {key_col}, CAST(n AS BIGINT) AS n,
           round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                 / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                    - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
             AS slope_per_sec,
           round((CAST(sy AS DOUBLE)
                  - round((CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
                           - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
                          / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                             - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE)), 6)
                    * CAST(sx AS DOUBLE))
                 / CAST(n AS DOUBLE), 6) AS intercept
    FROM g
    """
