"""Workload modeling: job-trace digest + cluster load curve.

Spark-first take on the reference's trace tooling (SURVEY §2.12):

- Rumen digests job-history logs into per-job records (submit/launch/finish
  times, task counts, priority — ``HT/hadoop-rumen/.../LoggedJob.java:55-71``)
  and summarizes distributions as discrete CDFs
  (``LoggedDiscreteCDF.java:24``, built from a value histogram).
  ``trace_digest`` reproduces that digest shape: per-priority job counts,
  task totals, and exact histogram-CDF percentiles — the discrete-domain
  percentile is computed from (priority, duration) counts plus a cumulative
  pass over the tiny histogram, never a data-sized sort.
- Gridmix/SLS replay a trace against a cluster to study load
  (``hadoop-gridmix/.../ReplayJobFactory.java``, ``ExecutionSummarizer.java``).
  ``concurrency_curve`` computes the load curve analytically instead: a
  sweep-line over submit(+1)/finish(-1) deltas, aggregated per time bucket;
  the cumulative concurrency runs over bucket aggregates (thousands of
  rows), so the only ordered pass is metadata-sized.

The trace itself is derived deterministically from the orders table (jobs =
orders, priority = o_orderpriority), so every number is oracle-checkable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def job_trace(orders: DataFrame) -> DataFrame:
    """LoggedJob-shaped trace from orders: deterministic duration (minutes)
    and map-task count derived from the order key."""
    return orders.select(
        F.col("o_orderkey").alias("job_id"),
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderpriority").alias("priority"),
        F.col("o_orderdate").alias("submit_ts"),
        (F.col("o_orderkey") % 240 + 1).cast("int").alias("dur_min"),
        (F.col("o_orderkey") % 50 + 1).cast("int").alias("n_maps"),
    ).withColumn(
        "finish_ts", F.expr("submit_ts + make_interval(0, 0, 0, 0, 0, dur_min, 0)")
    )


def trace_digest(trace: DataFrame, percentiles: tuple[float, ...] = (0.5, 0.9)) -> DataFrame:
    """Per-priority digest with exact histogram-CDF percentiles.

    Durations live in a small discrete domain, so the percentile comes from
    the (priority, duration) histogram: cumulative counts over at most
    |domain| rows per priority, then the smallest duration whose cumulative
    count reaches ceil(p * n). Exact, deterministic, and the ordered pass
    never touches data-sized rows — the same reason Rumen stores a
    Histogram, not samples (LoggedDiscreteCDF.java:50 setCDF).
    """
    hist = trace.groupBy("priority", "dur_min").agg(
        F.count("*").alias("cnt"), F.sum("n_maps").alias("maps")
    )
    w = (
        Window.partitionBy("priority")
        .orderBy("dur_min")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("cnt").over(w)).withColumn(
        "n", F.sum("cnt").over(Window.partitionBy("priority"))
    )
    pct_aggs = [
        F.min(
            F.when(F.col("cum") >= F.ceil(p * F.col("n")), F.col("dur_min"))
        ).cast("int").alias(f"p{int(p * 100)}_dur")
        for p in percentiles
    ]
    return cum.groupBy("priority").agg(
        F.sum("cnt").cast("bigint").alias("n_jobs"),
        F.sum("maps").cast("bigint").alias("sum_maps"),
        F.min("dur_min").cast("int").alias("min_dur"),
        F.max("dur_min").cast("int").alias("max_dur"),
        *pct_aggs,
    )


def concurrency_curve(trace: DataFrame, bucket: str = "day") -> DataFrame:
    """Sweep-line cluster load: per-bucket job starts, finishes, and
    end-of-bucket running concurrency.

    Deltas aggregate per bucket first (data-sized work, one shuffle); the
    cumulative sum then runs over bucket rows only — day buckets over a
    decade are ~3.7k rows, metadata scale at any corpus size.
    """
    starts = trace.select(
        F.date_trunc(bucket, "submit_ts").alias("b"), F.lit(1).alias("delta")
    )
    ends = trace.select(
        F.date_trunc(bucket, "finish_ts").alias("b"), F.lit(-1).alias("delta")
    )
    per_bucket = (
        starts.union(ends)
        .groupBy("b")
        .agg(
            F.sum(F.when(F.col("delta") > 0, 1).otherwise(0)).alias("n_start"),
            F.sum(F.when(F.col("delta") < 0, 1).otherwise(0)).alias("n_end"),
            F.sum("delta").alias("net"),
        )
    )
    w = Window.orderBy("b").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return per_bucket.withColumn("concurrency_eob", F.sum("net").over(w)).select(
        F.col("b").alias("bucket_ts"),
        F.col("n_start").cast("bigint"),
        F.col("n_end").cast("bigint"),
        F.col("concurrency_eob").cast("bigint"),
    )


def oracle_job_trace(table: str = "orders") -> str:
    return f"""
      SELECT o_orderkey AS job_id, o_custkey AS user_id,
             o_orderpriority AS priority, o_orderdate AS submit_ts,
             CAST(o_orderkey % 240 + 1 AS INT) AS dur_min,
             CAST(o_orderkey % 50 + 1 AS INT) AS n_maps,
             o_orderdate + INTERVAL 1 MINUTE * (o_orderkey % 240 + 1) AS finish_ts
      FROM {table}
    """


def oracle_trace_digest(percentiles: tuple[float, ...] = (0.5, 0.9)) -> str:
    pct_cols = ", ".join(
        f"CAST(min(CASE WHEN cum >= ceil({p} * n) THEN dur_min END) AS INT)"
        f" AS p{int(p * 100)}_dur"
        for p in percentiles
    )
    return f"""
    WITH trace AS ({oracle_job_trace()}),
    hist AS (
      SELECT priority, dur_min, count(*) AS cnt, sum(n_maps) AS maps
      FROM trace GROUP BY priority, dur_min
    ), cum_t AS (
      SELECT priority, dur_min, cnt, maps,
             sum(cnt) OVER (PARTITION BY priority ORDER BY dur_min
                            ROWS UNBOUNDED PRECEDING) AS cum,
             sum(cnt) OVER (PARTITION BY priority) AS n
      FROM hist
    )
    SELECT priority, CAST(sum(cnt) AS BIGINT) AS n_jobs,
           CAST(sum(maps) AS BIGINT) AS sum_maps,
           CAST(min(dur_min) AS INT) AS min_dur,
           CAST(max(dur_min) AS INT) AS max_dur,
           {pct_cols}
    FROM cum_t GROUP BY priority
    """


def oracle_concurrency_curve(bucket: str = "day") -> str:
    return f"""
    WITH trace AS ({oracle_job_trace()}),
    deltas AS (
      SELECT date_trunc('{bucket}', submit_ts) AS b, 1 AS delta FROM trace
      UNION ALL
      SELECT date_trunc('{bucket}', finish_ts) AS b, -1 AS delta FROM trace
    ), per_bucket AS (
      SELECT b,
             sum(CASE WHEN delta > 0 THEN 1 ELSE 0 END) AS n_start,
             sum(CASE WHEN delta < 0 THEN 1 ELSE 0 END) AS n_end,
             sum(delta) AS net
      FROM deltas GROUP BY b
    )
    SELECT b AS bucket_ts, CAST(n_start AS BIGINT) AS n_start,
           CAST(n_end AS BIGINT) AS n_end,
           CAST(sum(net) OVER (ORDER BY b ROWS UNBOUNDED PRECEDING) AS BIGINT)
             AS concurrency_eob
    FROM per_bucket
    """


# ---------------------------------------------------------------------------
# Gridmix replay executor — actually submits a synthetic job mix
# ---------------------------------------------------------------------------

#: default synthetic mix: cheap scan, agg, join, sort, dedup — the shapes
#: Gridmix's LoadJob/SleepJob emulate, but drawn from the real registry
_DEFAULT_MIX = (
    "q01_wordcount",
    "tq6_forecast_revenue",
    "tq13_customer_distribution",
    "q17_distinct",
    "q02_grep",
)


def gridmix_replay(
    spark,
    sf_dir: str,
    trace: DataFrame,
    mode: str = "replay",
    time_scale: float = 86_400.0,
    max_jobs: int = 12,
    stress_width: int = 4,
    query_mix: tuple[str, ...] = _DEFAULT_MIX,
):
    """Trace-driven replay of a synthetic job mix against THIS engine — the
    executor half of Gridmix (``HT/hadoop-gridmix/.../Gridmix.java:58``),
    where :func:`concurrency_curve` is the analytic half.

    Modes, as in the reference's JobFactory hierarchy:

    - ``replay`` (ReplayJobFactory): submit each job at its trace offset,
      compressed by ``time_scale`` (trace seconds per wall second).
    - ``stress`` (StressJobFactory): keep ``stress_width`` jobs in flight
      until the mix is exhausted — saturation, ignore trace timing.
    - ``serial`` (SerialJobFactory): one at a time, trace order.

    Each trace job maps deterministically (job_id mod mix size) to a
    registry query; jobs run on concurrent driver threads (Spark's
    supported multi-thread submission path; with ``spark.scheduler.mode=
    FAIR`` each lands in its own pool). Only job METADATA is collected —
    results are counted, never pulled to the driver.

    Returns (summary_row_dict, per_job list of dicts) — an
    ExecutionSummarizer-shaped report: per-job wall/rows/offsets plus
    makespan and effective concurrency (Σ wall / makespan).
    """
    import threading
    import time
    from concurrent.futures import ThreadPoolExecutor

    from ..queries import REGISTRY

    jobs = (
        trace.select("job_id", "submit_ts")
        .orderBy("submit_ts", "job_id")
        .limit(max_jobs)
        .collect()  # metadata-scale: max_jobs rows
    )
    if not jobs:
        return ({"n_jobs": 0, "n_failed": 0, "makespan_s": 0.0,
                 "effective_concurrency": 0.0}, [])
    t0 = jobs[0].submit_ts
    sc = spark.sparkContext
    wall0 = time.monotonic()
    results = []
    lock = threading.Lock()

    def run_one(job, delay_s: float):
        name = query_mix[job.job_id % len(query_mix)]
        if mode == "replay" and delay_s > 0:
            time.sleep(delay_s)
        sc.setLocalProperty("spark.scheduler.pool", f"gridmix-{job.job_id}")
        sc.setJobGroup(f"gridmix-{job.job_id}", f"replay {name}", False)
        start = time.monotonic() - wall0
        try:
            n = REGISTRY[name].fn(spark, sf_dir).count()
            ok = True
        except Exception:
            n, ok = -1, False
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)
        end = time.monotonic() - wall0
        with lock:
            results.append({
                "job_id": job.job_id, "query": name, "ok": ok, "rows": n,
                "submit_offset_s": round(delay_s, 3),
                "start_s": round(start, 3), "end_s": round(end, 3),
                "wall_s": round(end - start, 3),
            })

    if mode == "serial":
        for job in jobs:
            run_one(job, 0.0)
    else:
        width = stress_width if mode == "stress" else len(jobs)
        with ThreadPoolExecutor(max_workers=max(1, width)) as ex:
            futs = []
            for job in jobs:
                delay = (
                    (job.submit_ts - t0).total_seconds() / time_scale
                    if mode == "replay"
                    else 0.0
                )
                futs.append(ex.submit(run_one, job, delay))
            for f in futs:
                f.result()

    results.sort(key=lambda r: (r["start_s"], r["job_id"]))
    makespan = max(r["end_s"] for r in results)
    busy = sum(r["wall_s"] for r in results)
    summary = {
        "n_jobs": len(results),
        "n_failed": sum(1 for r in results if not r["ok"]),
        "makespan_s": round(makespan, 3),
        "effective_concurrency": round(busy / makespan, 3) if makespan else 0.0,
    }
    return summary, results
