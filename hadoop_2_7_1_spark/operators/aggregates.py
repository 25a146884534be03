"""Aggregation operators (SURVEY.md §2.4).

ValueAggregator framework analogue — the reference dispatches on aggregate
descriptor type strings emitted by mappers ("LongValueSum:word\\t1", see
mapreduce/lib/aggregate/ValueAggregatorBaseDescriptor.java:39-53 and
ValueAggregatorJob.java:119): here the same declarative surface is a
spec→Column registry compiled into ONE groupBy pass, so Catalyst runs it as
partial+final HashAggregate (the combiner, MapTask.java:1637, for free).

ValueHistogram (mapreduce/lib/aggregate/ValueHistogram.java:38): per key,
statistics over the *frequency distribution* of its values — count of distinct
values, min/max/mean/median/stddev of the per-value frequencies.

Exact median (examples/WordMedian.java:64-149): the reference streams the
sorted (length, count) histogram and picks index ceil(n/2). We reproduce that
shape: aggregate to a histogram first (tiny), then a cumulative-sum window
over the histogram — never a global sort of raw rows, so it scales.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# ---------------------------------------------------------------------------
# ValueAggregator registry
# ---------------------------------------------------------------------------

def _uniq_count(value: Column, max_items: int | None) -> Column:
    # UniqValueCount.java:35 supports a cap on tracked distinct items
    # (maxNumItems); the exact distinct count is the uncapped case.
    if max_items is None:
        return F.countDistinct(value).cast("bigint")
    return F.least(F.countDistinct(value), F.lit(max_items)).cast("bigint")


AGGREGATOR_TYPES = {
    # descriptor type string -> fn(value_col, opt) -> Column
    "LongValueSum": lambda v, _o: F.sum(v.cast("long")).cast("bigint"),
    "DoubleValueSum": lambda v, _o: F.sum(v.cast("double")).cast("double"),
    "LongValueMax": lambda v, _o: F.max(v.cast("long")).cast("bigint"),
    "LongValueMin": lambda v, _o: F.min(v.cast("long")).cast("bigint"),
    "StringValueMax": lambda v, _o: F.max(v.cast("string")),
    "StringValueMin": lambda v, _o: F.min(v.cast("string")),
    "UniqValueCount": lambda v, o: _uniq_count(v, o),
    "ValueHistogram:count": lambda v, _o: F.countDistinct(v).cast("bigint"),
}


def value_aggregate(
    df: DataFrame,
    group_col: Column | str,
    specs: Sequence[tuple[str, Column | str, str] | tuple[str, Column | str, str, object]],
) -> DataFrame:
    """Run a ValueAggregatorJob-style declarative aggregation.

    ``specs`` entries are ``(aggregator_type, value_col, out_name[, option])``
    mirroring the reference's "type:id\\tvalue" records; all descriptors over
    the same id compile into a single groupBy.agg pass.
    """
    key = F.col(group_col) if isinstance(group_col, str) else group_col
    aggs = []
    for spec in specs:
        typ, value, out = spec[0], spec[1], spec[2]
        opt = spec[3] if len(spec) > 3 else None
        v = F.col(value) if isinstance(value, str) else value
        try:
            fn = AGGREGATOR_TYPES[typ]
        except KeyError as e:  # pragma: no cover - config error
            raise ValueError(f"unknown aggregator type {typ!r}") from e
        aggs.append(fn(v, opt).alias(out))
    return df.groupBy(key.alias("id")).agg(*aggs)


# ---------------------------------------------------------------------------
# ValueHistogram
# ---------------------------------------------------------------------------

def value_histogram(df: DataFrame, key: str, value: str) -> DataFrame:
    """Per-key stats over value-frequency distribution (ValueHistogram.java:38).

    Output columns: id, n_distinct, min_freq, max_freq, mean_freq,
    median_freq (lower median), stddev_freq (population).

    Two hash aggregations; the per-key frequency list is collected only at the
    second level where cardinality = distinct values per key (bounded in the
    reference too — it holds the same map in memory per reduce key).
    """
    freq = df.groupBy(F.col(key).alias("id"), F.col(value).alias("v")).agg(
        F.count("*").alias("c")
    )
    return freq.groupBy("id").agg(
        F.count("*").cast("bigint").alias("n_distinct"),
        F.min("c").cast("bigint").alias("min_freq"),
        F.max("c").cast("bigint").alias("max_freq"),
        F.avg("c").cast("double").alias("mean_freq"),
        F.expr(
            "cast(element_at(sort_array(collect_list(c)),"
            " cast((count(*) + 1) div 2 as int)) as bigint)"
        ).alias("median_freq"),
        F.sqrt(
            F.avg(F.col("c").cast("double") * F.col("c"))
            - F.avg(F.col("c").cast("double")) * F.avg(F.col("c").cast("double"))
        ).alias("stddev_freq"),
    )


# ---------------------------------------------------------------------------
# Exact median via sorted histogram (WordMedian.java pattern)
# ---------------------------------------------------------------------------

def exact_median(df: DataFrame, col: str, out_name: str = "median") -> DataFrame:
    """Exact lower median ( element at rank (n+1) div 2 ) of an integer-ish
    column, computed scalably: histogram groupBy (distributed) then a
    cumulative window over the tiny histogram — the window's single partition
    holds one row per *distinct value*, not per input row."""
    hist = df.groupBy(F.col(col).alias("v")).agg(F.count("*").alias("c"))
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    total = hist.agg(F.sum("c").alias("n"))
    cum = hist.withColumn("cum", F.sum("c").over(w)).crossJoin(F.broadcast(total))
    target = F.expr("(n + 1) div 2")
    return (
        cum.filter(F.col("cum") >= target)
        .agg(F.min("v").cast("bigint").alias(out_name))
    )


def grouped_agg_udaf(returnType: str = "double"):
    """Combiner-as-UDAF surface (SURVEY.md §2.10: Job.setCombinerClass,
    MRC/mapreduce/Job.java:875): decorator turning a plain
    ``Series -> scalar`` function into a GROUPED_AGG pandas UDF usable in
    ``groupBy(...).agg(...)``. Spark runs it with map-side partial batches +
    Arrow transfer — the combiner pattern without user-visible plumbing.
    """
    from pyspark.sql.functions import PandasUDFType, pandas_udf

    def deco(fn):
        return pandas_udf(fn, returnType, PandasUDFType.GROUPED_AGG)

    return deco


def group_quantiles(
    df: DataFrame,
    group_col: str,
    value_col: str,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Exact per-group quantiles by rank selection: the q-quantile is the
    value at row_number ceil(q*n) in the group's value order (the same
    "nearest-rank, no interpolation" definition the exact-median pattern
    (q04) uses, so it is engine-replayable — unlike percentile_approx's
    engine-specific sketch).

    Scale shape: ONE group-keyed window (partitionBy group — balanced as
    long as groups are; for a single giant group use the two-phase rank in
    operators/partitioning.py) and one conditional aggregation. No global
    sort, no driver collection.
    """
    w = Window.partitionBy(group_col).orderBy("__v")
    ranked = df.select(group_col, F.col(value_col).alias("__v")).select(
        group_col,
        "__v",
        F.row_number().over(w).alias("__rn"),
        F.count("*").over(Window.partitionBy(group_col)).alias("__n"),
    )
    aggs = [
        F.max(
            F.when(F.col("__rn") == F.ceil(F.lit(float(q)) * F.col("__n")), F.col("__v"))
        )
        .cast("double")
        .alias(f"p{str(q)[2:].ljust(2, '0')}")
        for q in quantiles
    ]
    return ranked.groupBy(group_col).agg(*aggs)


def oracle_group_quantiles(
    table: str,
    group_col: str,
    value_col: str,
    quantiles: Sequence[float] = (0.5, 0.9, 0.99),
) -> str:
    sels = ",\n           ".join(
        f"CAST(max(CASE WHEN rn = ceil({q} * n) THEN v END) AS DOUBLE)"
        f" AS p{str(q)[2:].ljust(2, '0')}"
        for q in quantiles
    )
    return f"""
    WITH ranked AS (
      SELECT {group_col}, {value_col} AS v,
             row_number() OVER (PARTITION BY {group_col} ORDER BY {value_col}) AS rn,
             count(*) OVER (PARTITION BY {group_col}) AS n
      FROM {table}
    )
    SELECT {group_col}, {sels}
    FROM ranked GROUP BY {group_col}
    """


def grouped_exact_median(
    df: DataFrame, group_col: str, col: str, out_name: str = "median"
) -> DataFrame:
    """Exact lower median per group — the grouped twin of
    :func:`exact_median`: per-(group, value) histogram, cumulative window
    partitioned BY GROUP over the distinct values (window rows = distinct
    values per group, never input rows), pick rank (n+1) div 2."""
    hist = df.groupBy(F.col(group_col).alias("g"), F.col(col).alias("v")).agg(
        F.count("*").alias("c")
    )
    w = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    totals = hist.groupBy("g").agg(F.sum("c").alias("n"))
    cum = hist.withColumn("cum", F.sum("c").over(w)).join(totals, "g")
    return (
        cum.filter(F.col("cum") >= F.expr("(n + 1) div 2"))
        .groupBy("g")
        .agg(F.min("v").alias(out_name))
        .select(F.col("g").alias(group_col), out_name)
    )


def mad_outliers(
    events: DataFrame,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    k: float = 3.0,
) -> DataFrame:
    """Robust per-group outliers: |v - median| > k * 1.4826 * MAD.

    Median/MAD replace mean/stddev (evt_anomaly's 3-sigma) so a single
    extreme value can't mask others — the robust-statistics standard. Two
    grouped exact medians (each histogram + per-group cumulative window
    over distinct values), then a map-side filter; which rows flag is a
    pure function of the data, independent of parallelism (exact integer
    rank selection, per-row double arithmetic only).
    """
    med = grouped_exact_median(events, group_col, value_col, "med")
    dev = events.join(med, group_col).withColumn(
        "absdev", F.abs(F.col(value_col) - F.col("med"))
    )
    mad = grouped_exact_median(dev, group_col, "absdev", "mad")
    scale = 1.4826  # consistency constant for normal data (public)
    return (
        dev.join(mad, group_col)
        .filter(
            F.col("absdev") > F.lit(k) * (F.lit(scale) * F.col("mad"))
        )
        .select(
            F.col(id_col).cast("bigint").alias("event_id"),
            F.col(group_col),
            F.col(value_col).cast("double").alias("value"),
            F.col("med").cast("double").alias("med"),
            F.col("mad").cast("double").alias("mad"),
        )
    )


def oracle_mad_outliers(
    table: str,
    group_col: str = "event_type",
    value_col: str = "value",
    id_col: str = "event_id",
    k: float = 3.0,
) -> str:
    def med_cte(src: str, vcol: str, name: str) -> str:
        return f"""
    {name}_h AS (
      SELECT {group_col} AS g, {vcol} AS v, count(*) AS c
      FROM {src} GROUP BY 1, 2
    ), {name}_c AS (
      SELECT g, v,
             sum(c) OVER (PARTITION BY g ORDER BY v
                          ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS cum,
             sum(c) OVER (PARTITION BY g) AS n
      FROM {name}_h
    ), {name} AS (
      SELECT g AS {group_col}, min(v) AS m
      FROM {name}_c WHERE cum >= (n + 1) // 2 GROUP BY g
    )"""

    return f"""
    WITH {med_cte(table, value_col, "med")},
    dev AS (
      SELECT t.{id_col}, t.{group_col}, t.{value_col},
             med.m AS med, abs(t.{value_col} - med.m) AS absdev
      FROM {table} t JOIN med USING ({group_col})
    ),
    {med_cte("dev", "absdev", "mad")}
    SELECT CAST(d.{id_col} AS BIGINT) AS event_id, d.{group_col},
           CAST(d.{value_col} AS DOUBLE) AS value,
           CAST(d.med AS DOUBLE) AS med,
           CAST(mad.m AS DOUBLE) AS mad
    FROM dev d JOIN mad USING ({group_col})
    WHERE d.absdev > {float(k)!r} * ({1.4826!r} * mad.m)
    """


def winsorized_stats(
    df: DataFrame,
    group_col: str,
    value_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> DataFrame:
    """Winsorized robust statistics per group: clip values at the exact
    nearest-rank lo/hi quantiles, then report the clipped mean next to the
    raw mean — the outlier-robust rollup (one row per group: group, n,
    n_clipped_low, n_clipped_high, lo, hi, mean_raw, mean_winsorized).

    The quantile bounds come from the same one-window rank selection as
    :func:`group_quantiles`; the bound table is group-cardinality-sized and
    broadcasts back onto the scan, so the whole operator is one window +
    one broadcast join + one aggregate. Money accumulates as exact integer
    cents (both means are ratios of exact integers — engine-identical)."""
    w = Window.partitionBy(group_col).orderBy("__v")
    ranked = df.select(group_col, F.col(value_col).alias("__v")).select(
        group_col,
        "__v",
        F.row_number().over(w).alias("__rn"),
        F.count("*").over(Window.partitionBy(group_col)).alias("__n"),
    )
    bounds = ranked.groupBy(group_col).agg(
        F.max(
            F.when(F.col("__rn") == F.ceil(F.lit(float(lo_q)) * F.col("__n")), F.col("__v"))
        )
        .cast("double")
        .alias("lo"),
        F.max(
            F.when(F.col("__rn") == F.ceil(F.lit(float(hi_q)) * F.col("__n")), F.col("__v"))
        )
        .cast("double")
        .alias("hi"),
    )
    joined = df.select(group_col, F.col(value_col).cast("double").alias("__v")).join(
        F.broadcast(bounds), group_col
    )
    clipped = "case when __v < lo then lo when __v > hi then hi else __v end"
    return joined.groupBy(group_col).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("__v") < F.col("lo"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_low"),
        F.sum(F.when(F.col("__v") > F.col("hi"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_clipped_high"),
        F.max("lo").alias("lo"),
        F.max("hi").alias("hi"),
        F.expr(
            "cast(sum(cast(round(__v * 100) as bigint)) as double) / count(1) / 100"
        ).alias("mean_raw"),
        F.expr(
            f"cast(sum(cast(round(({clipped}) * 100) as bigint)) as double)"
            " / count(1) / 100"
        ).alias("mean_winsorized"),
    )


def oracle_winsorized_stats(
    table: str,
    group_col: str,
    value_col: str,
    lo_q: float = 0.05,
    hi_q: float = 0.95,
) -> str:
    clipped = "CASE WHEN v < lo THEN lo WHEN v > hi THEN hi ELSE v END"
    return f"""
    WITH ranked AS (
      SELECT {group_col}, CAST({value_col} AS DOUBLE) AS v,
             row_number() OVER (PARTITION BY {group_col} ORDER BY {value_col}) AS rn,
             count(*) OVER (PARTITION BY {group_col}) AS n
      FROM {table}
    ),
    bounds AS (
      SELECT {group_col},
             CAST(max(CASE WHEN rn = ceil({lo_q} * n) THEN v END) AS DOUBLE) AS lo,
             CAST(max(CASE WHEN rn = ceil({hi_q} * n) THEN v END) AS DOUBLE) AS hi
      FROM ranked GROUP BY {group_col}
    ),
    j AS (
      SELECT t.{group_col}, CAST(t.{value_col} AS DOUBLE) AS v, b.lo, b.hi
      FROM {table} t JOIN bounds b USING ({group_col})
    )
    SELECT {group_col}, CAST(count(*) AS BIGINT) AS n,
           CAST(coalesce(sum(CASE WHEN v < lo THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_clipped_low,
           CAST(coalesce(sum(CASE WHEN v > hi THEN 1 ELSE 0 END), 0) AS BIGINT)
             AS n_clipped_high,
           max(lo) AS lo, max(hi) AS hi,
           CAST(sum(CAST(round(v * 100) AS BIGINT)) AS DOUBLE) / count(*) / 100
             AS mean_raw,
           CAST(sum(CAST(round(({clipped}) * 100) AS BIGINT)) AS DOUBLE)
             / count(*) / 100 AS mean_winsorized
    FROM j GROUP BY {group_col}
    """


def weighted_median(
    df: DataFrame, group_col: str, value_col: str, weight_col: str
) -> DataFrame:
    """Exact weighted lower median per group: the smallest value whose
    running cumulative weight (value order) reaches ``(W+1) div 2`` for
    integer weights W — :func:`grouped_exact_median` generalized to
    weighted rows (that function is the ``weight=1`` special case).

    Same scale shape: per-(group, value) weight histogram, cumulative
    window over the DISTINCT values per group (never input rows), one
    conditional pick. All-integer arithmetic, engine-identical.
    """
    hist = df.groupBy(
        F.col(group_col).alias("g"), F.col(value_col).alias("v")
    ).agg(F.sum(F.col(weight_col).cast("bigint")).alias("c"))
    wcum = (
        Window.partitionBy("g")
        .orderBy("v")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = hist.withColumn("cum", F.sum("c").over(wcum)).withColumn(
        "tot", F.sum("c").over(Window.partitionBy("g"))
    )
    return cum.groupBy("g").agg(
        F.max("tot").cast("bigint").alias("total_weight"),
        F.min(
            F.when(F.col("cum") >= F.expr("(tot + 1) div 2"), F.col("v"))
        )
        .cast("double")
        .alias("weighted_median"),
    ).select(F.col("g").alias(group_col), "total_weight", "weighted_median")


def oracle_weighted_median(
    table: str, group_col: str, value_col: str, weight_col: str
) -> str:
    return f"""
    WITH hist AS (
      SELECT {group_col} AS g, {value_col} AS v,
             sum(CAST({weight_col} AS BIGINT)) AS c
      FROM {table} GROUP BY 1, 2
    ), cum AS (
      SELECT g, v, c,
             sum(c) OVER (PARTITION BY g ORDER BY v
                          ROWS UNBOUNDED PRECEDING) AS cum,
             sum(c) OVER (PARTITION BY g) AS tot
      FROM hist
    )
    SELECT g AS {group_col},
           CAST(max(tot) AS BIGINT) AS total_weight,
           CAST(min(CASE WHEN cum >= (tot + 1) // 2 THEN v END) AS DOUBLE)
             AS weighted_median
    FROM cum GROUP BY g
    """


def jackknife_ratio_table(
    df: DataFrame,
    key_col: str,
    num_cents: Column,
    den_col: Column,
    buckets: int = 10,
) -> DataFrame:
    """Delete-one-bucket jackknife table for a RATIO estimator — the
    standard variance/bias machinery for non-linear statistics (a plain
    group stddev is wrong for ratios; Efron & Tibshirani ch. 11, and the
    same delete-one scheme production A/B systems run for ratio metrics).

    Rows are hashed into ``buckets`` content-stable strata; per stratum g
    the leave-one-out estimate theta_(g) = (N - n_g) / (D - d_g) comes
    from EXACT integer (cents) sums, and the pseudo-value
    G*theta_hat - (G-1)*theta_(g) is a fixed-order chain of IEEE double
    ops on those exact inputs — deterministic on any engine, no float
    accumulation anywhere (the driver-side :func:`jackknife_se` does the
    tiny G-row reduction). Shape: ONE keyed aggregation + a broadcast
    1-row total.

    Output: (bucket, n_rows, num_cents, den_cents, theta_loo,
    pseudo_value), bucket = md5(key) mod ``buckets``.
    """
    from ..functions import hex_hash32

    g = buckets
    base = df.select(
        (hex_hash32(key_col) % g).cast("int").alias("bucket"),
        num_cents.cast("bigint").alias("__n"),
        den_col.cast("bigint").alias("__d"),
    )
    per = base.groupBy("bucket").agg(
        F.count("*").cast("bigint").alias("n_rows"),
        F.sum("__n").cast("bigint").alias("num_cents"),
        F.sum("__d").cast("bigint").alias("den_cents"),
    )
    tot = per.agg(
        F.sum("num_cents").cast("bigint").alias("__tn"),
        F.sum("den_cents").cast("bigint").alias("__td"),
    )
    return (
        per.crossJoin(F.broadcast(tot))
        .select(
            "bucket",
            "n_rows",
            "num_cents",
            "den_cents",
            (
                (F.col("__tn") - F.col("num_cents")).cast("double")
                / (F.col("__td") - F.col("den_cents")).cast("double")
            ).alias("theta_loo"),
            (
                F.lit(float(g))
                * (F.col("__tn").cast("double") / F.col("__td").cast("double"))
                - F.lit(float(g - 1))
                * (
                    (F.col("__tn") - F.col("num_cents")).cast("double")
                    / (F.col("__td") - F.col("den_cents")).cast("double")
                )
            ).alias("pseudo_value"),
        )
    )


def jackknife_se(rows: list) -> tuple[float, float]:
    """Driver-side jackknife point estimate + standard error from the
    G-row table (metadata scale). Returns (theta_hat, se)."""
    import math

    tn = sum(r["num_cents"] for r in rows)
    td = sum(r["den_cents"] for r in rows)
    theta = tn / td
    loos = [r["theta_loo"] for r in rows]
    gn = len(loos)
    mean_loo = sum(loos) / gn
    var = (gn - 1) / gn * sum((x - mean_loo) ** 2 for x in loos)
    return theta, math.sqrt(var)


def oracle_jackknife_ratio_table(
    table: str, key_expr: str, num_sql: str, den_sql: str, buckets: int = 10
) -> str:
    from ..functions import oracle_hash32

    g = buckets
    h = oracle_hash32(key_expr)
    return f"""
    WITH base AS (
      SELECT CAST({h} % {g} AS INT) AS bucket,
             CAST({num_sql} AS BIGINT) AS n,
             CAST({den_sql} AS BIGINT) AS d
      FROM {table}
    ),
    per AS (
      SELECT bucket, CAST(count(*) AS BIGINT) AS n_rows,
             CAST(sum(n) AS BIGINT) AS num_cents,
             CAST(sum(d) AS BIGINT) AS den_cents
      FROM base GROUP BY bucket
    ),
    tot AS (
      SELECT CAST(sum(num_cents) AS BIGINT) AS tn,
             CAST(sum(den_cents) AS BIGINT) AS td
      FROM per
    )
    SELECT bucket, n_rows, num_cents, den_cents,
           CAST(tot.tn - num_cents AS DOUBLE)
           / CAST(tot.td - den_cents AS DOUBLE) AS theta_loo,
           CAST({float(g)!r} AS DOUBLE)
           * (CAST(tot.tn AS DOUBLE) / CAST(tot.td AS DOUBLE))
           - CAST({float(g - 1)!r} AS DOUBLE)
             * (CAST(tot.tn - num_cents AS DOUBLE)
                / CAST(tot.td - den_cents AS DOUBLE)) AS pseudo_value
    FROM per, tot
    """


# ---------------------------------------------------------------------------
# Gini coefficient + Lorenz curve — the inequality profile of a spend /
# token-count / contribution distribution (who holds the mass).
# ---------------------------------------------------------------------------


def gini_lorenz(df: DataFrame, key_col: str, cents_col: str) -> DataFrame:
    """Exact Gini coefficient and Lorenz-curve decile points of a
    non-negative integer (cents) measure per key.

    Gini via the rank identity G = (2·Σᵢ i·xᵢ − (n+1)·Σx) / (n·Σx) over
    values sorted ascending — which needs a GLOBAL rank, produced by the
    two-phase range-partition prefix (``global_sort_with_rank``), never a
    data-sized single-partition window. Σ i·xᵢ accumulates as
    DECIMAL(38,0) over exact bigint products (rank ≤ n, cents exact), so
    the result is engine-replayable at any parallelism. Lorenz deciles
    bucket by integer arithmetic ((rank−1)·10 div n + 1) and cumulate over
    the 10-row decile frame (metadata scale).

    Output: (decile, n_cum, cum_cents, cum_share, gini) — 10 rows.
    """
    from .partitioning import global_sort_with_rank

    ranked = global_sort_with_rank(
        df.select(F.col(key_col).alias("k"), F.col(cents_col).cast("bigint").alias("x")),
        ["x", "k"],
        rank_col="rnk",
    )
    tot = ranked.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum("x").cast("bigint").alias("total"),
        F.sum(F.col("rnk").cast("decimal(38,0)") * F.col("x")).alias("rx"),
    )
    gini = tot.select(
        "n",
        "total",
        F.round(
            (
                F.lit(2.0) * F.col("rx").cast("double")
                - (F.col("n") + F.lit(1)).cast("double") * F.col("total").cast("double")
            )
            / (F.col("n").cast("double") * F.col("total").cast("double")),
            6,
        ).alias("gini"),
    )
    dec = (
        ranked.join(F.broadcast(gini), how="cross")
        .withColumn("decile", F.expr("((rnk - 1) * 10) div n + 1"))
        .groupBy("decile", "n", "gini")
        .agg(F.count("*").cast("bigint").alias("n_dec"), F.sum("x").cast("bigint").alias("dec_cents"))
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return (
        dec.join(F.broadcast(tot.select("total")), how="cross")
        .withColumn("n_cum", F.sum("n_dec").over(w).cast("bigint"))
        .withColumn("cum_cents", F.sum("dec_cents").over(w).cast("bigint"))
        .select(
            F.col("decile").cast("int").alias("decile"),
            "n_cum",
            "cum_cents",
            F.round(F.col("cum_cents").cast("double") / F.col("total").cast("double"), 6).alias(
                "cum_share"
            ),
            "gini",
        )
    )


def oracle_gini_lorenz(rows_sql: str) -> str:
    """DuckDB twin of :func:`gini_lorenz`; ``rows_sql`` yields (k, x)."""
    return f"""
    WITH base AS ({rows_sql}),
    ranked AS (
      SELECT k, CAST(x AS BIGINT) AS x,
             CAST(row_number() OVER (ORDER BY x, k) AS BIGINT) AS rnk
      FROM base
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n, CAST(sum(x) AS BIGINT) AS total,
             sum(CAST(rnk AS DECIMAL(38,0)) * x) AS rx
      FROM ranked
    ),
    gini AS (
      SELECT n, total,
             round((2.0 * CAST(rx AS DOUBLE) - CAST(n + 1 AS DOUBLE) * CAST(total AS DOUBLE))
                   / (CAST(n AS DOUBLE) * CAST(total AS DOUBLE)), 6) AS gini
      FROM tot
    ),
    dec AS (
      SELECT CAST((rnk - 1) * 10 // g.n + 1 AS BIGINT) AS decile,
             CAST(count(*) AS BIGINT) AS n_dec, CAST(sum(x) AS BIGINT) AS dec_cents
      FROM ranked, gini g GROUP BY 1, g.n
    )
    SELECT CAST(d.decile AS INT) AS decile,
           CAST(sum(d.n_dec) OVER (ORDER BY d.decile) AS BIGINT) AS n_cum,
           CAST(sum(d.dec_cents) OVER (ORDER BY d.decile) AS BIGINT) AS cum_cents,
           round(CAST(sum(d.dec_cents) OVER (ORDER BY d.decile) AS DOUBLE)
                 / CAST(g.total AS DOUBLE), 6) AS cum_share,
           g.gini
    FROM dec d, gini g
    """


# ---------------------------------------------------------------------------
# Exact higher moments — skewness / excess kurtosis per group from integer
# power sums. Spark's built-in skewness()/kurtosis() accumulate running
# doubles (order-dependent); this is the engine-replayable form.
# ---------------------------------------------------------------------------


def group_moments(df: DataFrame, group_col: str, int_col: str) -> DataFrame:
    """Per-group mean / stddev / skewness / excess kurtosis from EXACT
    integer power sums: Σx..Σx⁴ accumulate as DECIMAL(38,0) over bigint
    values, so the sums are bit-identical at any parallelism; the central-
    moment chain then runs in fixed-order IEEE doubles with sqrt (correctly
    rounded — no pow(x, 1.5)), so both engines produce the same bits.
    One partial+final HashAggregate, zero extra shuffles.

    Output: (group, n, mean_val, stddev, skewness, kurtosis_excess).
    """
    d = F.col("__d")
    base = df.select(
        F.col(group_col).alias("grp"),
        F.col(int_col).cast("decimal(19,0)").alias("__d"),
    )
    agg = base.groupBy("grp").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(d).cast("decimal(38,0)").alias("s1"),
        F.sum(d * d).cast("decimal(38,0)").alias("s2"),
        F.sum((d * d) * d).cast("decimal(38,0)").alias("s3"),
        F.sum((d * d) * (d * d)).cast("decimal(38,0)").alias("s4"),
    )
    nd = F.col("n").cast("double")
    mu = F.col("s1").cast("double") / nd
    m2 = F.col("s2").cast("double") / nd - mu * mu
    m3 = (
        F.col("s3").cast("double") / nd
        - F.lit(3.0) * mu * (F.col("s2").cast("double") / nd)
        + F.lit(2.0) * mu * mu * mu
    )
    m4 = (
        F.col("s4").cast("double") / nd
        - F.lit(4.0) * mu * (F.col("s3").cast("double") / nd)
        + F.lit(6.0) * mu * mu * (F.col("s2").cast("double") / nd)
        - F.lit(3.0) * mu * mu * mu * mu
    )
    return agg.select(
        F.col("grp").alias(group_col),
        "n",
        F.round(mu, 6).alias("mean_val"),
        F.round(F.sqrt(m2), 6).alias("stddev"),
        F.when(m2 > 0, F.round(m3 / (m2 * F.sqrt(m2)), 6)).alias("skewness"),
        F.when(m2 > 0, F.round(m4 / (m2 * m2) - F.lit(3.0), 6)).alias("kurtosis_excess"),
    )


def oracle_group_moments(table: str, group_col: str, int_expr: str) -> str:
    """DuckDB twin of :func:`group_moments` — power sums in HUGEINT (128
    bit, same exact integers as Spark's DECIMAL(38,0)), identical double
    chain."""
    return f"""
    WITH base AS (
      SELECT {group_col} AS grp, CAST({int_expr} AS HUGEINT) AS d FROM {table}
    ),
    agg AS (
      SELECT grp, CAST(count(*) AS BIGINT) AS n,
             sum(d) AS s1, sum(d * d) AS s2,
             sum((d * d) * d) AS s3, sum((d * d) * (d * d)) AS s4
      FROM base GROUP BY grp
    )
    SELECT grp AS {group_col}, n,
           round(CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_val,
           round(sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                      - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))), 6) AS stddev,
           CASE WHEN CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                     - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) > 0 THEN
             round((CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE)
                    - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                    + 2.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                   / ((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                       - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                         * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                      * sqrt(CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                             - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                               * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))), 6)
           END AS skewness,
           CASE WHEN CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                     - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                       * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)) > 0 THEN
             round((CAST(s4 AS DOUBLE) / CAST(n AS DOUBLE)
                    - 4.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(s3 AS DOUBLE) / CAST(n AS DOUBLE))
                    + 6.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE))
                    - 3.0 * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                   / ((CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                       - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                         * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE)))
                      * (CAST(s2 AS DOUBLE) / CAST(n AS DOUBLE)
                         - (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))
                           * (CAST(s1 AS DOUBLE) / CAST(n AS DOUBLE))))
                   - 3.0, 6)
           END AS kurtosis_excess
    FROM agg
    """


def iqr_outliers(df: DataFrame, group_col: str, int_col: str) -> DataFrame:
    """Tukey-fence outlier counts per group: q1/q3 by the same
    nearest-rank selection as :func:`group_quantiles` (value at
    row_number ceil(q·n) — exact, engine-replayable), fences at
    q1 − 1.5·IQR and q3 + 1.5·IQR, then one conditional re-aggregation
    counting rows outside. The standard pre-training data-quality gate
    for numeric columns.

    Quantile values are exact integers, so the fence doubles are
    bit-identical in every engine. Two passes over the group (rank
    window + count), fences broadcast at group-count scale.
    Output: (group, n, q1, q3, lo_fence, hi_fence, n_outliers).
    """
    w = Window.partitionBy("grp").orderBy("v")
    base = df.select(
        F.col(group_col).alias("grp"), F.col(int_col).cast("bigint").alias("v")
    )
    ranked = base.select(
        "grp",
        "v",
        F.row_number().over(w).alias("rn"),
        F.count("*").over(Window.partitionBy("grp")).alias("n"),
    )
    q = ranked.groupBy("grp").agg(
        F.max("n").cast("bigint").alias("n"),
        F.max(F.when(F.col("rn") == F.ceil(F.lit(0.25) * F.col("n")), F.col("v")))
        .cast("bigint")
        .alias("q1"),
        F.max(F.when(F.col("rn") == F.ceil(F.lit(0.75) * F.col("n")), F.col("v")))
        .cast("bigint")
        .alias("q3"),
    )
    fences = q.select(
        "grp",
        "n",
        "q1",
        "q3",
        (F.col("q1").cast("double") - F.lit(1.5) * (F.col("q3") - F.col("q1")).cast("double"))
        .alias("lo_fence"),
        (F.col("q3").cast("double") + F.lit(1.5) * (F.col("q3") - F.col("q1")).cast("double"))
        .alias("hi_fence"),
    )
    out = (
        base.join(F.broadcast(fences), "grp")
        .filter(
            (F.col("v").cast("double") < F.col("lo_fence"))
            | (F.col("v").cast("double") > F.col("hi_fence"))
        )
        .groupBy("grp")
        .agg(F.count("*").cast("bigint").alias("n_outliers"))
    )
    return fences.join(out, "grp", "left").select(
        F.col("grp").alias(group_col),
        "n",
        "q1",
        "q3",
        F.round(F.col("lo_fence"), 6).alias("lo_fence"),
        F.round(F.col("hi_fence"), 6).alias("hi_fence"),
        F.coalesce(F.col("n_outliers"), F.lit(0)).cast("bigint").alias("n_outliers"),
    )


def oracle_iqr_outliers(table: str, group_col: str, int_expr: str) -> str:
    return f"""
    WITH base AS (
      SELECT {group_col} AS grp, CAST({int_expr} AS BIGINT) AS v FROM {table}
    ),
    ranked AS (
      SELECT grp, v,
             row_number() OVER (PARTITION BY grp ORDER BY v) AS rn,
             count(*) OVER (PARTITION BY grp) AS n
      FROM base
    ),
    q AS (
      SELECT grp, CAST(max(n) AS BIGINT) AS n,
             CAST(max(CASE WHEN rn = ceil(0.25 * n) THEN v END) AS BIGINT) AS q1,
             CAST(max(CASE WHEN rn = ceil(0.75 * n) THEN v END) AS BIGINT) AS q3
      FROM ranked GROUP BY grp
    ),
    fences AS (
      SELECT grp, n, q1, q3,
             CAST(q1 AS DOUBLE) - 1.5 * CAST(q3 - q1 AS DOUBLE) AS lo_fence,
             CAST(q3 AS DOUBLE) + 1.5 * CAST(q3 - q1 AS DOUBLE) AS hi_fence
      FROM q
    ),
    outs AS (
      SELECT b.grp, CAST(count(*) AS BIGINT) AS n_outliers
      FROM base b JOIN fences f ON b.grp = f.grp
      WHERE CAST(b.v AS DOUBLE) < f.lo_fence OR CAST(b.v AS DOUBLE) > f.hi_fence
      GROUP BY b.grp
    )
    SELECT f.grp AS {group_col}, f.n, f.q1, f.q3,
           round(f.lo_fence, 6) AS lo_fence, round(f.hi_fence, 6) AS hi_fence,
           CAST(coalesce(o.n_outliers, 0) AS BIGINT) AS n_outliers
    FROM fences f LEFT JOIN outs o ON f.grp = o.grp
    """


def group_mode(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Exact per-group modal value with a deterministic tie-break (max
    count, then MIN value) — the categorical-imputation primitive that
    Spark's ``mode()`` leaves tie-ambiguous.

    Two keyed aggregations: value-frequency count, then a max_by over
    the (count, reversed-value) struct — no window, no sort. The second
    agg's input is one row per distinct (group, value).
    Output: (group, mode_value, mode_count).
    """
    freq = df.groupBy(
        F.col(group_col).alias("grp"), F.col(value_col).cast("string").alias("v")
    ).agg(F.count("*").cast("bigint").alias("c"))
    # max_by on (c, v-desc) picks highest count, lowest value on ties;
    # expressed via min over a struct sort: use max of struct(c, neg) is
    # awkward for strings — use two-stage: per-group max count, then min
    # value among values at that count.
    mx = freq.groupBy("grp").agg(F.max("c").cast("bigint").alias("mc"))
    return (
        freq.join(mx, "grp")
        .filter(F.col("c") == F.col("mc"))
        .groupBy("grp")
        .agg(
            F.min("v").alias("mode_value"),
            F.max("mc").cast("bigint").alias("mode_count"),
        )
        .select(F.col("grp").alias(group_col), "mode_value", "mode_count")
    )


def oracle_group_mode(table: str, group_col: str, value_expr: str) -> str:
    return f"""
    WITH freq AS (
      SELECT {group_col} AS grp, CAST({value_expr} AS VARCHAR) AS v,
             CAST(count(*) AS BIGINT) AS c
      FROM {table} GROUP BY 1, 2
    ),
    mx AS (SELECT grp, CAST(max(c) AS BIGINT) AS mc FROM freq GROUP BY grp)
    SELECT f.grp AS {group_col}, min(f.v) AS mode_value,
           CAST(max(m.mc) AS BIGINT) AS mode_count
    FROM freq f JOIN mx m ON f.grp = m.grp AND f.c = m.mc
    GROUP BY f.grp
    """
