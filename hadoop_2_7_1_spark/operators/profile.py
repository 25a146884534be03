"""Column profiling: one pass, one row of stats per column.

Data-engineering addition (no reference analogue beyond counters): null
rate, distinct count, min/max per column — the pre-flight check before a
100 TB job. All columns profile in a single aggregate over one scan (Spark
computes every stat in the same HashAggregate), then one narrow unpivot.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def profile(df: DataFrame, cols: list[str] | None = None) -> DataFrame:
    """(column, n_rows, n_null, n_distinct, min_val, max_val) per column;
    min/max stringified so heterogeneous columns share one schema."""
    cols = cols or df.columns
    aggs = [F.count(F.lit(1)).alias("_n")]
    for c in cols:
        aggs += [
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"_null_{c}"),
            F.countDistinct(c).alias(f"_dist_{c}"),
            F.min(c).cast("string").alias(f"_min_{c}"),
            F.max(c).cast("string").alias(f"_max_{c}"),
        ]
    wide = df.agg(*aggs)
    stacks = []
    for c in cols:
        stacks.append(
            F.struct(
                F.lit(c).alias("column"),
                F.col("_n").cast("bigint").alias("n_rows"),
                F.col(f"_null_{c}").cast("bigint").alias("n_null"),
                F.col(f"_dist_{c}").cast("bigint").alias("n_distinct"),
                F.col(f"_min_{c}").alias("min_val"),
                F.col(f"_max_{c}").alias("max_val"),
            )
        )
    return wide.select(F.explode(F.array(*stacks)).alias("s")).select("s.*")


def oracle_profile(table: str, cols: list[str]) -> str:
    """DuckDB twin: UNION ALL of per-column stat rows."""
    parts = [
        f"""
        SELECT '{c}' AS "column", CAST(count(*) AS BIGINT) AS n_rows,
               CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_null,
               CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,
               CAST(min({c}) AS VARCHAR) AS min_val,
               CAST(max({c}) AS VARCHAR) AS max_val
        FROM {table}
        """
        for c in cols
    ]
    return " UNION ALL ".join(parts)


def expectations(li: DataFrame, orders: DataFrame) -> DataFrame:
    """Expectation-suite validation report (Great-Expectations shape) over
    the lineitem/orders pair: one row per check
    (expectation, n_checked, n_failed, pass).

    All five single-table checks run in ONE aggregate over one scan
    (conditional sums sharing the HashAggregate, like :func:`profile`);
    uniqueness adds a count-distinct on the composite key in the same
    pass, and referential integrity is a left-anti count against the
    broadcastable parent keys. At 100 TB the whole suite costs one scan
    plus one key join — the reference analogue is a counter-emitting
    validation Mapper (MRC/mapreduce/Counters usage), but here the report
    is a queryable DataFrame.
    """
    base = li.agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("l_orderkey").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("f_null"),
        F.sum(
            F.when(
                F.col("l_quantity").isNull()
                | (F.col("l_quantity") < 1)
                | (F.col("l_quantity") > 50),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("f_range"),
        F.sum(
            F.when(
                F.col("l_returnflag").isNull()
                | ~F.col("l_returnflag").isin("A", "N", "R"),
                1,
            ).otherwise(0)
        )
        .cast("bigint")
        .alias("f_vals"),
        F.sum(F.when(F.col("l_extendedprice") < F.col("l_quantity"), 1).otherwise(0))
        .cast("bigint")
        .alias("f_order"),
        (
            F.count(F.lit(1))
            - F.countDistinct(
                F.concat_ws(
                    "_",
                    F.col("l_orderkey").cast("string"),
                    F.col("l_linenumber").cast("string"),
                )
            )
        )
        .cast("bigint")
        .alias("f_unique"),
    )
    orphans = (
        li.join(
            orders.select(F.col("o_orderkey").alias("l_orderkey")),
            "l_orderkey",
            "left_anti",
        )
        .agg(F.count(F.lit(1)).cast("bigint").alias("f_ref"))
    )
    wide = base.crossJoin(F.broadcast(orphans))
    rows = [
        ("not_null:l_orderkey", "f_null"),
        ("unique:(l_orderkey,l_linenumber)", "f_unique"),
        ("range:l_quantity in [1,50]", "f_range"),
        ("accepted_values:l_returnflag in (A,N,R)", "f_vals"),
        ("cross:l_extendedprice >= l_quantity", "f_order"),
        ("referential:l_orderkey in orders", "f_ref"),
    ]
    stacks = [
        F.struct(
            F.lit(name).alias("expectation"),
            F.col("n").alias("n_checked"),
            F.col(col).alias("n_failed"),
            (F.col(col) == 0).alias("pass"),
        )
        for name, col in rows
    ]
    return wide.select(F.explode(F.array(*stacks)).alias("s")).select("s.*")


def oracle_expectations(li: str, orders: str) -> str:
    return f"""
    WITH base AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(coalesce(sum(CASE WHEN l_orderkey IS NULL THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS f_null,
             CAST(coalesce(sum(CASE WHEN l_quantity IS NULL OR l_quantity < 1
                                         OR l_quantity > 50 THEN 1 ELSE 0 END), 0)
                  AS BIGINT) AS f_range,
             CAST(coalesce(sum(CASE WHEN l_returnflag IS NULL
                                         OR l_returnflag NOT IN ('A','N','R')
                                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS f_vals,
             CAST(coalesce(sum(CASE WHEN l_extendedprice < l_quantity
                                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS f_order,
             CAST(count(*) - count(DISTINCT CAST(l_orderkey AS VARCHAR) || '_'
                                            || CAST(l_linenumber AS VARCHAR))
                  AS BIGINT) AS f_unique
      FROM {li}
    ),
    orphans AS (
      SELECT CAST(count(*) AS BIGINT) AS f_ref FROM {li}
      WHERE l_orderkey NOT IN (SELECT o_orderkey FROM {orders})
    ),
    wide AS (SELECT * FROM base, orphans)
    SELECT 'not_null:l_orderkey' AS expectation, n AS n_checked,
           f_null AS n_failed, f_null = 0 AS pass FROM wide
    UNION ALL
    SELECT 'unique:(l_orderkey,l_linenumber)', n, f_unique, f_unique = 0 FROM wide
    UNION ALL
    SELECT 'range:l_quantity in [1,50]', n, f_range, f_range = 0 FROM wide
    UNION ALL
    SELECT 'accepted_values:l_returnflag in (A,N,R)', n, f_vals, f_vals = 0 FROM wide
    UNION ALL
    SELECT 'cross:l_extendedprice >= l_quantity', n, f_order, f_order = 0 FROM wide
    UNION ALL
    SELECT 'referential:l_orderkey in orders', n, f_ref, f_ref = 0 FROM wide
    """


def k_anonymity(
    df: DataFrame, quasi_cols: list[str], ks: tuple[int, ...] = (2, 5, 10)
) -> DataFrame:
    """k-anonymity audit over a quasi-identifier combination: one row per
    k with (k, n_rows, n_groups, n_violating_groups, n_rows_at_risk,
    anonymous) — a record is "at risk" when its quasi-identifier group has
    fewer than k members.

    One groupBy on the quasi columns produces the group-size histogram;
    every k level is a conditional sum over that (group-count-sized, tiny)
    table, so the audit costs a single shuffle regardless of how many k
    thresholds are reported.
    """
    groups = df.groupBy(*[F.col(c) for c in quasi_cols]).agg(
        F.count(F.lit(1)).alias("gn")
    )
    aggs = [
        F.sum("gn").cast("bigint").alias("n_rows"),
        F.count(F.lit(1)).cast("bigint").alias("n_groups"),
    ]
    for k in ks:
        aggs += [
            F.sum(F.when(F.col("gn") < k, 1).otherwise(0))
            .cast("bigint")
            .alias(f"v{k}"),
            F.sum(F.when(F.col("gn") < k, F.col("gn")).otherwise(0))
            .cast("bigint")
            .alias(f"r{k}"),
        ]
    wide = groups.agg(*aggs)
    stacks = [
        F.struct(
            F.lit(k).cast("bigint").alias("k"),
            F.col("n_rows").alias("n_rows"),
            F.col("n_groups").alias("n_groups"),
            F.col(f"v{k}").alias("n_violating_groups"),
            F.col(f"r{k}").alias("n_rows_at_risk"),
            (F.col(f"v{k}") == 0).alias("anonymous"),
        )
        for k in ks
    ]
    return wide.select(F.explode(F.array(*stacks)).alias("s")).select("s.*")


def oracle_k_anonymity(
    table: str, quasi_cols: list[str], ks: tuple[int, ...] = (2, 5, 10)
) -> str:
    q = ", ".join(quasi_cols)
    selects = " UNION ALL ".join(
        f"""SELECT CAST({k} AS BIGINT) AS k, n_rows, n_groups,
               v{k} AS n_violating_groups, r{k} AS n_rows_at_risk,
               v{k} = 0 AS anonymous FROM wide"""
        for k in ks
    )
    per_k = ", ".join(
        f"""CAST(coalesce(sum(CASE WHEN gn < {k} THEN 1 ELSE 0 END), 0) AS BIGINT) AS v{k},
           CAST(coalesce(sum(CASE WHEN gn < {k} THEN gn ELSE 0 END), 0) AS BIGINT) AS r{k}"""
        for k in ks
    )
    return f"""
    WITH groups AS (
      SELECT {q}, count(*) AS gn FROM {table} GROUP BY {q}
    ),
    wide AS (
      SELECT CAST(coalesce(sum(gn), 0) AS BIGINT) AS n_rows,
             CAST(count(*) AS BIGINT) AS n_groups, {per_k}
      FROM groups
    )
    {selects}
    """


def forget_users(
    customer: DataFrame, orders: DataFrame, lineitem: DataFrame, forget_mod: int = 37
) -> DataFrame:
    """Right-to-be-forgotten cascade report: purge customers whose key is
    divisible by ``forget_mod`` and propagate through orders (by custkey)
    into lineitem (by orderkey, via the orders semi-join) — one row per
    table: (tbl, n_before, n_purged, n_after).

    The cascade is two semi-join key sets (forgotten custkeys broadcast
    into orders; affected orderkeys equi-joined into lineitem) — never a
    row-wise delete loop. At 100 TB this is exactly the anti-join rewrite
    you'd run as a compaction pass; the report is the audit trail.
    """
    fc = customer.filter(F.col("c_custkey") % forget_mod == 0).select(
        F.col("c_custkey").alias("k")
    )
    fo = orders.join(
        F.broadcast(fc), orders["o_custkey"] == fc["k"], "left_semi"
    ).select(F.col("o_orderkey").alias("ok"))
    c_stats = customer.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_before"),
        F.sum(F.when(F.col("c_custkey") % forget_mod == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_purged"),
    ).select(F.lit("customer").alias("tbl"), "n_before", "n_purged")
    o_stats = orders.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_before"),
        F.sum(F.when(F.col("o_custkey") % forget_mod == 0, 1).otherwise(0))
        .cast("bigint")
        .alias("n_purged"),
    ).select(F.lit("orders").alias("tbl"), "n_before", "n_purged")
    li_purged = lineitem.join(
        fo, lineitem["l_orderkey"] == fo["ok"], "left_semi"
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n_purged"))
    li_stats = (
        lineitem.agg(F.count(F.lit(1)).cast("bigint").alias("n_before"))
        .crossJoin(F.broadcast(li_purged))
        .select(F.lit("lineitem").alias("tbl"), "n_before", "n_purged")
    )
    return (
        c_stats.unionByName(o_stats)
        .unionByName(li_stats)
        .select(
            "tbl",
            "n_before",
            "n_purged",
            (F.col("n_before") - F.col("n_purged")).cast("bigint").alias("n_after"),
        )
    )


def oracle_forget_users(
    customer: str, orders: str, lineitem: str, forget_mod: int = 37
) -> str:
    return f"""
    WITH fo AS (
      SELECT o_orderkey FROM {orders}
      WHERE o_custkey IN (SELECT c_custkey FROM {customer}
                          WHERE c_custkey % {forget_mod} = 0)
    ),
    r AS (
      SELECT 'customer' AS tbl, CAST(count(*) AS BIGINT) AS n_before,
             CAST(coalesce(sum(CASE WHEN c_custkey % {forget_mod} = 0
                                    THEN 1 ELSE 0 END), 0) AS BIGINT) AS n_purged
      FROM {customer}
      UNION ALL
      SELECT 'orders', CAST(count(*) AS BIGINT),
             CAST(coalesce(sum(CASE WHEN o_custkey % {forget_mod} = 0
                                    THEN 1 ELSE 0 END), 0) AS BIGINT)
      FROM {orders}
      UNION ALL
      SELECT 'lineitem', CAST(count(*) AS BIGINT),
             (SELECT CAST(count(*) AS BIGINT) FROM {lineitem}
              WHERE l_orderkey IN (SELECT o_orderkey FROM fo))
      FROM {lineitem}
    )
    SELECT tbl, n_before, n_purged,
           CAST(n_before - n_purged AS BIGINT) AS n_after
    FROM r
    """


# ---------------------------------------------------------------------------
# Snapshot drift: population stability index (PSI) per monitored column
# ---------------------------------------------------------------------------

PSI_ALERT = 0.2  # the standard "significant shift" PSI threshold


def drift_psi(
    df: DataFrame,
    base_filter_sql: str,
    specs: list[tuple[str, str]],
) -> DataFrame:
    """Distribution drift between two snapshots of the same table, as the
    population stability index per monitored column:

        PSI = Σ_bins (p_i − q_i) · ln(p_i / q_i)

    ``base_filter_sql`` splits rows into base (true) vs target (false);
    ``specs`` is [(col_name, bin_sql_expr)] — each expr must yield a STRING
    bin label (fixed-width numeric bins, raw categoricals, ...). The
    monitoring pass every production table gets between training snapshots.

    Bin proportions are Laplace-smoothed — p_i = (c_i + 0.5)/(N + 0.5·B)
    with B the number of observed bins — so empty-on-one-side bins stay
    finite and the whole computation is deterministic from exact integer
    counts (per-bin terms round to DECIMAL(38,6) before the Σ, the standard
    summation-order discipline). Plan: ONE scan fans every spec out via
    stack (rows × n_specs, narrow), one (col_name, bin) count shuffle, one
    tiny per-column fold. Output: (col_name, n_bins, psi, drifted).
    """
    n = len(specs)
    stack_args = ", ".join(f"'{name}', cast(({e}) as string)" for name, e in specs)
    binned = df.select(
        F.expr(f"({base_filter_sql})").alias("is_base"),
        F.expr(f"stack({n}, {stack_args}) as (col_name, bin)"),
    )
    counts = binned.groupBy("col_name", "bin").agg(
        F.sum(F.when(F.col("is_base"), 1).otherwise(0)).alias("cb"),
        F.sum(F.when(~F.col("is_base"), 1).otherwise(0)).alias("ct"),
    )
    totals = counts.groupBy("col_name").agg(
        F.sum("cb").alias("tb"),
        F.sum("ct").alias("tt"),
        F.count(F.lit(1)).alias("nb"),
    )
    p = "((cast(cb as double) + 0.5) / (cast(tb as double) + 0.5 * nb))"
    q = "((cast(ct as double) + 0.5) / (cast(tt as double) + 0.5 * nb))"
    terms = counts.join(totals, "col_name").select(
        "col_name",
        "nb",
        F.expr(f"cast(({p} - {q}) * ln({p} / {q}) as decimal(38,6))").alias("term"),
    )
    return terms.groupBy("col_name").agg(
        F.max("nb").cast("bigint").alias("n_bins"),
        F.sum("term").cast("double").alias("psi"),
        (F.sum("term").cast("double") > PSI_ALERT).alias("drifted"),
    )


def oracle_drift_psi(
    table: str,
    base_filter_sql: str,
    specs: list[tuple[str, str]],
) -> str:
    """DuckDB mirror of :func:`drift_psi` (stack → UNION ALL fan-out)."""
    fan = " UNION ALL ".join(
        f"SELECT ({base_filter_sql}) AS is_base, '{name}' AS col_name,"
        f" CAST(({e}) AS VARCHAR) AS bin FROM {table}"
        for name, e in specs
    )
    p = "((CAST(cb AS DOUBLE) + 0.5) / (CAST(tb AS DOUBLE) + 0.5 * nb))"
    q = "((CAST(ct AS DOUBLE) + 0.5) / (CAST(tt AS DOUBLE) + 0.5 * nb))"
    return f"""
    WITH binned AS ({fan}),
    counts AS (
      SELECT col_name, bin,
             sum(CASE WHEN is_base THEN 1 ELSE 0 END) AS cb,
             sum(CASE WHEN NOT is_base THEN 1 ELSE 0 END) AS ct
      FROM binned GROUP BY col_name, bin
    ),
    totals AS (
      SELECT col_name, sum(cb) AS tb, sum(ct) AS tt, count(*) AS nb
      FROM counts GROUP BY col_name
    ),
    terms AS (
      SELECT c.col_name, t.nb,
             CAST(({p} - {q}) * ln({p} / {q}) AS DECIMAL(38,6)) AS term
      FROM counts c JOIN totals t ON c.col_name = t.col_name
    )
    SELECT col_name, CAST(max(nb) AS BIGINT) AS n_bins,
           CAST(sum(term) AS DOUBLE) AS psi,
           CAST(sum(term) AS DOUBLE) > {PSI_ALERT!r} AS drifted
    FROM terms GROUP BY col_name
    """


# ---------------------------------------------------------------------------
# Laplace-mechanism histogram release (deterministic test-harness uniforms)
# ---------------------------------------------------------------------------

def dp_release(
    df: DataFrame,
    group_col: str,
    epsilon: float = 1.0,
    salt: str = "dp",
) -> DataFrame:
    """Differentially-private histogram release shape: per-group counts
    (sensitivity 1) plus Laplace(1/ε) noise via the inverse CDF
    ``−(1/ε)·sign(u)·ln(1 − 2|u|)`` on a uniform u ∈ (−½, ½).

    DETERMINISM CAVEAT, by design: u derives from md5(group‖salt) — a
    deterministic stand-in so the MECHANISM (sensitivity bookkeeping,
    inverse-CDF transform, post-processing rounding) is oracle-checkable
    and replayable in tests. A real release must draw u from secure
    randomness (fresh per query); swap the hash for an RNG at deploy time
    and nothing else changes. The engine-side cost is one group count plus
    map-only noise arithmetic.

    Output: (group, n_true, n_noised, epsilon) — n_true is reported here
    because this is the audit artifact; a production release drops it.
    """
    from ..functions import hex_hash32

    counts = df.groupBy(F.col(group_col).alias("grp")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_true")
    )
    # (k + 0.5) / 2^20 is strictly inside (0,1) and never exactly 0.5
    u01 = (
        (hex_hash32(F.concat_ws(":", F.lit(salt), F.col("grp").cast("string")))
         % (1 << 20)).cast("double") + F.lit(0.5)
    ) / F.lit(float(1 << 20))
    b = 1.0 / float(epsilon)
    noised = counts.withColumn("u", u01 - F.lit(0.5)).select(
        F.col("grp").alias(group_col),
        "n_true",
        F.expr(
            f"round(cast(n_true as double) + (case when u < 0 then {b!r} else -{b!r} end)"
            f" * ln(1 - 2 * abs(u)), 4)"
        ).alias("n_noised"),
        F.lit(float(epsilon)).alias("epsilon"),
    )
    return noised


def oracle_dp_release(
    table: str, group_col: str, epsilon: float = 1.0, salt: str = "dp"
) -> str:
    from ..functions import oracle_hash32

    h = oracle_hash32(f"'{salt}' || ':' || CAST(grp AS VARCHAR)")
    b = 1.0 / float(epsilon)
    return f"""
    WITH counts AS (
      SELECT {group_col} AS grp, CAST(count(*) AS BIGINT) AS n_true
      FROM {table} GROUP BY {group_col}
    ),
    noise AS (
      SELECT grp, n_true,
             (CAST({h} % {1 << 20} AS DOUBLE) + 0.5) / {float(1 << 20)!r} - 0.5 AS u
      FROM counts
    )
    SELECT grp AS {group_col}, n_true,
           round(CAST(n_true AS DOUBLE) + (CASE WHEN u < 0 THEN {b!r} ELSE {-b!r} END)
                 * ln(1 - 2 * abs(u)), 4) AS n_noised,
           CAST({float(epsilon)!r} AS DOUBLE) AS epsilon
    FROM noise
    """


def column_entropy(df: DataFrame, cols: list[str]) -> DataFrame:
    """Shannon entropy per categorical column — the profiling signal behind
    feature-selection and identifier-detection heuristics (near-zero
    entropy = constant; ln(n_distinct) = unique key): ``H = −Σ p·ln p``
    from exact value counts, plus ``H / ln(n_distinct)`` normalized to
    [0, 1].

    One scan fans all columns via stack (the drift_psi shape), one
    (col, value) count, one tiny per-column fold; per-value terms round to
    DECIMAL(38,6) before the Σ (ln ulp discipline). Output:
    (col_name, n_distinct, entropy, norm_entropy).
    """
    n = len(cols)
    stack_args = ", ".join(f"'{c}', cast({c} as string)" for c in cols)
    values = df.select(F.expr(f"stack({n}, {stack_args}) as (col_name, val)"))
    counts = values.groupBy("col_name", "val").agg(F.count("*").alias("c"))
    totals = counts.groupBy("col_name").agg(
        F.sum("c").alias("nt"), F.count("*").alias("nd")
    )
    terms = counts.join(totals, "col_name").select(
        "col_name",
        "nd",
        F.expr(
            "cast(-(cast(c as double) / nt) * ln(cast(c as double) / nt)"
            " as decimal(38,6))"
        ).alias("term"),
    )
    return terms.groupBy("col_name").agg(
        F.max("nd").cast("bigint").alias("n_distinct"),
        F.sum("term").cast("double").alias("entropy"),
        F.expr(
            "case when max(nd) <= 1 then cast(0 as double)"
            " else round(cast(sum(term) as double) / ln(cast(max(nd) as double)), 6) end"
        ).alias("norm_entropy"),
    )


def oracle_column_entropy(table: str, cols: list[str]) -> str:
    fan = " UNION ALL ".join(
        f"SELECT '{c}' AS col_name, CAST({c} AS VARCHAR) AS val FROM {table}"
        for c in cols
    )
    return f"""
    WITH v AS ({fan}),
    counts AS (
      SELECT col_name, val, count(*) AS c FROM v GROUP BY col_name, val
    ),
    totals AS (
      SELECT col_name, sum(c) AS nt, count(*) AS nd FROM counts GROUP BY col_name
    ),
    terms AS (
      SELECT c.col_name, t.nd,
             CAST(-(CAST(c.c AS DOUBLE) / t.nt) * ln(CAST(c.c AS DOUBLE) / t.nt)
                  AS DECIMAL(38,6)) AS term
      FROM counts c JOIN totals t USING (col_name)
    )
    SELECT col_name, CAST(max(nd) AS BIGINT) AS n_distinct,
           CAST(sum(term) AS DOUBLE) AS entropy,
           CASE WHEN max(nd) <= 1 THEN CAST(0 AS DOUBLE)
                ELSE round(CAST(sum(term) AS DOUBLE) / ln(CAST(max(nd) AS DOUBLE)), 6)
           END AS norm_entropy
    FROM terms GROUP BY col_name
    """


def benford(df: DataFrame, cols: list[str]) -> DataFrame:
    """Benford first-significant-digit audit — the classic synthetic-data /
    fraud / corrupted-feed screen: natural multiplicative quantities
    (prices, populations) follow P(d) = log10(1 + 1/d); uniform or
    fabricated ones don't. Reports, per column and digit 1-9: observed
    count, expected count, and the chi-square contribution.

    Shape: ONE scan fans all columns via stack (the drift_psi/entropy
    pattern), one (col, digit) count, then a 9-row-per-column scaffold
    (explode over a literal range) left-joined so zero-observation digits
    still appear. First digit comes from the BIGINT cents rendering
    (round(abs(x)*100)) — integer-to-string is engine-portable where
    double-to-string is not. Expected proportions are Python-evaluated
    doubles injected as literals into BOTH engines (repr round-trip), so
    the only float ops are one multiply, one subtract, one pow, one
    divide — identical order both sides, rounded to 6dp.
    """
    import math

    n = len(cols)
    stack_args = ", ".join(f"'{c}', cast(round(abs({c}) * 100) as bigint)" for c in cols)
    v = df.select(
        F.expr(f"stack({n}, {stack_args}) as (col_name, cents)")
    ).filter("cents > 0")
    digits = v.select(
        "col_name",
        F.expr("cast(substring(cast(cents as string), 1, 1) as int)").alias("digit"),
    )
    counts = digits.groupBy("col_name", "digit").agg(F.count("*").alias("c"))
    totals = counts.groupBy("col_name").agg(F.sum("c").alias("nt"))
    scaffold = totals.select(
        "col_name", "nt", F.explode(F.sequence(F.lit(1), F.lit(9))).alias("digit")
    )
    p_arr = "array(" + ", ".join(repr(math.log10(1 + 1 / d)) for d in range(1, 10)) + ")"
    return (
        scaffold.join(counts, ["col_name", "digit"], "left")
        .select(
            "col_name",
            "digit",
            F.coalesce(F.col("c"), F.lit(0)).cast("bigint").alias("n_obs"),
            F.expr(
                f"round(cast(nt as double) * element_at({p_arr}, digit), 6)"
            ).alias("expected_n"),
            F.expr(
                f"round(pow(cast(coalesce(c, 0) as double)"
                f" - cast(nt as double) * element_at({p_arr}, digit), 2)"
                f" / (cast(nt as double) * element_at({p_arr}, digit)), 6)"
            ).alias("chi2_term"),
        )
    )


def oracle_benford(table: str, cols: list[str]) -> str:
    import math

    fan = " UNION ALL ".join(
        f"SELECT '{c}' AS col_name,"
        f" CAST(round(abs({c}) * 100) AS BIGINT) AS cents FROM {table}"
        for c in cols
    )
    p_case = (
        "CASE s.digit "
        + " ".join(
            f"WHEN {d} THEN {math.log10(1 + 1 / d)!r}" for d in range(1, 10)
        )
        + " END"
    )
    return f"""
    WITH v AS (SELECT * FROM ({fan}) WHERE cents > 0),
    digits AS (
      SELECT col_name,
             CAST(substring(CAST(cents AS VARCHAR), 1, 1) AS INT) AS digit
      FROM v
    ),
    counts AS (
      SELECT col_name, digit, count(*) AS c FROM digits GROUP BY col_name, digit
    ),
    totals AS (
      SELECT col_name, CAST(sum(c) AS BIGINT) AS nt FROM counts GROUP BY col_name
    ),
    scaffold AS (
      SELECT col_name, nt, CAST(u.d AS INT) AS digit
      FROM totals, UNNEST(range(1, 10)) AS u(d)
    )
    SELECT s.col_name, s.digit,
           CAST(coalesce(c.c, 0) AS BIGINT) AS n_obs,
           round(CAST(s.nt AS DOUBLE) * ({p_case}), 6) AS expected_n,
           round(pow(CAST(coalesce(c.c, 0) AS DOUBLE)
                     - CAST(s.nt AS DOUBLE) * ({p_case}), 2)
                 / (CAST(s.nt AS DOUBLE) * ({p_case})), 6) AS chi2_term
    FROM scaffold s LEFT JOIN counts c
      ON s.col_name = c.col_name AND s.digit = c.digit
    """


def join_skew(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    top_n: int = 25,
) -> DataFrame:
    """Pre-flight skew audit for an equi-join — the check you run BEFORE
    launching a 100 TB join: which keys would dominate the shuffle?

    For every key present on both sides, est_rows = n_left * n_right is
    the exact number of output rows that key will produce; the report is
    the top_n keys by that contribution with their share of total output.
    A key holding >1% of a trillion-row join output is the signal to salt
    it (agg_salted_join) or broadcast around it.

    Scale shape: two map-side-combined keyed counts (one per side), one
    keyed join of the COUNT tables (key-cardinality scale, not data
    scale), a broadcast 1-row total, and top-n via sort+limit — Spark
    plans that as TakeOrderedAndProject (per-partition heap, merge on the
    driver), never a global sort. Output: (key, n_left, n_right,
    est_rows, pct_of_output).
    """
    la = (
        left.filter(F.col(left_key).isNotNull())
        .groupBy(F.col(left_key).alias("key"))
        .agg(F.count("*").cast("bigint").alias("n_left"))
    )
    ra = (
        right.filter(F.col(right_key).isNotNull())
        .groupBy(F.col(right_key).alias("key"))
        .agg(F.count("*").cast("bigint").alias("n_right"))
    )
    est = la.join(ra, "key").withColumn(
        "est_rows", (F.col("n_left") * F.col("n_right")).cast("bigint")
    )
    tot = est.agg(F.sum("est_rows").cast("bigint").alias("__tot"))
    return (
        est.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "n_left",
            "n_right",
            "est_rows",
            F.round(
                F.col("est_rows").cast("double") / F.col("__tot").cast("double") * 100.0,
                6,
            ).alias("pct_of_output"),
        )
        .orderBy(F.col("est_rows").desc(), F.col("key"))
        .limit(top_n)
    )


def oracle_join_skew(
    left: str, right: str, left_key: str, right_key: str, top_n: int = 25
) -> str:
    return f"""
    WITH la AS (
      SELECT {left_key} AS key, count(*) AS n_left FROM {left}
      WHERE {left_key} IS NOT NULL GROUP BY 1
    ),
    ra AS (
      SELECT {right_key} AS key, count(*) AS n_right FROM {right}
      WHERE {right_key} IS NOT NULL GROUP BY 1
    ),
    est AS (
      SELECT la.key, la.n_left, ra.n_right,
             la.n_left * ra.n_right AS est_rows
      FROM la JOIN ra USING (key)
    ),
    tot AS (SELECT CAST(sum(est_rows) AS BIGINT) AS t FROM est)
    SELECT key, CAST(n_left AS BIGINT) AS n_left,
           CAST(n_right AS BIGINT) AS n_right,
           CAST(est_rows AS BIGINT) AS est_rows,
           round(CAST(est_rows AS DOUBLE) / CAST(tot.t AS DOUBLE) * 100.0, 6)
             AS pct_of_output
    FROM est, tot
    ORDER BY est_rows DESC, key
    LIMIT {top_n}
    """


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    key_col: str,
    content_cols: list[str],
    dim_col: str,
) -> DataFrame:
    """Dataset diff between two snapshots — the change-data report behind
    incremental reprocessing and audit trails: per ``dim_col`` value, how
    many records were added, removed, changed (same key, different
    content) or unchanged between the snapshots.

    Content identity is md5 over the unit-separator-joined content
    columns (the dedup canonicalization), so "changed" is exact and
    engine-portable. Shape: one narrow hash map per side, ONE key-keyed
    full outer join, one small aggregate — no data-scale sort, and at
    100 TB the join co-partitions on the snapshot key (bucket both
    snapshots by key to make it zero-exchange, io.write_bucketed).
    """

    def prep(df: DataFrame, tag: str) -> DataFrame:
        return df.select(
            F.col(key_col).alias("k"),
            F.col(dim_col).alias(f"{tag}_dim"),
            F.md5(
                F.concat_ws(
                    "\u001f", *[F.col(c).cast("string") for c in content_cols]
                ).cast("binary")
            ).alias(f"{tag}_h"),
        )

    j = prep(old, "o").join(prep(new, "n"), "k", "full_outer")
    status = (
        F.when(F.col("o_h").isNull(), F.lit("added"))
        .when(F.col("n_h").isNull(), F.lit("removed"))
        .when(F.col("o_h") == F.col("n_h"), F.lit("unchanged"))
        .otherwise(F.lit("changed"))
    )
    return (
        j.select(F.coalesce("n_dim", "o_dim").alias(dim_col), status.alias("status"))
        .groupBy(dim_col, "status")
        .agg(F.count("*").cast("bigint").alias("n"))
    )


def oracle_snapshot_diff(
    old_sql: str,
    new_sql: str,
    key_col: str,
    content_cols: list[str],
    dim_col: str,
) -> str:
    cat = " || chr(31) || ".join(f"CAST({c} AS VARCHAR)" for c in content_cols)
    return f"""
    WITH o AS (
      SELECT {key_col} AS k, {dim_col} AS o_dim, md5({cat}) AS o_h
      FROM ({old_sql})
    ),
    n AS (
      SELECT {key_col} AS k, {dim_col} AS n_dim, md5({cat}) AS n_h
      FROM ({new_sql})
    ),
    j AS (
      SELECT coalesce(n.n_dim, o.o_dim) AS {dim_col},
             CASE WHEN o.o_h IS NULL THEN 'added'
                  WHEN n.n_h IS NULL THEN 'removed'
                  WHEN o.o_h = n.n_h THEN 'unchanged'
                  ELSE 'changed' END AS status
      FROM o FULL OUTER JOIN n ON o.k = n.k
    )
    SELECT {dim_col}, status, CAST(count(*) AS BIGINT) AS n
    FROM j GROUP BY {dim_col}, status
    """


def fd_check(df: DataFrame, det_cols: list[str], dep_col: str) -> DataFrame:
    """One-row functional-dependency check det_cols -> dep_col — the
    data-profiling primitive behind schema inference and key discovery
    (Metanome/Deequ territory): per determinant group, does exactly one
    dependent value appear?

    Exact counts, two-level aggregation (distinct (det, dep) pairs — one
    keyed shuffle with partials — then a det-keyed rollup). Output:
    (determinant, dependent, n_groups, n_pairs, n_violating_groups,
    holds).
    """
    det = [F.col(c) for c in det_cols]
    pairs = df.select(*det, F.col(dep_col)).distinct()
    per_det = pairs.groupBy(*det).agg(F.count("*").alias("n_dep"))
    return per_det.agg(
        F.lit("+".join(det_cols)).alias("determinant"),
        F.lit(dep_col).alias("dependent"),
        F.count("*").cast("bigint").alias("n_groups"),
        F.sum("n_dep").cast("bigint").alias("n_pairs"),
        F.sum(F.when(F.col("n_dep") > 1, 1).otherwise(0))
        .cast("bigint")
        .alias("n_violating_groups"),
    ).withColumn("holds", F.col("n_violating_groups") == 0)


def oracle_fd_check(table: str, det_cols: list[str], dep_col: str) -> str:
    det = ", ".join(det_cols)
    return f"""
    SELECT '{"+".join(det_cols)}' AS determinant, '{dep_col}' AS dependent,
           CAST(count(*) AS BIGINT) AS n_groups,
           CAST(sum(n_dep) AS BIGINT) AS n_pairs,
           CAST(sum(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) AS BIGINT)
             AS n_violating_groups,
           sum(CASE WHEN n_dep > 1 THEN 1 ELSE 0 END) = 0 AS holds
    FROM (
      SELECT {det}, count(*) AS n_dep
      FROM (SELECT DISTINCT {det}, {dep_col} FROM {table})
      GROUP BY {det}
    )
    """


def ref_integrity(
    child: DataFrame,
    parent: DataFrame,
    fk_col: str,
    pk_col: str,
    label: str,
) -> DataFrame:
    """One-row referential-integrity check child.fk -> parent.pk — the
    FK-orphan audit every warehouse load runs: how many child rows (and
    distinct keys) reference a parent that does not exist?

    Orphans via LEFT ANTI join (Spark broadcasts the parent key set when
    small; stays a keyed shuffle otherwise — never a full outer
    materialization). NULL fks are counted separately, not as orphans
    (SQL FK semantics). Output: (relation, n_child, n_null_fk,
    n_orphan_rows, n_orphan_keys, ok).
    """
    fk = child.select(F.col(fk_col).alias("fk"))
    nn = fk.filter(F.col("fk").isNotNull())
    orphans = nn.join(
        parent.select(F.col(pk_col).alias("fk")).distinct(), "fk", "left_anti"
    )
    counts = fk.agg(
        F.count("*").cast("bigint").alias("n_child"),
        F.sum(F.when(F.col("fk").isNull(), 1).otherwise(0))
        .cast("bigint")
        .alias("n_null_fk"),
    )
    ostats = orphans.agg(
        F.count("*").cast("bigint").alias("n_orphan_rows"),
        F.countDistinct("fk").cast("bigint").alias("n_orphan_keys"),
    )
    return (
        counts.crossJoin(F.broadcast(ostats))
        .select(
            F.lit(label).alias("relation"),
            "n_child",
            "n_null_fk",
            "n_orphan_rows",
            "n_orphan_keys",
            (F.col("n_orphan_rows") == 0).alias("ok"),
        )
    )


def oracle_ref_integrity(
    child: str, parent: str, fk_col: str, pk_col: str, label: str
) -> str:
    return f"""
    SELECT '{label}' AS relation,
           CAST((SELECT count(*) FROM {child}) AS BIGINT) AS n_child,
           CAST((SELECT count(*) FROM {child} WHERE {fk_col} IS NULL) AS BIGINT)
             AS n_null_fk,
           CAST(o.n_orphan_rows AS BIGINT) AS n_orphan_rows,
           CAST(o.n_orphan_keys AS BIGINT) AS n_orphan_keys,
           o.n_orphan_rows = 0 AS ok
    FROM (
      SELECT count(*) AS n_orphan_rows, count(DISTINCT c.{fk_col}) AS n_orphan_keys
      FROM {child} c
      WHERE c.{fk_col} IS NOT NULL
        AND c.{fk_col} NOT IN (SELECT {pk_col} FROM {parent} WHERE {pk_col} IS NOT NULL)
    ) o
    """


def drift_ks(
    dfa: DataFrame, dfb: DataFrame, value_col: str
) -> DataFrame:
    """Two-sample Kolmogorov-Smirnov drift statistic, EXACT — the
    nonparametric sibling of drift_psi (no binning choice to defend):
    KS = max over x of |ECDF_a(x) - ECDF_b(x)| over integer-cents values.

    The comparison never divides: cumulative counts are cross-multiplied
    (|cum_a * n_b - cum_b * n_a|, exact BIGINT), the max is taken over
    those integers, and ONE double division at the end produces the
    statistic — bit-identical on any engine, immune to float ECDF
    accumulation. The cumulative window runs over the per-VALUE aggregate
    (distinct-value scale; swap in two_phase_prefix if the value domain
    is data-sized). Output: (n_a, n_b, ks_stat, at_cents) — at_cents is
    the smallest value attaining the max.
    """
    a = dfa.select(F.expr(f"cast(round({value_col} * 100) as bigint)").alias("v"))
    b = dfb.select(F.expr(f"cast(round({value_col} * 100) as bigint)").alias("v"))
    tagged = a.select("v", F.lit(1).alias("ca"), F.lit(0).alias("cb")).union(
        b.select("v", F.lit(0).alias("ca"), F.lit(1).alias("cb"))
    )
    per_v = tagged.groupBy("v").agg(
        F.sum("ca").cast("bigint").alias("na"), F.sum("cb").cast("bigint").alias("nb")
    )
    w = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, 0)
    cum = per_v.withColumn("cna", F.sum("na").over(w).cast("bigint")).withColumn(
        "cnb", F.sum("nb").over(w).cast("bigint")
    )
    tot = per_v.agg(
        F.sum("na").cast("bigint").alias("ta"), F.sum("nb").cast("bigint").alias("tb")
    )
    d = cum.crossJoin(F.broadcast(tot)).withColumn(
        "diff", F.abs(F.col("cna") * F.col("tb") - F.col("cnb") * F.col("ta")).cast("bigint")
    )
    mx = d.agg(F.max("diff").cast("bigint").alias("mdiff"))
    return (
        d.join(F.broadcast(mx), d["diff"] == mx["mdiff"])
        .agg(
            F.first("ta").cast("bigint").alias("n_a"),
            F.first("tb").cast("bigint").alias("n_b"),
            (
                F.first("mdiff").cast("double")
                / (F.first("ta") * F.first("tb")).cast("double")
            ).alias("ks_stat"),
            F.min("v").cast("bigint").alias("at_cents"),
        )
    )


def oracle_drift_ks(a_sql: str, b_sql: str, value_col: str) -> str:
    return f"""
    WITH av AS (SELECT CAST(round({value_col} * 100) AS BIGINT) AS v FROM ({a_sql})),
    bv AS (SELECT CAST(round({value_col} * 100) AS BIGINT) AS v FROM ({b_sql})),
    tagged AS (
      SELECT v, 1 AS ca, 0 AS cb FROM av
      UNION ALL SELECT v, 0 AS ca, 1 AS cb FROM bv
    ),
    per_v AS (
      SELECT v, CAST(sum(ca) AS BIGINT) AS na, CAST(sum(cb) AS BIGINT) AS nb
      FROM tagged GROUP BY v
    ),
    cum AS (
      SELECT v,
             CAST(sum(na) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) AS BIGINT) AS cna,
             CAST(sum(nb) OVER (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
                  AND CURRENT ROW) AS BIGINT) AS cnb
      FROM per_v
    ),
    tot AS (SELECT CAST(sum(na) AS BIGINT) AS ta, CAST(sum(nb) AS BIGINT) AS tb
            FROM per_v),
    d AS (
      SELECT v, abs(cna * tot.tb - cnb * tot.ta) AS diff, tot.ta, tot.tb
      FROM cum, tot
    ),
    mx AS (SELECT CAST(max(diff) AS BIGINT) AS mdiff FROM d)
    SELECT CAST(any_value(d.ta) AS BIGINT) AS n_a,
           CAST(any_value(d.tb) AS BIGINT) AS n_b,
           CAST(any_value(mx.mdiff) AS DOUBLE)
           / CAST(any_value(d.ta) * any_value(d.tb) AS DOUBLE) AS ks_stat,
           CAST(min(d.v) AS BIGINT) AS at_cents
    FROM d, mx WHERE d.diff = mx.mdiff
    """


def rater_agreement(
    df: DataFrame, rater_a: str, rater_b: str, label: str = "a_vs_b"
) -> DataFrame:
    """Cohen's kappa between two binary raters (boolean SQL expressions
    over the same rows) — the inter-annotator-agreement metric every
    labeling/filter pipeline needs before trusting either signal:
    kappa = (p_o - p_e) / (1 - p_e), chance-corrected agreement.

    ONE pass builds the exact 2x2 contingency table (four integer
    counts); kappa is a fixed-order double chain on those exact inputs,
    rounded to 6dp. Output: (pair, n, n_both_pos, n_both_neg, n_only_a,
    n_only_b, p_observed, kappa).
    """
    t = df.select(
        F.expr(rater_a).cast("boolean").alias("ra"),
        F.expr(rater_b).cast("boolean").alias("rb"),
    )
    agg = t.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("ra") & F.col("rb"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_both_pos"),
        F.sum(F.when(~F.col("ra") & ~F.col("rb"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_both_neg"),
        F.sum(F.when(F.col("ra") & ~F.col("rb"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_only_a"),
        F.sum(F.when(~F.col("ra") & F.col("rb"), 1).otherwise(0))
        .cast("bigint")
        .alias("n_only_b"),
    )
    n = F.col("n").cast("double")
    po = (F.col("n_both_pos") + F.col("n_both_neg")).cast("double") / n
    pa1 = (F.col("n_both_pos") + F.col("n_only_a")).cast("double") / n
    pb1 = (F.col("n_both_pos") + F.col("n_only_b")).cast("double") / n
    pe = pa1 * pb1 + (F.lit(1.0) - pa1) * (F.lit(1.0) - pb1)
    return agg.select(
        F.lit(label).alias("pair"),
        "n",
        "n_both_pos",
        "n_both_neg",
        "n_only_a",
        "n_only_b",
        F.round(po, 6).alias("p_observed"),
        F.when(pe != 1.0, F.round((po - pe) / (F.lit(1.0) - pe), 6)).alias("kappa"),
    )


def oracle_rater_agreement(
    table: str, rater_a: str, rater_b: str, label: str = "a_vs_b"
) -> str:
    return f"""
    WITH t AS (
      SELECT CAST({rater_a} AS BOOLEAN) AS ra, CAST({rater_b} AS BOOLEAN) AS rb
      FROM {table}
    ),
    agg AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN ra AND rb THEN 1 ELSE 0 END) AS BIGINT)
               AS n_both_pos,
             CAST(sum(CASE WHEN NOT ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT)
               AS n_both_neg,
             CAST(sum(CASE WHEN ra AND NOT rb THEN 1 ELSE 0 END) AS BIGINT)
               AS n_only_a,
             CAST(sum(CASE WHEN NOT ra AND rb THEN 1 ELSE 0 END) AS BIGINT)
               AS n_only_b
      FROM t
    )
    SELECT '{label}' AS pair, n, n_both_pos, n_both_neg, n_only_a, n_only_b,
           round(CAST(n_both_pos + n_both_neg AS DOUBLE) / CAST(n AS DOUBLE), 6)
             AS p_observed,
           CASE WHEN (CAST(n_both_pos + n_only_a AS DOUBLE) / CAST(n AS DOUBLE))
                     * (CAST(n_both_pos + n_only_b AS DOUBLE) / CAST(n AS DOUBLE))
                     + (1.0 - CAST(n_both_pos + n_only_a AS DOUBLE) / CAST(n AS DOUBLE))
                       * (1.0 - CAST(n_both_pos + n_only_b AS DOUBLE) / CAST(n AS DOUBLE))
                     <> 1.0
                THEN round(
                  (CAST(n_both_pos + n_both_neg AS DOUBLE) / CAST(n AS DOUBLE)
                   - ((CAST(n_both_pos + n_only_a AS DOUBLE) / CAST(n AS DOUBLE))
                      * (CAST(n_both_pos + n_only_b AS DOUBLE) / CAST(n AS DOUBLE))
                      + (1.0 - CAST(n_both_pos + n_only_a AS DOUBLE) / CAST(n AS DOUBLE))
                        * (1.0 - CAST(n_both_pos + n_only_b AS DOUBLE) / CAST(n AS DOUBLE))))
                  / (1.0
                     - ((CAST(n_both_pos + n_only_a AS DOUBLE) / CAST(n AS DOUBLE))
                        * (CAST(n_both_pos + n_only_b AS DOUBLE) / CAST(n AS DOUBLE))
                        + (1.0 - CAST(n_both_pos + n_only_a AS DOUBLE) / CAST(n AS DOUBLE))
                          * (1.0 - CAST(n_both_pos + n_only_b AS DOUBLE) / CAST(n AS DOUBLE)))),
                  6)
           END AS kappa
    FROM agg
    """


# ---------------------------------------------------------------------------
# Exact ROC-AUC — the rank statistic (tie-corrected Mann-Whitney U) of a
# score against a binary label: the standard "does this quality signal
# actually predict the gate" model-eval readout.
# ---------------------------------------------------------------------------


def roc_auc(
    df: DataFrame, score: str, label: str, name: str = "score_vs_label"
) -> DataFrame:
    """Exact AUC via the tie-corrected rank identity
    AUC = (2·R⁺ − n⁺(n⁺+1)) / (2·n⁺·n⁻), where R⁺ is the sum of the
    average (mid) ranks of the positives.

    Scale shape: rows collapse to the DISTINCT-SCORE frame first (one
    keyed groupBy); the running count below each score comes from the
    two-phase range-partition prefix — never a data-sized global window.
    Everything up to the final division is exact BIGINT arithmetic
    (2·midrank = 2·cum_below + n_s + 1 is always integral), so the result
    is identical at any parallelism and in any engine. Degenerate inputs
    (all-positive / all-negative) yield NULL auc in both engines.

    Output: (metric, n, n_pos, n_neg, auc) — one row.
    """
    from .partitioning import two_phase_prefix

    per = (
        df.select(
            F.expr(score).cast("bigint").alias("s"),
            F.expr(label).cast("boolean").alias("y"),
        )
        .groupBy("s")
        .agg(
            F.count("*").cast("bigint").alias("ns"),
            F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("bigint").alias("np"),
        )
    )
    pref = two_phase_prefix(per, [F.col("s")], F.col("ns"), "cum_incl")
    # 2·midrank of every row tied at s = 2·(cum_incl − ns) + ns + 1
    agg = pref.agg(
        F.sum("ns").cast("bigint").alias("n"),
        F.sum("np").cast("bigint").alias("n_pos"),
        F.sum(
            F.col("np") * (F.lit(2) * (F.col("cum_incl") - F.col("ns")) + F.col("ns") + F.lit(1))
        )
        .cast("bigint")
        .alias("r2"),
    )
    n_neg = (F.col("n") - F.col("n_pos")).cast("bigint")
    return agg.select(
        F.lit(name).alias("metric"),
        "n",
        "n_pos",
        n_neg.alias("n_neg"),
        F.when(
            (F.col("n_pos") > 0) & (n_neg > 0),
            F.round(
                (
                    F.col("r2").cast("double")
                    - F.col("n_pos").cast("double") * (F.col("n_pos") + F.lit(1)).cast("double")
                )
                / (F.lit(2.0) * F.col("n_pos").cast("double") * n_neg.cast("double")),
                6,
            ),
        ).alias("auc"),
    )


def oracle_roc_auc(table: str, score: str, label: str, name: str = "score_vs_label") -> str:
    return f"""
    WITH per AS (
      SELECT CAST({score} AS BIGINT) AS s,
             CAST(count(*) AS BIGINT) AS ns,
             CAST(sum(CASE WHEN CAST({label} AS BOOLEAN) THEN 1 ELSE 0 END) AS BIGINT) AS np
      FROM {table} GROUP BY 1
    ),
    pref AS (
      SELECT s, ns, np,
             CAST(sum(ns) OVER (ORDER BY s
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS cum_incl
      FROM per
    ),
    agg AS (
      SELECT CAST(sum(ns) AS BIGINT) AS n, CAST(sum(np) AS BIGINT) AS n_pos,
             CAST(sum(np * (2 * (cum_incl - ns) + ns + 1)) AS BIGINT) AS r2
      FROM pref
    )
    SELECT '{name}' AS metric, n, n_pos, CAST(n - n_pos AS BIGINT) AS n_neg,
           CASE WHEN n_pos > 0 AND n - n_pos > 0 THEN
             round((CAST(r2 AS DOUBLE) - CAST(n_pos AS DOUBLE) * CAST(n_pos + 1 AS DOUBLE))
                   / (2.0 * CAST(n_pos AS DOUBLE) * CAST(n - n_pos AS DOUBLE)), 6)
           END AS auc
    FROM agg
    """


def calibration_bins(
    df: DataFrame,
    score: str,
    label: str,
    bin_expr: str,
    prob_expr: str,
) -> DataFrame:
    """Reliability diagram + per-bin Brier score of a probabilistic scorer
    against a binary label — the "is this confidence actually a
    probability" model-eval readout that pairs with :func:`roc_auc`.

    Binning is by EXACT integer arithmetic on the raw score (``bin_expr``),
    never by float thresholds on the probability — float-boundary binning
    is the classic cross-engine divergence. The predicted probability
    (``prob_expr``, a fixed deterministic formula of ``score``) is rounded
    to 6dp per row and accumulated as DECIMAL(38,6) (exact, order-free);
    the same for the per-row squared Brier term. One keyed groupBy.

    Output: (bin, n, n_pos, obs_rate, mean_pred, brier).
    """
    t = df.select(
        F.expr(bin_expr).cast("bigint").alias("bin"),
        F.expr(label).cast("boolean").alias("y"),
        F.round(F.expr(prob_expr), 6).alias("p"),
    ).withColumn(
        "sq",
        F.expr("cast(round((p - cast(case when y then 1.0 else 0.0 end as double))"
               " * (p - cast(case when y then 1.0 else 0.0 end as double)), 6)"
               " as decimal(38,6))"),
    )
    agg = t.groupBy("bin").agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("bigint").alias("n_pos"),
        F.sum(F.expr("cast(p as decimal(38,6))")).alias("sp"),
        F.sum("sq").alias("ssq"),
    )
    return agg.select(
        "bin",
        "n",
        "n_pos",
        F.round(F.col("n_pos").cast("double") / F.col("n").cast("double"), 6).alias(
            "obs_rate"
        ),
        F.round(F.col("sp").cast("double") / F.col("n").cast("double"), 6).alias(
            "mean_pred"
        ),
        F.round(F.col("ssq").cast("double") / F.col("n").cast("double"), 6).alias(
            "brier"
        ),
    )


def oracle_calibration_bins(
    table: str, score: str, label: str, bin_expr: str, prob_expr: str
) -> str:
    return f"""
    WITH t AS (
      SELECT CAST({bin_expr} AS BIGINT) AS bin,
             CAST({label} AS BOOLEAN) AS y,
             round({prob_expr}, 6) AS p
      FROM {table}
    ),
    agg AS (
      SELECT bin, CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
             sum(CAST(p AS DECIMAL(38,6))) AS sp,
             sum(CAST(round((p - CAST(CASE WHEN y THEN 1.0 ELSE 0.0 END AS DOUBLE))
                            * (p - CAST(CASE WHEN y THEN 1.0 ELSE 0.0 END AS DOUBLE)), 6)
                      AS DECIMAL(38,6))) AS ssq
      FROM t GROUP BY bin
    )
    SELECT bin, n, n_pos,
           round(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE), 6) AS obs_rate,
           round(CAST(sp AS DOUBLE) / CAST(n AS DOUBLE), 6) AS mean_pred,
           round(CAST(ssq AS DOUBLE) / CAST(n AS DOUBLE), 6) AS brier
    FROM agg
    """


def gains_lift(df: DataFrame, key: str, score: str, label: str) -> DataFrame:
    """Cumulative gains / lift table: rank rows by score descending,
    bucket into population deciles, report what share of all positives
    the top deciles capture and the lift over random targeting — the
    third leg of the model-eval tripod next to :func:`roc_auc` and
    :func:`calibration_bins`.

    Ranking uses the two-phase range-partition global rank (never a
    data-sized window); deciles are exact integer arithmetic; every
    output ratio is one division of exact BIGINT counts rounded to 6dp.
    Output: (decile, n_cum, pos_cum, capture, lift) — 10 rows.
    """
    from .partitioning import global_sort_with_rank

    t = df.select(
        F.col(key).alias("k"),
        F.expr(score).cast("bigint").alias("s"),
        F.expr(label).cast("boolean").alias("y"),
    )
    ranked = global_sort_with_rank(t, ["s", "k"], rank_col="rnk", ascending=[False, True])
    tot = ranked.agg(
        F.count("*").cast("bigint").alias("n"),
        F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("bigint").alias("pos"),
    )
    dec = (
        ranked.join(F.broadcast(tot), how="cross")
        .withColumn("decile", F.expr("((rnk - 1) * 10) div n + 1"))
        .groupBy("decile", "n", "pos")
        .agg(
            F.count("*").cast("bigint").alias("n_dec"),
            F.sum(F.when(F.col("y"), 1).otherwise(0)).cast("bigint").alias("pos_dec"),
        )
    )
    w = Window.orderBy("decile").rowsBetween(Window.unboundedPreceding, Window.currentRow)
    cum = dec.select(
        F.col("decile").cast("int").alias("decile"),
        F.sum("n_dec").over(w).cast("bigint").alias("n_cum"),
        F.sum("pos_dec").over(w).cast("bigint").alias("pos_cum"),
        "n",
        "pos",
    )
    return cum.select(
        "decile",
        "n_cum",
        "pos_cum",
        F.round(F.col("pos_cum").cast("double") / F.col("pos").cast("double"), 6).alias(
            "capture"
        ),
        F.round(
            (F.col("pos_cum").cast("double") / F.col("n_cum").cast("double"))
            / (F.col("pos").cast("double") / F.col("n").cast("double")),
            6,
        ).alias("lift"),
    )


def oracle_gains_lift(table: str, key: str, score: str, label: str) -> str:
    return f"""
    WITH t AS (
      SELECT {key} AS k, CAST({score} AS BIGINT) AS s,
             CAST({label} AS BOOLEAN) AS y
      FROM {table}
    ),
    ranked AS (
      SELECT k, s, y, CAST(row_number() OVER (ORDER BY s DESC, k) AS BIGINT) AS rnk
      FROM t
    ),
    tot AS (
      SELECT CAST(count(*) AS BIGINT) AS n,
             CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pos
      FROM ranked
    ),
    dec AS (
      SELECT CAST((rnk - 1) * 10 // tt.n + 1 AS BIGINT) AS decile,
             CAST(count(*) AS BIGINT) AS n_dec,
             CAST(sum(CASE WHEN y THEN 1 ELSE 0 END) AS BIGINT) AS pos_dec,
             tt.n, tt.pos
      FROM ranked, tot tt GROUP BY 1, tt.n, tt.pos
    )
    SELECT CAST(decile AS INT) AS decile,
           CAST(sum(n_dec) OVER (ORDER BY decile) AS BIGINT) AS n_cum,
           CAST(sum(pos_dec) OVER (ORDER BY decile) AS BIGINT) AS pos_cum,
           round(CAST(sum(pos_dec) OVER (ORDER BY decile) AS DOUBLE)
                 / CAST(pos AS DOUBLE), 6) AS capture,
           round((CAST(sum(pos_dec) OVER (ORDER BY decile) AS DOUBLE)
                  / CAST(sum(n_dec) OVER (ORDER BY decile) AS DOUBLE))
                 / (CAST(pos AS DOUBLE) / CAST(n AS DOUBLE)), 6) AS lift
    FROM dec
    """


def freshness_report(
    events: DataFrame, key_col: str = "event_type", ts_col: str = "ts"
) -> DataFrame:
    """Feed-freshness audit: per key, the lag between its newest record
    and the newest record anywhere in the table — the staleness readout
    for a multi-feed ingest (wall-clock "now" is deliberately NOT used:
    results must be replayable).

    One keyed max + one broadcast global max; exact integer seconds.
    Output: (key, newest, lag_s, stale_over_1h).
    """
    base = events.select(
        F.col(key_col).alias("k"),
        F.expr(f"cast(unix_timestamp({ts_col}) as bigint)").alias("t"),
        F.col(ts_col).alias("raw_ts"),
    )
    per_key = base.groupBy("k").agg(
        F.max("t").cast("bigint").alias("mt"),
        F.max(F.expr("date_trunc('second', raw_ts)")).alias("newest"),
    )
    g = per_key.agg(F.max("mt").cast("bigint").alias("gt"))
    return per_key.join(F.broadcast(g), how="cross").select(
        F.col("k").alias(key_col),
        "newest",
        (F.col("gt") - F.col("mt")).cast("bigint").alias("lag_s"),
        ((F.col("gt") - F.col("mt")) > 3600).alias("stale_over_1h"),
    )


def oracle_freshness_report(
    table: str, key_col: str = "event_type", ts_col: str = "ts"
) -> str:
    return f"""
    WITH base AS (
      SELECT {key_col} AS k,
             CAST(floor(epoch({ts_col})) AS BIGINT) AS t,
             date_trunc('second', CAST({ts_col} AS TIMESTAMP)) AS rs
      FROM {table}
    ),
    per_key AS (
      SELECT k, CAST(max(t) AS BIGINT) AS mt, max(rs) AS newest FROM base GROUP BY k
    ),
    g AS (SELECT CAST(max(mt) AS BIGINT) AS gt FROM per_key)
    SELECT k AS {key_col}, newest,
           CAST(g.gt - mt AS BIGINT) AS lag_s,
           (g.gt - mt) > 3600 AS stale_over_1h
    FROM per_key, g
    """


def key_candidates(df: DataFrame, columns: list[str]) -> DataFrame:
    """Primary-key discovery: for each audited column, distinct count vs
    row count vs nulls — is_key iff unique and non-null. The profiling
    sibling of [[prof_fd_audit]] (FDs need a key to hang off) and the
    first question schema-on-read ingest asks of an undocumented table.

    ONE shared scan: all count(DISTINCT col) aggregates ride a single
    expand-aggregate (Catalyst plans multi-distinct via Expand), so the
    audit costs one pass regardless of column count. Output one row per
    column: (column, n_rows, n_distinct, n_nulls, is_key).
    """
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n_rows")]
    for c in columns:
        aggs.append(F.countDistinct(F.col(c)).cast("bigint").alias(f"d_{c}"))
        aggs.append(
            F.sum(F.when(F.col(c).isNull(), 1).otherwise(0))
            .cast("bigint")
            .alias(f"n_{c}")
        )
    wide = df.agg(*aggs)
    stack = ", ".join(f"'{c}', d_{c}, n_{c}" for c in columns)
    long = wide.selectExpr(
        "n_rows",
        f"stack({len(columns)}, {stack}) as (column_name, n_distinct, n_nulls)",
    )
    return long.select(
        "column_name",
        "n_rows",
        "n_distinct",
        "n_nulls",
        ((F.col("n_distinct") == F.col("n_rows")) & (F.col("n_nulls") == 0)).alias(
            "is_key"
        ),
    )


def oracle_key_candidates(table: str, columns: list[str]) -> str:
    rows = " UNION ALL ".join(
        f"SELECT '{c}' AS column_name, CAST(count(*) AS BIGINT) AS n_rows,"
        f" CAST(count(DISTINCT {c}) AS BIGINT) AS n_distinct,"
        f" CAST(sum(CASE WHEN {c} IS NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_nulls"
        f" FROM {table}"
        for c in columns
    )
    return f"""
    SELECT column_name, n_rows, n_distinct, n_nulls,
           (n_distinct = n_rows AND n_nulls = 0) AS is_key
    FROM ({rows})
    """


def corr_matrix(df: DataFrame, cols: dict) -> DataFrame:
    """Pairwise Pearson correlation matrix over integer-quantized numeric
    columns — the EDA staple feeding feature selection and leakage hunts
    (a 0.99 off-diagonal usually IS the leak [[smp_time_split]] guards
    against). ``cols`` maps output name -> integer SQL expression (cents
    / basis points / units; the caller picks the quantization, which
    also sets the 100 TB overflow headroom like [[agg_moments]]).

    ONE shared scan: every Σx, Σx², Σxy accumulates as an EXACT
    DECIMAL(38,0) sum of per-row BIGINT products; the correlation
    combines them exactly in decimal (num = n·Σxy − Σx·Σy, the
    catastrophic-cancellation-free form) and converts to double only for
    the final divide/sqrt — so any parallelism and any engine agree to
    the conversion ulp. Output: (col_x, col_y, n, r) for the upper
    triangle, r rounded 6dp.
    """
    names = list(cols)
    aggs = [F.count(F.lit(1)).cast("bigint").alias("n")]
    for a in names:
        aggs.append(
            F.expr(f"sum(cast(({cols[a]}) as decimal(38,0)))").alias(f"s_{a}")
        )
        aggs.append(
            F.expr(
                f"sum(cast(({cols[a]}) as decimal(19,0))"
                f" * cast(({cols[a]}) as decimal(19,0)))"
            ).alias(f"q_{a}")
        )
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            aggs.append(
                F.expr(
                    f"sum(cast(({cols[a]}) as decimal(19,0))"
                    f" * cast(({cols[b]}) as decimal(19,0)))"
                ).alias(f"p_{a}_{b}")
            )
    wide = df.agg(*aggs)
    rows = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            num = (
                f"cast(n as decimal(38,0)) * p_{a}_{b}"
                f" - s_{a} * s_{b}"
            )
            dx = f"cast(n as decimal(38,0)) * q_{a} - s_{a} * s_{a}"
            dy = f"cast(n as decimal(38,0)) * q_{b} - s_{b} * s_{b}"
            rows.append(
                f"struct('{a}' as col_x, '{b}' as col_y, n,"
                f" round(cast(({num}) as double) /"
                f" sqrt(cast(({dx}) as double) * cast(({dy}) as double)), 6) as r)"
            )
    return wide.selectExpr(
        f"inline(array({', '.join(rows)}))"
    )


def oracle_corr_matrix(table: str, cols: dict) -> str:
    """DuckDB twin: identical decimal accumulation; decimal -> double goes
    through VARCHAR (DuckDB's direct cast double-rounds past 2^53)."""
    names = list(cols)
    sels = ["CAST(count(*) AS BIGINT) AS n"]
    for a in names:
        sels.append(f"sum(CAST(({cols[a]}) AS DECIMAL(38,0))) AS s_{a}")
        sels.append(
            f"sum(CAST(({cols[a]}) AS DECIMAL(19,0))"
            f" * CAST(({cols[a]}) AS DECIMAL(19,0))) AS q_{a}"
        )
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            sels.append(
                f"sum(CAST(({cols[a]}) AS DECIMAL(19,0))"
                f" * CAST(({cols[b]}) AS DECIMAL(19,0))) AS p_{a}_{b}"
            )
    def d(expr: str) -> str:
        return f"CAST(CAST(({expr}) AS VARCHAR) AS DOUBLE)"

    rows = []
    for i, a in enumerate(names):
        for b in names[i + 1 :]:
            num = f"CAST(n AS DECIMAL(38,0)) * p_{a}_{b} - s_{a} * s_{b}"
            dx = f"CAST(n AS DECIMAL(38,0)) * q_{a} - s_{a} * s_{a}"
            dy = f"CAST(n AS DECIMAL(38,0)) * q_{b} - s_{b} * s_{b}"
            rows.append(
                f"SELECT '{a}' AS col_x, '{b}' AS col_y, n,"
                f" round({d(num)} / sqrt({d(dx)} * {d(dy)}), 6) AS r FROM wide"
            )
    union = " UNION ALL ".join(rows)
    return f"""
    WITH wide AS MATERIALIZED (
      SELECT {', '.join(sels)} FROM {table}
    )
    {union}
    """
