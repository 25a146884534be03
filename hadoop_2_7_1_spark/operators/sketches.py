"""Deterministic distinct-count sketching (KMV / k-minimum-values).

Spark's production path for approximate distinct counts is the built-in
HyperLogLog++ (`approx_count_distinct`), but its estimate is
engine-specific, so it cannot be oracle-checked across engines. KMV over a
content hash is fully deterministic: hash every value to a uniform fraction
with md5, keep the k smallest per group, estimate distinct = (k-1)/h_(k).
Any engine that hashes the same bytes produces the same sketch — which also
makes the sketch *mergeable* (the union's sketch is the k smallest of the
concatenated sketches), the property that matters for partial aggregation
at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# 15 hex chars = 60 bits, safely inside a signed 64-bit integer.
_TWO_60 = float(1 << 60)


def _frac(col: str) -> F.Column:
    """md5(value) mapped to a uniform double in [0, 1)."""
    return (
        F.conv(F.substring(F.md5(F.col(col).cast("string").cast("binary")), 1, 15), 16, 10)
        .cast("bigint")
        / F.lit(_TWO_60)
    )


def kmv_distinct(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Per-group KMV distinct estimate alongside the exact count.

    Output: (group, n_exact, kmv_estimate, n_seen). Groups with fewer than
    k distinct values are exact by construction (the sketch holds them all).

    Scale shape: one distinct on (group, value) with map-side partial, then
    a group-keyed window that keeps k rows per group — never a per-group
    array in memory. A production streaming variant folds the same min-k
    merge into a partial-aggregate UDAF; the estimator and its determinism
    are identical.
    """
    # NULL values hash to NULL and would rank NULLS FIRST in Spark but
    # NULLS LAST in the oracle — exclude them on both engines
    d = df.select(group_col, value_col).filter(F.col(value_col).isNotNull()).distinct()
    hashed = d.withColumn("__frac", _frac(value_col))
    w = Window.partitionBy(group_col).orderBy("__frac")
    topk = hashed.withColumn("__rn", F.row_number().over(w)).filter(F.col("__rn") <= k)
    sketch = topk.groupBy(group_col).agg(
        F.count("*").cast("bigint").alias("n_seen"),
        F.max("__frac").alias("__kth"),
    )
    exact = d.groupBy(group_col).agg(F.count("*").cast("bigint").alias("n_exact"))
    return (
        exact.join(sketch, group_col)
        .select(
            group_col,
            "n_exact",
            F.when(F.col("n_seen") < k, F.col("n_seen").cast("double"))
            .otherwise(F.lit(float(k - 1)) / F.col("__kth"))
            .cast("double")
            .alias("kmv_estimate"),
            "n_seen",
        )
    )


def merge_kmv(sketches: list[list[float]], k: int) -> list[float]:
    """Driver-side union of KMV sketches: the k smallest of the union —
    used by tests to prove mergeability; distributed partial aggregation
    applies the same fold."""
    return sorted(set().union(*map(set, sketches)))[:k]


def _hash60(expr: F.Column) -> F.Column:
    """Low 60 bits of md5 over the column's string bytes, as a non-negative
    bigint — the shared cross-engine hash primitive (same formula the KMV
    sketch and the DuckDB oracles use)."""
    return F.conv(F.substring(F.md5(expr.cast("string").cast("binary")), 1, 15), 16, 10).cast(
        "bigint"
    )


def cms_cells(df: DataFrame, key_col: str, depth: int = 4, width: int = 512) -> DataFrame:
    """Count-min sketch of a key column as its distributed representation:
    one row per non-empty (row, col) cell with the collision-summed count.

    Each of the ``depth`` rows uses an independently salted hash
    h_j(x) = md5(j || ':' || x) mod width. The cell table is *mergeable by
    summing counts* — partial sketches from shards union + groupBy-sum into
    the corpus sketch, which is exactly Spark's partial→final HashAggregate,
    so at 100 TB the sketch build is one map-side-combined shuffle of at
    most depth*width*partitions rows (data volume never matters).
    """
    rows = F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j")
    return (
        df.select(F.col(key_col).alias("__k"))
        .filter(F.col("__k").isNotNull())
        .select("__k", rows)
        .select(
            "j",
            F.pmod(_hash60(F.concat_ws(":", F.col("j"), F.col("__k"))), F.lit(width)).alias(
                "col"
            ),
        )
        .groupBy("j", "col")
        .agg(F.count("*").cast("bigint").alias("cnt"))
    )


def cms_heavy_hitters(
    df: DataFrame,
    key_col: str,
    threshold: int,
    depth: int = 4,
    width: int = 512,
) -> DataFrame:
    """Heavy hitters by count-min estimate: keys whose CMS estimate
    (min over the depth rows of the probed cell) reaches ``threshold``,
    with the exact count alongside (estimate >= exact always — the one-sided
    CMS error; the gap is the collision mass).

    The probe is an equi-join of the candidate keys' (j, col) coordinates
    against the cell table — broadcast-sized (depth*width cells), so probing
    N candidates never shuffles the sketch. Output: (key, n_exact, cms_est).
    """
    cells = cms_cells(df, key_col, depth, width)
    exact = (
        df.select(F.col(key_col).alias("key"))
        .filter(F.col("key").isNotNull())
        .groupBy("key")
        .agg(F.count("*").cast("bigint").alias("n_exact"))
    )
    probes = exact.select(
        "key",
        "n_exact",
        F.explode(F.array(*[F.lit(j) for j in range(depth)])).alias("j"),
    ).withColumn(
        "col", F.pmod(_hash60(F.concat_ws(":", F.col("j"), F.col("key"))), F.lit(width))
    )
    est = (
        probes.join(F.broadcast(cells), ["j", "col"])
        .groupBy("key", "n_exact")
        .agg(F.min("cnt").cast("bigint").alias("cms_est"))
    )
    return est.filter(F.col("cms_est") >= threshold).select("key", "n_exact", "cms_est")


def oracle_cms_heavy_hitters(
    table: str, key_col: str, threshold: int, depth: int = 4, width: int = 512
) -> str:
    h = (
        "CAST(('0x' || substr(md5(CAST(j AS VARCHAR) || ':' || CAST({k} AS VARCHAR)), 1, 15))"
        " AS BIGINT) % {w}"
    )
    return f"""
    WITH keys AS (
      SELECT {key_col} AS key FROM {table} WHERE {key_col} IS NOT NULL
    ), hashed AS (
      SELECT key, j, {h.format(k="key", w=width)} AS col
      FROM keys CROSS JOIN range({depth}) t(j)
    ), cells AS (
      SELECT j, col, count(*) AS cnt FROM hashed GROUP BY j, col
    ), exact AS (
      SELECT key, count(*) AS n_exact FROM keys GROUP BY key
    ), probes AS (
      SELECT e.key, e.n_exact, j, {h.format(k="e.key", w=width)} AS col
      FROM exact e CROSS JOIN range({depth}) t(j)
    ), est AS (
      SELECT p.key, p.n_exact, min(c.cnt) AS cms_est
      FROM probes p JOIN cells c USING (j, col)
      GROUP BY p.key, p.n_exact
    )
    SELECT key, CAST(n_exact AS BIGINT) AS n_exact, CAST(cms_est AS BIGINT) AS cms_est
    FROM est WHERE cms_est >= {threshold}
    """


def _sql_hash60(expr: str) -> str:
    """Spark-SQL string form of the 60-bit md5 hash over ``expr`` (a SQL
    expression yielding a string)."""
    return f"cast(conv(substring(md5(cast(({expr}) as binary)), 1, 15), 16, 10) as bigint)"


def _sql_bloom_pos(key_col: str, j: int, m_bits: int) -> str:
    """Spark-SQL expression for the j-th Kirsch-Mitzenmacher probe position:
    (h1 + j*h2) mod m, with h2 salted by a chr(1) prefix."""
    h1 = _sql_hash60(f"cast({key_col} as string)")
    h2 = _sql_hash60(f"concat(chr(1), cast({key_col} as string))")
    return f"pmod({h1} + {j} * {h2}, {m_bits})"


def bloom_build(dim: DataFrame, key_col: str, m_bits: int = 128, k_hashes: int = 3) -> list[int]:
    """Distributed Bloom-filter build over the (small) dim side's keys.

    Kirsch-Mitzenmacher double hashing: two md5-derived 60-bit hashes h1, h2
    give position_j = (h1 + j*h2) mod m. The bitmap is built as a
    groupBy(word)–bit_or aggregation (map-side combined), and only the
    m/64 longs are collected — the classic runtime-filter shape: the build
    side streams once, the result is plan-literal-sized.
    """
    positions = ",".join(_sql_bloom_pos("__k", j, m_bits) for j in range(k_hashes))
    words = (
        dim.select(F.col(key_col).alias("__k"))
        .filter(F.col("__k").isNotNull())
        .distinct()
        .selectExpr(f"explode(array({positions})) as pos")
        .selectExpr(
            # 32-bit words (not 64): keeps every shift < 32 so the identical
            # arithmetic runs on engines that overflow-check 1<<63 (DuckDB).
            "cast(pos div 32 as int) as word",
            "shiftleft(1L, cast(pos % 32 as int)) as bit",
        )
        .groupBy("word")
        .agg(F.expr("bit_or(bit)").alias("bits"))
        .collect()
    )
    bitmap = [0] * (m_bits // 32)
    for r in words:
        bitmap[r.word] = r.bits
    return bitmap


def bloom_might_contain(
    key_col: str, bitmap: list[int], m_bits: int = 128, k_hashes: int = 3
) -> F.Column:
    """Membership-test Column against a built bitmap: true iff all k probed
    bits are set. The bitmap rides in the plan as a literal array (element_at
    on a 2–256 element array — whole-stage-codegen-friendly), so the probe
    side is a map-only filter: no join, no shuffle, exactly how a runtime
    bloom filter prunes a fact scan before the real join."""
    arr = "array(" + ",".join(f"{w}L" for w in bitmap) + ")"
    checks = []
    for j in range(k_hashes):
        pos = _sql_bloom_pos(key_col, j, m_bits)
        checks.append(
            f"(element_at({arr}, cast(({pos}) div 32 as int) + 1)"
            f" & shiftleft(1L, cast(({pos}) % 32 as int))) != 0"
        )
    return F.expr(" AND ".join(checks))


def oracle_bloom_prune(
    fact: str,
    fact_key: str,
    dim: str,
    dim_key: str,
    m_bits: int = 128,
    k_hashes: int = 3,
) -> str:
    """Oracle for the bloom-prune demo query: replays the same double-hashed
    bitmap in SQL and reports (n_pass, n_true, n_false_pos)."""

    def h(col: str, salt: bool) -> str:
        inner = f"chr(1) || CAST({col} AS VARCHAR)" if salt else f"CAST({col} AS VARCHAR)"
        return f"CAST(('0x' || substr(md5({inner}), 1, 15)) AS BIGINT)"

    def pos(col: str, j: int) -> str:
        return f"(({h(col, False)} + {j} * {h(col, True)}) % {m_bits})"

    pos_union = " UNION ALL ".join(
        f"SELECT {dim_key} AS k, {pos(dim_key, j)} AS pos FROM dimkeys" for j in range(k_hashes)
    )
    fact_checks = " AND ".join(
        f"((SELECT bits FROM bitmap WHERE word = {pos(fact_key, j)} // 32)"
        f" & (CAST(1 AS BIGINT) << CAST({pos(fact_key, j)} % 32 AS INTEGER))) <> 0"
        for j in range(k_hashes)
    )
    return f"""
    WITH dimkeys AS (
      SELECT DISTINCT {dim_key} FROM {dim}
    ), positions AS (
      {pos_union}
    ), bitmap AS (
      SELECT pos // 32 AS word, bit_or(CAST(1 AS BIGINT) << CAST(pos % 32 AS INTEGER)) AS bits
      FROM positions GROUP BY pos // 32
    ), passed AS (
      SELECT f.{fact_key},
             f.{fact_key} IN (SELECT {dim_key} FROM dimkeys) AS is_true
      FROM {fact} f
      WHERE {fact_checks}
    )
    SELECT CAST(count(*) AS BIGINT) AS n_pass,
           CAST(sum(CASE WHEN is_true THEN 1 ELSE 0 END) AS BIGINT) AS n_true,
           CAST(sum(CASE WHEN is_true THEN 0 ELSE 1 END) AS BIGINT) AS n_false_pos
    FROM passed
    """


def oracle_kmv_distinct(table: str, group_col: str, value_col: str, k: int = 64) -> str:
    frac = (
        f"CAST(('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15)) AS BIGINT)"
        f" / {float(1 << 60)!r}"
    )
    return f"""
    WITH d AS (
      SELECT DISTINCT {group_col}, {value_col} FROM {table}
      WHERE {value_col} IS NOT NULL
    ), h AS (
      SELECT {group_col}, {frac} AS frac FROM d
    ), r AS (
      SELECT {group_col}, frac,
             row_number() OVER (PARTITION BY {group_col} ORDER BY frac) AS rn
      FROM h
    ), sk AS (
      SELECT {group_col}, count(*) AS n_seen, max(frac) AS kth
      FROM r WHERE rn <= {k} GROUP BY {group_col}
    ), ex AS (
      SELECT {group_col}, count(*) AS n_exact FROM d GROUP BY {group_col}
    )
    SELECT ex.{group_col}, CAST(n_exact AS BIGINT) AS n_exact,
           CAST(CASE WHEN n_seen < {k} THEN n_seen
                     ELSE ({k} - 1) / kth END AS DOUBLE) AS kmv_estimate,
           CAST(n_seen AS BIGINT) AS n_seen
    FROM ex JOIN sk USING ({group_col})
    """


# ---------------------------------------------------------------------------
# HyperLogLog
# ---------------------------------------------------------------------------

HLL_P = 10                      # 2^10 = 1024 registers
HLL_M = 1 << HLL_P
HLL_RHO_CAP = 40                # register cap keeps 2^(cap-M) sums in BIGINT
# alpha_m * m^2 * 2^cap folded into ONE python double so both engines divide
# the identical numerator by the identical integer S — no multiply-order
# drift (Flajolet et al. 2007 constants).
_HLL_ALPHA = 0.7213 / (1.0 + 1.079 / HLL_M)
HLL_NUMERATOR = _HLL_ALPHA * HLL_M * HLL_M * float(1 << HLL_RHO_CAP)


def hll_distinct(df: DataFrame, group_col: str, value_col: str) -> DataFrame:
    """Per-group HyperLogLog distinct estimate alongside the exact count.

    Register assignment from the shared 60-bit md5 hash: top 10 bits pick
    the bucket, rho = leading-zero run of the remaining 50 bits (capped at
    40). The register table IS the distributed sketch — (group, bucket,
    max rho) rows — so merging partials is just max(), which Spark's
    map-side partial aggregation already performs; the estimator folds the
    registers with exact integer arithmetic (sum of 2^(cap-rho) in BIGINT)
    so the result is bit-identical at any parallelism, then applies the
    standard small-range linear-counting correction.

    Scale shape: two shuffles (dedup optional; register agg on
    (group, bucket) with partial max, then group fold of <= 1024 rows/group).
    Reference analogue: the capped UniqValueCount
    (MRC/mapreduce/lib/aggregate/UniqValueCount.java:1) — same job, bounded
    memory instead of a bounded exact set.
    """
    h = _hash60(F.col(value_col))
    d = df.filter(F.col(value_col).isNotNull()).select(
        F.col(group_col),
        # bit shift, NOT double division — h has up to 60 bits and doubles
        # lose integer exactness past 2^53
        F.shiftright(h, 50).alias("__b"),
        (h % (1 << 50)).alias("__w"),
    )
    rho = (
        F.when(F.col("__w") == 0, F.lit(51))
        .otherwise(F.lit(51) - F.length(F.bin(F.col("__w"))))
    )
    regs = (
        d.withColumn("__rho", F.least(rho, F.lit(HLL_RHO_CAP)))
        .groupBy(group_col, "__b")
        .agg(F.max("__rho").alias("__m"))
    )
    cap = HLL_RHO_CAP
    folded = regs.groupBy(group_col).agg(
        F.sum(F.expr(f"cast(pow(2, {cap} - __m) as bigint)")).alias("__s_present"),
        F.count("*").alias("__nb"),
    )
    zeros = F.lit(HLL_M) - F.col("__nb")
    s_total = (F.col("__s_present") + zeros * (1 << cap)).cast("double")
    e_raw = F.lit(HLL_NUMERATOR) / s_total
    est = F.when(
        (zeros > 0) & (e_raw <= 2.5 * HLL_M),
        F.round(F.lit(float(HLL_M)) * F.log(F.lit(float(HLL_M)) / zeros.cast("double")), 4),
    ).otherwise(F.round(e_raw, 4))
    exact = (
        df.filter(F.col(value_col).isNotNull())
        .groupBy(group_col)
        .agg(F.count_distinct(F.col(value_col)).cast("bigint").alias("n_exact"))
    )
    return exact.join(folded, group_col).select(
        group_col,
        "n_exact",
        est.cast("double").alias("hll_estimate"),
        zeros.cast("bigint").alias("n_zero_registers"),
    )


def oracle_hll_distinct(table: str, group_col: str, value_col: str) -> str:
    cap, m = HLL_RHO_CAP, HLL_M
    h = f"CAST(('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15)) AS BIGINT)"
    return f"""
    WITH d AS (
      SELECT {group_col},
             {h} // {1 << 50} AS b,
             {h} % {1 << 50} AS w
      FROM {table} WHERE {value_col} IS NOT NULL
    ), regs AS (
      SELECT {group_col}, b,
             max(least(CASE WHEN w = 0 THEN 51 ELSE 51 - len(bin(w)) END, {cap})) AS mreg
      FROM d GROUP BY {group_col}, b
    ), folded AS (
      SELECT {group_col},
             CAST(sum(CAST(2 ** ({cap} - mreg) AS BIGINT)) AS BIGINT) AS s_present,
             count(*) AS nb
      FROM regs GROUP BY {group_col}
    ), est AS (
      SELECT {group_col},
             {m} - nb AS zeros,
             CAST(s_present + ({m} - nb) * {1 << cap} AS DOUBLE) AS s_total
      FROM folded
    ), ex AS (
      SELECT {group_col}, CAST(count(DISTINCT {value_col}) AS BIGINT) AS n_exact
      FROM {table} WHERE {value_col} IS NOT NULL GROUP BY {group_col}
    )
    SELECT ex.{group_col}, n_exact,
           CAST(CASE WHEN zeros > 0 AND {HLL_NUMERATOR!r} / s_total <= {2.5 * m!r}
                     THEN round({float(m)!r} * ln({float(m)!r} / zeros), 4)
                     ELSE round({HLL_NUMERATOR!r} / s_total, 4) END AS DOUBLE)
             AS hll_estimate,
           CAST(zeros AS BIGINT) AS n_zero_registers
    FROM ex JOIN est USING ({group_col})
    """


def hll_sliding_distinct(
    events: DataFrame,
    ts_col: str = "ts",
    value_col: str = "user_id",
    window_days: int = 7,
) -> DataFrame:
    """Rolling ``window_days``-day distinct-count per day via MERGED HLL
    registers — the query that shows WHY sketches, not exact sets, back
    rolling uniques at scale: per-day register tables (day, bucket, max rho)
    are built once, and the trailing window for every day is just max() over
    the covered days' registers. Exact distinct is computed alongside as the
    accuracy audit.

    Merge-by-fanout keeps every shuffle equi-keyed: each per-day register
    row covers days [d, d+window-1], expanded map-side with a sequence
    explode (×window narrow fan-out of a register table that is at most
    1024 rows/day — NOT of the event stream), then one (day, bucket) max
    and one per-day fold. The exact side re-scans (day, value) pairs per
    covered day — that ×window blowup of the DATA is exactly what the
    sketch path avoids at 100 TB.

    Output: (day_epoch, n_exact, hll_estimate, n_zero_registers) for each
    observed day, window = the trailing ``window_days``.
    """
    cap, m = HLL_RHO_CAP, HLL_M
    day = F.expr(f"datediff(cast({ts_col} as date), date '1970-01-01')")
    h = _hash60(F.col(value_col))
    d = events.filter(F.col(value_col).isNotNull()).select(
        day.alias("day"),
        F.shiftright(h, 50).alias("__b"),
        (h % (1 << 50)).alias("__w"),
    )
    rho = (
        F.when(F.col("__w") == 0, F.lit(51))
        .otherwise(F.lit(51) - F.length(F.bin(F.col("__w"))))
    )
    day_regs = (
        d.withColumn("__rho", F.least(rho, F.lit(cap)))
        .groupBy("day", "__b")
        .agg(F.max("__rho").alias("__m"))
    )
    spine = d.select("day").distinct()
    covered = day_regs.select(
        F.explode(
            F.expr(f"sequence(day, day + {window_days - 1})")
        ).alias("day_s"),
        "__b",
        "__m",
    )
    merged = (
        covered.join(spine.select(F.col("day").alias("day_s")), "day_s")
        .groupBy("day_s", "__b")
        .agg(F.max("__m").alias("__m"))
    )
    folded = merged.groupBy("day_s").agg(
        F.sum(F.expr(f"cast(pow(2, {cap} - __m) as bigint)")).alias("__s_present"),
        F.count("*").alias("__nb"),
    )
    zeros = F.lit(m) - F.col("__nb")
    s_total = (F.col("__s_present") + zeros * (1 << cap)).cast("double")
    e_raw = F.lit(HLL_NUMERATOR) / s_total
    est = F.when(
        (zeros > 0) & (e_raw <= 2.5 * m),
        F.round(F.lit(float(m)) * F.log(F.lit(float(m)) / zeros.cast("double")), 4),
    ).otherwise(F.round(e_raw, 4))
    pairs = events.filter(F.col(value_col).isNotNull()).select(
        day.alias("day"), F.col(value_col).alias("v")
    ).distinct()
    exact = (
        pairs.select(
            F.explode(
                F.expr(f"sequence(day, day + {window_days - 1})")
            ).alias("day_s"),
            "v",
        )
        .join(spine.select(F.col("day").alias("day_s")), "day_s")
        .groupBy("day_s")
        .agg(F.count_distinct("v").cast("bigint").alias("n_exact"))
    )
    return exact.join(folded, "day_s").select(
        F.col("day_s").cast("bigint").alias("day_epoch"),
        "n_exact",
        est.cast("double").alias("hll_estimate"),
        zeros.cast("bigint").alias("n_zero_registers"),
    )


def oracle_hll_sliding_distinct(
    table: str,
    ts_col: str = "ts",
    value_col: str = "user_id",
    window_days: int = 7,
) -> str:
    cap, m = HLL_RHO_CAP, HLL_M
    h = f"CAST(('0x' || substr(md5(CAST({value_col} AS VARCHAR)), 1, 15)) AS BIGINT)"
    day = f"CAST(CAST({ts_col} AS DATE) - DATE '1970-01-01' AS INT)"
    return f"""
    WITH d AS (
      SELECT {day} AS day,
             {h} // {1 << 50} AS b,
             {h} % {1 << 50} AS w
      FROM {table} WHERE {value_col} IS NOT NULL
    ), day_regs AS (
      SELECT day, b,
             max(least(CASE WHEN w = 0 THEN 51 ELSE 51 - len(bin(w)) END, {cap})) AS mreg
      FROM d GROUP BY day, b
    ), spine AS (SELECT DISTINCT day FROM d),
    covered AS (
      SELECT day + o AS day_s, b, mreg
      FROM day_regs, UNNEST(range(0, {window_days})) AS u(o)
    ),
    merged AS (
      SELECT c.day_s, c.b, max(c.mreg) AS mreg
      FROM covered c JOIN spine s ON c.day_s = s.day
      GROUP BY c.day_s, c.b
    ),
    folded AS (
      SELECT day_s,
             CAST(sum(CAST(2 ** ({cap} - mreg) AS BIGINT)) AS BIGINT) AS s_present,
             count(*) AS nb
      FROM merged GROUP BY day_s
    ),
    est AS (
      SELECT day_s, {m} - nb AS zeros,
             CAST(s_present + ({m} - nb) * {1 << cap} AS DOUBLE) AS s_total
      FROM folded
    ),
    pairs AS (
      SELECT DISTINCT {day} AS day, {value_col} AS v
      FROM {table} WHERE {value_col} IS NOT NULL
    ),
    exact AS (
      SELECT p.day + o AS day_s, CAST(count(DISTINCT p.v) AS BIGINT) AS n_exact
      FROM pairs p, UNNEST(range(0, {window_days})) AS u(o), spine s
      WHERE p.day + o = s.day
      GROUP BY p.day + o
    )
    SELECT CAST(e.day_s AS BIGINT) AS day_epoch, e.n_exact,
           CAST(CASE WHEN zeros > 0 AND {HLL_NUMERATOR!r} / s_total <= {2.5 * m!r}
                     THEN round({float(m)!r} * ln({float(m)!r} / zeros), 4)
                     ELSE round({HLL_NUMERATOR!r} / s_total, 4) END AS DOUBLE)
             AS hll_estimate,
           CAST(zeros AS BIGINT) AS n_zero_registers
    FROM exact e JOIN est USING (day_s)
    """


def histogram_quantiles(
    events: DataFrame,
    key_col: str = "event_type",
    value_col: str = "value",
    width_cents: int = 500,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> DataFrame:
    """Approximate quantiles from a fixed-width histogram, WITH the exact
    audit alongside — completing the sketch-accuracy family (HLL, KMV, CMS,
    MinHash all carry their audits): per key, values bucket into
    ``width_cents`` cells; the q-quantile estimate is the upper edge of the
    first bucket whose cumulative count reaches ``ceil(q·n)``; the exact
    quantile (same rank definition) rides a per-key sort. Error bound is
    the bucket width by construction — the audit shows the actual gap.

    The sketch side is one (key, bucket) count + a window over the BUCKET
    table (bounded: value-range/width rows per key, not data-sized); the
    exact side is the per-key sort the sketch exists to avoid at scale —
    shipped here as the audit. All integers until the final per-row
    estimate. Output: (key, q, n, approx_cents, exact_cents, err_cents).
    """
    cents = F.expr(f"cast(round({value_col} * 100) as bigint)")
    base = events.select(F.col(key_col).alias("k"), cents.alias("c"))
    hist = (
        base.withColumn("bucket", F.expr(f"c div {width_cents}"))
        .groupBy("k", "bucket")
        .agg(F.count("*").alias("bn"))
    )
    wc = Window.partitionBy("k").orderBy("bucket").rowsBetween(
        Window.unboundedPreceding, 0
    )
    cum = hist.withColumn("cum", F.sum("bn").over(wc))
    totals = base.groupBy("k").agg(F.count("*").alias("n"))
    qdf = events.sparkSession.createDataFrame(
        [(float(q),) for q in qs], "q double"
    )
    targets = totals.crossJoin(F.broadcast(qdf)).withColumn(
        "rank", F.expr("cast(ceil(q * n) as bigint)")
    )
    approx = (
        cum.join(targets, "k")
        .filter(F.col("cum") >= F.col("rank"))
        .groupBy("k", "q", "n", "rank")
        .agg(F.min("bucket").alias("b"))
        .withColumn(
            "approx_cents", F.expr(f"(b + 1) * {width_cents}").cast("bigint")
        )
    )
    # value-at-rank is tie-order independent (equal ranks carry equal c),
    # so orderBy(c) alone is deterministic in the only thing that matters
    ws = Window.partitionBy("k").orderBy("c")
    ranked = base.withColumn("rn", F.row_number().over(ws))
    exact = (
        ranked.join(targets, "k")
        .filter(F.col("rn") == F.col("rank"))
        .select("k", "q", F.col("c").alias("exact_cents"))
    )
    return (
        approx.join(exact, ["k", "q"])
        .select(
            F.col("k").alias(key_col),
            "q",
            F.col("n").cast("bigint").alias("n"),
            "approx_cents",
            F.col("exact_cents").cast("bigint").alias("exact_cents"),
            (F.col("approx_cents") - F.col("exact_cents"))
            .cast("bigint")
            .alias("err_cents"),
        )
    )


def oracle_histogram_quantiles(
    table: str,
    key_col: str = "event_type",
    value_col: str = "value",
    width_cents: int = 500,
    qs: tuple[float, ...] = (0.5, 0.9, 0.99),
) -> str:
    qvals = ", ".join(f"({q!r})" for q in qs)
    return f"""
    WITH base AS (
      SELECT {key_col} AS k, CAST(round({value_col} * 100) AS BIGINT) AS c
      FROM {table}
    ),
    hist AS (
      SELECT k, c // {width_cents} AS bucket, count(*) AS bn
      FROM base GROUP BY k, c // {width_cents}
    ),
    cum AS (
      SELECT k, bucket, sum(bn) OVER (PARTITION BY k ORDER BY bucket
                                      ROWS UNBOUNDED PRECEDING) AS cum
      FROM hist
    ),
    totals AS (SELECT k, count(*) AS n FROM base GROUP BY k),
    targets AS (
      SELECT t.k, q.q, t.n, CAST(ceil(q.q * t.n) AS BIGINT) AS rank
      FROM totals t CROSS JOIN (VALUES {qvals}) q(q)
    ),
    approx AS (
      SELECT c.k, t.q, t.n, t.rank,
             CAST((min(c.bucket) + 1) * {width_cents} AS BIGINT) AS approx_cents
      FROM cum c JOIN targets t ON c.k = t.k
      WHERE c.cum >= t.rank
      GROUP BY c.k, t.q, t.n, t.rank
    ),
    ranked AS (
      SELECT k, c, row_number() OVER (PARTITION BY k ORDER BY c) AS rn
      FROM base
    ),
    exact AS (
      SELECT r.k, t.q, r.c AS exact_cents
      FROM ranked r JOIN targets t ON r.k = t.k AND r.rn = t.rank
    )
    SELECT a.k AS {key_col}, a.q, CAST(a.n AS BIGINT) AS n,
           a.approx_cents,
           CAST(e.exact_cents AS BIGINT) AS exact_cents,
           CAST(a.approx_cents - e.exact_cents AS BIGINT) AS err_cents
    FROM approx a JOIN exact e ON a.k = e.k AND a.q = e.q
    """


# ---------------------------------------------------------------------------
# KMV set algebra: pairwise overlap between groups without a data-scale join
# ---------------------------------------------------------------------------


def kmv_overlap(
    df: DataFrame, group_col: str, value_col: str, k: int = 64
) -> DataFrame:
    """Pairwise set-overlap report between every two groups from their KMV
    sketches — "how much do these sources share?" answered at sketch scale,
    the mergeable-sketch property :func:`kmv_distinct` only asserts, here
    actually exercised as set algebra (Beyer et al., SIGMOD 2007).

    Per group: the k smallest md5 fractions of its distinct values. Per
    pair (a, b): merge the two sketches, keep the k smallest of the union;
    the union's KMV estimate is (k-1)/h_(k), and the Jaccard estimate is
    the fraction of those k that appear in BOTH input sketches. Exact
    n_common / n_union ride along as the audit (the sketch-vs-exact
    discipline of agg_minhash_accuracy / agg_sketch_report).

    Scale shape: the sketch build is one distinct + one group-keyed
    window keeping k rows per group — data touched once. Everything
    pairwise happens on sketch rows (n_groups * k), never on data: the
    pair expansion is two broadcast equi-joins of the tiny pair table
    against sketch rows, Σ |pairs| * k rows total. The exact-audit join is
    a value-keyed equi-join of the distinct sets (Σ per-value group-count²,
    bounded by n_groups² per value) — at 100 TB drop the audit columns and
    only sketch rows ever move.
    """
    d = df.select(group_col, value_col).filter(F.col(value_col).isNotNull()).distinct()
    d = d.localCheckpoint()
    hashed = d.withColumn("__frac", _frac(value_col))
    w = Window.partitionBy(group_col).orderBy("__frac")
    sk = (
        hashed.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") <= k)
        .select(F.col(group_col).alias("g"), "__frac")
    )
    groups = d.select(F.col(group_col).alias("g")).distinct()
    pairs = (
        groups.select(F.col("g").alias("ga"))
        .join(F.broadcast(groups.select(F.col("g").alias("gb"))), F.col("ga") < F.col("gb"))
    )
    ma = pairs.join(sk, pairs["ga"] == sk["g"]).select(
        "ga", "gb", "__frac", F.lit(1).alias("in_a"), F.lit(0).alias("in_b")
    )
    mb = pairs.join(sk, pairs["gb"] == sk["g"]).select(
        "ga", "gb", "__frac", F.lit(0).alias("in_a"), F.lit(1).alias("in_b")
    )
    merged = (
        ma.union(mb)
        .groupBy("ga", "gb", "__frac")
        .agg(F.max("in_a").alias("in_a"), F.max("in_b").alias("in_b"))
    )
    w2 = Window.partitionBy("ga", "gb").orderBy("__frac")
    top = merged.withColumn("__rn", F.row_number().over(w2)).filter(F.col("__rn") <= k)
    pairstats = top.groupBy("ga", "gb").agg(
        F.count("*").cast("bigint").alias("n_merged"),
        F.max("__frac").alias("__kth"),
        F.sum(F.col("in_a") * F.col("in_b")).cast("bigint").alias("n_both"),
    )
    sizes = d.groupBy(group_col).agg(F.count("*").cast("bigint").alias("n"))
    common = (
        d.alias("p")
        .join(
            d.alias("q"),
            (F.col(f"p.{value_col}") == F.col(f"q.{value_col}"))
            & (F.col(f"p.{group_col}") < F.col(f"q.{group_col}")),
        )
        .groupBy(
            F.col(f"p.{group_col}").alias("ga"), F.col(f"q.{group_col}").alias("gb")
        )
        .agg(F.count("*").cast("bigint").alias("n_common"))
    )
    na = sizes.select(F.col(group_col).alias("ga"), F.col("n").alias("n_a"))
    nb = sizes.select(F.col(group_col).alias("gb"), F.col("n").alias("n_b"))
    return (
        pairstats.join(F.broadcast(na), "ga")
        .join(F.broadcast(nb), "gb")
        .join(F.broadcast(common), ["ga", "gb"], "left")
        .select(
            F.col("ga").alias("group_a"),
            F.col("gb").alias("group_b"),
            "n_a",
            "n_b",
            F.coalesce(F.col("n_common"), F.lit(0)).cast("bigint").alias("n_common"),
            (F.col("n_a") + F.col("n_b") - F.coalesce(F.col("n_common"), F.lit(0)))
            .cast("bigint")
            .alias("n_union"),
            (
                F.coalesce(F.col("n_common"), F.lit(0)).cast("double")
                / (F.col("n_a") + F.col("n_b") - F.coalesce(F.col("n_common"), F.lit(0))).cast(
                    "double"
                )
            ).alias("jaccard_exact"),
            (
                F.col("n_both").cast("double")
                / F.least(F.lit(k), F.col("n_merged")).cast("double")
            ).alias("jaccard_est"),
            F.when(F.col("n_merged") < k, F.col("n_merged").cast("double"))
            .otherwise(F.lit(float(k - 1)) / F.col("__kth"))
            .cast("double")
            .alias("union_est"),
        )
    )


def oracle_kmv_overlap(table: str, group_col: str, value_col: str, k: int = 64) -> str:
    frac = (
        f"CAST(('0x' || substr(md5(CAST(v AS VARCHAR)), 1, 15)) AS BIGINT)"
        f" / {float(1 << 60)!r}"
    )
    return f"""
    WITH d AS (
      SELECT DISTINCT {group_col} AS g, {value_col} AS v FROM {table}
      WHERE {value_col} IS NOT NULL
    ), h AS (
      SELECT g, {frac} AS frac FROM d
    ), r AS (
      SELECT g, frac, row_number() OVER (PARTITION BY g ORDER BY frac) AS rn
      FROM h
    ), sk AS (SELECT g, frac FROM r WHERE rn <= {k}),
    pairs AS (
      SELECT x.g AS ga, y.g AS gb
      FROM (SELECT DISTINCT g FROM d) x, (SELECT DISTINCT g FROM d) y
      WHERE x.g < y.g
    ),
    m AS (
      SELECT ga, gb, frac, max(in_a) AS in_a, max(in_b) AS in_b FROM (
        SELECT p.ga, p.gb, s.frac, 1 AS in_a, 0 AS in_b
        FROM pairs p JOIN sk s ON p.ga = s.g
        UNION ALL
        SELECT p.ga, p.gb, s.frac, 0 AS in_a, 1 AS in_b
        FROM pairs p JOIN sk s ON p.gb = s.g
      ) GROUP BY ga, gb, frac
    ),
    t AS (
      SELECT ga, gb, frac, in_a, in_b,
             row_number() OVER (PARTITION BY ga, gb ORDER BY frac) AS rn
      FROM m
    ),
    ps AS (
      SELECT ga, gb, count(*) AS n_merged, max(frac) AS kth,
             sum(in_a * in_b) AS n_both
      FROM t WHERE rn <= {k} GROUP BY ga, gb
    ),
    sizes AS (SELECT g, count(*) AS n FROM d GROUP BY g),
    com AS (
      SELECT p.g AS ga, q.g AS gb, count(*) AS n_common
      FROM d p JOIN d q ON p.v = q.v AND p.g < q.g
      GROUP BY p.g, q.g
    )
    SELECT ps.ga AS group_a, ps.gb AS group_b,
           CAST(na.n AS BIGINT) AS n_a, CAST(nb.n AS BIGINT) AS n_b,
           CAST(coalesce(com.n_common, 0) AS BIGINT) AS n_common,
           CAST(na.n + nb.n - coalesce(com.n_common, 0) AS BIGINT) AS n_union,
           CAST(coalesce(com.n_common, 0) AS DOUBLE)
           / CAST(na.n + nb.n - coalesce(com.n_common, 0) AS DOUBLE) AS jaccard_exact,
           CAST(ps.n_both AS DOUBLE)
           / CAST(least({k}, ps.n_merged) AS DOUBLE) AS jaccard_est,
           CAST(CASE WHEN ps.n_merged < {k} THEN ps.n_merged
                     ELSE ({k} - 1) / ps.kth END AS DOUBLE) AS union_est
    FROM ps
    JOIN sizes na ON ps.ga = na.g
    JOIN sizes nb ON ps.gb = nb.g
    LEFT JOIN com ON ps.ga = com.ga AND ps.gb = com.gb
    """
