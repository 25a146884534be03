"""Market-basket association rules (engine extra; no reference analogue —
the classic Apriori-style support/confidence/lift readout, expressed as
the two keyed aggregations + one self-equi-join it actually is).

Scale shape: baskets are bounded (an order has a handful of lines), so the
within-basket pair self-join is Σ basket² with a small constant — the same
bounded-blowup argument as the dedup cluster joins, guarded by the
registry-wide no-CartesianProduct plan audit. Everything is exact BIGINT
counts until the final support/confidence/lift divisions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assoc_rules(
    baskets: DataFrame,
    basket_col: str,
    item_col: str,
    min_pair: int = 2,
    top_k: int = 20,
) -> DataFrame:
    """Top-``top_k`` association rules A→B by lift over item pairs
    co-occurring in ≥ ``min_pair`` baskets.

    support = n_ab/n_baskets, confidence = n_ab/n_a,
    lift = n_ab·n_baskets / (n_a·n_b) — each a single division of exact
    BIGINT products, rounded to 6dp, so every engine orders rules
    identically (ties broken by antecedent, consequent). Top-k is a
    TakeOrderedAndProject, never a full global sort.
    Output: (antecedent, consequent, n_ab, n_a, n_b, support,
    confidence, lift).
    """
    items = (
        baskets.select(
            F.col(basket_col).alias("b"), F.col(item_col).cast("bigint").alias("i")
        )
        .distinct()
    )
    n_baskets = items.agg(F.countDistinct("b").cast("bigint").alias("nb"))
    item_cnt = items.groupBy("i").agg(F.count("*").cast("bigint").alias("ci"))
    pairs = (
        items.alias("x")
        .join(items.alias("y"), (F.col("x.b") == F.col("y.b")) & (F.col("x.i") < F.col("y.i")))
        .groupBy(F.col("x.i").alias("i1"), F.col("y.i").alias("i2"))
        .agg(F.count("*").cast("bigint").alias("n_ab"))
        .filter(F.col("n_ab") >= min_pair)
    )
    both = pairs.select("i1", "i2", "n_ab").union(
        pairs.select(F.col("i2").alias("i1"), F.col("i1").alias("i2"), "n_ab")
    )
    joined = (
        both.join(item_cnt.select(F.col("i").alias("i1"), F.col("ci").alias("n_a")), "i1")
        .join(item_cnt.select(F.col("i").alias("i2"), F.col("ci").alias("n_b")), "i2")
        .join(F.broadcast(n_baskets), how="cross")
    )
    scored = joined.select(
        F.col("i1").alias("antecedent"),
        F.col("i2").alias("consequent"),
        "n_ab",
        "n_a",
        "n_b",
        F.round(F.col("n_ab").cast("double") / F.col("nb").cast("double"), 6).alias("support"),
        F.round(F.col("n_ab").cast("double") / F.col("n_a").cast("double"), 6).alias(
            "confidence"
        ),
        F.round(
            (F.col("n_ab") * F.col("nb")).cast("double")
            / (F.col("n_a") * F.col("n_b")).cast("double"),
            6,
        ).alias("lift"),
    )
    return scored.orderBy(F.desc("lift"), F.asc("antecedent"), F.asc("consequent")).limit(
        top_k
    )


def oracle_assoc_rules(
    rows_sql: str, min_pair: int = 2, top_k: int = 20
) -> str:
    """DuckDB twin; ``rows_sql`` yields (b, i) basket-item rows."""
    return f"""
    WITH items AS (SELECT DISTINCT b, CAST(i AS BIGINT) AS i FROM ({rows_sql})),
    nb AS (SELECT CAST(count(DISTINCT b) AS BIGINT) AS nb FROM items),
    item_cnt AS (SELECT i, CAST(count(*) AS BIGINT) AS ci FROM items GROUP BY i),
    pairs AS (
      SELECT x.i AS i1, y.i AS i2, CAST(count(*) AS BIGINT) AS n_ab
      FROM items x JOIN items y ON x.b = y.b AND x.i < y.i
      GROUP BY 1, 2 HAVING count(*) >= {min_pair}
    ),
    bidir AS (
      SELECT i1, i2, n_ab FROM pairs
      UNION ALL SELECT i2, i1, n_ab FROM pairs
    ),
    scored AS (
      SELECT d.i1 AS antecedent, d.i2 AS consequent, d.n_ab, a.ci AS n_a, c.ci AS n_b,
             round(CAST(d.n_ab AS DOUBLE) / CAST(nb.nb AS DOUBLE), 6) AS support,
             round(CAST(d.n_ab AS DOUBLE) / CAST(a.ci AS DOUBLE), 6) AS confidence,
             round(CAST(d.n_ab * nb.nb AS DOUBLE) / CAST(a.ci * c.ci AS DOUBLE), 6) AS lift
      FROM bidir d JOIN item_cnt a ON d.i1 = a.i
                   JOIN item_cnt c ON d.i2 = c.i, nb
    )
    SELECT * FROM scored ORDER BY lift DESC, antecedent, consequent LIMIT {top_k}
    """
