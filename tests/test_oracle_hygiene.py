"""Guards for the two cross-engine oracle defect classes the sf0.1
full-registry parity sweep surfaced (round 8 continuation):

1. A computed DOUBLE cast to DECIMAL(38,x) on the hash surface is NOT
   quantized identically by DuckDB (double-arithmetic multiply+rint) and
   Spark (exact-expansion HALF_UP) — 19.5206395 casts to 19.520639 vs
   19.520640. The Brandes contributions now quantize via
   cast(round(x * 1e6) as bigint); these tests pin that the decimal cast
   never comes back.

2. DuckDB re-executes a non-MATERIALIZED CTE per reference, so unrolled
   Lloyd chains (cent{i} referenced twice per round) re-run their
   upstream multiplicatively — the sim_ivf_pq oracle took >58 min at
   sf0.1 before the chains were MATERIALIZED, seconds after.
"""

from __future__ import annotations

import re

from hadoop_2_7_1_spark.operators import graph, similarity

EDGES = "SELECT 'a' AS src, 'b' AS dst"


def test_betweenness_oracles_carry_no_double_to_decimal_cast():
    for sql in (
        graph.oracle_betweenness_sampled(EDGES, ["a"], depth=3),
        graph.oracle_edge_betweenness_sampled(EDGES, ["a"], depth=3),
    ):
        assert "DECIMAL" not in sql.upper()
        # the scaled-bigint quantization must be present instead
        assert "round(" in sql and "AS BIGINT" in sql
        assert "/ 1000000.0" in sql


def test_kmeans_and_pq_oracle_chains_are_materialized():
    km = similarity._oracle_kmeans_ctes("embeddings", k=8, n_iter=2, dim=64)
    pq = similarity._oracle_pq_ctes("embeddings", m=4, k=8, n_iter=2, dim=64)
    for sql, label in ((km, "kmeans"), (pq, "pq")):
        # every CTE in the unrolled chain must be MATERIALIZED: DuckDB
        # re-executes plain CTEs per reference and each round references
        # the previous centroids twice
        ctes = re.findall(r",?\s*([A-Za-z_0-9{}]+) AS (MATERIALIZED )?\(", sql)
        assert ctes, f"{label}: no CTEs parsed"
        plain = [name for name, mat in ctes if not mat]
        assert not plain, f"{label}: non-materialized CTEs {plain}"


def test_ivf_pq_oracle_builds_on_materialized_chains():
    sql = similarity.oracle_ivf_pq("embeddings", "vec_id < 3")
    # both the coarse chain and all four subspace chains must appear
    assert sql.count("MATERIALIZED") >= 16
