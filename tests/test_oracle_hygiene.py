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


def _multi_ref_plain_ctes(sql: str) -> list[str]:
    """CTE names defined without MATERIALIZED but referenced 2+ times —
    the pattern DuckDB re-executes per reference (grf_kcore's oracle
    filled the disk with temp spill at sf0.5 this way)."""
    out = []
    for cte, mat in re.findall(r"([A-Za-z_0-9]+) AS (MATERIALIZED )?\(", sql):
        if mat:
            continue
        refs = len(re.findall(rf"(?:FROM|JOIN)\s+{cte}\b", sql))
        if refs > 1:
            out.append(f"{cte}x{refs}")
    return out


def test_graph_oracles_have_no_multi_ref_plain_ctes():
    E = "SELECT 'a' AS src, 'b' AS dst"
    EW = "SELECT 'a' AS src, 'b' AS dst, 1.0 AS w"
    L = "SELECT 'a' AS node, 1 AS label"
    oracles = {
        "triangle_count": graph.oracle_triangle_count(E),
        "pagerank": graph.oracle_pagerank(E),
        "kcore": graph.oracle_kcore(E),
        "bfs_hops": graph.oracle_bfs_hops(E, "a"),
        "label_prop": graph.oracle_label_propagation(E),
        "sssp": graph.oracle_sssp(EW, "a"),
        "modularity": graph.oracle_modularity(E, L),
        "hits": graph.oracle_hits(E),
        "ppr": graph.oracle_personalized_pagerank(E, "node = 'a'"),
        "walks": graph.oracle_random_walks(E),
        "assortativity": graph.oracle_assortativity(E),
        "clustering": graph.oracle_clustering_coefficients(E),
        "betweenness": graph.oracle_betweenness_sampled(E, ["a"]),
        "edge_betweenness": graph.oracle_edge_betweenness_sampled(E, ["a"]),
    }
    bad = {n: r for n, r in
           ((n, _multi_ref_plain_ctes(sql)) for n, sql in oracles.items()) if r}
    assert not bad, f"re-execution-prone plain CTEs: {bad}"
