"""Declared query registry.

Every operator claimed done in SURVEY.md §2 registers here as a
(name → QuerySpec) entry: a PySpark callable ``(spark, sf_dir) -> DataFrame``
plus, when SQL-expressible, the equivalent DuckDB oracle SQL. The driver's
correctness gate runs both sides at sf0.01 and hash-compares; our pytest
parity suite runs the identical comparison at sf0.001.

Column-name contract: every computed column is aliased identically in the
Spark plan and the oracle SQL (the driver sorts columns by name before
hashing).
"""

from __future__ import annotations

from collections.abc import Callable
from dataclasses import dataclass

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]


@dataclass(frozen=True)
class QuerySpec:
    name: str
    fn: QueryFn
    oracle: str | None  # DuckDB SQL; None -> rows-only check
    doc: str = ""


REGISTRY: dict[str, QuerySpec] = {}


def register(name: str, oracle: str | None, doc: str = "") -> Callable[[QueryFn], QueryFn]:
    def deco(fn: QueryFn) -> QueryFn:
        if name in REGISTRY:
            raise ValueError(f"duplicate query name {name}")
        REGISTRY[name] = QuerySpec(name, fn, oracle, doc)
        return fn

    return deco


# The external driver samples the FIRST 50 registry entries for its oracle
# gate, so ordering is part of the contract. The window ROTATES each round so
# that every registered query earns a driver-verified CORRECTNESS row at
# least once (r1+r2 covered the reference example suite, TPC-H, and the
# flagship dedup/similarity/text/event operators — 72 distinct names).
#
# Round-3 window = the three queries fixed this round (TIMESTAMP_NTZ
# normalization: evt_sessionize/tmp_range_join; checksum BIGINT:
# bench_teragen_gensort) so the fixes earn green driver rows, followed by 47
# never-sampled queries. Rotate in round 4: the 8 deferred close siblings
# of already-green queries (agg_cube/agg_grouping_sets ~ agg_rollup,
# src_regex_filter ~ src_md5_sample, smp_train_test_split ~ smp_stratified,
# txt_vocab ~ txt_oov, bench_gridmix_load ~ bench_rumen_digest,
# evt_retention ~ evt_funnel, dd_incremental_ingest ~ dd_chunk_dedup) plus
# the queries added during round 3 (mm_resize_pixels, txt_unigram_logprob,
# txt_bpe_merges, cur_zorder_key).
_DRIVER_WINDOW = [
    # fixed this round — re-verify
    "evt_sessionize", "tmp_range_join", "bench_teragen_gensort",
    # never-driver-sampled tail
    "tq2_min_cost_supplier", "tq11_important_stock",
    "tq12_shipping_priority_mix",
    "q24_compose_join", "q25_random_text", "q26_pentomino", "q27_sudoku",
    "bench_terasort_big", "bench_rumen_digest",
    "mm_decode_meta",
    "src_md5_sample", "src_fixed_width", "src_bucketed_join",
    "agg_rollup", "agg_uniq_capped", "agg_salted_skew", "agg_salted_join",
    "agg_kmv_distinct", "agg_cms_heavy", "agg_bloom_prune",
    "agg_group_quantiles",
    "dd_simhash_pairs", "dd_containment",
    "smp_stratified", "smp_mixture", "smp_temperature",
    "prof_lineitem",
    "txt_repetition", "txt_tfidf_topterms", "txt_bm25", "txt_oov",
    "txt_encode_ids", "txt_winnow",
    "cur_decontaminate", "cur_pack_sequences", "cur_global_shuffle",
    "cur_upsert_merge", "cur_length_buckets", "cur_dataset_card",
    "evt_correlate", "evt_funnel", "evt_anomaly",
    "tmp_asof_tolerance",
    "sim_kmeans_sizes", "sim_pq_adc",
    "grf_pagerank", "grf_triangles",
]


def _ordered_names() -> list[str]:
    window = {n: i for i, n in enumerate(_DRIVER_WINDOW)}
    names = list(REGISTRY)
    reg_index = {n: i for i, n in enumerate(names)}
    return sorted(names, key=lambda n: (0, window[n]) if n in window else (1, reg_index[n]))


def queries() -> dict[str, QueryFn]:
    return {name: REGISTRY[name].fn for name in _ordered_names()}


def oracle_sql() -> dict[str, str]:
    return {
        name: REGISTRY[name].oracle
        for name in _ordered_names()
        if REGISTRY[name].oracle is not None
    }


# Import query modules for their registration side effects.
from . import reference  # noqa: E402,F401
from . import tpch  # noqa: E402,F401
from . import extras  # noqa: E402,F401
