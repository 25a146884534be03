"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Each query is fully materialized through a noop datasource write (every
output column is produced and consumed executor-side), so Catalyst cannot
prune the measured work down to a row count — a plain ``df.count()`` would
let map-only queries degenerate to a parquet count. Row counts come from an
``Observation`` attached to the same job.
"""

from __future__ import annotations

import json
import os
import sys
import time

# The big terasort point measures data movement: 10M rows under the 8g
# session factory. Correctness contexts (plain 1g driver sessions) keep the
# registry default of 2M. Must be set before the registry import builds the
# oracle strings.
os.environ.setdefault("SPARK_GRAFT_TERA_BIG", "10000000")

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

HEADLINE = [
    # TPC-H shapes: scan-agg, broadcast joins, semi/anti, double aggregation
    "tq1_pricing_summary",
    "tq3_shipping_priority",
    "tq5_local_supplier_volume",
    "tq6_forecast_revenue",
    "tq9_product_profit",
    "tq13_customer_distribution",
    "tq18_large_volume_customer",
    "tq21_waiting_suppliers",
    # reference example queries
    "q01_wordcount",
    "q02_grep",
    "q06_secondary_sort",
    "q10_value_histogram",
    "q11_total_sort",
    "q17_distinct",
    # BENCH-1 terasort + north-star pipeline ops
    "bench_terasort_validate",
    "bench_terasort_big",
    "dd_minhash_lsh",
    "dd_dup_clusters",
    "dd_chunk_dedup",
    "txt_quality",
    "evt_sessionize",
    "cur_pipeline_e2e",
    "cur_pack_sequences",
]

# Timed identically but kept OUT of the headline total: trend points for the
# heavy round-4 window queries, so future rounds can compare their cost
# without moving the headline metric (VERDICT r3 bench hygiene).
EXTRAS = [
    "mm_resize_pixels",
    "txt_bpe_merges",
    "dd_semdedup",
    "grf_kcore",
    # round-4 continuation additions: gram-index span dedup (heaviest new
    # shuffle) and the HLL register fold
    "dd_span_dedup",
    "agg_hll_distinct",
    # capstones: exact+near dedup decision; triple two-phase rank
    "dd_keeplist",
    "evt_rfm_segments",
    # round-5 heavies: in-engine GD trainer, trained-quantizer recall
    # curve, banding sweep (3 LSH configs + exact truth), BPE train+apply
    "txt_train_lr",
    "sim_kmeans_recall_curve",
    "dd_lsh_sweep",
    "txt_bpe_encode",
    # round-6 heavies: IVF-PQ (coarse + per-subspace trainings), C4 line
    # dedup (line-keyed window + per-doc rebuild), streaming-capstone batch
    # twin, KN LM scoring (three count tables + scoring joins)
    "sim_ivf_pq",
    "txt_line_dedup",
    "cur_pipeline_stream",
    "txt_kneser_ney",
    # round-6 late heavies: sketch set algebra (pairwise merge), HITS
    # (4 keyed shuffles/round x2), PPR (same), the 152-cell wide moment
    # aggregate, and the two-phase systematic resample
    "agg_kmv_overlap",
    "grf_hits",
    "grf_ppr",
    "sim_embedding_cov",
    "smp_resample",
    # round-6 final batches: corpus-to-corpus kNN hubness (Σ bucket²),
    # per-node clustering coefficients (wedge enumeration + explode),
    # train/eval shingle containment, greedy MMR rounds over the
    # shortlist, and the B²-pair Theil-Sen median
    "sim_hubness",
    "grf_clustering",
    "cur_contamination",
    "sim_mmr",
    "tmp_theil_sen",
    # round-6 continuation: Brandes pivots (8 unrolled join rounds over
    # the 2.4M-edge graph — the heaviest graph op by design), df-capped
    # pairwise TF-IDF cosine (Σ df² postings join), and the Hamming-1
    # bucketed range join
    "grf_betweenness",
    "dd_tfidf_cosine",
    "sim_threshold_join",
    # round-10: the retrieval-quality eval pays a brute-force truth pass
    # (|queries| x |corpus| dots) on top of the bucketed retriever — the
    # most deliberate "expensive audit" in the registry; trend it
    "sim_retrieval_quality",
    # round-11: the SimHash serving path (O(N) popcounts + O(budget) dots
    # per query, fixed panel) and its eval — the slope gate must see the
    # recall fix stay linear as N grows — plus the incremental LSH
    # admission (collision detection, no pair enumeration: the slope
    # receipt proves the semi-join shape stays linear)
    "sim_simhash_topk",
    "sim_simhash_retrieval",
    "dd_incremental_lsh",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    sf = os.path.basename(os.path.normpath(sf_dir)).replace("sf", "")
    try:
        sf_num = float(sf)
    except ValueError:
        sf_num = sf

    from hadoop_2_7_1_spark.queries import REGISTRY
    from hadoop_2_7_1_spark.session import get_spark

    spark = get_spark("bench")
    spark.sparkContext.setLogLevel("ERROR")

    # Warm the JVM + file listing once so per-query times measure the plans.
    try:
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    except Exception as exc:  # noqa: BLE001
        print(f"# warmup failed: {exc}", file=sys.stderr)

    from pyspark.sql import Observation
    from pyspark.sql import functions as F

    # Three fully-materialized passes per query, keeping the minimum: ambient
    # scheduling noise on a shared box swings single measurements 1.5-2x, and
    # the FIRST queries additionally pay JVM JIT warmup (tq1 runs first and
    # measured 2.1s min-of-2 cold vs 0.98s min-of-4 warm on identical code,
    # r6) — min-of-3 absorbs both. All passes do identical work (noop write
    # of every output column).
    n_passes = int(os.environ.get("SPARK_GRAFT_BENCH_PASSES", "3"))
    times: dict[str, float] = {}
    errors: dict[str, str] = {}
    # Per-query isolation: one broken query must never take down the whole
    # artifact (round 2 lost ALL bench numbers to a single AnalysisException).
    extra_times: dict[str, float] = {}

    def drop_block_debris() -> None:
        """Unpersist SQL cache AND the RDD blocks localCheckpoint leaves
        behind. The iterative operators (graph fixed-points, Brandes,
        greedy selections) localCheckpoint per round; those blocks live in
        the 8g heap until GC, so a query benched LATE in the session pays
        the earlier queries' memory pressure — measured sim_threshold_join
        (last in EXTRAS) at 20.4s in-session vs 12.0s solo on identical
        code/data/knobs at sf0.5. Per-query isolation is the point of this
        harness, so scrub between queries; each timed pass rebuilds its
        own state from parquet, so nothing measured is lost."""
        spark.catalog.clearCache()
        jrdds = spark.sparkContext._jsc.getPersistentRDDs()
        for jrdd in jrdds.values():
            jrdd.unpersist()

    def run_one(name: str, sink: dict[str, float]) -> None:
        drop_block_debris()
        spec = REGISTRY[name]
        best, n = None, 0
        try:
            for _ in range(n_passes):
                t0 = time.time()
                df = spec.fn(spark, sf_dir)
                obs = Observation()
                df.observe(obs, F.count(F.lit(1)).alias("n")).write.format(
                    "noop"
                ).mode("overwrite").save()
                n = obs.get["n"]
                elapsed = time.time() - t0
                best = elapsed if best is None else min(best, elapsed)
        except Exception as exc:  # noqa: BLE001 — report, keep benching
            errors[name] = f"{type(exc).__name__}: {exc}"[:500]
            print(f"# {name}: FAILED {errors[name][:120]}", file=sys.stderr)
            return
        sink[name] = round(best, 3)
        print(f"# {name}: {sink[name]}s ({n} rows)", file=sys.stderr)

    for name in HEADLINE:
        run_one(name, times)
    for name in EXTRAS:
        run_one(name, extra_times)

    # Gridmix replay executor (VERDICT r4 #5): submit a 12-job synthetic mix
    # at 4-wide saturation (StressJobFactory shape) and record the makespan.
    # Trend-only, like EXTRAS — concurrency scheduling noise must not move
    # the headline metric.
    try:
        from hadoop_2_7_1_spark.io import load_table
        from hadoop_2_7_1_spark.operators import loadmodel

        trace = loadmodel.job_trace(load_table(spark, sf_dir, "orders"))
        gm_summary, _ = loadmodel.gridmix_replay(
            spark, sf_dir, trace, mode="stress", max_jobs=12, stress_width=4
        )
        extra_times["bench_gridmix_replay"] = gm_summary["makespan_s"]
        print(
            f"# bench_gridmix_replay: {gm_summary['makespan_s']}s makespan, "
            f"{gm_summary['n_jobs']} jobs, eff-concurrency "
            f"{gm_summary['effective_concurrency']} "
            f"({gm_summary['n_failed']} failed)",
            file=sys.stderr,
        )
    except Exception as exc:  # noqa: BLE001
        errors["bench_gridmix_replay"] = f"{type(exc).__name__}: {exc}"[:500]

    total = round(sum(times.values()), 3)
    summary = {
        "metric": "headline_queries_total_wall",
        "value": total,
        "unit": "sec",
        "queries": times,
        "sf": sf_num,
    }
    if extra_times:
        summary["extras"] = extra_times  # trend-only, excluded from value
    if errors:
        summary["errors"] = errors
    print(json.dumps(summary))
    spark.stop()


if __name__ == "__main__":
    main()
