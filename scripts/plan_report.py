"""Regenerate PLANS.md: executed-plan audit of the headline + heaviest
registry queries, with the scale-relevant properties extracted per plan.

Usage: python scripts/plan_report.py [sf_dir]   (default sf0.01)

For each audited query the report records:
- exchange (shuffle) count and their partitioning expressions
- broadcast join count
- WholeStageCodegen span count (JVM-side expression coverage)
- pushed filters / read schema of every parquet scan
- red flags: CartesianProduct, SinglePartition exchanges, global sorts,
  row-at-a-time Python evals

This is the "explain(formatted) and iterate" loop as a persisted artifact:
re-run after plan-affecting changes and diff PLANS.md in review.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

AUDITED = [
    # biggest data movers + one representative per family
    "bench_terasort_big",
    "tq1_pricing_summary",
    "tq3_shipping_priority",
    "tq21_waiting_suppliers",
    "q06_secondary_sort",
    "dd_minhash_lsh",
    "dd_dup_clusters",
    "dd_span_dedup",
    "dd_fuzzy_name_pairs",
    "sim_knn_join",
    "agg_hll_distinct",
    "txt_bigram_logprob",
    "cur_domain_quota",
    "evt_ohlc_bars",
    "evt_sessionize",
    "tmp_gap_fill_locf",
    "grf_bfs_hops",
    "cur_pack_sequences",
    # round-5 additions
    "sim_kmeans_recall_curve",
    "dd_lsh_sweep",
    "sim_pq_recall",
    "evt_ab_test",
    "grf_sssp",
    "tmp_interpolate",
    "prof_expectations",
    "txt_bpe_encode",
    "cur_pipeline_v2",
    "agg_winsorized",
    # round-6 additions
    "cur_pipeline_stream",
    "evt_cusum",
    "tmp_lttb",
    "evt_hll_sliding",
    "txt_line_dedup",
    "txt_kneser_ney",
    "prof_drift_psi",
    "grf_label_prop",
    # round-6 late batch
    "grf_hits",
    "agg_kmv_overlap",
    "sim_embedding_cov",
    "evt_survival",
    "prof_join_skew",
    "grf_ppr",
    "txt_inverted_index",
    "evt_burst",
    "cur_snapshot_diff",
    "smp_resample",
    "agg_jackknife",
    "tmp_seasonal",
    "tmp_ewma",
    "evt_concurrency",
    "prof_fd_audit",
    "tmp_m4",
    "prof_benford",
    "grf_walks",
    "prof_ref_integrity",
    "evt_pareto_tiers",
    "prof_drift_ks",
    "evt_transition_entropy",
    "smp_class_balance",
    "txt_langid_confusion",
    "txt_readability",
    "grf_assortativity",
    "sim_pq_rerank",
    "evt_new_vs_returning",
    # round-6 final batches
    "agg_gini_lorenz",
    "prof_auc",
    "prof_gainlift",
    "txt_keyness",
    "tmp_ccf",
    "evt_assoc_rules",
    "agg_moments",
    "prof_calibration",
    "sim_hubness",
    "txt_zipf",
    "sim_mmr",
    "sim_rrf",
    "sim_rerank_linear",
    "sim_retrieval_quality",
    "sim_simhash_topk",
    "sim_simhash_retrieval",
    "dd_incremental_lsh",
    "sim_kcenter",
    "cur_contamination",
    "evt_power",
    "grf_clustering",
    "evt_interarrival",
    "tmp_sla",
    "txt_entropy_rate",
    "txt_lexical_diversity",
    "prof_outlier_iqr",
    "tmp_theil_sen",
    "evt_stickiness",
    "sim_centroid_drift",
    "agg_group_mode",
    "txt_boilerplate",
    "evt_bot_flags",
    "smp_rebalance",
    "evt_ratio_ci",
    "cur_water_filling",
    "dd_shingle_profile",
    # round-6 continuation batch
    "tmp_holt_linear",
    "tmp_changepoint",
    "tmp_rolling_features",
    "tmp_decompose",
    "sim_threshold_join",
    "smp_sequential_poisson",
    "txt_feature_hashing",
    "src_nested_json",
    "dd_tfidf_cosine",
    "grf_betweenness",
    "tmp_periodogram",
    "tmp_seasonal_anomaly",
    "evt_match_pattern",
    "evt_twap",
    "prof_key_candidates",
    "cur_contrastive_pairs",
    "grf_edge_betweenness",
    "smp_time_split",
    "prof_corr_matrix",
    # round-8: close the bench-extras gap — every bench.py extra now has a
    # PLANS.md entry (these run build-time actions — kmeans/BPE fits, k-core
    # rounds, trace replay — so the audited plan is the FINAL consumer plan
    # downstream of those fits; checkpoint_scans counts the truncations)
    "mm_resize_pixels",
    "txt_bpe_merges",
    "dd_semdedup",
    "grf_kcore",
    "dd_keeplist",
    "evt_rfm_segments",
    "txt_train_lr",
    "sim_ivf_pq",
    # (bench_gridmix_replay is not a registry query — bench.py drives
    # loadmodel.gridmix_replay directly; its plan is the replay executor's)
]


def audit(plan: str) -> dict:
    final = plan.split("== Initial Plan ==")[0]
    exchanges = re.findall(r"Exchange (\w+)\(([^)]*)", final)
    return {
        "exchanges": len([e for e in exchanges if e[0] != "SinglePartition"]),
        "single_partition": len(
            [1 for line in final.splitlines() if "SinglePartition" in line]
        ),
        "broadcasts": final.count("BroadcastExchange"),
        # codegen'd operators print as `*(n) NodeName` in the tree string
        "codegen_spans": len(set(re.findall(r"\*\((\d+)\)", final))),
        "pushed": re.findall(r"PushedFilters: \[([^\]]*)\]", final),
        "read_schemas": re.findall(r"ReadSchema: struct<([^>]*)", final),
        "cartesian": "CartesianProduct" in final,
        # a localCheckpoint-ed upstream frame appears as an ExistingRDD scan:
        # the exchanges that BUILT it are not in this plan — count the
        # truncation points so the report never silently under-states shuffles
        "checkpoint_scans": len(re.findall(r"Scan ExistingRDD", final)),
        "python_nodes": [
            n
            for n in ("BatchEvalPython", "MapInPandas", "ArrowEvalPython")
            if n in final
        ],
    }


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    from pyspark.sql import SparkSession

    from hadoop_2_7_1_spark.queries import REGISTRY

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")

    lines = [
        "# PLANS.md — executed-plan audit (regenerate: "
        "`python scripts/plan_report.py`)",
        "",
        f"Scale factor: `{sf_dir}`. Properties extracted from the FINAL "
        "(AQE-resolved) executed plan after running each query.",
        "",
    ]
    for name in AUDITED:
        df = REGISTRY[name].fn(spark, sf_dir)
        df.collect()
        plan = df._jdf.queryExecution().executedPlan().toString()
        a = audit(plan)
        flags = []
        if a["cartesian"]:
            flags.append("CARTESIAN!")
        if a["python_nodes"]:
            flags.append("python: " + ",".join(a["python_nodes"]))
        pushed = [p for p in a["pushed"] if p]
        lines += [
            f"## {name}",
            "",
            f"- shuffles: {a['exchanges']} keyed"
            + (f" + {a['single_partition']} single-partition (scalar/limit)"
               if a["single_partition"] else ""),
            f"- broadcast joins: {a['broadcasts']}",
            f"- whole-stage codegen spans: {a['codegen_spans']}",
            f"- pushed filters: {pushed if pushed else 'none needed'}",
            f"- scan columns: {['<' + s + '>' for s in a['read_schemas']]}",
        ]
        if a["checkpoint_scans"]:
            lines.append(
                f"- checkpoint-truncated inputs: {a['checkpoint_scans']} "
                "(iterative operator; per-round exchanges live in the "
                "checkpointed upstream jobs — see the operator docstring "
                "for the full shuffle accounting)"
            )
        if flags:
            lines.append(f"- FLAGS: {'; '.join(flags)}")
        lines.append("")
    out = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "PLANS.md")
    with open(out, "w") as fh:
        fh.write("\n".join(lines))
    print(f"wrote {out} ({len(AUDITED)} queries)")


if __name__ == "__main__":
    main()
