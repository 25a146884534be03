"""Recall-vs-SF receipt for the retriever quality/cost contract (round 11).

Runs the registered retrieval-quality evals (sim_retrieval_quality — the
bucket multi-probe ANN-join path that MEASURED the r10 recall decay — and
sim_simhash_retrieval — the SimHash prefilter + exact-re-rank serving path
that fixes it) at several scale factors and records the mean recall@10 /
nDCG@10 per (retriever, sf) into RECALL_r{N}.json.

The gate (VERDICT r10 #3): the production serving path must hold
recall@10 >= 0.5 across sf0.01 / 0.1 / 0.5 at DEFAULT knobs. The multiprobe
row is kept in the receipt on purpose — it documents the decay the fix
answers, not a defect in the ANN-join operator (whose contract is the
pair bill, audited separately by sim_ann_recall / the 3-point bench).

Usage: python scripts/recall_receipt.py OUT.json [sf_dir ...]
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")

DEFAULT_SFS = [
    "/root/testdata/sf0.01",
    "/root/testdata/sf0.1",
    "/root/repo/.scratch/sf0.5",
]
EVALS = {
    "multiprobe": "sim_retrieval_quality",
    "simhash": "sim_simhash_retrieval",
}
RECALL_FLOOR = 0.5  # the contract the simhash path must meet at every SF


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else "RECALL_r11.json"
    sfs = sys.argv[2:] or DEFAULT_SFS

    from pyspark.sql import SparkSession
    from pyspark.sql import functions as F

    import __spark_entry__ as entry

    spark = (
        SparkSession.builder.master("local[8]")
        .config("spark.sql.shuffle.partitions", "8")
        .config("spark.driver.memory", "8g")
        .appName("recall-receipt")
        .getOrCreate()
    )
    qs = entry.queries()
    receipt: dict = {"floor": RECALL_FLOOR, "rows": []}
    ok = True
    for sf in sfs:
        for retriever, qname in EVALS.items():
            df = qs[qname](spark, sf)
            agg = df.agg(
                F.avg("recall").alias("recall"),
                F.avg("ndcg").alias("ndcg"),
                F.count("*").alias("n_queries"),
            ).collect()[0]
            row = {
                "sf_dir": sf,
                "retriever": retriever,
                "mean_recall_at_10": round(agg["recall"], 4),
                "mean_ndcg_at_10": round(agg["ndcg"], 4),
                "n_queries": agg["n_queries"],
            }
            if retriever == "simhash":
                row["meets_floor"] = agg["recall"] >= RECALL_FLOOR
                ok = ok and row["meets_floor"]
            receipt["rows"].append(row)
            print(json.dumps(row))
    receipt["simhash_meets_floor_everywhere"] = ok
    with open(out_path, "w") as fh:
        json.dump(receipt, fh, indent=2)
    print(f"wrote {out_path}; simhash floor {'MET' if ok else 'MISSED'}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
