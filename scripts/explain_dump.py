"""Dump .explain("formatted") for named registry queries to plans/r12/.

Usage: python scripts/explain_dump.py <suffix> <query> [query ...]
       python scripts/explain_dump.py before grf_ppr grf_hits

Writes plans/r12/<query>_<suffix>.txt for each query. Building a query may
run driver-side knob jobs (kmeans fits, counts) — that is part of the plan
being audited, not an error. SPARK_GRAFT_SF_DIR picks the data (default
sf0.1, the bench point, so plan shapes match what the bench measures).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    suffix = sys.argv[1]
    names = sys.argv[2:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "plans", "r12"
    )
    os.makedirs(out_dir, exist_ok=True)

    from hadoop_2_7_1_spark.queries import REGISTRY
    from hadoop_2_7_1_spark.session import get_spark

    spark = get_spark("explain_dump")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        df = REGISTRY[name].fn(spark, sf_dir)
        plan = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        path = os.path.join(out_dir, f"{name}_{suffix}.txt")
        with open(path, "w") as fh:
            fh.write(plan)
        print(f"wrote {path} ({len(plan.splitlines())} lines)")
    spark.stop()


if __name__ == "__main__":
    main()
