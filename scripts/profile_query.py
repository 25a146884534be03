"""Per-query profile: split driver-side build time (spec.fn — includes any
knob jobs / iterative training collects) from execution time (noop write),
and report how many Spark jobs each phase submitted.

Usage: python scripts/profile_query.py <query> [query ...]
       SPARK_GRAFT_SF_DIR picks the data dir (default sf0.1).

Two passes per query, reporting the second (warm) pass: the first pays JVM
JIT + listing warmup that the bench's min-of-3 also absorbs.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from hadoop_2_7_1_spark.queries import REGISTRY
    from hadoop_2_7_1_spark.session import get_spark

    spark = get_spark("profile_query")
    spark.sparkContext.setLogLevel("ERROR")
    sc = spark.sparkContext
    try:
        spark.read.parquet(os.path.join(sf_dir, "lineitem.parquet")).count()
    except Exception:
        pass

    def n_jobs() -> int:
        return len(sc.statusTracker().getJobIdsForGroup(None))

    for name in names:
        for pas in range(2):
            spark.catalog.clearCache()
            for jrdd in sc._jsc.getPersistentRDDs().values():
                jrdd.unpersist()
            j0 = n_jobs()
            t0 = time.time()
            df = REGISTRY[name].fn(spark, sf_dir)
            t1 = time.time()
            j1 = n_jobs()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.time()
            j2 = n_jobs()
            if pas == 1:
                print(
                    f"{name}: build {t1 - t0:.2f}s ({j1 - j0} jobs), "
                    f"exec {t2 - t1:.2f}s ({j2 - j1} jobs), "
                    f"total {t2 - t0:.2f}s"
                )
    spark.stop()


if __name__ == "__main__":
    main()
