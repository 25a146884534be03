"""Registry-wide audit of OUTPUT schemas for non-portable decimal columns.

The r7 driver red (tmp_changepoint) was a DECIMAL(38,0) column on the hash
surface: pandas round-trips high-precision decimals as object-dtype
``decimal.Decimal`` values whose stringification (``1E+15`` vs
``1000000000000000``) differs across duckdb/pandas/pyarrow versions, so an
exact-value match can still hash-mismatch in the driver environment. The
discipline (oracle_corr_matrix, profile.py) is: decimals may appear INSIDE
a computation, but the emitted column must be BIGINT, DOUBLE (rounded), or
an exact digit STRING.

This script builds every registered query at the given SF and reports any
DecimalType column in the OUTPUT schema. Exit 1 if any are found. Run after
registry changes; the result is recorded in COVERAGE.md.

Usage: python scripts/decimal_sweep.py [sf_dir]
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.001"


def main() -> None:
    from pyspark.sql import SparkSession
    from pyspark.sql.types import DecimalType

    from hadoop_2_7_1_spark.queries import REGISTRY

    spark = (
        SparkSession.builder.master("local[8]")
        .appName("decimal_sweep")
        .config("spark.ui.enabled", "false")
        .getOrCreate()
    )
    flagged: list[tuple[str, str, str]] = []
    errors: list[tuple[str, str]] = []
    for name, spec in REGISTRY.items():
        try:
            schema = spec.fn(spark, SF_DIR).schema
        except Exception as ex:  # build-time action failed; report, keep going
            errors.append((name, str(ex)[:120]))
            continue
        for f in schema.fields:
            if isinstance(f.dataType, DecimalType):
                flagged.append((name, f.name, f.dataType.simpleString()))
    for name, col, typ in flagged:
        print(f"DECIMAL OUTPUT: {name}.{col} {typ}")
    for name, err in errors:
        print(f"BUILD ERROR: {name}: {err}")
    print(
        f"\n{len(REGISTRY)} queries swept, {len(flagged)} decimal output "
        f"columns, {len(errors)} build errors"
    )
    sys.exit(1 if flagged or errors else 0)


if __name__ == "__main__":
    main()
