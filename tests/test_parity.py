"""Differential oracle parity: every registered query with an oracle runs in
both PySpark and DuckDB over the same parquet; results must match under the
driver's canonicalization. Mirrors the reference's oracle pattern
(TestWordStats.java:49: reimplement independently, assert equality)."""

from __future__ import annotations

import pytest

from hadoop_2_7_1_spark.queries import REGISTRY

from .conftest import SF_DIR, assert_frames_match

ORACLE_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is not None)
ROWS_ONLY_QUERIES = sorted(n for n, s in REGISTRY.items() if s.oracle is None)


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_parity(spark, oracle, name):
    spec = REGISTRY[name]
    spark_pdf = spec.fn(spark, SF_DIR).toPandas()
    duck_pdf = oracle.sql(spec.oracle).df()
    assert_frames_match(spark_pdf, duck_pdf, name)


@pytest.mark.parametrize("name", ROWS_ONLY_QUERIES)
def test_rows_only_queries_run(spark, name):
    spec = REGISTRY[name]
    out = spec.fn(spark, SF_DIR)
    rows = out.collect()
    assert len(rows) >= 0
    assert out.schema is not None
