"""JDBC source/sink wrappers.

Reference: ``DBInputFormat`` (LIMIT/OFFSET splits,
MRC/mapreduce/lib/db/DBInputFormat.java:61), ``DataDrivenDBInputFormat``
(min/max key-range splits, DataDrivenDBInputFormat.java:61) and the per-type
splitters (IntegerSplitter/TextSplitter/DateSplitter…), plus ``DBOutputFormat``
(batched INSERTs, DBOutputFormat.java:50).

Spark's JDBC source already implements the *data-driven* strategy — balanced
range predicates on ``partitionColumn`` between lower/upper bounds — which is
the reference's better path (its LIMIT/OFFSET mode rescans on every split).
These wrappers just pin that strategy and the write batching.

Exercised live against embedded Apache Derby (which ships in Spark's jars)
in tests/test_sources.py::test_jdbc_roundtrip_embedded_derby — the same
write→read→aggregate→verify loop the reference runs against HSQLDB
(DBCountPageView.java:350-416).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, DataFrameReader, SparkSession


def read_jdbc_partitioned(
    spark: SparkSession,
    url: str,
    table: str,
    partition_column: str,
    lower_bound: int,
    upper_bound: int,
    num_partitions: int,
    **options: str,
) -> DataFrameReader:
    """DataDrivenDBInputFormat: one balanced range predicate per partition.

    Returns the configured reader (call ``.load()`` against a live database).
    """
    reader = (
        spark.read.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("partitionColumn", partition_column)
        .option("lowerBound", str(lower_bound))
        .option("upperBound", str(upper_bound))
        .option("numPartitions", str(num_partitions))
    )
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader


def write_jdbc_batched(
    df: DataFrame, url: str, table: str, batch_size: int = 1000, mode: str = "append",
    **options: str,
):
    """DBOutputFormat: batched INSERT sink. Returns the configured writer."""
    writer = (
        df.write.format("jdbc")
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
        .mode(mode)
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    return writer
