"""Fixed-length record source.

Reference: ``FixedLengthInputFormat`` + ``FixedLengthRecordReader``
(MRC/mapreduce/lib/input/FixedLengthInputFormat.java:50 — every record is
exactly ``recordLength`` bytes, splits snap to record boundaries; the
TeraSort input path reads 100-byte records this way).

Spark-first design: a fixed-length *text* file is one line per record (the
common case) and goes through ``spark.read.text`` — fully split-parallel.
A headerless fixed-length *binary* file has no row delimiter, so we read
per-file blobs (``binaryFile``) and explode slices; parallelism is per-file.
At 100 TB you shard input into many files (as the reference's writers do),
so per-file parallelism is the natural unit there too; within-file split
would need a custom DataSource, which the slice math here would port into.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

FieldSpec = list[tuple[str, int, int]]  # (name, start_1_based, length)


def parse_fixed_width(col: Column | str, fields: FieldSpec) -> list[Column]:
    """Slice a fixed-width string column into typed columns (codegen-only)."""
    c = F.col(col) if isinstance(col, str) else col
    return [F.substring(c, start, length).alias(name) for name, start, length in fields]


def read_fixed_width_lines(
    spark: SparkSession, path: str, fields: FieldSpec
) -> DataFrame:
    """Fixed-width records, one per line: split-parallel text scan + substring
    projection (stays in whole-stage codegen, no UDF)."""
    df = spark.read.text(path)
    return df.select(*parse_fixed_width("value", fields))


def read_fixed_length_binary(
    spark: SparkSession, path: str, record_len: int
) -> DataFrame:
    """Undelimited fixed-length binary records → one ``binary`` column
    ``record`` plus provenance (file, record index).

    Slice explosion happens executor-side per file; a trailing partial
    record raises (matching FixedLengthRecordReader.java:161, which throws
    ``IOException("Partial record...")`` on truncated input).
    """
    blobs = spark.read.format("binaryFile").load(path).select(
        "path",
        F.when(
            F.length("content") % record_len != 0,
            F.raise_error(
                F.concat(
                    F.lit(
                        f"Partial record: file length not a multiple of {record_len}: "
                    ),
                    F.col("path"),
                )
            ).cast("binary"),
        )
        .otherwise(F.col("content"))
        .alias("content"),
    )
    return blobs.select(
        "path",
        F.posexplode(
            # sequence(1, 0) is DESCENDING in Spark: guard sub-record files.
            F.expr(
                f"CASE WHEN length(content) >= {record_len} THEN "
                f"transform(sequence(1, cast(length(content) / {record_len} as int)), "
                f"i -> substring(content, (i - 1) * {record_len} + 1, {record_len})) "
                f"ELSE array() END"
            )
        ).alias("rec_idx", "record"),
    ).where(F.length("record") == record_len)
