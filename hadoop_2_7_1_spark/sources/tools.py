"""Data-movement tools.

Reference (SURVEY.md §2.12):
- ``DistCp`` (hadoop-tools/hadoop-distcp/.../DistCp.java, CopyMapper.java:50)
  — listing job + one map per file → :func:`distcp`
- ``HadoopArchives`` (hadoop-tools/hadoop-archives/.../HadoopArchives.java:79)
  — pack many small files into an indexed archive → :func:`compact`
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def distcp(spark: SparkSession, src: str, dst: str) -> int:
    """Parallel recursive copy: build the file listing (the reference's
    "listing job"), then copy files executor-side, one task per partition.

    Bytes never flow through the driver; each task streams its files
    directly. Returns the number of files copied.
    """
    listing = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(src)
        .select("path", "content")
    )

    def copy_partition(rows):
        for row in rows:
            rel = os.path.relpath(row.path.replace("file:", ""), src.replace("file:", ""))
            target = os.path.join(dst, rel)
            os.makedirs(os.path.dirname(target), exist_ok=True)
            with open(target, "wb") as f:
                f.write(row.content)
            yield (row.path,)

    copied = listing.rdd.mapPartitions(copy_partition).count()
    return copied


def compact(
    spark: SparkSession, src_glob: str, dst: str, target_files: int = 1, fmt: str = "parquet"
) -> None:
    """HadoopArchives analogue: many small files → few large columnar files.

    coalesce (not repartition): merging small inputs needs no shuffle.
    """
    df = spark.read.format(fmt).load(src_glob)
    df.coalesce(target_files).write.mode("overwrite").format(fmt).save(dst)


def write_bloom_indexed(df: DataFrame, key: str, dst: str, n_files: int = 4) -> None:
    """BloomMapFile analogue (IO/BloomMapFile.java:49): a key-sorted columnar
    table with a per-file bloom filter on the key for fast negative lookups.

    MapFile's sorted index → ``repartitionByRange`` + ``sortWithinPartitions``
    (parquet min/max row-group stats become the index, so a point predicate
    prunes to one file and a few row groups); BloomMapFile's filter →
    parquet's native bloom filter, which serves scan-time membership tests
    for keys that defeat min/max pruning (high-cardinality, non-clustered).
    """
    (
        df.repartitionByRange(n_files, key)
        .sortWithinPartitions(key)
        .write.mode("overwrite")
        .option(f"parquet.bloom.filter.enabled#{key}", "true")
        .option(f"parquet.bloom.filter.expected.ndv#{key}", str(max(df.count(), 1)))
        .parquet(dst)
    )


def point_lookup(spark: SparkSession, path: str, key: str, value) -> DataFrame:
    """MapFile.Reader.get analogue: predicate-pushed point read over a
    bloom-indexed table. The filter reaches the parquet scan (PushedFilters),
    so non-matching files/row groups are skipped without decoding."""
    return spark.read.parquet(path).filter(F.col(key) == F.lit(value))


def listing(spark: SparkSession, path: str) -> DataFrame:
    """DistCp's listing phase as a first-class DataFrame (path, size, mtime)."""
    return (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(path)
        .select("path", F.col("length").alias("size"), F.col("modificationTime").alias("mtime"))
    )
