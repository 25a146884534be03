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


def distcp(
    spark: SparkSession,
    src: str,
    dst: str,
    update: bool = False,
    delete: bool = False,
) -> int:
    """Parallel recursive copy: build the file listing (the reference's
    "listing job"), then copy files executor-side, one task per partition.

    ``update`` reproduces DistCp's ``-update`` sync (CopyMapper skips files
    whose size already matches the target); ``delete`` reproduces
    ``-delete`` (remove target files with no source counterpart). The
    listing is metadata-only — file *bytes* never flow through the driver;
    each task streams its own files. Returns the number of files copied.
    """
    src_root = src.replace("file:", "")

    def rel_of(path: str) -> str:
        return os.path.relpath(path.replace("file:", ""), src_root)

    if update or delete:
        src_meta = {rel_of(r.path): r.size for r in listing(spark, src).collect()}
        dst_meta: dict[str, int] = {}
        for base, _, files in os.walk(dst):
            for f in files:
                p = os.path.join(base, f)
                dst_meta[os.path.relpath(p, dst)] = os.path.getsize(p)
        if delete:
            for rel in set(dst_meta) - set(src_meta):
                os.remove(os.path.join(dst, rel))
        to_copy = {
            rel for rel, size in src_meta.items()
            if not update or dst_meta.get(rel) != size
        }
        if not to_copy:
            return 0
        # scan only the files that actually need copying — skipped files'
        # bytes are never read (the reference's CopyMapper skip is per-map;
        # ours prunes at the scan)
        load_paths = [os.path.join(src_root, rel) for rel in sorted(to_copy)]
    else:
        load_paths = [src]

    files_df = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(load_paths)
        .select("path", "content")
    )

    def copy_partition(rows):
        for row in rows:
            rel = rel_of(row.path)
            target = os.path.join(dst, rel)
            os.makedirs(os.path.dirname(target), exist_ok=True)
            with open(target, "wb") as f:
                f.write(row.content)
            yield (row.path,)

    copied = files_df.rdd.mapPartitions(copy_partition).count()
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
