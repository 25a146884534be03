"""Data-movement tools.

Reference (SURVEY.md §2.12):
- ``DistCp`` (hadoop-tools/hadoop-distcp/.../DistCp.java, CopyMapper.java:50)
  — listing job + one map per file → :func:`distcp`
- ``HadoopArchives`` (hadoop-tools/hadoop-archives/.../HadoopArchives.java:79)
  — pack many small files into an indexed archive → :func:`compact`
"""

from __future__ import annotations

import hashlib
import os
import shutil

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

_CHUNK = 1 << 20  # 1 MiB streaming buffer — files never materialize in memory


def _file_md5(path: str) -> str:
    h = hashlib.md5()
    with open(path, "rb") as f:
        while chunk := f.read(_CHUNK):
            h.update(chunk)
    return h.hexdigest()


def _rel_col(path_col, root: str):
    """URI path column -> path relative to ``root`` (driver-free, codegen)."""
    import re as _re

    norm = F.regexp_replace(path_col, "^file:", "")
    return F.regexp_replace(norm, "^" + _re.escape(root.rstrip("/") + "/"), "")


def _empty_listing(spark: SparkSession) -> DataFrame:
    return spark.createDataFrame([], "path string, size bigint, mtime timestamp")


def distcp(
    spark: SparkSession,
    src: str,
    dst: str,
    update: bool = False,
    delete: bool = False,
    skip_crc_check: bool = False,
    preserve: str = "",
    atomic: bool = False,
    bandwidth_mb: float | None = None,
) -> int:
    """Parallel recursive copy, shaped like the reference's DistCp: a
    metadata-only listing job, then one copy task per file batch
    (CopyMapper.java:50,192 — RetriableFileCopyCommand streams bytes
    FS→FS inside the map task).

    Scale properties:
    - File *bytes* never enter DataFrame rows or the driver; each executor
      task opens its files and streams them in 1 MiB chunks (no 2 GB
      row-size cap, no per-file memory spike).
    - The ``-update``/``-delete`` diff is a join of the src and dst
      *listings* (path, size) — metadata-sized, distributed — never a
      driver-side dict (the old ``.collect()`` + ``os.walk`` approach dies
      at tens of millions of files).
    - ``-update`` skips a file only when size matches AND content checksums
      match, per CopyMapper.canSkip; ``skip_crc_check=True`` reproduces
      ``-skipcrccheck`` (size-only skip). Checksums are computed
      executor-side, streaming, and only for size-matching candidates.
    - ``preserve`` reproduces ``-p[ptug]``
      (DistCpOptions.FileAttribute / CopyMapper.java:192 preserve calls):
      ``p`` permissions, ``t`` timestamps, ``u``/``g`` owner ids — applied
      executor-side from the source file's stat after each copy.
    - ``bandwidth_mb`` reproduces ``-bandwidth``: each copy task paces its
      reads to N MB/s (ThrottledInputStream.java:40 token pacing) so a bulk
      copy cannot saturate shared storage; total throughput ≈ N x tasks,
      as in the reference (per-map cap).
    - ``atomic`` reproduces ``-atomic``: every file lands in a hidden work
      directory next to ``dst`` and one final rename commits the whole tree
      — a killed run leaves NO partial destination (reference: copy to
      ``-tmp`` work path, CopyCommitter commit-by-rename). Incompatible
      with ``update``/``delete``, as in the reference CLI.
      Independently of ``atomic``, each individual file is written to a
      ``.__distcp_tmp__`` sibling and ``os.replace``d, so even a plain copy
      never exposes a half-written file.

    Returns the number of files copied.
    """
    if atomic and (update or delete):
        raise ValueError("-atomic is incompatible with -update/-delete")
    src_root = src.replace("file:", "")
    dst_root = dst.replace("file:", "")
    final_root = None
    if atomic:
        if os.path.exists(dst_root):
            raise FileExistsError(f"-atomic requires missing target: {dst_root}")
        final_root = dst_root
        dst_root = dst_root.rstrip("/") + ".__distcp_work__"

    src_ls = listing(spark, src).select(
        _rel_col(F.col("path"), src_root).alias("rel"),
        F.regexp_replace("path", "^file:", "").alias("src_path"),
        F.col("size").alias("src_size"),
    )
    try:
        dst_ls = listing(spark, dst)
    except Exception:  # destination does not exist yet
        dst_ls = _empty_listing(spark)
    dst_ls = dst_ls.select(
        _rel_col(F.col("path"), dst_root).alias("rel"),
        F.regexp_replace("path", "^file:", "").alias("dst_path"),
        F.col("size").alias("dst_size"),
        # pin the listing snapshot: the delete action below mutates dst, and
        # the copy plan must join against the PRE-delete metadata, not
        # re-scan (which would also fail on just-removed files)
    ).localCheckpoint()

    if delete:
        # dst files with no src counterpart: anti-join on the relative path,
        # removed executor-side (DistCp's CopyCommitter deleteMissing).
        doomed = dst_ls.join(src_ls, "rel", "left_anti").select("dst_path")

        def rm_partition(rows):
            for row in rows:
                try:
                    os.remove(row.dst_path)
                except FileNotFoundError:
                    pass

        doomed.foreachPartition(rm_partition)

    plan = src_ls.join(dst_ls.select("rel", "dst_size"), "rel", "left_outer")
    if update:
        # Size mismatch / missing target always copies; size-equal pairs are
        # checksum-verified executor-side below (unless -skipcrccheck).
        if skip_crc_check:
            plan = plan.where(
                F.col("dst_size").isNull() | (F.col("dst_size") != F.col("src_size"))
            )
    else:
        plan = plan.withColumn("dst_size", F.lit(None).cast("bigint"))

    n_tasks = max(spark.sparkContext.defaultParallelism, 1)
    verify_crc = update and not skip_crc_check

    def copy_partition(rows):
        copied = 0
        for row in rows:
            target = os.path.join(dst_root, row.rel)
            if (
                verify_crc
                and row.dst_size is not None
                and row.dst_size == row.src_size
                and _file_md5(row.src_path) == _file_md5(target)
            ):
                continue  # CopyMapper.canSkip: same length AND same checksum
            os.makedirs(os.path.dirname(target), exist_ok=True)
            tmp = target + ".__distcp_tmp__"
            if bandwidth_mb:
                import time

                budget = bandwidth_mb * (1 << 20)  # bytes/sec for this task
                t0, done = time.monotonic(), 0
                with open(row.src_path, "rb") as fsrc, open(tmp, "wb") as fdst:
                    while chunk := fsrc.read(_CHUNK):
                        fdst.write(chunk)
                        done += len(chunk)
                        ahead = done / budget - (time.monotonic() - t0)
                        if ahead > 0:  # ThrottledInputStream: sleep off the surplus
                            time.sleep(ahead)
            else:
                with open(row.src_path, "rb") as fsrc, open(tmp, "wb") as fdst:
                    shutil.copyfileobj(fsrc, fdst, _CHUNK)
            # fault-injection hook (Hadoop's fi test framework analogue):
            # lets crash-consistency tests kill a run between the temp write
            # and the publish rename. Zero cost unless the env var is set.
            _delay = os.environ.get("SPARK_GRAFT_DISTCP_TEST_DELAY")
            if _delay:
                import time

                time.sleep(float(_delay))
            if preserve:
                st = os.stat(row.src_path)
                if "p" in preserve:
                    os.chmod(tmp, st.st_mode)
                if "u" in preserve or "g" in preserve:
                    try:
                        os.chown(
                            tmp,
                            st.st_uid if "u" in preserve else -1,
                            st.st_gid if "g" in preserve else -1,
                        )
                    except PermissionError:
                        pass  # reference logs + continues without ownership
                if "t" in preserve:
                    os.utime(tmp, (st.st_atime, st.st_mtime))
            os.replace(tmp, target)  # never expose a half-written file
            copied += 1
        yield copied

    n_copied = plan.repartition(n_tasks).rdd.mapPartitions(copy_partition).sum()
    if final_root is not None:
        # commit: one rename publishes the whole tree (CopyCommitter)
        os.makedirs(dst_root, exist_ok=True)  # empty source still commits
        os.rename(dst_root, final_root)
    return n_copied


def distch(spark: SparkSession, specs: list[str], recursive: bool = True) -> int:
    """DistCh (hadoop-tools/hadoop-extras .../tools/DistCh.java): distributed
    chmod/chown/chgrp. Each spec is ``path:owner:group:mode`` with empty
    fields left unchanged (DistCh's FileOperation format); ``mode`` is octal.

    Shape: one metadata listing per spec root, attribute changes applied
    executor-side per partition — the same listing-job + per-file map-task
    split as the reference (and as :func:`distcp`). Returns files changed.
    """
    import grp as _grp
    import pwd as _pwd

    total = 0
    for spec in specs:
        parts = (spec + ":::").split(":")
        root, owner, group, mode = parts[0], parts[1], parts[2], parts[3]
        uid = _pwd.getpwnam(owner).pw_uid if owner else -1
        gid = _grp.getgrnam(group).gr_gid if group else -1
        mode_int = int(mode, 8) if mode else None
        root_abs = root.replace("file:", "")
        if os.path.isfile(root_abs):
            paths = spark.createDataFrame([(root_abs,)], "p string")
        elif recursive:
            paths = listing(spark, root).select(
                F.regexp_replace("path", "^file:", "").alias("p")
            )
        else:
            names = [
                (os.path.join(root_abs, n),)
                for n in os.listdir(root_abs)
                if os.path.isfile(os.path.join(root_abs, n))
            ]
            paths = spark.createDataFrame(names or [], "p string")

        def change(rows):
            n = 0
            for row in rows:
                try:
                    if mode_int is not None:
                        os.chmod(row.p, mode_int)
                    if uid != -1 or gid != -1:
                        os.chown(row.p, uid, gid)
                    n += 1
                except (PermissionError, FileNotFoundError):
                    pass  # reference logs + continues
            yield n

        total += paths.rdd.mapPartitions(change).sum()
    return int(total)


def logalyzer(
    spark: SparkSession,
    logs_dir: str,
    out_dir: str,
    grep_pattern: str | None = None,
    sort_columns: list[int] | None = None,
    separator: str = " ",
) -> int:
    """Logalyzer (hadoop-tools/hadoop-extras .../tools/Logalyzer.java):
    grep + column-sort analysis over a directory of log files (the
    ``-grep``/``-sort``/``-separator`` flag surface; the ``-archive`` mode
    is :func:`distcp`). Writes the matching lines, globally ordered by the
    selected columns, as text; returns the number of matching lines.

    Spark-first: rlike filter pushes into the scan stage; the sort is one
    range exchange (sample -> repartitionByRange -> local sort).
    """
    import re as _re

    df = spark.read.text(logs_dir)
    if grep_pattern:
        df = df.filter(F.col("value").rlike(grep_pattern))
    if sort_columns:
        cols = F.split(F.col("value"), _re.escape(separator))
        df = df.orderBy(*[cols.getItem(i) for i in sort_columns])
    df.write.mode("overwrite").text(out_dir)
    return spark.read.text(out_dir).count()


def snapshot_listing(spark: SparkSession, path: str, snap_path: str) -> int:
    """Persist ``path``'s recursive listing as a snapshot manifest
    (rel, size, mtime_ms) — the local-FS stand-in for an HDFS snapshot,
    consumed by :func:`distcp_diff`. Metadata-only, written distributed.
    Returns the number of files recorded."""
    root = path.replace("file:", "")
    ls = listing(spark, path).select(
        _rel_col(F.col("path"), root).alias("rel"),
        F.col("size"),
        (F.unix_millis(F.col("mtime"))).alias("mtime_ms"),
    )
    ls.write.mode("overwrite").parquet(snap_path)
    return spark.read.parquet(snap_path).count()


def distcp_diff(
    spark: SparkSession,
    src: str,
    dst: str,
    from_snap: str,
    to_snap: str,
    fallback_update: bool = False,
) -> dict:
    """``-diff <from> <to>`` snapshot-based sync (DistCpSync.java): bring
    ``dst`` (at ``from_snap`` state) to ``to_snap`` state by replaying only
    the CHANGED files — never a full copy plan over the whole tree.

    The diff is three metadata joins over the two snapshot manifests
    (created / deleted / modified-by-size-or-mtime); bytes for created and
    modified files stream from the CURRENT ``src`` tree (which is at the
    ``to_snap`` state, as in the reference where the target snapshot is the
    live directory). Renames appear as delete+create, the same degradation
    the reference applies when rename tracking is unavailable.

    Precondition (DistCpSync.preSyncCheck): every file in ``from_snap``
    must still exist in ``dst`` at the recorded size — ``dst`` must not
    have drifted since the last sync. On violation: ``ValueError``, or a
    plain ``distcp -update -delete`` when ``fallback_update=True``
    (the reference's fallback path).

    Returns ``{"copied": n, "deleted": n}``.
    """
    src_root = src.replace("file:", "")
    dst_root = dst.replace("file:", "")
    s_from = spark.read.parquet(from_snap)
    s_to = spark.read.parquet(to_snap)
    dst_ls = (
        listing(spark, dst)
        .select(
            _rel_col(F.col("path"), dst_root).alias("rel"),
            F.col("size").alias("dst_size"),
        )
        .localCheckpoint()
    )

    drift = (
        s_from.join(dst_ls, "rel", "left_outer")
        .where(F.col("dst_size").isNull() | (F.col("dst_size") != F.col("size")))
        .limit(1)
        .count()
    )
    if drift:
        if fallback_update:
            n = distcp(spark, src, dst, update=True, delete=True)
            return {"copied": n, "deleted": -1, "fallback": True}
        raise ValueError(
            "distcp -diff precondition failed: dst drifted from the "
            "from-snapshot state (DistCpSync.preSyncCheck)"
        )

    f = s_from.select("rel", F.col("size").alias("f_size"), F.col("mtime_ms").alias("f_mtime"))
    t = s_to.select("rel", F.col("size").alias("t_size"), F.col("mtime_ms").alias("t_mtime"))
    joined = f.join(t, "rel", "full_outer").localCheckpoint()
    deleted = joined.where(F.col("t_size").isNull()).select("rel")
    to_copy = joined.where(
        F.col("f_size").isNull()  # created
        | (F.col("t_size") != F.col("f_size"))  # modified
        | (F.col("t_mtime") != F.col("f_mtime"))
    ).where(F.col("t_size").isNotNull()).select("rel")

    def rm_partition(rows):
        for row in rows:
            try:
                os.remove(os.path.join(dst_root, row.rel))
            except FileNotFoundError:
                pass

    deleted_n = deleted.count()
    deleted.foreachPartition(rm_partition)

    def copy_partition(rows):
        copied = 0
        for row in rows:
            target = os.path.join(dst_root, row.rel)
            os.makedirs(os.path.dirname(target), exist_ok=True)
            tmp = target + ".__distcp_tmp__"
            with open(os.path.join(src_root, row.rel), "rb") as fsrc, open(
                tmp, "wb"
            ) as fdst:
                shutil.copyfileobj(fsrc, fdst, _CHUNK)
            os.replace(tmp, target)
            copied += 1
        yield copied

    n_tasks = max(spark.sparkContext.defaultParallelism, 1)
    copied_n = to_copy.repartition(n_tasks).rdd.mapPartitions(copy_partition).sum()
    return {"copied": int(copied_n), "deleted": int(deleted_n)}


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
