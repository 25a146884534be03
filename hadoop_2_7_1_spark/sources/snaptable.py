"""Snapshot-versioned parquet tables: manifest-listed data files, atomic
version pointer, time-travel reads.

The storage-management layer the engine's CDC operators (cur_upsert_merge,
cur_scd2_history, dd_incremental_ingest) assume at 100 TB: writers add data
directories and publish a MANIFEST per version; readers resolve a version's
manifest to its file list, so

- commits are atomic: the version pointer is a rename-published one-line
  file, and a crash after data files land but before the manifest/pointer
  publish leaves every reader on the previous version (pytest pins this);
- time travel is free: any retained version re-reads exactly its manifest's
  files;
- appends never rewrite: an append manifest is the previous file list plus
  the new directory (the 100 TB property — commit cost is O(delta), not
  O(table)).

This is the reference FileOutputCommitter's publish-by-rename discipline
(MRC/lib/output/FileOutputCommitter.java:1 — task/job temporary dirs
renamed into place) lifted from job level to TABLE level, the same idea
production table formats build on. Layout:

    {root}/data/v{N}/part-*.parquet     (one directory per commit)
    {root}/manifests/v{N}.json          ({"version", "mode", "dirs"})
    {root}/VERSION                      (current version number)
"""

from __future__ import annotations

import json
import os

from pyspark.sql import DataFrame, SparkSession


def _version_path(root: str) -> str:
    return os.path.join(root, "VERSION")


def current_version(root: str) -> int:
    """The published version, 0 if the table has never committed."""
    try:
        with open(_version_path(root)) as fh:
            return int(fh.read().strip())
    except FileNotFoundError:
        return 0


def _manifest_path(root: str, version: int) -> str:
    return os.path.join(root, "manifests", f"v{version}.json")


def read_manifest(root: str, version: int) -> dict:
    with open(_manifest_path(root, version)) as fh:
        return json.load(fh)


def snap_commit(df: DataFrame, root: str, mode: str = "append") -> int:
    """Commit ``df`` as the next version; returns the new version number.

    ``mode='append'``: the new manifest lists every prior data dir plus
    this commit's. ``mode='overwrite'``: the manifest lists only this
    commit's dir (old versions stay readable until vacuumed).

    Publish order is data -> manifest -> VERSION (rename-atomic), so any
    interruption leaves the table at the previous version.
    """
    if mode not in ("append", "overwrite"):
        raise ValueError(f"mode must be append|overwrite, got {mode!r}")
    prev = current_version(root)
    version = prev + 1
    rel_dir = os.path.join("data", f"v{version}")
    df.write.mode("overwrite").parquet(os.path.join(root, rel_dir))
    dirs = [rel_dir]
    if mode == "append" and prev > 0:
        dirs = read_manifest(root, prev)["dirs"] + dirs
    os.makedirs(os.path.join(root, "manifests"), exist_ok=True)
    manifest = {"version": version, "mode": mode, "dirs": dirs}
    mtmp = _manifest_path(root, version) + ".tmp"
    with open(mtmp, "w") as fh:
        json.dump(manifest, fh)
    os.rename(mtmp, _manifest_path(root, version))
    vtmp = _version_path(root) + ".tmp"
    with open(vtmp, "w") as fh:
        fh.write(str(version))
    os.rename(vtmp, _version_path(root))  # the atomic publish
    return version


def snap_read(spark: SparkSession, root: str, version: int | None = None) -> DataFrame:
    """Read the table at ``version`` (default: current). The scan unions
    exactly the manifest's directories — predicate pushdown, column
    pruning, and partition parallelism all apply per file as usual."""
    v = current_version(root) if version is None else version
    if v < 1:
        raise FileNotFoundError(f"{root} has no committed version")
    dirs = read_manifest(root, v)["dirs"]
    return spark.read.parquet(*[os.path.join(root, d) for d in dirs])


def snap_history(root: str) -> list[dict]:
    """Manifests of every retained version, ascending."""
    out = []
    for v in range(1, current_version(root) + 1):
        try:
            out.append(read_manifest(root, v))
        except FileNotFoundError:
            continue
    return out


def snap_vacuum(root: str, keep_last: int = 1) -> list[str]:
    """Drop data directories referenced ONLY by versions older than the
    last ``keep_last``; returns the removed relative dirs. Readers of
    retained versions are unaffected (their manifests' files survive)."""
    import shutil

    cur = current_version(root)
    keep_versions = set(range(max(1, cur - keep_last + 1), cur + 1))
    keep_dirs: set[str] = set()
    for v in keep_versions:
        keep_dirs.update(read_manifest(root, v)["dirs"])
    removed = []
    data_root = os.path.join(root, "data")
    for name in sorted(os.listdir(data_root)) if os.path.isdir(data_root) else []:
        rel = os.path.join("data", name)
        if rel not in keep_dirs:
            shutil.rmtree(os.path.join(data_root, name))
            removed.append(rel)
    for v in range(1, cur + 1):
        if v not in keep_versions:
            try:
                os.remove(_manifest_path(root, v))
            except FileNotFoundError:
                pass
    return removed


def snap_stream_sink(stream_df: DataFrame, root: str, checkpoint: str):
    """Exactly-once streaming appends into a snapshot table: each
    micro-batch commits one table version via ``foreachBatch``, recording
    the batch id in the manifest; a REPLAYED batch (restart after a crash
    between sink commit and checkpoint advance — the classic duplication
    window) is detected by id and skipped, so the table never holds a
    batch twice. Returns the started StreamingQuery.

    This pairs Structured Streaming's replayable source offsets with the
    table's atomic publish: offsets say WHAT might re-run, the manifest's
    batch id says what already LANDED — together, exactly-once table
    state with no distributed transaction.
    """

    def commit_batch(batch_df: DataFrame, batch_id: int) -> None:
        cur = current_version(root)
        if cur > 0:
            last = read_manifest(root, cur).get("batch_id", -1)
            if batch_id <= last:
                return  # replayed batch: already published, skip
        version = snap_commit(batch_df, root, "append")
        m = read_manifest(root, version)
        m["batch_id"] = batch_id
        mtmp = _manifest_path(root, version) + ".tmp"
        with open(mtmp, "w") as fh:
            json.dump(m, fh)
        os.rename(mtmp, _manifest_path(root, version))

    return (
        stream_df.writeStream.foreachBatch(commit_batch)
        .option("checkpointLocation", checkpoint)
        .trigger(availableNow=True)
        .start()
    )


def snap_compact(spark: SparkSession, root: str, target_files: int = 1) -> int:
    """Compact the current version's accumulated small files into
    ``target_files`` as a NEW data-identical version — the table-
    maintenance pass every append-heavy snapshot table needs (a 100 TB
    table appended hourly is 8760 manifest dirs/year; readers pay the
    open() tax until someone bin-packs).

    coalesce(), not repartition(): compaction must not shuffle — it
    narrows existing partitions into fewer output files. The compacted
    commit uses 'overwrite' manifest semantics (lists only its own dir);
    prior versions stay time-travel readable until snap_vacuum. Returns
    the new version number.
    """
    df = snap_read(spark, root)
    return snap_commit(df.coalesce(target_files), root, "overwrite")
