"""Hadoop Archive (.har) writer — format-compatible with HarFileSystem.

Reference: ``hadoop-tools/hadoop-archives/.../HadoopArchives.java`` (mapper
packs file bytes into part files + emits index lines at :664-697; reducer
writes ``_index``/``_masterindex`` at :706-790) and
``hadoop-common/.../fs/HarFileSystem.java`` (reader: ``getHarHash:482`` =
``path.hashCode() & 0x7fffffff``, ``HarStatus`` line parsing at :573-621,
``VERSION = 3``).

Layout produced (byte-compatible, verified in tests by reading the archive
back through Hadoop's own HarFileSystem via ``har://`` paths):

- ``<name>.har/part-N``      — concatenated file payloads
- ``<name>.har/_index``      — one line per entry, sorted by path hash:
  ``enc(path) file <part> <start> <len> <encProps> `` or
  ``enc(path) dir <encProps> 0 0 <encChild> ... ``
- ``<name>.har/_masterindex``— ``"3 \\n"`` then ``<h0> <h1> <start> <end> \\n``
  per 1000-line index block (hash range → byte range of ``_index``).

Scale shape mirrors the reference: file BYTES move executor-side only (each
partition streams its files into its own part file); the driver handles
index METADATA (path, offsets — trivially small). Spark-first difference:
partition assignment is a hash repartition instead of an MR shuffle.
"""

from __future__ import annotations

import os
from collections.abc import Iterator
from urllib.parse import quote_plus

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

VERSION = 3  # HarFileSystem.VERSION


def _java_string_hash(s: str) -> int:
    """java.lang.String.hashCode (signed 32-bit), the basis of getHarHash."""
    h = 0
    for ch in s:
        h = (31 * h + ord(ch)) & 0xFFFFFFFF
    return h - (1 << 32) if h >= (1 << 31) else h


def har_hash(path: str) -> int:
    """HarFileSystem.getHarHash:482 — hashCode & 0x7fffffff."""
    return _java_string_hash(path) & 0x7FFFFFFF


def _enc(s: str) -> str:
    """java.net.URLEncoder.encode(s, "UTF-8"): '+' for space; *-._ kept."""
    return quote_plus(s, safe="*-._")


def _props(mtime_ms: int, perm_short: int = 420, owner: str = "spark",
           group: str = "supergroup") -> str:
    """HadoopArchives.encodeProperties:648 — doubly-encoded property blob."""
    return _enc(f"{mtime_ms} {perm_short} {_enc(owner)} {_enc(group)}")


def har_create(
    spark: SparkSession, src: str, dst_har: str, num_parts: int = 1
) -> int:
    """Archive every file under ``src`` into ``dst_har`` (must end ``.har``).

    Returns the number of archived files. The archive is readable by any
    stock Hadoop via ``har://`` URIs (tested against the bundled
    HarFileSystem).
    """
    if not dst_har.endswith(".har"):
        raise ValueError("archive name must end with .har (HarFileSystem contract)")
    src_root = src.replace("file:", "").rstrip("/")

    files = (
        spark.read.format("binaryFile")
        .option("recursiveFileLookup", "true")
        .load(src)
        .select(
            F.regexp_replace("path", "^file:", "").alias("abs_path"),
            F.col("length").alias("size"),
            (F.unix_timestamp("modificationTime") * 1000).alias("mtime_ms"),
        )
    )

    os.makedirs(dst_har, exist_ok=True)

    # Executor-side packing: each partition streams its files into its own
    # part file (byte payloads never leave the executor); only (path,
    # offset, length) metadata returns.
    def pack(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        partname = f"part-{pid}"
        fh, pos = None, 0
        out = {"abs_path": [], "partname": [], "start": [], "length": [],
               "mtime_ms": []}
        for pdf in batches:
            if fh is None and len(pdf):
                fh = open(os.path.join(dst_har, partname), "wb")
            for abs_path, size, mtime_ms in zip(
                pdf["abs_path"], pdf["size"], pdf["mtime_ms"]
            ):
                start = pos
                with open(abs_path, "rb") as f:
                    while chunk := f.read(1 << 20):
                        fh.write(chunk)
                        pos += len(chunk)
                out["abs_path"].append(abs_path)
                out["partname"].append(partname)
                out["start"].append(start)
                out["length"].append(pos - start)
                out["mtime_ms"].append(int(mtime_ms))
        if fh is not None:
            fh.close()
        yield pd.DataFrame(out)

    meta = (
        files.repartition(num_parts, "abs_path")
        .mapInPandas(
            pack,
            "abs_path string, partname string, start long, length long, mtime_ms long",
        )
        .collect()  # metadata-scale: one row per archived file
    )

    # Build index entries: files + every ancestor directory with children.
    entries: dict[str, str] = {}
    children: dict[str, set[str]] = {"/": set()}
    for row in meta:
        rel = "/" + os.path.relpath(row.abs_path, src_root)
        perm, owner, group = 420, "spark", "supergroup"
        try:
            st = os.stat(row.abs_path)
            perm = st.st_mode & 0o7777
            import grp as _grp
            import pwd as _pwd

            owner = _pwd.getpwuid(st.st_uid).pw_name
            group = _grp.getgrgid(st.st_gid).gr_name
        except (OSError, KeyError):
            pass
        entries[rel] = (
            f"{_enc(rel)} file {row.partname} {row.start} {row.length} "
            f"{_props(row.mtime_ms, perm, owner, group)} "
        )
        # record every ancestor dir and its immediate children
        d = os.path.dirname(rel)
        child = os.path.basename(rel)
        while True:
            children.setdefault(d, set()).add(child)
            if d == "/":
                break
            d, child = os.path.dirname(d), os.path.basename(d)

    for d, childs in children.items():
        kids = " ".join(_enc(c) for c in sorted(childs))
        # Each directory's own stat, as the reference HadoopArchives records
        # (not the first file's mtime): mtime/perm/owner/group from the
        # source tree; fall back to defaults when the dir no longer stats.
        d_mtime, d_perm, d_owner, d_group = 0, 493, "spark", "supergroup"
        try:
            st = os.stat(os.path.join(src_root, d.lstrip("/")))
            d_mtime = int(st.st_mtime * 1000)
            d_perm = st.st_mode & 0o7777
            import grp as _grp
            import pwd as _pwd

            d_owner = _pwd.getpwuid(st.st_uid).pw_name
            d_group = _grp.getgrgid(st.st_gid).gr_name
        except (OSError, KeyError):
            pass
        entries[d] = f"{_enc(d)} dir {_props(d_mtime, d_perm, d_owner, d_group)} 0 0 {kids} "

    # _index sorted by hash (the reducer's IntWritable sort), _masterindex
    # blocks of 1000 lines (HArchivesReducer.numIndexes).
    lines = sorted(entries.items(), key=lambda kv: har_hash(kv[0]))
    index_path = os.path.join(dst_har, "_index")
    master_path = os.path.join(dst_har, "_masterindex")
    blocks = []
    with open(index_path, "wb") as idx:
        start_hash, start_pos, written = 0, 0, 0
        last_hash = 0
        for rel, line in lines:
            idx.write((line + "\n").encode("utf-8"))
            last_hash = har_hash(rel)
            written += 1
            if written >= 1000:
                blocks.append((start_hash, last_hash, start_pos, idx.tell()))
                start_hash, start_pos, written = last_hash, idx.tell(), 0
        if written > 0:
            blocks.append((start_hash, last_hash, start_pos, idx.tell()))
    with open(master_path, "wb") as mi:
        mi.write(f"{VERSION} \n".encode())
        for h0, h1, p0, p1 in blocks:
            mi.write(f"{h0} {h1} {p0} {p1} \n".encode())
    return len(meta)


def har_extract(har_path: str, dest_dir: str) -> int:
    """Unpack a ``.har`` archive into ``dest_dir`` (pure Python: parse
    ``_index``, slice the part files). Returns the number of files written.

    This is the task-side localization step behind the streaming CLI's
    ``-archives`` flag (ST/StreamJob.java flag table): the reference ships
    an archive to each task and unpacks it into the working directory; we
    unpack once and ship the tree via ``sc.addFile(recursive=True)``."""
    import urllib.parse

    count = 0
    with open(os.path.join(har_path, "_index"), "rb") as fh:
        for raw in fh.read().decode("utf-8").splitlines():
            parts = raw.split(" ")
            if len(parts) < 2:
                continue
            rel = urllib.parse.unquote(parts[0])
            kind = parts[1]
            target = os.path.join(dest_dir, rel.lstrip("/"))
            if kind == "dir":
                os.makedirs(target, exist_ok=True)
                continue
            partname, start, length = parts[2], int(parts[3]), int(parts[4])
            os.makedirs(os.path.dirname(target), exist_ok=True)
            with open(os.path.join(har_path, partname), "rb") as pf:
                pf.seek(start)
                payload = pf.read(length)
            with open(target, "wb") as out:
                out.write(payload)
            count += 1
    return count


def har_read_file(spark: SparkSession, har_path: str, inner: str) -> DataFrame:
    """Read one archived text file back THROUGH Hadoop's HarFileSystem
    (har:// URI against the default local fs) — the parity check that the
    written layout is the real format, not a lookalike."""
    uri = f"har://{har_path}/{inner.lstrip('/')}"
    return spark.read.text(uri)
