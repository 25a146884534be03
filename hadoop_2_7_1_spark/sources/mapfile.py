"""MapFile source/sink — the reference's sorted, indexed KV container.

Reference: ``IO/MapFile.java:59`` — a directory holding two SequenceFiles:
``data`` (records in key-sorted order) and ``index`` (every
INDEX_INTERVAL-th key -> LongWritable byte position of that record in
``data``; MapFile.Writer.append region). ``MapFile.Reader.get`` loads the
tiny index, binary-searches it, seeks ``data`` and scans at most one
interval. ``MapFileOutputFormat`` (MRC/mapreduce/lib/output/
MapFileOutputFormat.java) writes ONE MapFile per reducer partition.

Spark-first shape: the write is a range-repartition + within-partition sort
(one shuffle — the same sort the reference's reduce phase performs), then an
Arrow-batched ``mapInPandas`` writer emits ``part-NNNNN/{data,index}`` per
partition. At 100 TB the data files stay distributed and block-splittable;
only index entries (1 per 128 records) and the returned part manifest are
small. Point lookup reads ONE index file and ONE bounded slice of one data
file — never a scan.

Format compatibility is pinned by a stock ``org.apache.hadoop.io.MapFile
.Reader`` round-trip in tests/test_sources.py.
"""

from __future__ import annotations

import os
import struct
from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from .seqfile import (
    _SeqWriter,
    _WRITABLE_FOR_DTYPE,
    _decode_writable,
    _parse_seq_stream,
    _read_seq_header,
    read_vlong,
)

#: io.map.index.interval default (MapFile.Writer)
INDEX_INTERVAL = 128

_LONG_WRITABLE = "org.apache.hadoop.io.LongWritable"


def write_map_file(
    df: DataFrame,
    path: str,
    key_col: str,
    value_col: str,
    num_parts: int = 4,
    index_interval: int = INDEX_INTERVAL,
) -> int:
    """Write ``df`` as ``path/part-NNNNN/{data,index}`` MapFile directories
    (MapFileOutputFormat layout: one MapFile per partition, keys sorted
    within each). Returns the number of records written.

    Keys are range-partitioned so each part owns a contiguous key range —
    a point lookup then touches exactly one part (the reference's
    TotalOrderPartitioner + MapFileOutputFormat composition; plain
    MapFileOutputFormat hash-partitions, which also works but makes every
    reader check one part per hash bucket).
    """
    dtypes = dict(df.dtypes)
    key_class, enc_key = _WRITABLE_FOR_DTYPE[dtypes[key_col]]
    value_class, enc_value = _WRITABLE_FOR_DTYPE[dtypes[value_col]]

    os.makedirs(path, exist_ok=True)
    sel = (
        df.select(key_col, value_col)
        .repartitionByRange(num_parts, F.col(key_col))
        .sortWithinPartitions(key_col)
    )

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        import pandas as pd
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        part_dir = os.path.join(path, f"part-{pid:05d}")
        data_fh = index_fh = None
        data = index = None
        n = 0
        for pdf in batches:
            if data is None:
                os.makedirs(part_dir, exist_ok=True)
                data_fh = open(os.path.join(part_dir, "data"), "wb")
                index_fh = open(os.path.join(part_dir, "index"), "wb")
                data = _SeqWriter(
                    data_fh, key_class, value_class, f"mapfile-data:{pid}"
                )
                index = _SeqWriter(
                    index_fh, key_class, _LONG_WRITABLE, f"mapfile-index:{pid}"
                )
            for k, v in zip(pdf.iloc[:, 0], pdf.iloc[:, 1]):
                kb = enc_key(k)
                if n % index_interval == 0:
                    # record position BEFORE this append (MapFile.Writer:
                    # position.set(data.getLength()))
                    index.append(kb, struct.pack(">q", data_fh.tell()))
                data.append(kb, enc_value(v))
                n += 1
        if data_fh is not None:
            data_fh.close()
            index_fh.close()
        yield pd.DataFrame({"part": [pid], "n_records": [n]})

    counts = sel.mapInPandas(run, "part int, n_records long").collect()
    total = sum(r.n_records for r in counts)
    if total == 0:
        # header-only empty MapFile, like MapFile.Writer with no appends
        part_dir = os.path.join(path, "part-00000")
        os.makedirs(part_dir, exist_ok=True)
        with open(os.path.join(part_dir, "data"), "wb") as fh:
            _SeqWriter(fh, key_class, value_class, "mapfile-data:empty")
        with open(os.path.join(part_dir, "index"), "wb") as fh:
            _SeqWriter(fh, key_class, _LONG_WRITABLE, "mapfile-index:empty")
    return total


def read_map_file(
    spark: SparkSession, path: str, key_name: str = "key", value_name: str = "value"
) -> DataFrame:
    """Full scan: the ``data`` SequenceFiles read through Spark's Hadoop
    input path (block-splittable, same as any SequenceFile scan)."""
    from .seqfile import read_sequence_file

    return read_sequence_file(
        spark, os.path.join(path, "part-*", "data"), key_name, value_name
    )


def _norm(key):
    """Comparable form matching WritableComparable order: Text compares raw
    utf8 bytes, numeric Writables compare numerically."""
    return key.encode("utf-8") if isinstance(key, str) else key


def map_file_lookup(path: str, key, index_interval: int = INDEX_INTERVAL):
    """Index-aware point lookup (MapFile.Reader.get): binary-search the
    in-memory index, seek ``data`` at the indexed position, scan forward at
    most one interval. Reads O(index) + one bounded data slice — never a
    full data file. Returns the value or None.

    Driver-side utility by design: a point lookup is metadata-scale; batch
    lookups belong in a join against :func:`read_map_file`.
    """
    import glob

    target = _norm(key)
    for part_dir in sorted(glob.glob(os.path.join(path, "part-*"))):
        index_path = os.path.join(part_dir, "index")
        with open(index_path, "rb") as fh:
            idx_buf = fh.read()  # 1 entry per 128 records: tiny by design
        entries = []
        for kb, vb, kcls, _ in _parse_seq_stream(idx_buf):
            entries.append(
                (_norm(_decode_writable(kcls, kb)), struct.unpack(">q", vb)[0])
            )
        if not entries or target < entries[0][0]:
            continue
        # rightmost indexed key <= target (entries are in key order)
        lo, hi = 0, len(entries) - 1
        while lo < hi:
            mid = (lo + hi + 1) // 2
            if entries[mid][0] <= target:
                lo = mid
            else:
                hi = mid - 1
        pos = entries[lo][1]
        hit = _scan_data_from(os.path.join(part_dir, "data"), pos, target,
                              index_interval)
        if hit is not None:
            return hit
    return None


def _scan_data_from(data_path: str, pos: int, target, max_records: int):
    """Scan up to ``max_records`` framed records starting at ``pos`` for
    ``target``; reads the file incrementally (64 KiB chunks), not whole."""
    with open(data_path, "rb") as fh:
        head = fh.read(4096)
        key_class, value_class, _ = _read_seq_header(head)
        fh.seek(pos)
        state = {"buf": b"", "off": 0}

        def ensure(n: int) -> bool:
            while len(state["buf"]) - state["off"] < n:
                chunk = fh.read(65536)
                if not chunk:
                    return False
                state["buf"] = state["buf"][state["off"] :] + chunk
                state["off"] = 0
            return True

        seen = 0
        while seen <= max_records:
            if not ensure(4):
                return None
            (rec_len,) = struct.unpack_from(">i", state["buf"], state["off"])
            if rec_len == -1:  # sync escape
                if not ensure(20):
                    return None
                state["off"] += 20
                continue
            if not ensure(8 + rec_len):
                return None
            off = state["off"]
            (key_len,) = struct.unpack_from(">i", state["buf"], off + 4)
            kb = state["buf"][off + 8 : off + 8 + key_len]
            vb = state["buf"][off + 8 + key_len : off + 8 + rec_len]
            state["off"] = off + 8 + rec_len
            seen += 1
            k = _norm(_decode_writable(key_class, kb))
            if k == target:
                return _decode_writable(value_class, vb)
            if k > target:  # sorted data: overshot
                return None
    return None
