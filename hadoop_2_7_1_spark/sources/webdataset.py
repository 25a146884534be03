"""WebDataset-style tar-shard ingest.

The standard large-scale multimodal training layout: samples are grouped
into tar shards; each sample is a set of same-prefix members
(``sample_0007.png`` / ``.txt`` / ``.json``); the SHARD is the unit of
parallelism (one reader task per tar, samples streamed sequentially inside
it). Public format: https://github.com/webdataset/webdataset.

Spark-first mapping: ``binaryFile`` reads each shard whole as one row
(never decoded on the driver), and an Arrow-batched ``mapInPandas`` stage
parses the tar with the stdlib and regroups members into one row per
sample. At 100 TB this is exactly the production shape — thousands of
~100 MB-1 GB shards, partition count = shard count, blobs stay binary
columns end to end (multimodal decode stages attach downstream, cf.
operators/multimodal.py).

Reference analogue: HadoopArchives' many-files-in-one-container reading
(`HT/hadoop-archives/.../HadoopArchives.java:50`) and
MultiFileWordCount's one-task-per-container pattern
(`EX/MultiFileWordCount.java:43`).
"""

from __future__ import annotations

import io
import tarfile

from pyspark.sql import DataFrame, SparkSession

#: member extensions surfaced as typed columns; anything else is counted
#: but not materialized
_TEXT_EXTS = ("txt", "json")
_BIN_EXTS = ("png", "jpg", "jpeg", "bin", "wav")


def write_webdataset_shard(path: str, samples) -> None:
    """Write one tar shard. ``samples`` is an iterable of
    ``(key, {ext: bytes})``; members are emitted in key order with zeroed
    mtimes so shard bytes are deterministic."""
    with tarfile.open(path, "w") as tf:
        for key, members in samples:
            for ext in sorted(members):
                data = members[ext]
                info = tarfile.TarInfo(f"{key}.{ext}")
                info.size = len(data)
                info.mtime = 0
                tf.addfile(info, io.BytesIO(data))


def read_webdataset(spark: SparkSession, path_glob: str) -> DataFrame:
    """One row per SAMPLE: (shard, key, n_members, image binary,
    caption string, meta string). Shards parallelize via binaryFile (one
    input row each); the tar parse is Arrow-batched and never touches the
    driver."""
    raw = spark.read.format("binaryFile").load(path_glob)

    def parse(batches):
        import os

        import pandas as pd

        for pdf in batches:
            rows = []
            for p, blob in zip(pdf["path"], pdf["content"]):
                shard = os.path.basename(str(p))
                groups: dict[str, dict[str, bytes]] = {}
                with tarfile.open(fileobj=io.BytesIO(bytes(blob))) as tf:
                    for m in tf.getmembers():
                        if not m.isfile() or "." not in m.name:
                            continue
                        key, ext = m.name.rsplit(".", 1)
                        groups.setdefault(key, {})[ext.lower()] = (
                            tf.extractfile(m).read()
                        )
                for key in sorted(groups):
                    g = groups[key]
                    image = next(
                        (g[e] for e in _BIN_EXTS if e in g), None
                    )
                    rows.append(
                        {
                            "shard": shard,
                            "key": key,
                            "n_members": len(g),
                            "image": image,
                            "caption": g.get("txt", b"").decode(
                                "utf-8", "replace"
                            ),
                            "meta": g.get("json", b"").decode(
                                "utf-8", "replace"
                            ),
                        }
                    )
            yield pd.DataFrame(
                rows,
                columns=[
                    "shard", "key", "n_members", "image", "caption", "meta"
                ],
            )

    return raw.mapInPandas(
        parse,
        "shard string, key string, n_members int, image binary, "
        "caption string, meta string",
    )
