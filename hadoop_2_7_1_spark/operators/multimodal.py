"""Multimodal column plumbing (north-star addition).

Images/audio/video are opaque ``binary`` columns plus a typed metadata
struct. The Spark-side machinery — schema, Arrow-batched ``mapInPandas``
UDFs, partition sizing — is real and tested; the actual codec calls are
stubbed (PIL/ffmpeg etc. are not in this container) behind
``NotImplementedError`` or a clearly-marked deterministic fake derived from
the md5 of the payload, so every stage of the pipeline is exercised
end-to-end and oracle-checkable.

Scale notes: binary payloads ride in Arrow record batches (zero-copy to
pandas); keep ``spark.sql.files.maxPartitionBytes`` at the default 128 MB so
a partition of blobs fits executor memory, and repartition by a content hash
before decode so skewed sources don't pile onto one task.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import (
    BinaryType,
    LongType,
    StringType,
    StructField,
    StructType,
)

MEDIA_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("content", BinaryType()),
        StructField("media_type", StringType()),  # image|audio|video
    ]
)

DECODE_META_SCHEMA = StructType(
    [
        StructField("media_id", LongType()),
        StructField("n_bytes", LongType()),
        StructField("width", LongType()),
        StructField("height", LongType()),
        StructField("fmt", StringType()),
    ]
)


def _fake_dims(payload: bytes) -> tuple[int, int]:
    """Deterministic stand-in for a real header parse: dims from md5.

    STUB — replace with PIL.Image.open(BytesIO(payload)).size in a container
    that ships an image codec. The md5-derived value is reproducible in the
    DuckDB oracle, which is the point of the fake.
    """
    h = hashlib.md5(payload).hexdigest()
    w = 64 + int(h[:8], 16) % 512
    ht = 64 + int(h[8:16], 16) % 512
    return w, ht


def decode_image_meta(df: DataFrame, id_col: str = "media_id", content_col: str = "content") -> DataFrame:
    """Extract (n_bytes, width, height, fmt) per blob via Arrow-batched UDF."""

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            dims = [_fake_dims(bytes(b)) for b in pdf[content_col]]
            yield pd.DataFrame(
                {
                    "media_id": pdf[id_col].astype("int64"),
                    "n_bytes": [len(bytes(b)) for b in pdf[content_col]],
                    "width": [d[0] for d in dims],
                    "height": [d[1] for d in dims],
                    "fmt": ["fake" for _ in dims],
                }
            )

    return df.select(
        F.col(id_col).cast("long").alias(id_col), F.col(content_col)
    ).mapInPandas(run, DECODE_META_SCHEMA)


def resize_images(df: DataFrame, width: int, height: int) -> DataFrame:
    """STUB: real implementation needs an image codec (PIL/opencv)."""
    raise NotImplementedError(
        "image resize requires an image codec not present in this container; "
        "the decode/meta path (decode_image_meta) demonstrates the plumbing"
    )


def sample_video_frames(df: DataFrame, every_n: int) -> DataFrame:
    """STUB: real implementation needs ffmpeg bindings."""
    raise NotImplementedError(
        "video frame sampling requires ffmpeg, not present in this container"
    )


def documents_as_media(docs: DataFrame) -> DataFrame:
    """Adapter used by tests/queries: treat document text bytes as blobs."""
    return docs.select(
        F.col("doc_id").cast("long").alias("media_id"),
        F.encode("text", "UTF-8").alias("content"),
        F.lit("image").alias("media_type"),
    )
