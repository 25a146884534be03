"""SequenceFile source/sink.

Reference: ``IO/SequenceFile.java`` (layouts NONE/RECORD/BLOCK at :197,
writer factory :259) is the reference's binary KV container;
``SequenceFileInputFormat`` / ``...AsText`` / ``...AsBinary``
(MRC/mapreduce/lib/input/SequenceFileInputFormat.java:41,
SequenceFileAsTextInputFormat.java:37) read it back as native types,
strings, or raw bytes.

Spark-first stance (SURVEY.md §1.3): our *intermediates* are Parquet —
columnar, pruned, pushdown-friendly. This module exists for interchange with
data that already lives in SequenceFiles: reads go through Spark's Hadoop
input-format path, so files are block-splittable exactly as in the reference
(one task per block-aligned split — scales to many-TB inputs the same way
the reference's ``getSplits`` does). Values cross the JVM→Python boundary
once per record on read, so convert to Parquet early in a pipeline rather
than re-scanning a SequenceFile repeatedly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

#: writable class implied for each Python type by ``saveAsSequenceFile``
#: (via Pyrolite unpickling): int→LongWritable (if it fits), str→Text,
#: bytes/bytearray→BytesWritable, float→DoubleWritable, bool→BooleanWritable.

CODECS = {
    "gzip": "org.apache.hadoop.io.compress.GzipCodec",
    "deflate": "org.apache.hadoop.io.compress.DefaultCodec",
    "bzip2": "org.apache.hadoop.io.compress.BZip2Codec",
    # IO/compress/SnappyCodec.java, Lz4Codec.java — the cluster defaults for
    # SequenceFile interchange. Hadoop 3.3+ (bundled with Spark) backs these
    # with pure-Java snappy-java / lz4-java, so no native libhadoop needed.
    "snappy": "org.apache.hadoop.io.compress.SnappyCodec",
    "lz4": "org.apache.hadoop.io.compress.Lz4Codec",
}


def write_sequence_file(
    df: DataFrame, path: str, key_col: str, value_col: str, codec: str | None = None
) -> None:
    """SequenceFileOutputFormat analogue: write (key, value) columns as a
    SequenceFile; Writable classes are inferred from the column types.

    ``codec`` enables BLOCK compression (SequenceFile.java:228) with one of
    CODECS' short names or a fully-qualified codec class.

    .. warning:: Interchange sink ONLY — rows cross JVM→Python→JVM via
       Pyrolite (``df.rdd``), i.e. row-at-a-time Python in the write path.
       Exporting a large table this way is 10-100× slower than the Parquet
       sink; at scale, keep intermediates in Parquet and reserve
       SequenceFiles for handing data to legacy Hadoop consumers.
    """
    pairs = df.select(key_col, value_col).rdd.map(tuple)
    codec_cls = CODECS.get(codec, codec) if codec else None
    pairs.saveAsSequenceFile(path, compressionCodecClass=codec_cls)


def read_sequence_file(
    spark: SparkSession,
    path: str,
    key_name: str = "key",
    value_name: str = "value",
    min_splits: int | None = None,
) -> DataFrame:
    """SequenceFileInputFormat analogue: (key, value) DataFrame with native
    types (Writables auto-converted)."""
    rdd = spark.sparkContext.sequenceFile(path, minSplits=min_splits)
    return rdd.toDF([key_name, value_name])


def read_sequence_file_as_text(
    spark: SparkSession, path: str, key_name: str = "key", value_name: str = "value"
) -> DataFrame:
    """SequenceFileAsTextInputFormat: both sides stringified
    (SequenceFileAsTextRecordReader calls toString on each Writable)."""
    from pyspark.sql import functions as F

    df = read_sequence_file(spark, path, key_name, value_name)
    return df.select(
        F.col(key_name).cast("string").alias(key_name),
        F.col(value_name).cast("string").alias(value_name),
    )
