"""XML-tag-delimited record reader.

Reference: ``StreamXmlRecordReader`` (ST/StreamXmlRecordReader.java) — scans
for configured begin/end patterns and emits everything between them as one
record, regardless of line boundaries.

Spark-first: per-file whole-text read + ``regexp_extract_all`` explosion.
Record extraction is executor-side and codegen'd; parallelism is per-file
(records may span arbitrary line boundaries, so line-splitting cannot be
used). Shard inputs into many files at scale, same as the reference, whose
splits also degrade to whole-file when records straddle split boundaries.
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def read_xml_records(
    spark: SparkSession, path: str, begin_tag: str, end_tag: str
) -> DataFrame:
    """One row per ``begin_tag … end_tag`` span, column ``record`` (tags
    included, matching StreamXmlRecordReader's default)."""
    pat = re.escape(begin_tag) + r"[\s\S]*?" + re.escape(end_tag)
    # Spark SQL string literals escape-process backslashes: double them.
    sql_pat = pat.replace("\\", "\\\\").replace("'", "\\'")
    return (
        spark.read.text(path, wholetext=True)
        .select(F.explode(F.expr(f"regexp_extract_all(value, '{sql_pat}', 0)")).alias("record"))
    )


def extract_tag_value(df: DataFrame, tag: str, out: str) -> DataFrame:
    """Pull ``<tag>text</tag>`` out of each record into column ``out``."""
    pat = f"<{tag}>(.*?)</{tag}>"
    sql_safe = pat.replace("\\", "\\\\")
    return df.withColumn(out, F.regexp_extract("record", sql_safe, 1))
