"""SparkSession factory.

Local tests run on ``local[$SPARK_GRAFT_CPUS]`` (default all cores); the same
settings are what we would ship to a 1000-executor cluster, only the master
and memory sizing change:

- AQE on: runtime coalescing of shuffle partitions, skew-join splitting, and
  dynamic broadcast conversion replace Hadoop's static reducer count
  (``mapreduce.job.reduces``, mapred-default.xml:254 in the reference).
- shuffle.partitions: at 100 TB you size this ~2-3x total cores; locally 32.
  AQE coalesces down so oversizing is safe.
- Arrow enabled: every Python-side operator (pipe UDFs, multimodal decode)
  moves data in Arrow record batches, never row-at-a-time pickling.
- UTC session timezone so parquet timestamps compare bit-exact against the
  DuckDB oracle.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "hadoop_2_7_1_spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "*")
    if shuffle_partitions is None:
        shuffle_partitions = 32
    builder = (
        SparkSession.builder.appName(app_name)
        .master(os.environ.get("SPARK_GRAFT_MASTER", f"local[{cpus}]"))
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        # events.parquet stores TIMESTAMP(NANOS); read as long + convert in io
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        # never surface TIMESTAMP_NTZ from parquet: the reference models time
        # as zone-less long millis, and with the session pinned to UTC plain
        # TIMESTAMP has identical instants while staying compatible with
        # unix_micros()/window() etc. (io.load_table also casts defensively)
        .config("spark.sql.parquet.inferTimestampNTZ.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.files.maxPartitionBytes", str(128 * 1024 * 1024))
    )
    # ANSI sweep hook (round 9): SPARK_GRAFT_ANSI=1 runs the whole engine
    # under spark.sql.ansi.enabled=true (strict overflow/cast/div-by-zero)
    # so the test suite + registry can be audited for silent-wraparound
    # assumptions. COVERAGE.md "ANSI posture" records the findings.
    if os.environ.get("SPARK_GRAFT_ANSI"):
        builder = builder.config("spark.sql.ansi.enabled", "true")
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    return builder.getOrCreate()
