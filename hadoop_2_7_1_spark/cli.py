"""Hadoop-Streaming-style CLI (SURVEY.md §3 entry point 2).

Reference: ``hadoop jar hadoop-streaming.jar -input … -output … -mapper cmd
-reducer cmd`` (ST/StreamJob.java, ~30 flags; protocol in
HadoopStreaming.md.vm:75-77). This shim accepts the core flag set and lowers
to the same engine operators the API exposes:

    python -m hadoop_2_7_1_spark.cli \
        -input /data/in.txt -output /data/out \
        -mapper "tr a-z A-Z" -reducer "uniq -c" \
        [-separator $'\t'] [-numReduceTasks 32] [-inputformat text|kv|parquet]

Semantics, matching the reference pipeline: mapper runs over input lines;
its ``key<TAB>value`` output is shuffled (repartition by key + sort within
partitions, ≈ the MR sort/shuffle); the reducer process sees each
partition's records grouped by key on stdin, exactly like PipeReducer.
"""

from __future__ import annotations

import argparse
import shlex

from pyspark.sql import functions as F


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(prog="hadoop_2_7_1_spark.cli", description=__doc__)
    p.add_argument("-input", required=True, dest="input")
    p.add_argument("-output", required=True, dest="output")
    p.add_argument("-mapper", default=None)
    p.add_argument("-reducer", default=None)
    p.add_argument("-separator", default="\t")
    p.add_argument("-numReduceTasks", type=int, default=32, dest="num_reduce")
    p.add_argument("-inputformat", default="text", choices=["text", "kv", "parquet"])
    return p


def run(argv: list[str] | None = None, spark=None) -> str:
    args = build_parser().parse_args(argv)
    if spark is None:
        from .session import get_spark

        spark = get_spark("streaming-cli")

    from .io import read_kv_text, read_text
    from .operators.pipes import pipe_transform

    if args.inputformat == "parquet":
        df = spark.read.parquet(args.input)
    elif args.inputformat == "kv":
        df = read_kv_text(spark, args.input, args.separator)
    else:
        df = read_text(spark, args.input)

    if args.mapper:
        df = pipe_transform(df, shlex.split(args.mapper), sep=args.separator)

    if args.reducer:
        # MR shuffle: partition by key, key-sorted within partition, then the
        # reducer executable consumes each partition's grouped stream.
        key = df.columns[0]
        df = df.repartition(args.num_reduce, key).sortWithinPartitions(key)
        df = pipe_transform(df, shlex.split(args.reducer), sep=args.separator)

    df.write.mode("overwrite").option("sep", args.separator).csv(args.output)
    return args.output


if __name__ == "__main__":
    run()
