"""Hadoop-Streaming-style CLI (SURVEY.md §3 entry point 2).

Reference: ``hadoop jar hadoop-streaming.jar -input … -output … -mapper cmd
-reducer cmd`` (ST/StreamJob.java:1098, flag table in
HadoopStreaming.md.vm:101-156; line protocol at :75-77, separator configs at
:232-239). This CLI accepts the documented flag surface and lowers each flag
onto the engine operator that implements its semantics:

======================  =====================================================
Streaming flag          Lowering
======================  =====================================================
-input (repeatable)     union of sources (MultipleInputs)
-output                 text sink (TextOutputFormat) or SequenceFile
-mapper / -reducer      ``pipes.pipe_transform`` subprocess per partition
-combiner               map-side pipe over key-sorted partition pre-shuffle
-reducer aggregate      ValueAggregator registry (aggregates.value_aggregate
                        semantics over "Type:id<TAB>value" records)
-reducer NONE           map-only job (also -numReduceTasks 0)
-file/-files            ``sc.addFile`` + subprocess cwd = SparkFiles root —
                        shipped artifacts are in the task working directory
                        exactly like the reference's file packaging
-cmdenv name=value      subprocess environment overlay
-inputformat            text | kv | seqtext | auto | parquet | xml
-inputreader            StreamXmlRecordReader,begin=B,end=E → sources.xml
-outputformat           text | seq (SequenceFile via sources.seqfile)
-partitioner kf         KeyFieldBasedPartitioner (+keypartitioner.options)
-numReduceTasks         shuffle partition count
-io typedbytes          typed-bytes pipe (operators.typedbytes)
-io rawbytes            int32-framed raw-bytes pipe (pipe_transform_raw)
-lazyOutput             skip write when the result is empty (LazyOutputFormat)
-verbose                plan + row-count echo
-D name=value           stream.map.output.field.separator,
                        stream.num.map.output.key.fields,
                        map.output.key.field.separator,
                        mapreduce.partition.keypartitioner.options,
                        mapreduce.partition.keycomparator.options,
                        mapreduce.job.reduces
======================  =====================================================

Shuffle semantics match the reference pipeline: mapper output is
repartitioned on the (configured) key fields and key-sorted within each
partition (the MR sort/shuffle); the reducer subprocess consumes each
partition's grouped stream exactly like PipeReducer.java:40.
"""

from __future__ import annotations

import argparse
import os
import shlex

from pyspark.sql import functions as F

#: -D keys we honor (names from mapred-default.xml / HadoopStreaming.md.vm)
_D_MAP_OUT_SEP = "stream.map.output.field.separator"
_D_REDUCE_OUT_SEP = "stream.reduce.output.field.separator"
_D_NUM_KEY_FIELDS = "stream.num.map.output.key.fields"
_D_KEY_FIELD_SEP = "map.output.key.field.separator"
_D_PARTITIONER_OPTS = "mapreduce.partition.keypartitioner.options"
_D_COMPARATOR_OPTS = "mapreduce.partition.keycomparator.options"
_D_NUM_REDUCES = "mapreduce.job.reduces"


def build_parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="hadoop_2_7_1_spark.cli",
        description="Hadoop Streaming flag surface on the Spark engine",
    )
    p.add_argument("-input", action="append", required=True, dest="inputs")
    p.add_argument("-output", required=True, dest="output")
    p.add_argument("-mapper", default=None)
    p.add_argument("-reducer", default=None)
    p.add_argument("-combiner", default=None)
    p.add_argument("-file", "-files", action="append", default=[], dest="files")
    # -archives archive[#alias] (repeatable): unpack a .har/.zip/.tar[.gz]
    # into the task working directory under <alias> (default: archive
    # basename), mirroring the reference's archive localization
    # (ST/StreamJob.java flag table, HadoopStreaming.md.vm:101-156).
    p.add_argument("-archives", action="append", default=[], dest="archives")
    p.add_argument("-cmdenv", action="append", default=[], dest="cmdenv")
    p.add_argument("-separator", default="\t")
    p.add_argument("-numReduceTasks", type=int, default=None, dest="num_reduce")
    p.add_argument(
        "-inputformat",
        default="text",
        choices=["text", "kv", "seq", "seqtext", "auto", "parquet", "xml",
                 "TextInputFormat", "KeyValueTextInputFormat",
                 "SequenceFileInputFormat",
                 "SequenceFileAsTextInputFormat", "AutoInputFormat",
                 "StreamInputFormat"],
    )
    # -inputreader "StreamXmlRecordReader,begin=<tag>,end=</tag>"
    # (ST/StreamJob.java -inputreader flag; reader semantics
    # ST/StreamXmlRecordReader.java:40). Implies the xml input format.
    p.add_argument("-inputreader", default=None, dest="inputreader")
    p.add_argument("-outputformat", default="text", choices=["text", "seq"])
    p.add_argument("-partitioner", default=None)
    p.add_argument(
        "-io", default="text", choices=["text", "typedbytes", "rawbytes"],
        dest="io_mode",
    )
    p.add_argument("-lazyOutput", action="store_true", dest="lazy_output")
    p.add_argument("-verbose", action="store_true")
    p.add_argument("-background", action="store_true")  # accepted; no-op locally
    p.add_argument("-D", action="append", default=[], dest="defines")
    return p


_INPUTFORMAT_ALIASES = {
    "TextInputFormat": "text",
    "KeyValueTextInputFormat": "kv",
    "SequenceFileInputFormat": "seq",
    "SequenceFileAsTextInputFormat": "seqtext",
    "AutoInputFormat": "auto",
    "StreamInputFormat": "xml",
}


def _parse_inputreader(spec: str) -> tuple[str, str]:
    """``StreamXmlRecordReader,begin=B,end=E`` → (B, E)."""
    parts = spec.split(",")
    if not parts[0].strip().endswith("StreamXmlRecordReader"):
        raise ValueError(f"unsupported -inputreader {parts[0]!r}")
    kv = dict(p.split("=", 1) for p in parts[1:] if "=" in p)
    if "begin" not in kv or "end" not in kv:
        raise ValueError("-inputreader StreamXmlRecordReader needs begin=/end=")
    return kv["begin"], kv["end"]


def _kspec_to_fieldspec(opts: str) -> str:
    """Translate sort-style ``-k`` options ("-k2,2nr -k1") into the keyfield
    module's field spec ("2nr,1"). ``-kA,B`` ranges expand to every field
    A..B with the shared flags (KeyFieldBasedComparator.java:53 semantics;
    character offsets within a field are not supported)."""
    import re

    parts = []
    for tok in opts.split():
        if not tok.startswith("-k"):
            continue
        m = re.match(r"^(\d+)(?:\.\d+)?(?:,(\d+)(?:\.\d+)?)?([nr]*)$", tok[2:])
        if not m:
            raise ValueError(f"bad -k option {tok!r}")
        start, end, flags = int(m.group(1)), int(m.group(2) or m.group(1)), m.group(3)
        parts.extend(f"{fno}{flags}" for fno in range(start, end + 1))
    return ",".join(parts)


def _read_one(spark, fmt: str, path: str, sep: str, xml_tags=None):
    from .io import load_auto, read_kv_text, read_text
    from .sources.seqfile import read_sequence_file, read_sequence_file_as_text

    if fmt == "parquet":
        return spark.read.parquet(path)
    if fmt == "kv":
        return read_kv_text(spark, path, sep)
    if fmt == "seq":
        return read_sequence_file(spark, path)
    if fmt == "seqtext":
        return read_sequence_file_as_text(spark, path)
    if fmt == "auto":
        return load_auto(spark, path)
    if fmt == "xml":
        from .sources.xml import read_xml_records

        begin, end = xml_tags or ("<record>", "</record>")
        # one record per span, presented like a text source so the mapper
        # pipe / identity paths treat it uniformly
        return read_xml_records(spark, path, begin, end).withColumnRenamed(
            "record", "value"
        )
    return read_text(spark, path)


def _aggregate_reduce(df):
    """``-reducer aggregate`` (ValueAggregatorReducer, VA/ValueAggregatorJob
    .java:119): mapper emits ``Type:id<TAB>value`` records; each aggregator
    type folds its ids' values; output is ``id<TAB>result``."""
    parsed = df.select(
        F.substring_index("key", ":", 1).alias("typ"),
        F.expr("substring(key, instr(key, ':') + 1)").alias("id"),
        F.col("value"),
    )
    stats = parsed.groupBy("typ", "id").agg(
        F.sum(F.col("value").cast("long")).alias("lsum"),
        F.max(F.col("value").cast("long")).alias("lmax"),
        F.min(F.col("value").cast("long")).alias("lmin"),
        F.sum(F.col("value").cast("double")).alias("dsum"),
        F.max("value").alias("smax"),
        F.min("value").alias("smin"),
        F.count_distinct("value").alias("uniq"),
    )
    result = (
        F.when(F.col("typ") == "LongValueSum", F.col("lsum").cast("string"))
        .when(F.col("typ") == "LongValueMax", F.col("lmax").cast("string"))
        .when(F.col("typ") == "LongValueMin", F.col("lmin").cast("string"))
        .when(F.col("typ") == "DoubleValueSum", F.col("dsum").cast("string"))
        .when(F.col("typ") == "StringValueMax", F.col("smax"))
        .when(F.col("typ") == "StringValueMin", F.col("smin"))
        .when(F.col("typ") == "UniqValueCount", F.col("uniq").cast("string"))
        .otherwise(F.lit(None))
    )
    return stats.select(F.col("id").alias("key"), result.alias("value"))


def _localize_archive(spark, spec: str) -> None:
    """Unpack ``archive[#alias]`` and ship the tree to tasks.

    Reference semantics (mapreduce DistributedCache archives): the archive
    is unpacked into the task cwd under its basename, or under the ``#``
    fragment alias when given. ``.har`` unpacks via the engine's own reader
    (``sources.har.har_extract``); ``.zip`` / ``.tar[.gz]`` / ``.tgz``/
    ``.jar`` via the stdlib."""
    import tempfile

    path, _, alias = spec.partition("#")
    alias = alias or os.path.basename(path.rstrip("/"))
    stage = os.path.join(tempfile.mkdtemp(prefix="archives-"), alias)
    os.makedirs(stage, exist_ok=True)
    low = path.lower()
    if low.endswith(".har"):
        from .sources.har import har_extract

        har_extract(path.rstrip("/"), stage)
    elif low.endswith((".zip", ".jar")):
        import zipfile

        with zipfile.ZipFile(path) as zf:
            zf.extractall(stage)
    elif low.endswith((".tar", ".tar.gz", ".tgz")):
        import tarfile

        with tarfile.open(path) as tf:
            tf.extractall(stage)
    else:
        raise ValueError(f"-archives: unsupported archive type {path!r}")
    spark.sparkContext.addFile(stage, recursive=True)


def run(argv: list[str] | None = None, spark=None) -> str:
    args = build_parser().parse_args(argv)
    if spark is None:
        from .session import get_spark

        spark = get_spark("streaming-cli")

    from .operators.keyfield import parse_sort_spec, sort_exprs
    from .operators.pipes import pipe_transform
    from .operators.typedbytes import pipe_transform_raw, pipe_transform_typed

    conf = dict(d.split("=", 1) for d in args.defines)
    map_out_sep = conf.get(_D_MAP_OUT_SEP, "\t")
    reduce_out_sep = conf.get(_D_REDUCE_OUT_SEP, "\t")
    num_key_fields = int(conf.get(_D_NUM_KEY_FIELDS, "1"))
    key_field_sep = conf.get(_D_KEY_FIELD_SEP, "\t")
    num_reduce = args.num_reduce
    if num_reduce is None:
        num_reduce = int(conf.get(_D_NUM_REDUCES, "32"))

    # -files: ship via the Spark files mechanism; subprocesses run with
    # cwd = the files root, so "python mapper.py" finds its script exactly
    # like a reference streaming task finds its packaged files.
    pipe_cwd = None
    if args.files or args.archives:
        from pyspark import SparkFiles

        for f in args.files:
            spark.sparkContext.addFile(f)
        for spec in args.archives:
            _localize_archive(spark, spec)
        pipe_cwd = SparkFiles.getRootDirectory()
    env = dict(e.split("=", 1) for e in args.cmdenv) or None

    fmt = _INPUTFORMAT_ALIASES.get(args.inputformat, args.inputformat)
    xml_tags = None
    if args.inputreader:
        xml_tags = _parse_inputreader(args.inputreader)
        fmt = "xml"
    paths = [p for arg in args.inputs for p in arg.split(",")]
    df = _read_one(spark, fmt, paths[0], args.separator, xml_tags)
    for path in paths[1:]:  # MultipleInputs: union of sources
        df = df.unionByName(_read_one(spark, fmt, path, args.separator, xml_tags))

    def pipe(frame, cmd_str, **kw):
        if args.io_mode == "typedbytes":
            return pipe_transform_typed(
                frame, shlex.split(cmd_str), env=env, cwd=pipe_cwd
            )
        if args.io_mode == "rawbytes":
            return pipe_transform_raw(
                frame, shlex.split(cmd_str), env=env, cwd=pipe_cwd
            )
        return pipe_transform(
            frame, shlex.split(cmd_str), env=env, cwd=pipe_cwd, **kw
        )

    if args.mapper and args.mapper not in ("cat", "NONE",
                                           "org.apache.hadoop.mapred.lib.IdentityMapper"):
        df = pipe(
            df, args.mapper,
            sep=args.separator, out_sep=map_out_sep,
            num_key_fields=num_key_fields,
        )
    elif df.columns == ["value"]:  # identity mapper over a text source
        df = df.select(F.col("value").alias("key"), F.lit("").alias("value"))

    if num_reduce == 0 or args.reducer == "NONE":
        out = df  # map-only: no shuffle, no sort (reference: numReduceTasks=0)
    elif args.reducer == "aggregate":
        # ValueAggregator is a DataFrame groupBy — it shuffles on its own
        # (typ, id) key, so the MR-style repartition+sort would only add a
        # second, wasted shuffle of the full mapper output.
        out = _aggregate_reduce(df)
    else:
        import re

        if args.combiner:
            # map-side combine: key-group within each *input* partition and
            # pipe before any shuffle (the reference combines at spill time,
            # MapTask.java sortAndSpill) — the shuffle then moves combined
            # records and the reduce-side sort restores grouping.
            df = pipe(
                df.sortWithinPartitions(df.columns[0]), args.combiner,
                sep=args.separator, out_sep=map_out_sep,
                num_key_fields=num_key_fields,
            )
        key = df.columns[0]  # after any pipe: always the key column
        # Partition key: KeyFieldBasedPartitioner restricts to key fields
        # a..b of the key (split on map.output.key.field.separator).
        part_expr = F.col(key)
        if args.partitioner or _D_PARTITIONER_OPTS in conf:
            opts = _kspec_to_fieldspec(conf.get(_D_PARTITIONER_OPTS, "-k1,1"))
            specs = parse_sort_spec(opts)
            fields = F.split(F.col(key), re.escape(key_field_sep))
            part_expr = F.concat_ws(
                "\x01", *[fields.getItem(f - 1) for f, _, _ in specs]
            )
        shuffled = df.repartition(num_reduce, part_expr)
        if _D_COMPARATOR_OPTS in conf:
            shuffled = shuffled.sortWithinPartitions(
                *sort_exprs(key, _kspec_to_fieldspec(conf[_D_COMPARATOR_OPTS]),
                            key_field_sep)
            )
        else:
            shuffled = shuffled.sortWithinPartitions(key)
        if args.reducer and args.reducer != "org.apache.hadoop.mapred.lib.IdentityReducer":
            out = pipe(
                shuffled, args.reducer,
                sep=args.separator, out_sep=reduce_out_sep,
            )
        else:
            out = shuffled  # IdentityReducer: sorted pass-through

    if args.verbose:
        out.explain()
    persisted = False
    if args.lazy_output:
        # LazyOutputFormat: skip the sink only when the result is empty.
        # persist so the emptiness probe and the write share one execution
        # (subprocess pipes must not run twice over the data).
        out = out.persist()
        persisted = True
        if len(out.take(1)) == 0:
            out.unpersist()
            return args.output
    try:
        if args.outputformat == "seq":
            from .sources.seqfile import write_sequence_file

            write_sequence_file(out, args.output, out.columns[0], out.columns[1])
        else:
            # TextOutputFormat: raw key<sep>value lines, never quoted (the csv
            # sink would quote any field containing the separator).
            lines = out.select(
                F.concat_ws(
                    args.separator, *[F.col(c).cast("string") for c in out.columns]
                ).alias("value")
            )
            lines.write.mode("overwrite").text(args.output)
    finally:
        if persisted:
            out.unpersist()  # don't leak cached blocks for the session lifetime
    return args.output


if __name__ == "__main__":
    run()
