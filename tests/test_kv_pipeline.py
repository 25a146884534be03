"""KVDataset facade + Pipeline (JobControl analogue) unit tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from hadoop_2_7_1_spark.functions import tokenize
from hadoop_2_7_1_spark.io import load_table
from hadoop_2_7_1_spark.kv import kv
from hadoop_2_7_1_spark.plans import Pipeline

from .conftest import SF_DIR


def test_kv_wordcount_matches_q01(spark):
    docs = load_table(spark, SF_DIR, "documents")
    counts = (
        kv(docs, F.col("doc_id"), F.col("text"))
        .flat_map_values(tokenize("value"))
        .filter(F.col("value") != "")
        .map_kv(F.col("value"), F.lit(1))
        .reduce_by_key(F.count("*").cast("bigint"), "cnt")
        .to_df()
    )
    from hadoop_2_7_1_spark.queries import REGISTRY

    q01 = REGISTRY["q01_wordcount"].fn(spark, SF_DIR)
    a = {(r["key"], r["cnt"]) for r in counts.collect()}
    b = {(r["word"], r["cnt"]) for r in q01.collect()}
    assert a == b


def test_kv_group_sorted(spark):
    li = load_table(spark, SF_DIR, "lineitem")
    g = (
        kv(li, F.col("l_orderkey"), F.col("l_linenumber"))
        .group_sorted("value")
        .collect()
    )
    for row in g[:50]:
        assert row["values"] == sorted(row["values"])


def test_pipeline_dag_order_and_results(spark):
    ran: list[str] = []

    def mk(name, dep_count):
        def fn(s, deps):
            ran.append(name)
            assert len(deps) == dep_count
            return s.range(5)

        return fn

    p = (
        Pipeline()
        .add("a", mk("a", 0), materialize=True)
        .add("b", mk("b", 1), deps=["a"])
        .add("c", mk("c", 2), deps=["a", "b"])
    )
    out = p.run(spark)
    assert ran.index("a") < ran.index("b") < ran.index("c")
    assert set(out) == {"a", "b", "c"}


def test_pipeline_cycle_rejected(spark):
    p = Pipeline().add("x", lambda s, d: None, deps=["y"]).add("y", lambda s, d: None, deps=["x"])
    with pytest.raises(ValueError, match="cycle"):
        p.run(spark)


def test_pipeline_failure_names_stage(spark):
    def boom(s, d):
        raise RuntimeError("inner")

    p = Pipeline().add("bad", boom)
    with pytest.raises(RuntimeError, match="stage 'bad' failed"):
        p.run(spark)


def test_streaming_cli_wordcount(spark, tmp_path):
    """Entry point 2 parity: -mapper/-reducer pipeline == the classic
    'hadoop-streaming wordcount' (tr + uniq -c shape done with awk)."""
    import glob

    from hadoop_2_7_1_spark import cli

    src = tmp_path / "in.txt"
    src.write_text("b a\na b\nc a\n")
    out = str(tmp_path / "out")
    cli.run(
        [
            "-input", str(src),
            "-output", out,
            "-mapper", "awk '{for(i=1;i<=NF;i++) print $i\"\\t\"1}'",
            "-reducer", "awk -F'\\t' '{c[$1]+=$2} END {for(k in c) print k\"\\t\"c[k]}'",
            "-numReduceTasks", "4",
        ],
        spark=spark,
    )
    counts = {}
    for f in glob.glob(out + "/part-*"):
        for line in open(f):
            if line.strip():
                k, v = line.strip().split("\t")
                counts[k] = counts.get(k, 0) + int(v)
    assert counts == {"a": 3, "b": 2, "c": 1}
