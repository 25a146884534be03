"""Focused tests for the r11 terasort-validate rework: the order check is a
narrow mapInArrow pass over the sorted partitions (no second full-data
exchange), and it must still actually *detect* misorder — the check is real,
not assumed from the sort."""

from __future__ import annotations

from pyspark.sql import functions as F

from hadoop_2_7_1_spark.queries.reference import (
    _tera_validate_partition,
    _terasort_validate,
)


def test_validate_output_matches_direct_computation(spark):
    """End-to-end values at a small N equal a from-scratch computation of
    the declared semantics (global-order lag + xor checksum)."""
    n = 5000
    got = _terasort_validate(spark, n).collect()[0]
    exp = spark.sql(
        f"""
        WITH gen AS (
          SELECT substring(md5(cast(id as string)), 1, 10) AS key,
                 lpad(cast(id as string), 32, '0') AS payload
          FROM range({n})
        ), s AS (
          SELECT key, payload,
                 lag(key || payload) OVER (ORDER BY key, payload) AS prev
          FROM gen
        )
        SELECT cast(count(*) as bigint) AS n_records,
               cast(sum(case when prev is not null and prev > key || payload
                        then 1 else 0 end) as bigint) AS n_misorder,
               cast(bit_xor(cast(conv(substring(md5(concat(key, payload)), 1, 15),
                                      16, 10) as bigint)) as bigint) AS checksum
        FROM s
        """
    ).collect()[0]
    assert got.n_records == exp.n_records == n
    assert got.n_misorder == exp.n_misorder == 0
    assert got.checksum == exp.checksum


def _run_checker(spark, recs_per_pid):
    """Feed (rec, chk, pid) rows through the per-partition checker exactly
    as _terasort_validate wires it, one physical partition per pid."""
    sc = spark.sparkContext
    # RDD-level union of single-partition parallelizes: one physical
    # partition per pid, immune to LocalRelation/union folding
    rdd = sc.union(
        [
            sc.parallelize([(rec, i, pid) for i, rec in enumerate(recs)], 1)
            for pid, recs in recs_per_pid
        ]
    )
    df = spark.createDataFrame(rdd, "rec string, chk long, pid int")
    out = df.mapInArrow(
        _tera_validate_partition,
        "pid int, n_records long, n_misorder long, "
        "first_rec string, last_rec string, part_checksum long",
    )
    return {r.pid: r for r in out.collect()}


def test_checker_detects_misorder_and_folds_checksum(spark):
    w = 42  # fixed record width, as in the real pipeline

    def rec(s: str) -> str:
        return s.ljust(w, "0")

    sorted_run = [rec(c) for c in "abcdef"]
    misordered = [rec(c) for c in "abfcde"]  # f before c/d/e: 1 descent
    reversed_run = [rec(c) for c in "fedcba"]  # every adjacent pair descends
    by_pid = _run_checker(
        spark, [(0, sorted_run), (1, misordered), (2, reversed_run)]
    )
    assert by_pid[0].n_misorder == 0
    assert by_pid[1].n_misorder == 1
    assert by_pid[2].n_misorder == len(reversed_run) - 1
    for pid, run in ((0, sorted_run), (1, misordered), (2, reversed_run)):
        assert by_pid[pid].n_records == len(run)
        assert by_pid[pid].first_rec == run[0]
        assert by_pid[pid].last_rec == run[-1]
    # chk values were 0..5 per pid; xor(0..5) = 1
    assert by_pid[0].part_checksum == 1


def test_checker_counts_misorder_across_batch_boundaries(spark):
    """Adjacent-pair comparison must span Arrow batch boundaries: with
    maxRecordsPerBatch=2, descents that fall between batches still count."""
    old = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "2")
    try:
        w = 42
        run = [c.ljust(w, "0") for c in "bcadfe"]  # descents at idx 2, 5
        by_pid = _run_checker(spark, [(0, run)])
        assert by_pid[0].n_misorder == 2
        assert by_pid[0].n_records == len(run)
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", old)
