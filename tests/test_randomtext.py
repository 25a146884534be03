"""RandomTextWriter parity: the committed constants are the output of a
compiled harness of the reference mapper loop (EX/RandomTextWriter.java:
126-165, generateSentence :156) run with explicit seeds over the reference's
own 1000-word array — the reference itself uses an UNSEEDED Random, so
parity is defined as: identical vocabulary, identical java.util.Random draw
sequence, identical byte accounting, given the same seed.

    RTWHarness words.txt 12345 10000 -> 20 10119 b1da6da66e88559fa5691bb3cef0677b
    RTWHarness words.txt 12346 10000 -> 14 10224 0122226ae31109521a41b4dc7b34f227
    RTWHarness words.txt 7     10000 -> 15 10355 37821cbe95dca677dc2e2477a387993b
"""

from __future__ import annotations

import hashlib
import os
import re

import pytest

from hadoop_2_7_1_spark.operators.randomtext import (
    WORDS,
    JavaRandom,
    random_text_summary,
    sentences_for_map,
)

REF_RUNS = {
    12345: (20, 10119, "b1da6da66e88559fa5691bb3cef0677b"),
    12346: (14, 10224, "0122226ae31109521a41b4dc7b34f227"),
    7: (15, 10355, "37821cbe95dca677dc2e2477a387993b"),
}

_REF_SRC = (
    "/root/reference/hadoop-mapreduce-project/hadoop-mapreduce-examples/"
    "src/main/java/org/apache/hadoop/examples/RandomTextWriter.java"
)


def test_java_random_matches_jdk():
    # pinned from `new java.util.Random(42).nextInt(1000)` x5 and
    # `new java.util.Random(0).nextInt(16)` x3 on the container's JDK 17
    r = JavaRandom(42)
    assert [r.next_int(1000) for _ in range(5)] == [130, 763, 248, 884, 970]
    p = JavaRandom(0)
    assert [p.next_int(16) for _ in range(3)] == [11, 13, 3]  # pow-2 path


@pytest.mark.skipif(not os.path.exists(_REF_SRC), reason="reference not mounted")
def test_vocabulary_matches_reference_source():
    src = open(_REF_SRC).read()
    arr = src.split("private static String[] words = {", 1)[1].split("};", 1)[0]
    assert re.findall(r'"([^"]*)"', arr) == WORDS


def test_stream_parity_with_compiled_reference():
    for seed, (want_n, want_bytes, want_md5) in REF_RUNS.items():
        md = hashlib.md5()
        n = total = 0
        for k, v in sentences_for_map(seed, 10_000):
            md.update((k + "\t" + v + "\n").encode())
            n += 1
            total += len(k) + len(v)
        assert (n, total, md.hexdigest()) == (want_n, want_bytes, want_md5)


def test_distributed_summary_matches_pins(spark):
    rows = {
        r.map_id: (r.n_records, r.n_bytes, r.stream_md5)
        for r in random_text_summary(spark, n_maps=2, bytes_per_map=10_000).collect()
    }
    assert rows == {0: REF_RUNS[12345], 1: REF_RUNS[12346]}
