"""GenSort parity: our generator must be bit-identical to the reference
(EX/terasort/GenSort.java, Random16.java, Unsigned16.java).

The committed constants below are the reference generator's own output,
produced by compiling the reference terasort sources (with a
java.util.zip.CRC32 stub for PureJavaCrc32 — identical algorithm) and
running ``GenSort -c``:

    GenSort -c 1000 out        -> checksum 1f9ffe645ec
    GenSort -c -b5000 100 out  -> checksum 2fd9cc10c0
    GenSort -c -a 500 out      -> checksum f7f1e01efc
    GenSort -c 2000 out        -> checksum 3f8c10b8d50
"""

from __future__ import annotations

from zlib import crc32

from hadoop_2_7_1_spark.operators import gensort

REF_CHECKSUMS = {
    (0, 1000, False): 0x1F9FFE645EC,
    (5000, 100, False): 0x2FD9CC10C0,
    (0, 500, True): 0xF7F1E01EFC,
    (0, 2000, False): 0x3F8C10B8D50,
}


def _checksum(first: int, count: int, use_ascii: bool) -> int:
    return sum(crc32(r) for r in gensort.gen_records(first, count, use_ascii))


def test_reference_checksums_reproduce():
    for (first, count, use_ascii), want in REF_CHECKSUMS.items():
        assert _checksum(first, count, use_ascii) == want


def test_skip_ahead_matches_iteration():
    x = 0
    for i in range(300):
        assert gensort.skip_ahead(i) == x
        x = gensort.next_rand(x)
    # large jumps: skipping n+m == skipping n then iterating m
    x = gensort.skip_ahead(10**12)
    for _ in range(5):
        x = gensort.next_rand(x)
    assert x == gensort.skip_ahead(10**12 + 5)


def test_record_structure():
    rec = next(gensort.gen_records(7, 1))
    assert len(rec) == 100
    assert rec[10:12] == b"\x00\x11"
    assert rec[12:44] == b"%032X" % 7
    assert rec[44:48] == b"\x88\x99\xaa\xbb"
    assert rec[96:100] == b"\xcc\xdd\xee\xff"
    arec = next(gensort.gen_records(7, 1, use_ascii=True))
    assert len(arec) == 100 and arec[98:100] == b"\r\n"
    assert all(32 <= b < 127 for b in arec[:10])


def test_distributed_teragen_matches_sequential(spark):
    n = 1000
    df = gensort.teragen(spark, n).repartition(8)  # force multi-partition gen
    rows = {r.rowid: bytes(r.record) for r in gensort.teragen(spark, n).collect()}
    seq = list(gensort.gen_records(0, n))
    assert len(rows) == n
    assert all(rows[i] == seq[i] for i in range(n))
    out = gensort.teragen_checksum(gensort.teragen(spark, n)).collect()[0]
    assert out.n_records == n
    assert int(out.checksum) == REF_CHECKSUMS[(0, 1000, False)]
