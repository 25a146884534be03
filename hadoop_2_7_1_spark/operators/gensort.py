"""GenSort-exact TeraGen: bit-identical to the reference generator.

Reference semantics (studied, not copied):
- ``EX/terasort/Random16.java:374`` — 128-bit LCG
  ``f(x) = (a*x + c) mod 2**128`` with L'Ecuyer's ``a`` and the GenSort ``c``;
  ``skipAhead`` (``Random16.java:336``) advances seed 0 by ``n`` steps via
  squared-function composition so any row's state is O(log n).
- ``EX/terasort/Unsigned16.java:297`` — 128-bit unsigned arithmetic; Python
  ints subsume it (mask to 128 bits).
- ``EX/terasort/GenSort.java:38–100`` — binary record layout: 10-byte key =
  high bytes of rand; break ``00 11``; 32 uppercase hex digits of the row id;
  break ``88 99 AA BB``; 48 filler bytes = hex digits 20..31 of rand each
  repeated 4x; break ``CC DD EE FF``.
- ``GenSort.java:94–147`` — ascii record layout: 10 printable key chars from
  base-95 digits of the two 64-bit halves; 32-hex row id; 52 filler bytes =
  hex digits 19..31 each repeated 4x; trailing CR LF.
- ``EX/terasort/TeraGen.java:203–233`` — row ``r`` uses the state after
  ``r+1`` LCG steps (skipAhead(r) then one nextRand), checksum = 128-bit sum
  of per-record CRC32.

The generator is embarrassingly parallel: each partition skip-aheads to its
first row id and iterates — no shuffle, no coordination, perfect 100 TB
scaling (this is exactly how the reference parallelizes across map tasks).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

MASK128 = (1 << 128) - 1
GEN_A = 0x2360ED051FC65DA44385DF649FCCF645
GEN_C = 0x4A696D47726179524950202020202001


def next_rand(x: int) -> int:
    """One LCG step (Random16.nextRand)."""
    return (GEN_A * x + GEN_C) & MASK128


def skip_ahead(n: int) -> int:
    """State after ``n`` steps from seed 0 (Random16.skipAhead).

    Composes f**(2**i) for the set bits of ``n``; powers of the same affine
    map commute, so bit order is irrelevant.
    """
    a, c = GEN_A, GEN_C
    x = 0
    while n:
        if n & 1:
            x = (a * x + c) & MASK128
        c = (a * c + c) & MASK128
        a = (a * a) & MASK128
        n >>= 1
    return x


def binary_record(rand: int, rowid: int) -> bytes:
    """100-byte binary record (GenSort.generateRecord)."""
    randhex = b"%032X" % rand
    return (
        rand.to_bytes(16, "big")[:10]
        + b"\x00\x11"
        + b"%032X" % (rowid & MASK128)
        + b"\x88\x99\xaa\xbb"
        + bytes(d for d in randhex[20:32] for _ in range(4))
        + b"\xcc\xdd\xee\xff"
    )


def ascii_record(rand: int, rowid: int) -> bytes:
    """100-byte printable record (GenSort.generateAsciiRecord)."""
    key = bytearray(10)
    temp = rand >> 64
    for i in range(8):
        key[i] = 32 + temp % 95
        temp //= 95
    temp = rand & 0xFFFFFFFFFFFFFFFF
    key[8] = 32 + temp % 95
    temp //= 95
    key[9] = 32 + temp % 95
    randhex = b"%032X" % rand
    return (
        bytes(key)
        + b"  "
        + b"%032X" % (rowid & MASK128)
        + b"  "
        + bytes(d for d in randhex[19:32] for _ in range(4))
        + b"\r\n"
    )


def gen_records(first_row: int, count: int, use_ascii: bool = False) -> Iterator[bytes]:
    """Sequential generation from any starting row (GenSort.outputRecords)."""
    make = ascii_record if use_ascii else binary_record
    rand = skip_ahead(first_row)
    for rowid in range(first_row, first_row + count):
        rand = next_rand(rand)
        yield make(rand, rowid)


def teragen(spark: SparkSession, num_rows: int, use_ascii: bool = False) -> DataFrame:
    """Distributed GenSort: (rowid BIGINT, record BINARY), bit-identical to
    the reference for every row id regardless of partitioning."""

    def gen(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        make = ascii_record if use_ascii else binary_record
        rand = None
        expected = None
        for pdf in batches:
            out = []
            for rowid in pdf["id"]:
                rowid = int(rowid)
                if rand is None or rowid != expected:
                    rand = skip_ahead(rowid)  # re-sync on any discontinuity
                rand = next_rand(rand)
                expected = rowid + 1
                out.append(make(rand, rowid))
            yield pd.DataFrame({"rowid": pdf["id"], "record": out})

    return spark.range(num_rows).mapInPandas(gen, "rowid bigint, record binary")


def teragen_checksum(df: DataFrame) -> DataFrame:
    """TeraGen's CHECKSUM counter: 128-bit sum of per-record CRC32
    (TeraGen.java:229–233). CRC32 runs JVM-side (`F.crc32`); the sum fits
    DECIMAL(38) far beyond 10**12 records (sum < n * 2**32), so the 128-bit
    wrap the reference guards against never occurs in practice."""
    return df.agg(
        F.count("*").cast("bigint").alias("n_records"),
        F.sum(F.crc32("record").cast("decimal(38,0)"))
        .cast("decimal(38,0)")
        .alias("checksum"),
    )
