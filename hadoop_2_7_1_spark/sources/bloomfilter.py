"""Hadoop DynamicBloomFilter wire format + the MurmurHash it keys on.

Reference behavior (re-implemented, not copied):
- ``util/hash/MurmurHash.java:41`` — 32-bit MurmurHash2 over signed Java
  ints, seeded per hash-function index (seed chain: next seed = previous
  hash), tail bytes sign-extended.
- ``util/bloom/HashFunction.java:108`` — nbHash positions as
  ``abs(hash_i % vectorSize)`` with Java truncating remainder.
- ``util/bloom/Filter.java:197`` / ``BloomFilter.java:200`` /
  ``DynamicBloomFilter.java:248`` — serialization: int VERSION=-1, int
  nbHash, byte hashType, int vectorSize; then nr, currentNbRecord,
  matrix length, and per row the same header + LSB-first bit bytes.
- ``io/BloomMapFile.java:161`` — vectorSize = ceil(-k·n / ln(1 - c^(1/k)))
  with k=HASH_COUNT=5, n=io.mapfile.bloom.size, c=io.mapfile.bloom.error.rate.

Byte-compatibility with the stock JVM classes is pinned in
tests/test_sources.py (both directions: our file read by
``BloomMapFile.Reader``, a ``BloomMapFile.Writer`` file read by us).
"""

from __future__ import annotations

import math
import struct

HASH_COUNT = 5  # BloomMapFile.HASH_COUNT
MURMUR_HASH = 1  # Hash.MURMUR_HASH type id
_VERSION = -1  # Filter.VERSION

_M = 0x5BD1E995
_MASK = 0xFFFFFFFF


def _i32(x: int) -> int:
    """Wrap to Java signed 32-bit."""
    x &= _MASK
    return x - 0x100000000 if x >= 0x80000000 else x


def murmur_hash(data: bytes, seed: int) -> int:
    """Hadoop's 32-bit MurmurHash2 (signed Java int result)."""
    length = len(data)
    h = _i32(seed ^ length)
    len_4 = length >> 2
    for i in range(len_4):
        i_4 = i << 2
        k = data[i_4 + 3] - 256 if data[i_4 + 3] >= 128 else data[i_4 + 3]
        k = (k << 8) | data[i_4 + 2]
        k = (k << 8) | data[i_4 + 1]
        k = (k << 8) | data[i_4 + 0]
        k = _i32(k * _M)
        k ^= (k & _MASK) >> 24
        k = _i32(k * _M)
        h = _i32(h * _M)
        h = _i32(h ^ k)
    left = length - (len_4 << 2)
    if left:
        # Java sign-extends the tail bytes before xor
        if left >= 3:
            b = data[length - 3]
            h = _i32(h ^ ((b - 256 if b >= 128 else b) << 16))
        if left >= 2:
            b = data[length - 2]
            h = _i32(h ^ ((b - 256 if b >= 128 else b) << 8))
        if left >= 1:
            b = data[length - 1]
            h = _i32(h ^ (b - 256 if b >= 128 else b))
        h = _i32(h * _M)
    h ^= (h & _MASK) >> 13
    h = _i32(h * _M)
    h ^= (h & _MASK) >> 15
    return _i32(h)


def bloom_positions(key: bytes, nb_hash: int, vector_size: int) -> list[int]:
    """HashFunction.hash(Key): seed-chained murmur, Java truncating %."""
    out = []
    initval = 0
    for _ in range(nb_hash):
        initval = murmur_hash(key, initval)
        out.append(abs(int(math.fmod(initval, vector_size))))
    return out


def vector_size_for(num_keys: int, error_rate: float, k: int = HASH_COUNT) -> int:
    """BloomMapFile.initBloomFilter's sizing formula."""
    return int(math.ceil((-k * num_keys) / math.log(1.0 - error_rate ** (1.0 / k))))


class DynamicBloom:
    """DynamicBloomFilter: rows of plain BloomFilters, a new row per ``nr``
    added keys; membership = any row hits. Wire-compatible with the stock
    reader/writer."""

    def __init__(self, vector_size: int, nb_hash: int = HASH_COUNT, nr: int = 0):
        self.vector_size = vector_size
        self.nb_hash = nb_hash
        self.nr = nr
        self.current = 0
        self.rows: list[bytearray] = [bytearray((vector_size + 7) // 8)]

    def add(self, key: bytes) -> None:
        if self.nr and self.current >= self.nr:
            self.rows.append(bytearray((self.vector_size + 7) // 8))
            self.current = 0
        row = self.rows[-1]
        for pos in bloom_positions(key, self.nb_hash, self.vector_size):
            row[pos >> 3] |= 1 << (pos & 7)  # LSB-first, like bitvalues[]
        self.current += 1

    def test(self, key: bytes) -> bool:
        positions = bloom_positions(key, self.nb_hash, self.vector_size)
        for row in self.rows:
            if all(row[p >> 3] & (1 << (p & 7)) for p in positions):
                return True
        return False

    def to_bytes(self) -> bytes:
        head = struct.pack(
            ">iibi", _VERSION, self.nb_hash, MURMUR_HASH, self.vector_size
        )
        body = struct.pack(">iii", self.nr, self.current, len(self.rows))
        parts = [head, body]
        row_head = struct.pack(
            ">iibi", _VERSION, self.nb_hash, MURMUR_HASH, self.vector_size
        )
        for row in self.rows:
            parts.append(row_head)
            parts.append(bytes(row))
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, buf: bytes) -> "DynamicBloom":
        ver, nb_hash, _hash_type, vector_size = struct.unpack_from(">iibi", buf, 0)
        if ver != _VERSION:
            raise ValueError(f"unsupported bloom filter version {ver}")
        off = 13
        nr, current, n_rows = struct.unpack_from(">iii", buf, off)
        off += 12
        f = cls(vector_size, nb_hash, nr)
        f.current = current
        f.rows = []
        n_bytes = (vector_size + 7) // 8
        for _ in range(n_rows):
            off += 13  # each row repeats the Filter header
            f.rows.append(bytearray(buf[off : off + n_bytes]))
            off += n_bytes
        return f
