"""Build a deterministic N× scale-up of an SF directory for scaling-trend
measurement (e.g. sf0.1 -> a synthetic sf0.5 in a scratch dir).

The point is the SCALING EXPONENT receipt: two bench points (base SF and
N× SF) separate each query's fixed stage floor from its marginal per-row
cost, which is the number that predicts 100 TB behavior. The replication
must therefore preserve workload CHARACTER, not just row counts:

- FK families share one offset per copy (orderkey, custkey, suppkey,
  partkey, user_id, doc_id, vec_id, event_id), so join fan-outs and key
  cardinality ratios are preserved. region/nation stay fixed, like TPC-H
  dims at every SF.
- documents.text for copy c>0 gets a copy-tag token injected after every
  4th word: ~3/4 of word 3-grams change, so cross-copy Jaccard lands
  ~0.2 — BELOW the 0.5 near-dup thresholds — while within-copy dup
  structure is untouched. Naive cloning would make every doc a 5-way
  exact dup and blow the Σ bucket² pair bill quadratically, poisoning
  the trend.
- embeddings.embedding for copy c>0 is dimension-rolled by 13*c: norm
  and value distribution are exactly preserved, expected cross-copy
  cosine ~0 (below every threshold in the sim_ family), within-copy
  geometry identical.
- events timestamps are unchanged: N× users in the same window = higher
  density, which is how event streams actually scale.

Usage: python scripts/make_scaled_sf.py SRC_DIR DST_DIR [N]
"""

from __future__ import annotations

import os
import re
import sys

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

# key column -> offset family; every column in a family moves by the same
# per-copy stride (max value in the base data + 1), so FKs stay aligned.
FAMILIES = {
    "o_orderkey": "orderkey", "l_orderkey": "orderkey",
    "c_custkey": "custkey", "o_custkey": "custkey",
    "s_suppkey": "suppkey", "l_suppkey": "suppkey",
    "p_partkey": "partkey", "l_partkey": "partkey",
    "doc_id": "doc_id", "vec_id": "vec_id",
    "event_id": "event_id", "user_id": "user_id",
}
FIXED_DIMS = {"region", "nation"}


_PROPS_K = re.compile(r'"k":\s*(\d+)')


def _offset_props(col: pa.ChunkedArray, off: int) -> pa.ChunkedArray:
    """Offset the device-like '$.k' identifier inside events.props for
    copies c>0. Without this, cross-copy users share device ids and the
    identity-stitch connected components grow with N instead of staying
    copy-local — distorting the workload-character preservation the
    replication promises for the graph/identity trend.

    Memory bound: processed per Arrow chunk, never the whole column — the
    regex substitution is Python-side (the replacement needs arithmetic on
    the captured group, which no vectorized regexp_replace can express) but
    driver memory stays O(chunk), not O(N)."""
    chunks: list[pa.Array] = []
    for chunk in col.chunks if isinstance(col, pa.ChunkedArray) else [col]:
        out = [
            None
            if v is None
            else _PROPS_K.sub(lambda m: f'"k": {int(m.group(1)) + off}', v)
            for v in chunk.to_pylist()
        ]
        chunks.append(pa.array(out, type=pa.string()))
    return pa.chunked_array(chunks, type=pa.string())


def _props_stride(src: str) -> int:
    """Per-copy stride for the props '$.k' key: max base value + 1.

    Computed in DuckDB (vectorized regexp_extract_all + max) so the stride
    scan is O(1) driver memory at any N — same pattern/group semantics as
    ``_PROPS_K``, which the per-copy offset pass still uses."""
    path = os.path.join(src, "events.parquet")
    if not os.path.exists(path):
        return 0
    import duckdb

    (mx,) = duckdb.sql(
        "SELECT max(CAST(x AS BIGINT)) FROM ("
        "  SELECT unnest(regexp_extract_all(props, '\"k\":\\s*(\\d+)', 1)) AS x"
        f"  FROM read_parquet('{path}') WHERE props IS NOT NULL)"
    ).fetchone()
    return 0 if mx is None else int(mx) + 1


def _tag_text(text: str, c: int) -> str:
    words = text.split(" ")
    tag = f"x{c}q"
    out: list[str] = []
    for i, w in enumerate(words):
        out.append(w)
        if i % 4 == 3:
            out.append(tag)
    return " ".join(out)


def _strides(src: str) -> dict[str, int]:
    strides: dict[str, int] = {}
    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".parquet"):
            continue
        t = pq.read_table(os.path.join(src, fname))
        for col, fam in FAMILIES.items():
            if col in t.column_names:
                mx = pc.max(t[col]).as_py()
                strides[fam] = max(strides.get(fam, 0), int(mx) + 1)
    return strides


def main() -> None:
    src, dst = sys.argv[1], sys.argv[2]
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 5
    os.makedirs(dst, exist_ok=True)
    strides = _strides(src)
    props_stride = _props_stride(src)
    print(f"strides: {strides} props_k: {props_stride}")
    for fname in sorted(os.listdir(src)):
        if not fname.endswith(".parquet"):
            continue
        table = fname[: -len(".parquet")]
        t = pq.read_table(os.path.join(src, fname))
        if table in FIXED_DIMS:
            pq.write_table(t, os.path.join(dst, fname))
            print(f"{table}: fixed dim, {t.num_rows} rows")
            continue
        copies = []
        for c in range(n):
            cols = {}
            for name in t.column_names:
                col = t[name]
                if name in FAMILIES and c > 0:
                    off = c * strides[FAMILIES[name]]
                    # add_checked: an int32 key family with a large stride
                    # must ERROR, not silently wrap into colliding/negative
                    # keys (upcast the base SF to int64 if it ever trips)
                    col = pc.add_checked(col, pa.scalar(off, type=col.type))
                elif table == "events" and name == "props" and c > 0:
                    col = _offset_props(col, c * props_stride)
                elif table == "documents" and name == "text" and c > 0:
                    col = pa.array(
                        [_tag_text(v, c) for v in col.to_pylist()],
                        type=pa.string(),
                    )
                elif table == "documents" and name == "n_chars" and c > 0:
                    # keep the metadata column true to the mutated text
                    cols["__defer_nchars__"] = True
                    col = None
                elif table == "embeddings" and name == "embedding" and c > 0:
                    mat = np.array(col.to_pylist(), dtype=np.float32)
                    mat = np.roll(mat, 13 * c, axis=1)
                    col = pa.array(list(mat), type=t.schema.field(name).type)
                if col is not None:
                    cols[name] = col
            if cols.pop("__defer_nchars__", None):
                cols["n_chars"] = pc.cast(
                    pc.utf8_length(cols["text"]), t.schema.field("n_chars").type
                )
            copies.append(
                pa.table({f.name: cols[f.name] for f in t.schema})
            )
        out = pa.concat_tables(copies)
        pq.write_table(out, os.path.join(dst, fname))
        print(f"{table}: {t.num_rows} -> {out.num_rows} rows")


if __name__ == "__main__":
    main()
