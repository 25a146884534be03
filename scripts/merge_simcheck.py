"""Merge per-process driver_sim chunk receipts into one SIMCHECK file.

Big-SF full sims run as N fresh processes (`--chunk i/n`) because the
DuckDB-oracle allocator high-water accumulates across heavy oracles within
one process (the r10 sf1.0 harness OOM). Each chunk writes its own --out;
this script verifies the chunks are disjoint, complete against the live
registry, and all green, then writes the union receipt.

Usage: python scripts/merge_simcheck.py OUT CHUNK1 CHUNK2 [...]
Exits non-zero if chunks overlap, miss registry names, or carry red rows.
"""

from __future__ import annotations

import json
import sys

sys.path.insert(0, "/root/repo")


def main() -> None:
    out, *chunk_paths = sys.argv[1:]
    chunks = [json.load(open(p)) for p in chunk_paths]

    sf_dirs = {c["sf_dir"] for c in chunks}
    if len(sf_dirs) != 1:
        sys.exit(f"chunks disagree on sf_dir: {sf_dirs}")
    # The oracle watchdog budget may legitimately differ between chunk
    # runs (a healed row re-ran solo under a longer budget); record the
    # full set rather than rejecting.
    timeouts = sorted({c.get("oracle_timeout_sec") for c in chunks})

    merged: dict[str, dict] = {}
    for p, c in zip(chunk_paths, chunks):
        if c.get("partial"):
            sys.exit(f"{p} is marked partial — its run did not finish")
        for name, row in c["queries"].items():
            if name in merged:
                sys.exit(f"duplicate query across chunks: {name}")
            merged[name] = row

    import __spark_entry__ as e

    registry = set(e.queries())
    missing = registry - set(merged)
    extra = set(merged) - registry
    if missing or extra:
        sys.exit(f"registry mismatch: missing={sorted(missing)} extra={sorted(extra)}")

    n_ok = sum(
        1
        for r in merged.values()
        if r.get("hash_match") is True
        or (r.get("oracle") is False and r.get("err") is None)
    )
    n_timeout = sum(
        1 for r in merged.values() if str(r.get("err", "")).startswith("oracle: timeout")
    )
    n_bad = len(merged) - n_ok - n_timeout

    with open(out, "w") as fh:
        json.dump(
            {
                "sf_dir": sf_dirs.pop(),
                "cpus": chunks[0].get("cpus"),
                "n_ok": n_ok,
                "n_bad": n_bad,
                "n_oracle_timeout": n_timeout,
                "oracle_timeout_sec": timeouts if len(timeouts) > 1 else timeouts[0],
                "merged_from": chunk_paths,
                "queries": {n: merged[n] for n in sorted(merged)},
            },
            fh,
            indent=1,
        )
    print(f"wrote {out}: {n_ok} ok, {n_bad} bad, {n_timeout} timeouts of {len(merged)}")
    sys.exit(1 if n_bad else 0)


if __name__ == "__main__":
    main()
