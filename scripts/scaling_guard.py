"""Standing scale-regression gate (round 9, VERDICT r8 item 3): FAIL if any
measured query is superlinear across two bench points.

scripts/scaling_report.py narrates the floor/marginal decomposition; this
script is the pass/fail wrapper the round freeze runs so a future
superlinear regression (a pinned knob, an accidental all-pairs join) cannot
land silently. A query FAILS when

    t_hi / t_lo  >  (sf_hi / sf_lo) * TOLERANCE

with TOLERANCE = 1.2 by default: linear scaling plus ambient noise on a
shared box. The generated-input queries (terasort/gridmix) are excluded —
their size is a knob, not the SF dir.

Usage: python scripts/scaling_guard.py LO.json HI.json [--tolerance X]
Exit 0 = every common query <= linear*tolerance; exit 1 otherwise.
Each input is one bench.py stdout JSON line (headline + extras merged).
"""

from __future__ import annotations

import json
import sys

SELF_SCALED = {"bench_terasort_big", "bench_terasort_validate", "bench_gridmix_replay"}
# Sub-second queries are floor-dominated: a 0.2s -> 0.9s move is scheduler
# noise, not a scaling signal. Only times above this floor can fail the gate.
MIN_LO_SEC = 0.5
# The size-derived pair-bill operators are amortized-linear but their cell
# count is QUANTIZED: sign-buckets come in powers of two (dims =
# ceil(log2(N/40)), so rows/bucket oscillates in (20, 40] and a x5 SF pair
# can land rows/bucket x1.25 higher at the hi point), and the Hamming-1
# probe factor grows as (dims+1) (x9/7 here). Exact two-point bound for a
# x5 pair: 5 * 1.25 * 1.3 ~= 8.1; semdedup adds the N*k Lloyd-assignment
# term (k = ceil(N/250)), negligible in seconds at these SFs but visible
# in the ratio. Allowance 1.65 * sf_ratio * tolerance (= 9.9 at x5)
# admits the modeled envelope while still failing every pinned-knob
# regression ever measured (x11.9 / x15.7 / x24.8 — SCALE.md r8 table).
QUANTIZED_PAIR_BILL = {"dd_semdedup", "sim_hubness", "sim_threshold_join"}
QUANT_FACTOR = 1.65


def load(path: str) -> tuple[float, dict[str, float]]:
    with open(path) as fh:
        d = json.load(fh)
    qs = dict(d["queries"])
    qs.update(d.get("extras", {}))
    return float(d["sf"]), qs


def main() -> None:
    argv = sys.argv[1:]
    tol = 1.2
    if "--tolerance" in argv:
        i = argv.index("--tolerance")
        tol = float(argv[i + 1])
        del argv[i : i + 2]
    unknown = [a for a in argv if a.startswith("--")]
    if unknown:
        sys.exit(f"unknown flags: {unknown}")
    if len(argv) != 2:
        sys.exit("usage: scaling_guard.py LO.json HI.json [--tolerance X]")
    sf_lo, lo = load(argv[0])
    sf_hi, hi = load(argv[1])
    base_allowed = (sf_hi / sf_lo) * tol
    bad: list[str] = []
    n_checked = 0
    for name, t_lo in sorted(lo.items()):
        if name in SELF_SCALED or name not in hi:
            continue
        if t_lo < MIN_LO_SEC:
            continue
        n_checked += 1
        allowed = base_allowed * (
            QUANT_FACTOR if name in QUANTIZED_PAIR_BILL else 1.0
        )
        r = hi[name] / t_lo
        flag = "  <-- SUPERLINEAR" if r > allowed else ""
        if name in QUANTIZED_PAIR_BILL:
            flag = f"  [pair-bill allowance {allowed:.1f}]" + flag
        if r > allowed:
            bad.append(name)
        print(f"{name}: {t_lo:.2f}s -> {hi[name]:.2f}s  x{r:.2f}{flag}")
    print(
        f"\n{n_checked} checked at sf {sf_lo}->{sf_hi}"
        f" (allowed ratio {base_allowed:.1f}); {len(bad)} superlinear"
    )
    if bad:
        print(f"FAIL: {bad}")
        sys.exit(1)
    print("OK")


if __name__ == "__main__":
    main()
