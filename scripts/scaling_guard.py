"""Standing scale-regression gate (round 9, VERDICT r8 item 3; N-point
series + fitted slope since round 10): FAIL if any measured query is
superlinear across the bench points.

scripts/scaling_report.py narrates the floor/marginal decomposition; this
script is the pass/fail wrapper the round freeze runs so a future
superlinear regression (a pinned knob, an accidental all-pairs join) cannot
land silently. Two layers:

1. PAIRWISE (any number of points >= 2): for each consecutive SF pair, a
   query FAILS when  t_hi / t_lo > (sf_hi / sf_lo) * TOLERANCE  with
   TOLERANCE = 1.2 by default (linear scaling plus ambient noise on a
   shared box).
2. FITTED SLOPE (3+ points): OLS slope of ln(t) on ln(sf) over the whole
   series — the layer that catches COMPOUNDING creep the per-pair noise
   allowances admit. Fixed stage floors only ever push the slope BELOW 1,
   so an upper bound is safe. Honest models measure: linear + tolerance
   over a 10x span is slope <= 1 + ln(1.2)/ln(10) ~= 1.08; the quantized
   pair-bill operators' power-of-two wobble is BOUNDED (it cannot compound
   across points — rows/bucket oscillates in a fixed band), measured
   ~1.11 on an honest quantized-linear series. Gates: SLOPE_MAX = 1.25
   plain, 1.45 pair-bill — above the honest models with headroom, below
   both the pairwise-leak maximum (a series riding every pair allowance
   fits ~1.3 plain / ~1.55 pair-bill) and any pure power law >= 1.5.
   A genuine O(N^2) measures ~2.0 and fails unambiguously.

The generated-input queries (terasort/gridmix) are excluded — their size is
a knob, not the SF dir. The size-derived pair-bill operators carry a
modeled quantization allowance (see QUANTIZED_PAIR_BILL below).

Usage: python scripts/scaling_guard.py LO.json [MID.json ...] HI.json
           [--tolerance X]
Files may be given in any order; they are sorted by their "sf" field.
Exit 0 = every common query within bounds; exit 1 otherwise.
Each input is one bench.py stdout JSON line (headline + extras merged).
"""

from __future__ import annotations

import json
import math
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
# Fitted-slope gates (3+ points) — see module docstring layer 2 for the
# derivation (honest linear ~1.08, honest quantized-linear ~1.11,
# pairwise-leak max ~1.3/~1.55, quadratic ~2.0).
SLOPE_MAX = 1.25
SLOPE_MAX_QUANTIZED = 1.45


def load(path: str) -> tuple[float, dict[str, float]]:
    with open(path) as fh:
        d = json.load(fh)
    qs = dict(d["queries"])
    qs.update(d.get("extras", {}))
    return float(d["sf"]), qs


def fit_slope(sfs: list[float], ts: list[float]) -> float:
    """OLS slope of ln(t) on ln(sf). Timings are clamped to 1 ms before the
    log: only the lowest point is floor-gated by MIN_LO_SEC, so a 0.0 at a
    higher point (a degenerate bench artifact) must degrade to a harmless
    near-zero term, not crash the gate with a bare ValueError (ADVICE r10).
    The clamp can only LOWER the fitted slope at a non-lowest point, and a
    sub-millisecond timing there means the query is floor-bound anyway."""
    xs = [math.log(s) for s in sfs]
    ys = [math.log(max(t, 1e-3)) for t in ts]
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    sxx = sum((x - mx) * (x - mx) for x in xs)
    sxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys))
    return sxy / sxx


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
    if len(argv) < 2:
        sys.exit(
            "usage: scaling_guard.py LO.json [MID.json ...] HI.json"
            " [--tolerance X]"
        )
    points = sorted((load(p) for p in argv), key=lambda x: x[0])
    sfs = [sf for sf, _ in points]
    if len(set(sfs)) != len(sfs):
        sys.exit(f"duplicate sf points: {sfs}")
    lo = points[0][1]
    # a query must be measured at EVERY point and above the floor at the
    # lowest one to be gated
    common = [
        name
        for name, t in sorted(lo.items())
        if name not in SELF_SCALED
        and t >= MIN_LO_SEC
        and all(name in qs for _, qs in points[1:])
    ]
    bad: list[str] = []
    for name in common:
        ts = [qs[name] for _, qs in points]
        quant = name in QUANTIZED_PAIR_BILL
        flags: list[str] = []
        ok = True
        # layer 1: consecutive-pair ratio rule
        for (sf_a, _), (sf_b, _), t_a, t_b in zip(
            points, points[1:], ts, ts[1:]
        ):
            if t_a < MIN_LO_SEC:
                continue  # this pair's low side is floor-dominated
            allowed = (sf_b / sf_a) * tol * (QUANT_FACTOR if quant else 1.0)
            r = t_b / t_a
            if r > allowed:
                ok = False
                flags.append(
                    f"pair {sf_a}->{sf_b} x{r:.2f} > {allowed:.1f}"
                )
        # layer 2: fitted slope over the whole series
        slope = None
        if len(points) >= 3:
            slope = fit_slope(sfs, ts)
            smax = SLOPE_MAX_QUANTIZED if quant else SLOPE_MAX
            if slope > smax:
                ok = False
                flags.append(f"slope {slope:.2f} > {smax}")
        series = " -> ".join(f"{t:.2f}s" for t in ts)
        note = f"  [pair-bill]" if quant else ""
        stail = f"  slope={slope:.2f}" if slope is not None else ""
        fail = ("  <-- SUPERLINEAR: " + "; ".join(flags)) if not ok else ""
        print(f"{name}: {series}{stail}{note}{fail}")
        if not ok:
            bad.append(name)
    print(
        f"\n{len(common)} checked at sf {sfs} (tolerance {tol});"
        f" {len(bad)} superlinear"
    )
    if bad:
        print(f"FAIL: {bad}")
        sys.exit(1)
    print("OK")


if __name__ == "__main__":
    main()
