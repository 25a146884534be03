"""Turn two bench.py JSON outputs at different SFs into a scaling-trend
table: per query, the two wall times, the observed ratio, and the
floor/marginal decomposition from the two-point linear model
t(sf) = floor + rate*sf.

The decomposition is the 100 TB predictor: a query whose time is mostly
`floor` (stage/scheduling constant) amortizes on a real cluster; a query
whose ratio exceeds the SF ratio is superlinear at THIS parameterization
and needs its knobs (cluster count, bands, k) scaled with data.

Usage: python scripts/scaling_report.py LO.json HI.json
(each file is one bench.py stdout JSON line; sf read from the file)
"""

from __future__ import annotations

import json
import sys


def load(path: str) -> tuple[float, dict[str, float]]:
    with open(path) as fh:
        d = json.load(fh)
    qs = dict(d["queries"])
    qs.update(d.get("extras", {}))
    return float(d["sf"]), qs


# generated-input queries whose size is a knob, not the SF dir — a cross-SF
# ratio for these measures nothing (bench_terasort_* generate their own rows)
SELF_SCALED = {"bench_terasort_big", "bench_terasort_validate", "bench_gridmix_replay"}


def main() -> None:
    sf_lo, lo = load(sys.argv[1])
    sf_hi, hi = load(sys.argv[2])
    lo = {k: v for k, v in lo.items() if k not in SELF_SCALED}
    ratio_sf = sf_hi / sf_lo
    print(f"| query | t@{sf_lo} | t@{sf_hi} | ratio (sf x{ratio_sf:.0f}) | floor s | marginal s/sf | read |")
    print("|---|---|---|---|---|---|---|")
    rows = []
    for name in lo:
        if name not in hi:
            continue
        t_lo, t_hi = lo[name], hi[name]
        r = t_hi / t_lo if t_lo else float("inf")
        rate = (t_hi - t_lo) / (sf_hi - sf_lo)
        floor = max(0.0, t_lo - rate * sf_lo)
        if r <= 1.3:
            read = "floor-bound"
        elif r <= ratio_sf * 1.15:
            read = "≤linear"
        else:
            read = f"SUPERLINEAR x{r / ratio_sf:.1f}"
        rows.append((r, name, t_lo, t_hi, floor, rate, read))
    for r, name, t_lo, t_hi, floor, rate, read in sorted(rows, reverse=True):
        print(
            f"| {name} | {t_lo:.2f} | {t_hi:.2f} | {r:.2f} | {floor:.2f} |"
            f" {rate:.2f} | {read} |"
        )


if __name__ == "__main__":
    main()
