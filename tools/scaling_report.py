"""Per-query sf0.1 → sf0.5 scaling table (VERDICT r5 #4).

Reads the two BENCH_DETAIL snapshots produced by bench.py runs against
/root/testdata/sf0.1 and the 5×-replicated .scaling/sf0.5 (built by
tools/make_scaled_sf.py) and prints a markdown table of per-query wall
ratios. Interpretation: queries near 1× are job-floor-bound (driver
scheduling, not data); queries near 5× are data-bound and scaling
linearly; super-linear ratios are the ones to audit for quadratic
candidate growth.

Usage: python tools/scaling_report.py [sf01_detail] [sf05_detail]
"""

from __future__ import annotations

import json
import sys


def main() -> None:
    p01 = sys.argv[1] if len(sys.argv) > 1 else "/root/repo/.scaling/BENCH_DETAIL_sf01.json"
    p05 = sys.argv[2] if len(sys.argv) > 2 else "/root/repo/.scaling/BENCH_DETAIL_sf05.json"
    d01 = json.load(open(p01))["queries"]
    d05 = json.load(open(p05))["queries"]
    rows = []
    for name, t01 in sorted(d01.items()):
        t05 = d05.get(name)
        if t05 is None or t01 <= 0:
            continue
        rows.append((name, t01, t05, t05 / t01))
    rows.sort(key=lambda r: r[3])
    print("| query | sf0.1 s | sf0.5 s | ratio |")
    print("|---|---|---|---|")
    for name, t01, t05, r in rows:
        print(f"| {name} | {t01:.2f} | {t05:.2f} | {r:.2f}x |")
    ratios = [r[3] for r in rows]
    n = len(ratios)
    med = sorted(ratios)[n // 2]
    floor_tier = sum(1 for r in ratios if r < 2.0)
    linear_tier = sum(1 for r in ratios if 2.0 <= r <= 7.0)
    super_tier = [rw[0] for rw in rows if rw[3] > 7.0]
    print()
    print(
        f"{n} queries; median ratio {med:.2f}x at 5x data; "
        f"{floor_tier} job-floor-bound (<2x), {linear_tier} ~linear (2-7x), "
        f"super-linear (>7x): {super_tier or 'none'}"
    )


if __name__ == "__main__":
    main()
