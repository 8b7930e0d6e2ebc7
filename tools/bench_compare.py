"""Spread-aware round-over-round bench comparison.

bench.py reports per-query median-of-3 plus a [min, max] spread; this
tool compares two BENCH json files and separates REAL movements (the
two runs' spreads don't overlap) from scheduling noise (they do) — the
distinction a previous round's audit had to reconstruct by hand for a
0.4 s query whose single-shot time swung 1.5x.

Usage: python tools/bench_compare.py BENCH_r08.json BENCH_r09.json
Files may be plain bench output ({"queries": ..., "spread": ...}) or a
BENCH_SCALING bundle ({"sf0.1": {...}, "sf1": {...}}), in which case
pass the same sf key on both sides via --sf=sf0.1.
"""

from __future__ import annotations

import json
import sys


def load(path: str, sf: str | None) -> dict:
    d = json.load(open(path))
    if "parsed" in d and "queries" not in d:
        d = d["parsed"]  # driver-recorded BENCH_r{N}.json wraps the line
    if sf is not None:
        d = d[sf]
    return d


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--sf=")]
    sf = None
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a[len("--sf="):]
    if len(args) != 2:
        print(__doc__)
        return 2
    a, b = load(args[0], sf), load(args[1], sf)
    qa, qb = a["queries"], b["queries"]
    sa, sb = a.get("spread", {}), b.get("spread", {})
    common = [k for k in qa if k in qb]
    print(f"{len(common)} common queries; totals "
          f"{sum(qa[k] for k in common):.2f}s -> {sum(qb[k] for k in common):.2f}s")
    moved, noise = [], []
    for k in common:
        ta, tb = qa[k], qb[k]
        lo_a, hi_a = sa.get(k, [ta, ta])
        lo_b, hi_b = sb.get(k, [tb, tb])
        overlap = not (lo_b > hi_a or lo_a > hi_b)
        ratio = tb / ta if ta else float("inf")
        (noise if overlap else moved).append((ratio, k, ta, tb, (lo_a, hi_a), (lo_b, hi_b)))
    moved.sort(reverse=True)
    if not moved:
        print("no movements outside spread overlap — all noise-compatible")
    for ratio, k, ta, tb, ra, rb in moved:
        tag = "SLOWER" if ratio > 1 else "faster"
        print(f"{tag} {ratio:5.2f}x {k}: {ta}s {list(ra)} -> {tb}s {list(rb)}")
    only_a = sorted(set(qa) - set(qb))
    only_b = sorted(set(qb) - set(qa))
    if only_a:
        print("removed:", ", ".join(only_a))
    if only_b:
        print("added:", ", ".join(only_b))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
