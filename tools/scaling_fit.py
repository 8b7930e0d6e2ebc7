"""Per-query power-law fits over a BENCH_SCALING_r*.json bundle.

Fits wall = c * sf^e by least squares in log-log space over every
scale point a query appears in, prints the table sorted by exponent
(descending) and flags e > 0.9 — at 100 TB a near-linear-or-worse
compute path is the thing to chase, while sub-linear exponents mean
fixed floors still dominate at bench scale.

Usage: python tools/scaling_fit.py BENCH_SCALING_r11.json [--flag 0.9]
"""

from __future__ import annotations

import json
import math
import sys


def fit(points: list[tuple[float, float]]) -> float | None:
    """Least-squares slope of log(wall) vs log(sf); None if < 2 points
    or any non-positive wall."""
    pts = [(s, w) for s, w in points if w > 0]
    if len(pts) < 2:
        return None
    xs = [math.log(s) for s, _ in pts]
    ys = [math.log(w) for _, w in pts]
    n = len(pts)
    mx, my = sum(xs) / n, sum(ys) / n
    denom = sum((x - mx) ** 2 for x in xs)
    if denom == 0:
        return None
    return sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / denom


def main() -> int:
    path = sys.argv[1] if len(sys.argv) > 1 else "BENCH_SCALING_r11.json"
    flag = 0.9
    for i, a in enumerate(sys.argv):
        if a == "--flag":
            flag = float(sys.argv[i + 1])
    bundle = json.load(open(path))
    scales = sorted(
        (k for k in bundle if k.startswith("sf")), key=lambda k: float(k[2:])
    )
    sfs = {k: float(k[2:]) for k in scales}
    names: list[str] = []
    for k in scales:
        for q in bundle[k].get("queries", {}):
            if q not in names:
                names.append(q)
    rows = []
    for q in names:
        pts = [
            (sfs[k], bundle[k]["queries"][q])
            for k in scales
            if q in bundle[k].get("queries", {})
        ]
        e = fit(pts)
        rows.append((q, e, len(pts), pts[-1][1] if pts else None))
    rows.sort(key=lambda r: (r[1] is None, -(r[1] or 0)))
    n_flagged = 0
    print(f"{'query':42s} {'exp':>6s} {'pts':>3s} {'wall@max':>9s}")
    for q, e, npts, last in rows:
        mark = ""
        if e is not None and e > flag:
            mark = f"  <-- exponent > {flag}"
            n_flagged += 1
        es = f"{e:6.2f}" if e is not None else "     -"
        print(f"{q:42s} {es} {npts:3d} {last:9.3f}{mark}")
    suite_pts = [(sfs[k], bundle[k]["value"]) for k in scales if "value" in bundle[k]]
    se = fit(suite_pts)
    print(
        f"\nsuite exponent over {len(suite_pts)} points: "
        f"{se:.3f}" if se is not None else "\nsuite exponent: n/a"
    )
    print(f"flagged (> {flag}): {n_flagged}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
