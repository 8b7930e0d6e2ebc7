"""Spread-aware round-over-round bench comparison.

bench.py reports per-query median-of-3 plus a [min, max] spread; this
tool compares two BENCH json files and separates REAL movements (the
two runs' spreads don't overlap) from scheduling noise (they do) — the
distinction a previous round's audit had to reconstruct by hand for a
0.4 s query whose single-shot time swung 1.5x.

Usage: python tools/bench_compare.py BENCH_r08.json BENCH_r10.json
Files may be plain bench output ({"queries": ...}) or a BENCH_SCALING
bundle ({"sf0.1": {...}, "sf1": {...}}), in which case pass the same sf
key on both sides via --sf=sf0.1. Since round 10 the final bench line is
compact (medians only) and the [min, max] spreads live in a sidecar
(BENCH_SPREAD.json); attach sidecars with --spread-a=path /
--spread-b=path to restore noise separation for that side.
"""

from __future__ import annotations

import json
import os
import re
import sys


def _auto_spread(path: str) -> str | None:
    """BENCH_r{N}.json -> sibling BENCH_SPREAD_r{N}.json when present
    (bench.py archives one per round since r12; r10/r11 backfilled), so
    `bench_compare.py BENCH_r10.json BENCH_r11.json` noise-separates
    both sides with no flags."""
    m = re.match(r"BENCH_r(\d+)\.json$", os.path.basename(path))
    if not m:
        return None
    cand = os.path.join(os.path.dirname(path), f"BENCH_SPREAD_r{m.group(1)}.json")
    return cand if os.path.exists(cand) else None


def load(path: str, sf: str | None, spread_path: str | None = None) -> dict:
    d = json.load(open(path))
    if "parsed" in d and "queries" not in d:
        # driver-recorded BENCH_r{N}.json wraps the stdout line
        if d["parsed"] is None:
            raise SystemExit(
                f"{path}: driver recorded parsed=null (the bench stdout "
                "line did not survive tail capture) — no medians to "
                "compare. Use the round's BENCH_SCALING sidecar with "
                "--sf=sf0.1 instead, e.g. BENCH_SCALING_r09.json."
            )
        d = d["parsed"]
    if sf is not None and "queries" not in d:
        # --sf selects within a BENCH_SCALING bundle; a plain bench
        # file on the other side of the comparison ignores it.
        if sf not in d:
            raise SystemExit(
                f"{path}: no {sf!r} block (keys: {sorted(d)[:8]})"
            )
        d = d[sf]
    if spread_path is not None:
        d = dict(d, spread=json.load(open(spread_path))["spread"])
    return d


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    sf = spread_a = spread_b = None
    for a in sys.argv[1:]:
        if a.startswith("--sf="):
            sf = a[len("--sf="):]
        elif a.startswith("--spread-a="):
            spread_a = a[len("--spread-a="):]
        elif a.startswith("--spread-b="):
            spread_b = a[len("--spread-b="):]
    if len(args) != 2:
        print(__doc__)
        return 2
    spread_a = spread_a or _auto_spread(args[0])
    spread_b = spread_b or _auto_spread(args[1])
    a, b = load(args[0], sf, spread_a), load(args[1], sf, spread_b)
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
