"""Assemble a BENCH_SCALING_r*.json bundle from per-scale bench runs.

Each scale point is a plain bench.py stdout line plus its
BENCH_SPREAD.json sidecar (captured right after the run). The bundle
format matches BENCH_SCALING_r10.json: one {metric, value, unit,
queries, sf} block per "sfX" key plus a "spreads" section of
per-query [min, max] ranges.

Usage:
  python tools/assemble_scaling.py OUT.json sf0.1=/tmp/b.json:/tmp/s.json [sf1=...]
"""

from __future__ import annotations

import json
import sys


def main() -> int:
    out_path = sys.argv[1]
    bundle: dict = {}
    spreads: dict = {}
    for spec in sys.argv[2:]:
        key, _, paths = spec.partition("=")
        bench_path, _, spread_path = paths.partition(":")
        bundle[key] = json.load(open(bench_path))
        if spread_path:
            spreads[key] = json.load(open(spread_path))["spread"]
    bundle["spreads"] = spreads
    with open(out_path, "w") as f:
        json.dump(bundle, f, indent=1)
    scales = [k for k in bundle if k.startswith("sf")]
    print(f"wrote {out_path}: {scales}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
