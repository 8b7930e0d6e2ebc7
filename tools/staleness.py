"""Driver-row staleness report — the input to each round's _PRIORITY
rotation (salesforce_prefect_etl_pipeline_spark/queries_all.py).

The driver's correctness gate hard-checks only the FIRST 50 registered
queries per round, so every query's "latest hard-signal row" ages unless
rotated back into the window. This prints, oldest first, the round of
each registered query's most recent CORRECTNESS_r*.json appearance —
exactly the list the next round's tier-1/tier-2 window should front.

Usage: python tools/staleness.py [--window 50]
"""

from __future__ import annotations

import glob
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    window = 50
    for a in sys.argv[1:]:
        if a.startswith("--window"):
            window = int(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
    latest: dict[str, int] = {}
    for f in sorted(glob.glob("CORRECTNESS_r*.json")):
        rnd = int(f.split("_r")[1].split(".")[0])
        d = json.load(open(f))
        for k in d:
            latest[k] = rnd

    from salesforce_prefect_etl_pipeline_spark.queries_all import QUERIES

    rows = sorted(((latest.get(q, 0), q) for q in QUERIES))
    never = [q for r, q in rows if r == 0]
    if never:
        print(f"NEVER driver-checked ({len(never)}):")
        for q in never:
            print(f"  r-  {q}")
    print(f"\noldest-first ({len(rows)} registered; window={window}):")
    for r, q in rows:
        if r:
            print(f"  r{r:<2d} {q}")
    suggested = [q for _, q in rows][:window]
    print(f"\nsuggested next-round window (oldest {window}):")
    for q in suggested:
        print(f'    "{q}",')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
