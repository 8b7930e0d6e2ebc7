"""Driver-row staleness report — the input to each round's _PRIORITY
rotation (salesforce_prefect_etl_pipeline_spark/queries_all.py).

The driver's correctness gate hard-checks only the FIRST 50 registered
queries per round, so every query's "latest hard-signal row" ages unless
rotated back into the window. This prints, oldest first, the round of
each registered query's most recent CORRECTNESS_r*.json appearance —
exactly the list the next round's tier-1/tier-2 window should front.

``--check`` diffs the CURRENT ``_PRIORITY`` window against the suggested
one and exits non-zero on drift, so forgetting the rotation at the start
of a round is a hard failure (tests/test_registry.py wires this into
pytest). The comparison is by set — reordering inside the window is
legitimate (all 50 get checked either way); missing/extra names are not.

Usage: python tools/staleness.py [--window 50] [--check]
"""

from __future__ import annotations

import glob
import json
import os
import sys

_REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO)


def _round_files() -> list[tuple[int, str]]:
    """(round, path) for every CORRECTNESS_r*.json, ascending by round."""
    out = []
    for f in glob.glob(os.path.join(_REPO, "CORRECTNESS_r*.json")):
        out.append((int(os.path.basename(f).split("_r")[1].split(".")[0]), f))
    return sorted(out)


def latest_rounds() -> dict[str, int]:
    """Latest CORRECTNESS_r*.json round per query name (repo root)."""
    latest: dict[str, int] = {}
    for rnd, f in _round_files():
        for k in json.load(open(f)):
            latest[k] = rnd
    return latest


def newest_round_set() -> set[str]:
    """Query names covered by the newest CORRECTNESS round (empty if none)."""
    files = _round_files()
    if not files:
        return set()
    return set(json.load(open(files[-1][1])))


def second_newest_round_set() -> set[str]:
    """Query names covered by the second-newest round (empty if <2 rounds)."""
    files = _round_files()
    if len(files) < 2:
        return set()
    return set(json.load(open(files[-2][1])))


def suggested_window(window: int = 50) -> list[str]:
    """The oldest-``window`` registered queries, never-checked first then
    by (round, name) — what next round's _PRIORITY should front."""
    from salesforce_prefect_etl_pipeline_spark.queries_all import QUERIES

    latest = latest_rounds()
    rows = sorted((latest.get(q, 0), q) for q in QUERIES)
    return [q for _, q in rows][:window]


def priority_window(window: int = 50) -> list[str]:
    """The first ``window`` names the registry actually fronts."""
    from salesforce_prefect_etl_pipeline_spark.queries_all import QUERIES

    return list(QUERIES)[:window]


def check_drift(window: int = 50) -> list[str]:
    """Human-readable drift lines; empty means the rotation is current.

    Time-consistency (r11 advice): once the driver's newest
    CORRECTNESS_r*.json lands it re-dates every query it covers, so the
    naive "fronted == suggested-oldest-N" comparison flips red at the
    natural end-of-round commit even though the rotation WAS done. If
    the fronted window is exactly the newest round's checked set, the
    rotation has been consumed by that round — treat it as current; the
    check goes red only when a NEW round starts without rotating.

    Exemption guard (r12 advice): the driver always checks the fronted
    50, so a round that SKIPS the rotation still lands a CORRECTNESS
    file equal to the fronted window — the exemption alone would keep
    the check green forever. Two consecutive rounds covering the same
    set is the fingerprint of a skipped rotation, so the exemption is
    denied when the two newest round sets are identical.
    """
    have = set(priority_window(window))
    newest = newest_round_set()
    if have and have == newest and newest != second_newest_round_set():
        return []
    want = set(suggested_window(window))
    problems = []
    for q in sorted(want - have):
        problems.append(f"stale query NOT fronted: {q}")
    for q in sorted(have - want):
        problems.append(f"fronted but not in suggested window: {q}")
    return problems


def main() -> int:
    window = 50
    check = False
    for a in sys.argv[1:]:
        if a.startswith("--window"):
            window = int(a.split("=", 1)[1] if "=" in a else sys.argv[sys.argv.index(a) + 1])
        elif a == "--check":
            check = True

    if check:
        problems = check_drift(window)
        if problems:
            print(f"ROTATION DRIFT ({len(problems)}):")
            for p in problems:
                print(f"  {p}")
            return 1
        print(f"rotation current: _PRIORITY window matches the suggested oldest-{window}")
        return 0

    from salesforce_prefect_etl_pipeline_spark.queries_all import QUERIES

    latest = latest_rounds()
    rows = sorted((latest.get(q, 0), q) for q in QUERIES)
    never = [q for r, q in rows if r == 0]
    if never:
        print(f"NEVER driver-checked ({len(never)}):")
        for q in never:
            print(f"  r-  {q}")
    print(f"\noldest-first ({len(rows)} registered; window={window}):")
    for r, q in rows:
        if r:
            print(f"  r{r:<2d} {q}")
    print(f"\nsuggested next-round window (oldest {window}):")
    for q in [q for _, q in rows][:window]:
        print(f'    "{q}",')
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
