"""Order-reversed paired A/B bench of HEAD vs a baseline git ref
(r13 verdict task 7 — the manual experiment of SCALE.md's round-13
round-over-round section, folded into a tool).

The box's wall-clock decays over a session (r13 measured identical
code at 37.5 -> 49.7 s), so "run old, then new" conflates code deltas
with drift. This tool interleaves FULL bench.py runs of the two sides
with the order REVERSED on alternate repetitions:

    rep 0:  baseline, head
    rep 1:  head, baseline
    rep 2:  baseline, head
    ...

so each side is measured equally early and late; per-query medians of
the two sides are then drift-balanced by construction, and the paired
per-rep deltas expose any residual trend. Each side runs its OWN
bench.py in a subprocess (its own JVM, its own package import — the
only way to execute two code versions that share a module namespace).

Usage:
    python tools/bench_ab.py <baseline-ref> [--sf-dir DIR] [--reps N]

Writes BENCH_AB.json at the repo root:
    {"baseline_ref", "sf_dir", "reps", "runs_per_query",
     "per_rep": [{"order", "baseline": {q: s}, "head": {q: s}}, ...],
     "median": {"baseline": {...}, "head": {...}},
     "delta": {q: head_med - base_med, ...},
     "calib": {"baseline": [...], "head": [...]}}

SPARK_GRAFT_BENCH_RUNS defaults to 1 here (the paired repetitions
replace the within-run median); raise it for the full protocol.
"""

from __future__ import annotations

import json
import os
import statistics
import subprocess
import sys
import tempfile

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _run_side(side_dir: str, sf_dir: str, runs_per_query: str) -> dict:
    """One full bench.py run in a subprocess; returns the parsed final
    JSON line (queries medians + calib_sec)."""
    env = dict(os.environ)
    env["SPARK_GRAFT_SF_DIR"] = sf_dir
    env["SPARK_GRAFT_BENCH_RUNS"] = runs_per_query
    # never round-stamp archives from A/B runs
    env.pop("SPARK_GRAFT_BENCH_ROUND", None)
    out = subprocess.run(
        [sys.executable, "bench.py"],
        cwd=side_dir,
        env=env,
        capture_output=True,
        text=True,
        check=True,
    )
    last = [ln for ln in out.stdout.strip().splitlines() if ln.startswith("{")][-1]
    return json.loads(last)


def main() -> int:
    args = sys.argv[1:]
    if not args:
        print(__doc__)
        return 2
    ref = args[0]
    sf_dir = "/root/testdata/sf0.01"
    reps = 2
    runs_per_query = os.environ.get("SPARK_GRAFT_BENCH_RUNS", "1")
    it = iter(args[1:])
    for a in it:
        if a == "--sf-dir":
            sf_dir = next(it)
        elif a == "--reps":
            reps = int(next(it))

    # Resolve the ref to a SHA up front and verify any reused worktree
    # is actually AT it (r15 advice: a moved branch or a prior run's
    # leftover checkout silently benched stale code as the "baseline").
    sha = subprocess.run(
        ["git", "rev-parse", f"{ref}^{{commit}}"],
        cwd=REPO,
        capture_output=True,
        text=True,
        check=True,
    ).stdout.strip()
    wt = os.path.join(
        tempfile.gettempdir(), f"bench_ab_{ref.replace('/', '_')}"
    )
    if os.path.exists(wt):
        at = subprocess.run(
            ["git", "-C", wt, "rev-parse", "HEAD"],
            capture_output=True,
            text=True,
        ).stdout.strip()
        if at != sha:
            print(
                f"# worktree {wt} at {at[:12]}, want {sha[:12]} —"
                " re-checking out",
                file=sys.stderr,
            )
            subprocess.run(
                ["git", "-C", wt, "checkout", "--detach", sha], check=True
            )
    else:
        subprocess.run(
            ["git", "worktree", "add", "--detach", wt, sha],
            cwd=REPO,
            check=True,
        )

    per_rep, calib = [], {"baseline": [], "head": []}
    for rep in range(reps):
        order = (
            [("baseline", wt), ("head", REPO)]
            if rep % 2 == 0
            else [("head", REPO), ("baseline", wt)]
        )
        rec = {"order": [side for side, _ in order]}
        for side, side_dir in order:
            print(f"# rep {rep}: running {side} ({side_dir})", file=sys.stderr)
            line = _run_side(side_dir, sf_dir, runs_per_query)
            rec[side] = line["queries"]
            if "calib_sec" in line:
                calib[side].append(line["calib_sec"])
        per_rep.append(rec)

    common = set(per_rep[0]["baseline"]) & set(per_rep[0]["head"])
    med = {
        side: {
            q: round(statistics.median(r[side][q] for r in per_rep), 3)
            for q in common
        }
        for side in ("baseline", "head")
    }
    delta = {
        q: round(med["head"][q] - med["baseline"][q], 3)
        for q in sorted(common, key=lambda q: med["head"][q] - med["baseline"][q])
    }
    out = {
        "baseline_ref": ref,
        "sf_dir": sf_dir,
        "reps": reps,
        "runs_per_query": int(runs_per_query),
        "per_rep": per_rep,
        "median": med,
        "delta": delta,
        "calib": calib,
        "total_delta": round(
            sum(med["head"].values()) - sum(med["baseline"].values()), 3
        ),
    }
    path = os.path.join(REPO, "BENCH_AB.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"# paired A/B written to {path}", file=sys.stderr)
    print(
        json.dumps(
            {
                "total_delta_sec": out["total_delta"],
                "baseline_total": round(sum(med["baseline"].values()), 3),
                "head_total": round(sum(med["head"].values()), 3),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
