"""Measure the containment broadcast window's UPPER edge (r10 verdict
task 3) — the one designed-for-scale behavior that had no data point:
``CONTAINMENT_BROADCAST_MAX_PROBE_ROWS`` (20M) and the ~320 MB index
footprint claim were reasoned, not measured (sf1 sits at ~3M probe
rows, far inside the window).

A synthetic argmin PROFILE (passed via ``containment_lsh_pairs``'s
``profile=`` hook, so no text/shingling cost) pins the probe-row count
exactly: each doc carries 64 distinct h32 values used as BOTH its
shingles and its packed argmins, so probe rows = 64 x n_docs, each m
is probed by exactly one doc (worst case for the index's keys/offsets
arrays — every m distinct), and self-matches are excluded, leaving
only birthday-collision noise far below the cutoff. That isolates the
cost being measured: index build + broadcast + counting kernel, with
approximately zero candidate/verification volume.

For each size (just under / just over the ceiling) it runs BOTH
strategies end-to-end, records wall time, what ``auto`` picks, the
real index array bytes (pulled from the live broadcast slot), and
driver-side RSS deltas (python + JVM) around the broadcast build.

Usage: python tools/containment_ceiling.py [n_docs[:group] ...]
  (default sizes: 281250 -> 18.0M rows, 343750 -> 22.0M rows;
  ":group" switches to the hot-m regime, e.g. 281250:16 makes doc
  blocks of 16 share all 64 argmins — match density 16)
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _rss_mb() -> dict[str, float]:
    """Resident-set sizes of this python process and the session JVM."""
    out = {"python": 0.0, "java": 0.0}
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                out["python"] = int(line.split()[1]) / 1024.0
    try:
        ps = subprocess.run(
            ["ps", "-C", "java", "-o", "rss="], capture_output=True, text=True
        )
        out["java"] = sum(int(x) for x in ps.stdout.split()) / 1024.0
    except Exception:
        pass
    return out


def make_profile(spark, n_docs: int, group: int = 1):
    """(doc_id, shingles, argmins) with 64 distinct h32 per doc: probe
    rows == 64 * n_docs. ``group=1`` makes every m unique across docs
    (worst case for the index's keys/offsets arrays, ~zero match
    volume); ``group=g`` makes docs in blocks of g share all 64 values
    (hot-m regime: distinct-m count and the keys/offsets arrays shrink
    g-fold while match volume becomes 64*(g-1) per doc — the
    duplicate-family shape the broadcast path was built for)."""
    idx = F.sequence(F.lit(0), F.lit(63))

    def h32(i):
        seed = (F.col("doc_id") / F.lit(group)).cast("long")
        return F.xxhash64(seed, i).bitwiseAND(F.lit(0xFFFFFFFF))

    return (
        spark.range(n_docs)
        .select(F.col("id").alias("doc_id"))
        .repartition(32)
        .select(
            "doc_id",
            F.transform(idx, h32).alias("shingles"),
            F.transform(
                idx,
                lambda i: F.shiftleft(i.cast("long"), 32).bitwiseOR(h32(i)),
            ).alias("argmins"),
        )
    )


def main() -> int:
    from salesforce_prefect_etl_pipeline_spark.operators import dedup
    from salesforce_prefect_etl_pipeline_spark.session import get_spark

    specs = sys.argv[1:] or ["281250", "343750"]
    spark = get_spark("containment-ceiling")
    results = []
    for spec in specs:
        n_docs, _, g = spec.partition(":")
        n_docs, group = int(n_docs), int(g or 1)
        prof = make_profile(spark, n_docs, group).localCheckpoint()
        stats = dedup.containment_auto_stats(prof)
        row = {
            "n_docs": n_docs,
            "group": group,
            "n_probe_rows": stats["n_index_rows"],
            "n_matched": stats["n_matched"],
            "auto": stats["strategy"],
        }
        for strat in ("broadcast", "shuffle"):
            rss0 = _rss_mb()
            t0 = time.time()
            n_out = dedup.containment_lsh_pairs(
                None, profile=prof, strategy=strat
            ).count()
            wall = round(time.time() - t0, 1)
            rss1 = _rss_mb()
            row[strat] = {
                "wall_s": wall,
                "out_rows": n_out,
                "rss_delta_mb": {
                    k: round(rss1[k] - rss0[k], 1) for k in rss1
                },
            }
            if strat == "broadcast" and dedup._PROBE_BCAST_SLOT:
                arrs = dedup._PROBE_BCAST_SLOT[-1].value
                row[strat]["index_bytes_mb"] = round(
                    sum(a.nbytes for a in arrs) / 1e6, 1
                )
                row[strat]["index_arrays_mb"] = {
                    name: round(a.nbytes / 1e6, 1)
                    for name, a in zip(
                        ("keys", "offsets", "pa_codes", "w", "vocab"), arrs
                    )
                }
            print(
                f"# n={n_docs}:{group} ({row['n_probe_rows']} rows, "
                f"matched={row['n_matched']}) {strat}: {row[strat]}",
                file=sys.stderr,
            )
        results.append(row)
        prof.unpersist()
    print(json.dumps(results))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
