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

Usage: python tools/containment_ceiling.py [n_docs[:group[:spread]] ...]
  (default sizes: 281250 -> 18.0M rows, 343750 -> 22.0M rows;
  ":group" switches to the hot-m regime, e.g. 281250:16 makes doc
  blocks of 16 share all 64 argmins — match density ~group-1;
  ":spread" disperses the sharing sets PER SLOT via per-slot modular
  permutations, so the same density spreads over ~64x more distinct
  directed pairs, each with count ~1 — the REAL corpus cardinality
  shape (sf1: 1.36B instances over 233M distinct pairs), where the
  shuffle aggregate's pain is key cardinality, not just volume. Block
  mode concentrates instances onto few pairs at count 64, which both
  understates the aggregate's hash-table size and overstates
  verification volume.)
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def _proc_stat(pid: int) -> tuple[str, int] | None:
    """(comm, ppid) from /proc/<pid>/stat, None if the process vanished."""
    try:
        with open(f"/proc/{pid}/stat") as f:
            raw = f.read()
    except OSError:
        return None
    # comm may contain spaces/parens — it is the parenthesized field 2
    comm = raw[raw.index("(") + 1 : raw.rindex(")")]
    ppid = int(raw[raw.rindex(")") + 2 :].split()[1])
    return comm, ppid


def _rss_mb() -> dict[str, float]:
    """Resident-set sizes of this python process and THIS SESSION's JVM
    (java processes descended from this pid — `ps -C java` summed every
    JVM on the box, polluting the delta with concurrent sessions)."""
    out = {"python": 0.0, "java": 0.0}
    me = os.getpid()
    with open("/proc/self/status") as f:
        for line in f:
            if line.startswith("VmRSS"):
                out["python"] = int(line.split()[1]) / 1024.0
    try:
        for d in os.listdir("/proc"):
            if not d.isdigit():
                continue
            st = _proc_stat(int(d))
            if st is None or st[0] != "java":
                continue
            # walk the parent chain: ours iff it passes through this pid
            pid = st[1]
            for _ in range(32):
                if pid == me:
                    break
                if pid <= 1:
                    pid = 0
                    break
                nxt = _proc_stat(pid)
                if nxt is None:
                    pid = 0
                    break
                pid = nxt[1]
            if pid != me:
                continue
            with open(f"/proc/{d}/status") as f:
                for line in f:
                    if line.startswith("VmRSS"):
                        out["java"] += int(line.split()[1]) / 1024.0
    except Exception:
        pass
    return out


def _next_prime(n: int) -> int:
    def isp(x: int) -> bool:
        if x < 2 or x % 2 == 0:
            return x == 2
        f = 3
        while f * f <= x:
            if x % f == 0:
                return False
            f += 2
        return True

    while not isp(n):
        n += 1
    return n


def make_profile(spark, n_docs: int, group: int = 1, dispersed: bool = False):
    """(doc_id, shingles, argmins) with 64 distinct h32 per doc: probe
    rows == 64 * n_docs. ``group=1`` makes every m unique across docs
    (worst case for the index's keys/offsets arrays, ~zero match
    volume); ``group=g`` makes docs in blocks of g share all 64 values
    (hot-m regime: distinct-m count and the keys/offsets arrays shrink
    g-fold while match volume becomes 64*(g-1) per doc — the
    duplicate-family shape the broadcast path was built for).

    ``dispersed=True`` keeps the same multiplicity g per shared value
    (so the measured density is still ~g-1) but draws slot i's sharing
    set from a PER-SLOT modular permutation of the doc ids
    (d -> d*(i+2) mod M, M prime >= n_docs, then blocks of g), so the
    64 slots of one doc match ~64 DIFFERENT doc sets: matched instances
    spread over ~64x(g-1) distinct directed pairs per doc with count ~1
    each, instead of g-1 pairs at count 64. This reproduces the real
    corpus cardinality shape (sf1: 5.8 instances per distinct directed
    pair) — the aggregate's hash table is sized by distinct pairs, and
    nothing clears the cutoff, isolating counting-stage cost from
    verification volume."""
    idx = F.sequence(F.lit(0), F.lit(63))
    m_prime = _next_prime(n_docs)

    def h32(i):
        if dispersed:
            perm = (F.col("doc_id") * (i + F.lit(2))) % F.lit(m_prime)
            seed = F.floor(perm / F.lit(group)).cast("long")
        else:
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


def _stage_metrics(spark) -> dict[int, dict[str, int]]:
    """Per-stage spill/shuffle byte counters from the UI REST API
    (the tool session enables spark.ui for exactly this); {} when the
    UI is off (e.g. reusing an existing session)."""
    import urllib.request

    ui = spark.sparkContext.uiWebUrl
    if not ui:
        return {}
    app = spark.sparkContext.applicationId
    try:
        with urllib.request.urlopen(
            f"{ui}/api/v1/applications/{app}/stages?status=complete", timeout=10
        ) as r:
            stages = json.load(r)
    except Exception:
        return {}
    return {
        s["stageId"]: {
            "memSpill": s.get("memoryBytesSpilled", 0),
            "diskSpill": s.get("diskBytesSpilled", 0),
            "shufWrite": s.get("shuffleWriteBytes", 0),
        }
        for s in stages
    }


def main() -> int:
    from salesforce_prefect_etl_pipeline_spark.operators import dedup
    from salesforce_prefect_etl_pipeline_spark.session import get_spark

    specs = sys.argv[1:] or ["281250", "343750"]
    spark = get_spark(
        "containment-ceiling",
        extra_conf={
            "spark.ui.enabled": "true",
            # the corpus cells drive runs whose AQE-planned broadcast
            # builds exceed the 1g default; the tool measures, it must
            # not abort mid-cell
            "spark.driver.maxResultSize": "8g",
        },
    )
    results = []
    for spec in specs:
        if spec.startswith("corpus:"):
            # real-corpus cell (r11 verdict task 3): the full shingling
            # profile of an actual documents fixture — realistic match
            # density AND pair cardinality, vs the synthetics' controlled
            # shapes. `corpus:/root/repo/.scaledata/sf10` puts ~27M index
            # rows above the 20M ceiling with real density ~500.
            sf_dir = spec.split(":", 1)[1]
            from salesforce_prefect_etl_pipeline_spark.queries_llm import _docs

            prof = (
                dedup.joint_shingle_profile(_docs(spark, sf_dir), k=8)
                .select("doc_id", "shingles", "argmins")
                .localCheckpoint()
            )
            n_docs, group, dispersed = -1, 0, False
        else:
            parts = spec.split(":")
            n_docs = int(parts[0])
            group = int(parts[1]) if len(parts) > 1 and parts[1] else 1
            dispersed = len(parts) > 2 and parts[2] == "spread"
            prof = make_profile(spark, n_docs, group, dispersed).localCheckpoint()
        stats = dedup.containment_auto_stats(prof)
        if stats["n_matched"] is None:
            # outside the row window auto skips the density aggregate
            # (it can't change the pick); this tool is measuring, so run
            # the same two-count join auto would have
            mask = lambda x: x.bitwiseAND(F.lit(0xFFFFFFFF))  # noqa: E731
            pc = (
                prof.select(F.explode(F.transform("argmins", mask)).alias("m"))
                .groupBy("m")
                .agg(F.count(F.lit(1)).alias("np"))
            )
            ic = (
                prof.select(
                    F.explode(
                        F.array_distinct(F.transform("shingles", mask))
                    ).alias("h")
                )
                .groupBy("h")
                .agg(F.count(F.lit(1)).alias("ni"))
            )
            stats["n_matched"] = (
                pc.join(ic, pc["m"] == ic["h"])
                .select(F.sum(F.col("np") * F.col("ni")).alias("n"))
                .collect()[0][0]
                or 0
            )
        row = {
            "spec": spec,
            "n_docs": n_docs,
            "group": group,
            "dispersed": dispersed,
            "n_probe_rows": stats["n_index_rows"],
            "n_matched": stats["n_matched"],
            "density": round(stats["n_matched"] / max(1, stats["n_index_rows"]), 1),
            "auto": stats["strategy"],
        }
        # exact comma-separated tokens, not substring membership —
        # CEILING_STRATEGIES=reshuffled must select nothing, not shuffle
        wanted = os.environ.get("CEILING_STRATEGIES", "broadcast,shuffle").split(",")
        strategies = tuple(s for s in ("broadcast", "shuffle") if s in wanted)
        for strat in strategies:
            rss0 = _rss_mb()
            stages0 = _stage_metrics(spark)
            t0 = time.time()
            try:
                n_out = dedup.containment_lsh_pairs(
                    None, profile=prof, strategy=strat
                ).count()
            except Exception as exc:  # a died cell IS a measurement
                row[strat] = {
                    "wall_s": round(time.time() - t0, 1),
                    "died": f"{type(exc).__name__}: {str(exc)[:200]}",
                }
                print(f"# {strat} DIED: {row[strat]}", file=sys.stderr)
                continue
            wall = round(time.time() - t0, 1)
            rss1 = _rss_mb()
            stages1 = _stage_metrics(spark)
            new = {k: v for k, v in stages1.items() if k not in stages0}
            row[strat] = {
                "wall_s": wall,
                "out_rows": n_out,
                "rss_delta_mb": {
                    k: round(rss1[k] - rss0[k], 1) for k in rss1
                },
                "mem_spill_mb": round(
                    sum(s["memSpill"] for s in new.values()) / 1e6, 1
                ),
                "disk_spill_mb": round(
                    sum(s["diskSpill"] for s in new.values()) / 1e6, 1
                ),
                "shuffle_write_mb": round(
                    sum(s["shufWrite"] for s in new.values()) / 1e6, 1
                ),
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
