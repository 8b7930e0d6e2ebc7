"""Iterative graph analytics over relational-derived edge lists.

Companion to the pointer-jumping connected components in
``operators/dedup.py``: where CC shows convergence-bounded iteration,
PageRank shows FIXED-count iteration with exactly reproducible numbers.

Determinism contract (same philosophy as ``functions.exact_sum``): all
rank arithmetic is INTEGER — ranks live as bigints scaled by ``SCALE``,
per-edge contributions use floor division, and the damping factor is a
ratio of integers. Every operation is order-independent (bigint sums)
and dialect-identical (``DIV`` in Spark, ``//`` in DuckDB), so a
fixed-iteration run value-hashes against a SQL replay — no float drift,
on any cluster layout. At 1e9+ edges the per-iteration plan is one
hash join (ranks ⋈ edges on src) + one aggregation (sum by dst), both
shuffling on graph keys; iterations reuse the same partitioning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: Fixed-point scale for integer ranks: 1e9 ~ 9 decimal digits.
SCALE = 1_000_000_000

#: Damping factor as an integer ratio (0.85).
DAMP_NUM, DAMP_DEN = 85, 100


def pagerank_exact(
    edges: DataFrame,
    n_nodes: int,
    iters: int = 5,
    src: str = "src",
    dst: str = "dst",
    weight: str = "weight",
    checkpoint_every: int = 5,
) -> DataFrame:
    """Weighted PageRank, ``iters`` fixed iterations, integer-exact.

    ``edges``: (src, dst, weight>0). Update rule (scaled bigints):

        R'(v) = SCALE*(DEN-NUM)//(DEN*N)
              + NUM * sum_u( R(u) * w(u,v) // W(u) ) // DEN

    where W(u) is u's total out-weight. Floor divisions make each term
    exact; dangling mass (nodes with no out-edges) is dropped, the
    standard simplification (documented, matched by the oracle).

    Returns (node, rank_scaled) for every node that has at least one
    edge. The caller supplies ``n_nodes`` (a one-row control-plane
    count, not data-plane state).

    Lineage: each iteration chains a join+agg onto the plan, doubling
    plan size per round; every ``checkpoint_every`` iterations the rank
    frame is ``localCheckpoint``-ed (same lineage-truncation discipline
    as ``connected_components``), so raising ``iters`` costs linear
    plan work instead of exponential analysis time.
    """
    e = edges.select(
        F.col(src).alias("src"), F.col(dst).alias("dst"),
        F.col(weight).cast("long").alias("w"),
    )
    outw = e.groupBy("src").agg(F.sum("w").alias("out_w"))
    # NOTE (r16 optimization round, measured): the loop-invariant `e` /
    # `nodes` subtrees are re-PLANNED under every iteration (the
    # 5-iteration nation-trade plan text carries 274 parquet scans /
    # 342 Exchanges), but truncating them with localCheckpoint was
    # paired-measured ~0.5-1.0 s SLOWER at sf1 (5.5→5.9 s medians,
    # 3 order-reversed reps): the checkpointed RDD loses both
    # statistics (size-unknown sides demote runtime broadcast choices)
    # and output partitioning, while AQE's runtime exchange reuse
    # already dedups the repeated fact-join subtrees. Left as-is on the
    # evidence; `checkpoint_every` still bounds plan growth for large
    # `iters`.
    e = e.join(outw, "src")
    nodes = (
        e.select(F.col("src").alias("node"))
        .union(e.select(F.col("dst").alias("node")))
        .distinct()
    )
    base = F.expr(
        f"CAST({SCALE * (DAMP_DEN - DAMP_NUM)} AS BIGINT)"
        f" DIV {DAMP_DEN * n_nodes}"
    )
    ranks = nodes.select("node", base.alias("rank_scaled"))
    for it in range(iters):
        contrib = (
            e.join(ranks, e["src"] == ranks["node"])
            .select(
                "dst",
                # Product in DECIMAL(38,0): rank_scaled approaches SCALE
                # (1e9) and per-edge weights can reach ~1e9+ at the
                # module's advertised scale, so a bigint product would
                # silently wrap near 9.2e18. The quotient is <= the
                # source rank (w <= out_w), so it always fits bigint.
                F.expr(
                    "CAST(CAST(rank_scaled AS DECIMAL(38,0)) * w DIV out_w"
                    " AS BIGINT)"
                ).alias("term"),
            )
            .groupBy("dst")
            .agg(F.sum("term").alias("in_sum"))
        )
        ranks = (
            nodes.join(contrib, nodes["node"] == contrib["dst"], "left")
            .select(
                "node",
                (
                    base
                    + F.expr(
                        f"{DAMP_NUM} * coalesce(in_sum, 0L) DIV {DAMP_DEN}"
                    )
                ).alias("rank_scaled"),
            )
        )
        # Truncate lineage periodically (and before the final sort):
        # the chained join+agg plan otherwise doubles per iteration.
        # Not on every round — a checkpoint materializes the frame, so
        # batching them every `checkpoint_every` rounds keeps the
        # default iters=5 at ONE materialization.
        if (it + 1) % checkpoint_every == 0 and it + 1 < iters:
            ranks = ranks.localCheckpoint(eager=True)
    return ranks.orderBy("node")


def pagerank_sql(
    edges_sql: str, n_nodes_sql: str, iters: int = 5
) -> str:
    """SQL replay of :func:`pagerank_exact`: the fixed iteration count
    unrolls into chained CTEs (no recursion, no aggregate-in-recursive-
    term restrictions), every step the same integer arithmetic."""
    base = (
        f"(CAST({SCALE} AS BIGINT) * {DAMP_DEN - DAMP_NUM})"
        f" // ({DAMP_DEN} * ({n_nodes_sql}))"
    )
    out = [
        f"""
WITH e0 AS ({edges_sql}),
outw AS (SELECT src, CAST(SUM(w) AS BIGINT) AS out_w FROM e0 GROUP BY src),
e AS (SELECT e0.src, e0.dst, e0.w, outw.out_w FROM e0 JOIN outw USING (src)),
nodes AS (SELECT DISTINCT node FROM
          (SELECT src AS node FROM e UNION ALL SELECT dst FROM e)),
r0 AS (SELECT node, CAST({base} AS BIGINT) AS rank_scaled FROM nodes)"""
    ]
    for i in range(iters):
        out.append(
            f""",
c{i + 1} AS (
  SELECT e.dst,
         SUM(CAST(CAST(r.rank_scaled AS HUGEINT) * e.w // e.out_w
             AS BIGINT)) AS in_sum
  FROM e JOIN r{i} r ON e.src = r.node GROUP BY e.dst
),
r{i + 1} AS (
  SELECT n.node,
         CAST({base} + {DAMP_NUM} * COALESCE(c.in_sum, 0) // {DAMP_DEN}
              AS BIGINT) AS rank_scaled
  FROM nodes n LEFT JOIN c{i + 1} c ON n.node = c.dst
)"""
        )
    out.append(f"\nSELECT node, rank_scaled FROM r{iters} ORDER BY node")
    return "".join(out)


def triangle_counts(edges: DataFrame, src: str = "src", dst: str = "dst") -> DataFrame:
    """Per-node triangle participation counts over the undirected graph —
    the classic cohesion/clustering metric (and the standard distributed
    triangle enumeration): canonicalize each edge to (a < b), then
    enumerate each triangle exactly once as a < b < c via two joins —
    (a,b) ⋈ (b,c) ⋈ exists(a,c) — and credit all three corners.

    Scale shape: two equi-joins on single vertex keys; the join fan-out
    concentrates on high-degree vertices, so at web scale the standard
    refinement is degree-ordered orientation (point edges from low to
    high degree) instead of id order — same plan, different canonical
    order; id order keeps the result SQL-replayable here. Returns
    (node, n_triangles), nodes with at least one triangle."""
    a, b = F.least(F.col(src), F.col(dst)), F.greatest(F.col(src), F.col(dst))
    e = (
        edges.filter(F.col(src) != F.col(dst))
        .select(a.alias("a"), b.alias("b"))
        .distinct()
    )
    e1 = e.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = e.select(F.col("a").alias("y2"), F.col("b").alias("z"))
    e3 = e.select(F.col("a").alias("x3"), F.col("b").alias("z3"))
    tris = (
        e1.join(e2, F.col("y") == F.col("y2"))
        .join(e3, (F.col("x3") == F.col("x")) & (F.col("z3") == F.col("z")))
        .select("x", "y", "z")
    )
    node = tris.select(F.explode(F.array("x", "y", "z")).alias("node"))
    return (
        node.groupBy("node")
        .agg(F.count(F.lit(1)).alias("n_triangles"))
        .orderBy("node")
    )


def triangle_counts_sql(edges_sql: str) -> str:
    """DuckDB twin of :func:`triangle_counts` over the same edge SQL."""
    return f"""
WITH raw AS MATERIALIZED ({edges_sql}),
e AS MATERIALIZED (
  SELECT DISTINCT least(src, dst) AS a, greatest(src, dst) AS b
  FROM raw WHERE src <> dst
),
tris AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z
  FROM e e1
  JOIN e e2 ON e1.b = e2.a
  JOIN e e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
  SELECT unnest([x, y, z]) AS node FROM tris
)
SELECT node, COUNT(*) AS n_triangles
FROM corners GROUP BY node ORDER BY node
"""
