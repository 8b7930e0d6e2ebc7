"""Binned interval (range) join.

Matches right-side points to left-side intervals per key:
``left.lo <= right.point <= left.hi``. A naive range predicate forces
Spark into broadcast-nested-loop (O(n*m) per key); the standard scale
trick is binning: explode each interval into the fixed-width bins it
covers, map each point to its bin, equi-join on (key, bin), then apply
the exact predicate. Join cost becomes O(points + intervals * width/bin)
with an ordinary shuffled hash join — the same technique DuckDB/Trino
apply internally for range joins, expressed manually for Spark.

Bin width trades replication (wide intervals -> many bins) against bucket
selectivity; pick ~ the median interval width.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    lo: str,
    hi: str,
    point: str,
    bin_width: int,
) -> DataFrame:
    """Inner interval join; lo/hi/point are numeric (cast epoch/days
    upstream). Returns left columns + right columns (key deduplicated)."""
    lbins = left.withColumn(
        "__bin",
        F.explode(
            F.sequence(
                (F.col(lo) / bin_width).cast("long"),
                (F.col(hi) / bin_width).cast("long"),
            )
        ),
    )
    rbins = right.withColumn("__bin", (F.col(point) / bin_width).cast("long"))
    # each point maps to exactly one bin and an interval lists each bin
    # once, so every qualifying (interval, point) pair appears exactly
    # once — no post-join dedup (and no extra shuffle) needed
    return (
        lbins.join(rbins, [key, "__bin"])
        .filter((F.col(point) >= F.col(lo)) & (F.col(point) <= F.col(hi)))
        .drop("__bin")
    )
