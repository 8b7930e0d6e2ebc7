"""AS-OF join — match each left row to the most recent right row with
right_ts <= left_ts per key (the standard time-series point-in-time
join; reference has no joins at all, SURVEY.md §2.3, so this is pure
extension surface alongside the equi/semi/anti family).

Spark has no built-in as-of join; this implements it with the
union + ordered window trick, which scales as one shuffle on
(key, ts) — the same cost as a sort-merge join — instead of the naive
range-join explosion:

1. tag left (probe) and right (build) rows, union them;
2. per key, order by (ts, side) with right rows first on ties;
3. ``last_value(right_struct, ignoreNulls) over rows unbounded
   preceding`` carries the most recent right ROW forward as ONE struct —
   carrying columns independently would let an older row's non-null
   value leak into a column the matched row left NULL (different output
   columns from different right rows);
4. keep only left rows and unpack the struct.

Ties (right_ts == left_ts) match, mirroring DuckDB's ASOF JOIN
(right_ts <= left_ts), which serves as the oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window


def asof_join(
    left: DataFrame,
    right: DataFrame,
    key: str,
    left_ts: str,
    right_ts: str,
    right_value_cols: list[str],
) -> DataFrame:
    """Left as-of join: every left row, plus the named right columns from
    the latest right row with right_ts <= left_ts (nulls if none)."""
    lcols = left.columns
    rtypes = dict(right.dtypes)
    null_struct = F.lit(None).cast(
        "struct<" + ",".join(f"{c}:{rtypes[c]}" for c in right_value_cols) + ">"
    )
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__side"),
        null_struct.alias("__r"),
    )
    r = right.select(
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols if c != key],
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__side"),
        # A struct of all-null fields is itself non-null, so last(...,
        # ignorenulls) still treats a right row with NULL values as the
        # match — only the left rows' NULL placeholder is skipped.
        F.struct(*[F.col(c) for c in right_value_cols]).alias("__r"),
    ).select(*lcols, "__ts", "__side", "__r")
    unioned = l.unionByName(r)
    # right rows sort before left rows at equal ts (__side 0 < 1), so a
    # same-instant right row is visible to the left row.
    w = (
        Window.partitionBy(key)
        .orderBy("__ts", "__side")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.select(
        *lcols,
        "__ts",
        "__side",
        F.last("__r", ignorenulls=True).over(w).alias("__m"),
    )
    return carried.filter(F.col("__side") == 1).select(
        *lcols, *[F.col(f"__m.{c}").alias(c) for c in right_value_cols]
    )
