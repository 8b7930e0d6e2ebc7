"""AS-OF join — match each left row to the nearest right row per key
in a direction: ``backward`` (most recent right_ts <= left_ts — the
standard point-in-time join), ``forward`` (earliest right_ts >=
left_ts — "next event after"), or ``nearest`` (closer of the two,
ties to backward — pandas merge_asof's direction vocabulary).
The reference has no joins at all (SURVEY.md §2.3), so this is pure
extension surface alongside the equi/semi/anti family.

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
    direction: str = "backward",
) -> DataFrame:
    """Left as-of join: every left row, plus the named right columns
    from the matched right row (nulls if none) — matched per
    ``direction``; ties (right_ts == left_ts) always match, and
    ``nearest`` resolves an equidistant backward/forward pair to the
    backward row.

    One shuffle on (key, ts) regardless of direction; ``nearest`` adds
    a second window SORT over the same exchange (backward and forward
    carries need opposite tie orderings), not a second shuffle."""
    if direction not in ("backward", "forward", "nearest"):
        raise ValueError(f"unknown direction {direction!r}")
    lcols = left.columns
    rtypes = dict(right.dtypes)
    ts_type = dict(left.dtypes)[left_ts]
    fields = [("__rts", rtypes[right_ts])] + [
        (c, rtypes[c]) for c in right_value_cols
    ]
    null_struct = F.lit(None).cast(
        "struct<" + ",".join(f"{c}:{t}" for c, t in fields) + ">"
    )
    l = left.select(
        *lcols,
        F.col(left_ts).alias("__ts"),
        F.lit(True).alias("__is_left"),
        null_struct.alias("__r"),
    )
    r = right.select(
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols if c != key],
        F.col(key),
        F.col(right_ts).alias("__ts"),
        F.lit(False).alias("__is_left"),
        # A struct of all-null fields is itself non-null, so last(...,
        # ignorenulls) still treats a right row with NULL values as the
        # match — only the left rows' NULL placeholder is skipped.
        F.struct(
            F.col(right_ts).alias("__rts"),
            *[F.col(c) for c in right_value_cols],
        ).alias("__r"),
    ).select(*lcols, "__ts", "__is_left", "__r")
    unioned = l.unionByName(r)
    # Tie ordering differs per carry direction: the backward carry needs
    # right rows BEFORE left at equal ts (so a same-instant right row is
    # in the preceding frame); the forward carry needs them AFTER.
    side_b = F.when(F.col("__is_left"), 1).otherwise(0)
    side_f = F.when(F.col("__is_left"), 0).otherwise(1)
    w_b = (
        Window.partitionBy(key)
        .orderBy("__ts", side_b)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    w_f = (
        Window.partitionBy(key)
        .orderBy("__ts", side_f)
        .rowsBetween(Window.currentRow, Window.unboundedFollowing)
    )
    carries = [*lcols, "__ts", "__is_left"]
    if direction in ("backward", "nearest"):
        carries.append(F.last("__r", ignorenulls=True).over(w_b).alias("__mb"))
    if direction in ("forward", "nearest"):
        carries.append(F.first("__r", ignorenulls=True).over(w_f).alias("__mf"))
    carried = unioned.select(*carries)
    if direction == "backward":
        m = F.col("__mb")
    elif direction == "forward":
        m = F.col("__mf")
    else:
        # microsecond distances for timestamps (a long cast truncates a
        # timestamp to SECONDS, collapsing sub-second distances); day
        # distances for dates; NATIVE-precision double distances for
        # numerics (a long cast would truncate fractional ts values and
        # flip near-ties — the same collapse, one type over). Exact
        # name matching, not prefixes: "interval" types would otherwise
        # pass the startswith("int") test and bypass this guard.
        # Anything else (e.g. STRING timestamps, whose numeric cast
        # yields NULL and silently turns every nearest into backward)
        # is refused.
        integral = {"tinyint", "smallint", "int", "bigint", "long"}
        fractional = ts_type in ("double", "float") or ts_type.startswith(
            "decimal("
        )
        if ts_type.startswith("timestamp"):
            def _as_num(c):
                return F.unix_micros(c)
        elif ts_type == "date":
            def _as_num(c):
                return F.unix_date(c).cast("long")
        elif ts_type in integral:
            def _as_num(c):
                return c.cast("long")
        elif fractional:
            def _as_num(c):
                return c.cast("double")
        else:
            raise ValueError(
                f"asof_join direction='nearest' needs a timestamp, date "
                f"or numeric ts column; got {ts_type!r} — cast it first"
            )

        dist_b = _as_num(F.col("__ts")) - _as_num(F.col("__mb.__rts"))
        dist_f = _as_num(F.col("__mf.__rts")) - _as_num(F.col("__ts"))
        m = (
            F.when(F.col("__mb").isNull(), F.col("__mf"))
            .when(F.col("__mf").isNull(), F.col("__mb"))
            .when(dist_f < dist_b, F.col("__mf"))
            .otherwise(F.col("__mb"))
        )
    return carried.filter(F.col("__is_left")).select(
        *lcols, *[m.getField(c).alias(c) for c in right_value_cols]
    )
