"""Scalar Column helpers mirroring the reference's tolerant-cast semantics.

All JVM-side native expressions — these stay inside whole-stage codegen.

Reference parity map (SURVEY.md §2.8):
- F1 ``str.to_date(strict=False)``       -> ``to_date_tolerant``
- F2 ``str.to_datetime(strict=False)``   -> ``to_timestamp_tolerant``
- F3 ``(end-start).total_seconds()/3600``-> ``duration_hours``
- F6 ``cast(Float64, strict=False)``     -> ``try_double``
- P6 ``_ensure_cols(df, cols, fill)``    -> ``ensure_columns``
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def try_double(col: str | Column) -> Column:
    """Tolerant numeric cast: unparseable -> null (tasks/process.py:22)."""
    c = F.col(col) if isinstance(col, str) else col
    return c.try_cast("double")


def to_date_tolerant(col: str | Column) -> Column:
    """String -> date, null on failure (tasks/extract.py:97)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c).cast("date")


def to_timestamp_tolerant(col: str | Column) -> Column:
    """String -> timestamp, null on failure (tasks/process.py:90-93)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.try_to_timestamp(c)


def duration_hours(start: str | Column, end: str | Column) -> Column:
    """Timestamp difference in fractional hours, null-filled to 0.0
    (tasks/process.py:94-95). Sub-second precision via double casts."""
    s = F.col(start) if isinstance(start, str) else start
    e = F.col(end) if isinstance(end, str) else end
    hours = (e.cast("double") - s.cast("double")) / F.lit(3600.0)
    return F.coalesce(hours, F.lit(0.0))


#: Quantization scale for deterministic float sums (4 decimal digits).
SUM_SCALE = 10000.0


def exact_sum(col: str | Column) -> Column:
    """Order-independent, engine-independent double sum.

    Per-row quantization uses only IEEE-exact primitives — ``floor(x *
    1e4 + 0.5)`` — so every engine computing it on the same input double
    produces the same integer (a direct double->DECIMAL cast does NOT
    have this property: Spark rounds via exact BigDecimal, DuckDB via a
    double multiply, and they disagree near rounding boundaries). The
    integers accumulate exactly in DECIMAL(28,0) (sum type DECIMAL(38,0),
    ample for 100 TB-scale money sums), so the result is also independent
    of partitioning/accumulation order — reproducible on 1 core or 1000
    executors. See plans/compiler.py docstring §4.
    """
    c = F.col(col) if isinstance(col, str) else col
    q = F.floor(c * F.lit(SUM_SCALE) + F.lit(0.5)).cast("decimal(28,0)")
    return F.sum(q).cast("double") / F.lit(SUM_SCALE)


def exact_sum_sql(expr: str) -> str:
    """DuckDB-side twin of :func:`exact_sum`."""
    return (
        f"(CAST(SUM(CAST(FLOOR(({expr}) * 10000.0 + 0.5) AS DECIMAL(28,0)))"
        " AS DOUBLE) / 10000.0)"
    )


def ensure_columns(df: DataFrame, cols: list[str], fill: str = "UNKNOWN") -> DataFrame:
    """Add any missing column as a string literal (tasks/process.py:11-16).

    Single ``select`` (not chained withColumn) so the analyzer sees one
    projection regardless of how many columns are synthesized.
    """
    missing = [c for c in cols if c not in df.columns]
    if not missing:
        return df
    return df.select("*", *[F.lit(fill).alias(c) for c in missing])
