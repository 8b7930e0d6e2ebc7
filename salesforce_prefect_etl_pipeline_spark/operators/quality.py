"""Data-quality operators — the reference's QA branch
(tasks/quality_parallel.py) re-expressed as single-pass Spark plans.

- schema gate (X8, :20-51): required-column presence check, raises.
- non-empty gate (X9, :54-73): raises on 0 rows (cheap ``isEmpty``).
- column profiler (X10, :105-140): dtype / null_count / n_distinct per
  column in ONE aggregation pass (the reference loops per column), plus
  top-k value counts for low-cardinality columns (A11).
- row-count drift (:159-189): relative-change alert against persisted
  per-object state; state lives in a parquet run-log table instead of a
  ``rowcount.txt`` (works from any executor-less driver, survives reruns).
"""

from __future__ import annotations

import json
import os
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


class SchemaGateError(ValueError):
    """Raised when required columns are missing (mirrors the reference's
    ValueError at tasks/quality_parallel.py:47)."""


class EmptyInputError(ValueError):
    """Raised on empty input ("No data to process",
    tasks/quality_parallel.py:70)."""


def schema_gate(df: DataFrame, required_cols: list[str]) -> dict:
    missing = [c for c in required_cols if c not in df.columns]
    report = {
        "required": list(required_cols),
        "present": [c for c in required_cols if c in df.columns],
        "missing": missing,
        "ok": not missing,
    }
    if missing:
        raise SchemaGateError(f"missing required columns: {missing}")
    return report


def nonempty_gate(df: DataFrame) -> dict:
    if df.isEmpty():
        raise EmptyInputError("No data to process")
    return {"rows": df.count()}


def profile_columns(df: DataFrame, topk: int = 5, topk_max_distinct: int = 5000) -> dict:
    """Column profile as one wide aggregation + per-low-cardinality-column
    top-k passes. Returns the reference's JSON shape
    (tasks/quality_parallel.py:116-135)."""
    aggs = []
    for c in df.columns:
        aggs.append(F.count_if(F.col(c).isNull()).alias(f"__null__{c}"))
        aggs.append(F.countDistinct(c).alias(f"__nuniq__{c}"))
    row = df.agg(*aggs).collect()[0].asDict()
    dtypes = dict(df.dtypes)
    profile: dict = {"n_rows": df.count(), "columns": {}}
    for c in df.columns:
        col_prof = {
            "dtype": dtypes[c],
            "null_count": row[f"__null__{c}"],
            "n_unique": row[f"__nuniq__{c}"],
        }
        if col_prof["n_unique"] <= topk_max_distinct:
            top = (
                df.groupBy(c)
                .count()
                .orderBy(F.desc("count"), F.asc_nulls_first(c))
                .limit(topk)
                .collect()
            )
            col_prof["top_values"] = [
                {"value": None if r[c] is None else str(r[c]), "count": r["count"]}
                for r in top
            ]
        profile["columns"][c] = col_prof
    return profile


def profile_frame(df: DataFrame) -> DataFrame:
    """The profiler's aggregate pass as a long-format DataFrame
    (column_name, null_count, n_unique) — the oracle-checkable core."""
    spark = df.sparkSession
    aggs = []
    for c in df.columns:
        aggs.append(F.count_if(F.col(c).isNull()).alias(f"__null__{c}"))
        aggs.append(F.countDistinct(c).alias(f"__nuniq__{c}"))
    wide = df.agg(*aggs)
    stack_args = ", ".join(
        f"'{c}', __null__{c}, __nuniq__{c}" for c in df.columns
    )
    n = len(df.columns)
    return wide.select(
        F.expr(f"stack({n}, {stack_args}) AS (column_name, null_count, n_unique)")
    ).orderBy("column_name")


def profile_frame_sql(table: str, columns: list[str]) -> str:
    parts = [
        f"SELECT '{c}' AS column_name,"
        f" COUNT(*) FILTER (WHERE {c} IS NULL) AS null_count,"
        f" COUNT(DISTINCT {c}) AS n_unique FROM {table}"
        for c in columns
    ]
    return " UNION ALL ".join(parts) + " ORDER BY column_name"


# ----------------------------------------------------------------------
# Row-count drift detection (stateful between runs)
def rowcount_drift_check(
    spark: SparkSession,
    object_name: str,
    current_rows: int,
    state_dir: str,
    threshold: float = 0.5,
) -> dict:
    """Compare current row count to the previous run's; alert when the
    relative change >= threshold (reference default 50%,
    tasks/quality_parallel.py:176-184). State = JSONL log per object
    (append-only; last record wins), kept driver-side like the
    reference's qc_state dir."""
    os.makedirs(state_dir, exist_ok=True)
    path = os.path.join(state_dir, f"{object_name}_rowcount.jsonl")
    prev_rows = None
    if os.path.exists(path):
        with open(path) as f:
            lines = [ln for ln in f.read().splitlines() if ln.strip()]
        if lines:
            prev_rows = json.loads(lines[-1])["rows"]
    alert = False
    change = None
    if prev_rows is not None and prev_rows > 0:
        change = abs(current_rows - prev_rows) / prev_rows
        alert = change >= threshold
    with open(path, "a") as f:
        f.write(json.dumps({"rows": current_rows, "ts": time.time()}) + "\n")
    return {
        "object": object_name,
        "previous_rows": prev_rows,
        "current_rows": current_rows,
        "relative_change": change,
        "alert": alert,
        "threshold": threshold,
    }
