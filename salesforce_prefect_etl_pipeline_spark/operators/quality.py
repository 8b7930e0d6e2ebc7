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


def topk_values(df: DataFrame, columns: list[str], k: int = 5) -> DataFrame:
    """Top-k values by frequency for MANY columns in ONE melted pass:
    ``stack`` each (column_name, value-as-string) pair out of every row,
    one groupBy(column_name, value), one window rank. Output
    (column_name, value, cnt, rnk) ordered by (column_name, rnk).

    This replaces a job-per-column loop: on a 100-column table that was
    100 sequential scans; here it is one scan + one shuffle regardless of
    column count (job count verified independent of width in tests)."""
    from pyspark.sql.window import Window

    n = len(columns)
    # Backtick-quote identifiers and escape the label literal: a generic
    # profiler API sees arbitrary column names, which must never be able
    # to alter the stack() expression.
    stack_args = ", ".join(
        f"""'{c.replace("'", "''")}', CAST(`{c.replace('`', '``')}` AS STRING)"""
        for c in columns
    )
    melted = df.select(
        F.expr(f"stack({n}, {stack_args}) AS (column_name, value)")
    )
    counts = melted.groupBy("column_name", "value").agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = Window.partitionBy("column_name").orderBy(
        F.desc("cnt"), F.asc_nulls_first("value")
    )
    return (
        counts.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .orderBy("column_name", "rnk")
    )


def topk_values_sql(table: str, columns: list[str], k: int = 5) -> str:
    melted = " UNION ALL ".join(
        f"SELECT '{c}' AS column_name, CAST({c} AS VARCHAR) AS value FROM {table}"
        for c in columns
    )
    return f"""
WITH melted AS ({melted}),
counts AS (
  SELECT column_name, value, COUNT(*) AS cnt FROM melted GROUP BY 1, 2
)
SELECT column_name, value, cnt, rnk FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY column_name ORDER BY cnt DESC, value ASC NULLS FIRST) AS rnk
  FROM counts
) WHERE rnk <= {k} ORDER BY column_name, rnk
"""


def profile_columns(
    df: DataFrame,
    topk: int = 5,
    topk_max_distinct: int = 5000,
    approx_distinct_at_width: int = 40,
) -> dict:
    """Column profile. Returns the reference's JSON shape
    (tasks/quality_parallel.py:116-135) in at most THREE jobs total,
    independent of column count:

    1. one wide aggregation: row count + per-column null count +
       distinct count. Exact ``countDistinct`` plans an Expand that
       multiplies the scan by column count, so tables wider than
       ``approx_distinct_at_width`` switch to ``approx_count_distinct``
       (HLL, one pass, ~2% error — the A9 approx path);
    2. one melted ``topk_values`` pass over every low-cardinality column.
    """
    cols = df.columns
    use_approx = len(cols) > approx_distinct_at_width
    distinct = F.approx_count_distinct if use_approx else F.countDistinct
    aggs = [F.count(F.lit(1)).alias("__nrows__")]
    for c in cols:
        aggs.append(F.count_if(F.col(c).isNull()).alias(f"__null__{c}"))
        aggs.append(distinct(c).alias(f"__nuniq__{c}"))
    row = df.agg(*aggs).collect()[0].asDict()
    dtypes = dict(df.dtypes)
    profile: dict = {
        "n_rows": row["__nrows__"],
        "distinct_estimated": use_approx,
        "columns": {},
    }
    for c in cols:
        profile["columns"][c] = {
            "dtype": dtypes[c],
            "null_count": row[f"__null__{c}"],
            "n_unique": row[f"__nuniq__{c}"],
        }
    eligible = [
        c for c in cols if profile["columns"][c]["n_unique"] <= topk_max_distinct
    ]
    if eligible:
        for r in topk_values(df, eligible, k=topk).collect():
            profile["columns"][r.column_name].setdefault("top_values", []).append(
                {"value": r.value, "count": r.cnt}
            )
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


def key_skew_profile(df: DataFrame, key: str, k: int = 10) -> DataFrame:
    """Join-key skew report: the ``k`` heaviest keys with their row
    counts, corpus share, and skew ratio (count / mean-count-per-key) —
    the diagnostic you run BEFORE a big join to decide between plain
    shuffle, AQE skew-split, and `salted_join` (operators/joins.py). A
    skew ratio of ~1 means uniform keys; 100x means that key's shuffle
    partition does 100x the average work.

    Shape: one groupBy(key) count (map-side partial agg), a 1-row
    global (n_rows, n_keys) aggregate broadcast against the top-k, and
    TakeOrderedAndProject for the top-k itself — safe on any key
    cardinality, bounded output."""
    counts = df.groupBy(F.col(key).alias("key")).agg(
        F.count(F.lit(1)).alias("n")
    )
    tot = counts.agg(
        F.sum("n").alias("__rows"), F.count(F.lit(1)).alias("__keys")
    )
    return (
        counts.crossJoin(F.broadcast(tot))
        .select(
            "key",
            "n",
            (F.col("n").cast("double") / F.col("__rows")).alias("share"),
            (
                (F.col("n") * F.col("__keys")).cast("double") / F.col("__rows")
            ).alias("skew_ratio"),
        )
        .orderBy(F.desc("n"), F.asc("key"))
        .limit(k)
    )


def key_skew_profile_sql(table: str, key: str, k: int = 10) -> str:
    return f"""
WITH counts AS (
  SELECT {key} AS key, COUNT(*) AS n FROM {table} GROUP BY 1
),
tot AS (SELECT CAST(SUM(n) AS BIGINT) AS rows_, COUNT(*) AS keys_ FROM counts)
SELECT key, n,
       CAST(n AS DOUBLE) / rows_ AS share,
       CAST(n * keys_ AS DOUBLE) / rows_ AS skew_ratio
FROM counts CROSS JOIN tot
ORDER BY n DESC, key ASC LIMIT {k}
"""


def observed_qa(df: DataFrame, columns: list[str] | None = None, name: str = "qa"):
    """Ride-along QA metrics via Spark's Observation API: row count and
    per-column null counts are accumulated DURING the next action on
    the returned frame (the write, the aggregation — whatever the job
    already does), so the QA pass costs ZERO extra scans. The
    reference's profiler (X10, tasks/quality_parallel.py:20-80) and its
    port `profile_frame` re-scan the frame; at 100 TB a second scan of
    the fact table is the single most expensive QA design choice this
    API deletes.

    Returns (observed_df, observation). After the first action on
    observed_df, ``observation.get`` yields
    {"rows": n, "nulls_<col>": n, ...}. Works on batch frames
    (streaming queries report through StreamingQueryProgress instead).
    """
    from pyspark.sql import Observation

    cols = columns or df.columns
    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("rows")] + [
        F.sum(F.when(F.col(c).isNull(), 1).otherwise(0)).alias(f"nulls_{c}")
        for c in cols
    ]
    return df.observe(obs, *metrics), obs


class ExpectationError(ValueError):
    """Raised by check_expectations(strict=True) when any rule fails."""


def check_expectations(
    df: DataFrame, rules: list[tuple], strict: bool = False
) -> list[dict]:
    """Declarative data-contract checks in ONE aggregation pass — the
    dbt-test / Great-Expectations shape on the gate machinery. Rules:

    - ``("not_null", col, min_frac)`` — fraction of non-null values
    - ``("unique", col)`` — no duplicate values among non-nulls
    - ``("accepted_values", col, values, min_frac)`` — membership
    - ``("between", col, lo, hi, min_frac)`` — inclusive range

    Every rule compiles to one conditional aggregate over the same
    scan, so a 50-rule contract on a 100 TB table costs ONE pass (the
    reference's QA loop paid a job per check). Returns one report dict
    per rule; ``strict=True`` raises on the first failure like the
    schema/non-empty gates."""
    aggs = [F.count(F.lit(1)).alias("__n")]
    for i, rule in enumerate(rules):
        kind, col = rule[0], rule[1]
        c = F.col(col)
        if kind == "not_null":
            aggs.append(F.count_if(c.isNotNull()).alias(f"__r{i}"))
        elif kind == "unique":
            aggs.append(F.countDistinct(c).alias(f"__r{i}"))
            aggs.append(F.count_if(c.isNotNull()).alias(f"__r{i}n"))
        elif kind == "accepted_values":
            aggs.append(F.count_if(c.isin(list(rule[2]))).alias(f"__r{i}"))
        elif kind == "between":
            aggs.append(
                F.count_if(c.between(rule[2], rule[3])).alias(f"__r{i}")
            )
        else:
            raise ValueError(f"unknown expectation {kind!r}")
    row = df.agg(*aggs).collect()[0].asDict()
    n = row["__n"]
    reports = []
    for i, rule in enumerate(rules):
        kind, col = rule[0], rule[1]
        if kind == "unique":
            observed = row[f"__r{i}"]
            ok = observed == row[f"__r{i}n"]
            detail = {"distinct": observed, "non_null": row[f"__r{i}n"]}
        else:
            frac = row[f"__r{i}"] / n if n else 1.0
            min_frac = rule[-1]
            ok = frac >= min_frac
            detail = {"fraction": frac, "min_fraction": min_frac}
        reports.append(
            {"rule": kind, "column": col, "ok": ok, "rows": n, **detail}
        )
    if strict:
        failed = [r for r in reports if not r["ok"]]
        if failed:
            raise ExpectationError(f"expectations failed: {failed}")
    return reports
