"""Spec -> DataFrame plan compiler.

Port of the reference's aggregation engine (``tasks/process.py:56-112``):
the ``_build_aggs`` expression compiler (``:27-54``), ``_ensure_cols``
(``:11-16``), tolerant metric casts (``:18-25``), group-by/global agg
dispatch (``:104``) and first-key output sort (``:107-108``) — as one lazy
Catalyst plan instead of the reference's eager file-per-stage pipeline.

Pinned semantics (SURVEY.md §4.3 "semantic shims"):

1. **Tolerant casts**: metric columns pass through ``try_cast('double')``
   (unparseable -> null), matching Polars ``strict=False``.
2. **All-null SUM -> 0.0** (Polars parity; SQL would give NULL). Both the
   Spark plan and the generated oracle SQL wrap sums in ``COALESCE(.., 0.0)``.
3. **Ascending sort places nulls first** in both engines (Spark default;
   oracle emits ``NULLS FIRST``).
4. **Deterministic float aggregation**: double SUM/AVG results depend on
   accumulation order (partial aggregation over N partitions), which would
   break bit-exact comparison against any single-threaded oracle and makes
   reruns non-reproducible at cluster scale. Metrics are therefore
   quantized per-row with IEEE-exact primitives (``floor(x*1e4 + 0.5)``,
   identical on every engine — see ``functions.exact_sum``) and
   accumulated exactly in DECIMAL, with the final value cast back to
   ``double``. AVG = exact-sum / non-null-count in IEEE double. This is
   order-independent at any parallelism — the property a 100 TB engine
   needs for reproducible numbers.

Output naming contract (tasks/process.py:28,45-52): group keys, then
``records`` (count(*), includes nulls), then ``sum_<col>/avg_<col>/
min_<col>/max_<col>`` (lowercased); a ``count`` op folds into ``records``
(``:53``).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F

from salesforce_prefect_etl_pipeline_spark.functions import (
    ensure_columns,
    exact_sum,
    exact_sum_sql,
    try_double,
)
from salesforce_prefect_etl_pipeline_spark.specs import TableSpec

# Internal prefix for pre-cast metric columns.
_M = "__metric__"


def ensure_session_confs(spark: SparkSession) -> None:
    """Runtime-settable confs the engine's semantics depend on, applied
    defensively so queries behave identically under a caller-created
    SparkSession (e.g. the driver harness), not only under
    ``session.get_spark``:

    - ``nanosAsLong``: events.ts is parquet TIMESTAMP(NANOS), which the
      Spark reader otherwise rejects outright (PARQUET_TYPE_ILLEGAL);
    - UTC session timezone: timestamp formatting/bucketing must match
      the UTC-based DuckDB oracle.
    """
    spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    spark.conf.set("spark.sql.session.timeZone", "UTC")


def load_table(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Parquet scan for one testdata table (TESTDATA.md layout).

    ``events.ts`` normalizes to a session-tz TIMESTAMP regardless of how
    the testdata was written (the generator has shipped both):

    - TIMESTAMP(NANOS): no native Spark type; with
      ``spark.sql.legacy.parquet.nanosAsLong`` it arrives as epoch-nanos
      long and is truncated to micros (same as DuckDB's
      TIMESTAMP_NS -> TIMESTAMP cast, so the oracle sees identical
      instants);
    - TIMESTAMP(MICROS, isAdjustedToUTC=false): Spark reads TIMESTAMP_NTZ;
      cast to TIMESTAMP interprets the wall-clock in the session zone
      (pinned UTC above), which is exactly how DuckDB treats the same
      naive values.
    """
    ensure_session_confs(spark)
    df = spark.read.parquet(f"{sf_dir}/{table}.parquet")
    if table == "events":
        ts_type = dict(df.dtypes).get("ts")
        if ts_type == "bigint":
            df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
        elif ts_type == "timestamp_ntz":
            df = df.withColumn("ts", F.col("ts").cast("timestamp"))
    return df


def _metric_output_cols(spec: TableSpec) -> list[tuple[str, str, str]]:
    """(metric_col, op, output_name) triples, 'count' folded into records."""
    out = []
    for col, ops in spec.metrics.items():
        for op in ops:
            if op == "count":
                continue  # covered by `records` (tasks/process.py:53)
            prefix = "avg" if op == "mean" else op
            out.append((col, op, f"{prefix}_{col.lower()}"))
    return out


def build_agg_exprs(spec: TableSpec) -> list[Column]:
    """The _build_aggs port (tasks/process.py:27-54): metrics dict -> Columns.

    Expects the pre-cast ``__metric__<col>`` double columns produced by
    :func:`compile_spec`'s prelude.
    """
    aggs: list[Column] = [F.count(F.lit(1)).alias("records")]
    for col, op, out_name in _metric_output_cols(spec):
        d = F.col(_M + col)
        esum = exact_sum(d)
        if op == "sum":
            aggs.append(F.coalesce(esum, F.lit(0.0)).alias(out_name))
        elif op == "mean":
            aggs.append(
                F.when(F.count(d) > 0, esum / F.count(d)).alias(out_name)
            )
        elif op == "min":
            aggs.append(F.min(d).alias(out_name))
        elif op == "max":
            aggs.append(F.max(d).alias(out_name))
    return aggs


def prepare_input(df: DataFrame, spec: TableSpec) -> DataFrame:
    """The pre-aggregation prelude: projection, filter, derived columns,
    group-key synthesis, tolerant metric casts.

    All narrow transformations — Catalyst collapses them into the scan
    (column pruning + predicate pushdown), so at 100 TB the parquet reader
    only materializes the referenced columns and row groups.
    """
    if spec.fields:
        needed = set(spec.fields) | set(spec.group_by) | set(spec.metrics)
        # Columns referenced only in derived exprs or the WHERE clause must
        # survive the projection (the reference applies WHERE in SOQL
        # *before* projection, so specs may filter on unprojected columns).
        for expr in [*spec.derived.values(), spec.where or ""]:
            needed |= {c for c in df.columns if c in expr}
        cols = [c for c in df.columns if c in needed]
        if cols:
            df = df.select(*cols)
    if spec.where:
        df = df.filter(F.expr(spec.where))
    if spec.limit is not None:
        df = df.limit(spec.limit)
    if spec.derived:
        df = df.select("*", *[F.expr(e).alias(n) for n, e in spec.derived.items()])
    df = ensure_columns(df, list(spec.group_by), fill="UNKNOWN")
    # Tolerant numeric casts; a missing metric column is synthesized as
    # literal 0.0 (tasks/process.py:23-24).
    metric_exprs = [
        (try_double(c) if c in df.columns else F.lit(0.0)).alias(_M + c)
        for c in spec.metrics
    ]
    return df.select("*", *metric_exprs)


def compile_spec(spark: SparkSession, spec: TableSpec, sf_dir: str) -> DataFrame:
    """Full spec -> result plan (the process_object_data port)."""
    df = prepare_input(load_table(spark, sf_dir, spec.table), spec)
    keys = list(spec.group_by)
    aggs = build_agg_exprs(spec)
    if keys:
        out = df.groupBy(*keys).agg(*aggs)
        # Reference sorts by the first group key only (tasks/process.py:107).
        out = out.orderBy(F.asc_nulls_first(keys[0]))
    else:
        out = df.agg(*aggs)
    return out


# --- Oracle SQL generation ---------------------------------------------
# Generating the DuckDB oracle from the same spec guarantees the column
# names and pinned semantics match the Spark plan exactly.

#: Static testdata schemas (TESTDATA.md / FIXTURES.md §A) — used to decide
#: which spec columns must be synthesized (UNKNOWN / 0.0) in the oracle.
TESTDATA_COLUMNS: dict[str, tuple[str, ...]] = {
    "region": ("r_regionkey", "r_name"),
    "nation": ("n_nationkey", "n_name", "n_regionkey"),
    "customer": ("c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"),
    "supplier": ("s_suppkey", "s_name", "s_nationkey", "s_acctbal"),
    "part": ("p_partkey", "p_name", "p_brand", "p_type", "p_size", "p_retailprice"),
    "orders": (
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice",
        "o_orderdate", "o_orderpriority",
    ),
    "lineitem": (
        "l_orderkey", "l_partkey", "l_suppkey", "l_linenumber", "l_quantity",
        "l_extendedprice", "l_discount", "l_tax", "l_returnflag",
        "l_linestatus", "l_shipdate",
    ),
    "events": ("event_id", "ts", "user_id", "event_type", "value", "props"),
    "documents": ("doc_id", "text", "lang", "source", "n_chars"),
    "embeddings": ("vec_id", "embedding", "label"),
}


def spec_oracle_sql(spec: TableSpec) -> str:
    """ANSI SQL (DuckDB dialect-compatible) equivalent of compile_spec."""
    table_cols = set(TESTDATA_COLUMNS[spec.table])
    avail = set(table_cols) | set(spec.derived)

    prep_items = ["*"]
    prep_items += [f"({e}) AS {n}" for n, e in spec.derived.items()]
    prep_items += [f"'UNKNOWN' AS {k}" for k in spec.group_by if k not in avail]
    prep_items += [
        (
            f"TRY_CAST({c} AS DOUBLE) AS __metric__{c}"
            if c in avail
            else f"0.0 AS __metric__{c}"
        )
        for c in spec.metrics
    ]
    where = f" WHERE {spec.where}" if spec.where else ""
    prep = f"SELECT {', '.join(prep_items)} FROM {spec.table}{where}"

    sel = list(spec.group_by) + ["COUNT(*) AS records"]
    for c, op, out_name in _metric_output_cols(spec):
        m = f"__metric__{c}"
        esum = exact_sum_sql(m)
        if op == "sum":
            sel.append(f"COALESCE({esum}, 0.0) AS {out_name}")
        elif op == "mean":
            sel.append(
                f"CASE WHEN COUNT({m}) > 0 THEN {esum} / COUNT({m}) END AS {out_name}"
            )
        else:
            sel.append(f"{op.upper()}({m}) AS {out_name}")

    sql = f"WITH __prep AS ({prep}) SELECT {', '.join(sel)} FROM __prep"
    if spec.group_by:
        keys = ", ".join(spec.group_by)
        sql += f" GROUP BY {keys} ORDER BY {spec.group_by[0]} ASC NULLS FIRST"
    return sql
