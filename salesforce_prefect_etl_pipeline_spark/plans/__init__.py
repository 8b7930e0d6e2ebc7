"""Spec -> DataFrame plan compilation."""

from salesforce_prefect_etl_pipeline_spark.plans.compiler import (
    build_agg_exprs,
    compile_spec,
    ensure_session_confs,
    load_table,
    spec_oracle_sql,
)

__all__ = [
    "build_agg_exprs",
    "compile_spec",
    "ensure_session_confs",
    "load_table",
    "spec_oracle_sql",
]
