"""Scalar expression helpers (SURVEY.md §2.8) — native Column expressions
only, no Python UDFs (reference parity needs none, SURVEY.md §2.11)."""

from salesforce_prefect_etl_pipeline_spark.functions.scalars import (
    duration_hours,
    ensure_columns,
    exact_sum,
    exact_sum_sql,
    to_date_tolerant,
    to_timestamp_tolerant,
    try_double,
)

__all__ = [
    "duration_hours",
    "ensure_columns",
    "exact_sum",
    "exact_sum_sql",
    "to_date_tolerant",
    "to_timestamp_tolerant",
    "try_double",
]
