"""Composition root: importing this module registers every query.

``__spark_entry__`` (the driver contract) imports this; individual query
modules stay importable on their own (they only depend on
queries_registry, never on each other's registration)."""

from __future__ import annotations

from salesforce_prefect_etl_pipeline_spark import queries_ext  # noqa: F401
from salesforce_prefect_etl_pipeline_spark import queries_llm  # noqa: F401
from salesforce_prefect_etl_pipeline_spark import queries_sql  # noqa: F401
from salesforce_prefect_etl_pipeline_spark import queries_streaming  # noqa: F401
from salesforce_prefect_etl_pipeline_spark import queries_tpch  # noqa: F401
from salesforce_prefect_etl_pipeline_spark.queries_registry import ORACLES, QUERIES

__all__ = ["QUERIES", "ORACLES"]
