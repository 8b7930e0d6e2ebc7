"""Registry binding query names -> (Spark callable, DuckDB oracle SQL).

This is the single source of truth consumed by ``__spark_entry__``:
``QUERIES[name](spark, sf_dir) -> DataFrame`` and ``ORACLES[name]`` (a
DuckDB-compatible SQL string over the pre-registered testdata views).
Names without an oracle entry get the driver's weaker rows-only check.

Sections mirror SURVEY.md §2 plus the north-star extensions.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from salesforce_prefect_etl_pipeline_spark.plans import compile_spec, spec_oracle_sql
from salesforce_prefect_etl_pipeline_spark.specs import SPECS

QUERIES: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
ORACLES: dict[str, str] = {}


def register_query(
    name: str,
    fn: Callable[[SparkSession, str], DataFrame],
    oracle: str | None = None,
) -> None:
    QUERIES[name] = fn
    if oracle is not None:
        ORACLES[name] = oracle


def _register_spec_queries() -> None:
    """Every registered TableSpec becomes a query + generated oracle —
    the reference's whole config-driven aggregation surface
    (tasks/process.py via plans.compiler)."""
    for spec_name, spec in SPECS.items():
        if spec.limit is not None:
            continue  # LIMIT-without-order is nondeterministic; tested in pytest
        register_query(
            f"spec_{spec_name}",
            (lambda spark, sf_dir, s=spec: compile_spec(spark, s, sf_dir)),
            spec_oracle_sql(spec),
        )


_register_spec_queries()

# Extension query modules register themselves on import; the composition
# root that imports them all is queries_all (kept separate so individual
# query modules can be imported directly without a cycle through here).
