"""Every reference object spec must compile and produce the reference's
output shape on string-typed (CSV-like) input frames."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from salesforce_prefect_etl_pipeline_spark.plans.compiler import (
    build_agg_exprs,
    prepare_input,
)
from salesforce_prefect_etl_pipeline_spark.reference_specs import REFERENCE_SPECS
from salesforce_prefect_etl_pipeline_spark.sources.salesforce import build_soql


def _fake_frame(spark, spec, n=7):
    """String-typed frame shaped like the spec's extract (CSV arrival)."""
    schema = T.StructType([T.StructField(f, T.StringType()) for f in spec.fields])
    rows = []
    for i in range(n):
        row = []
        for f in spec.fields:
            if f == "Id":
                row.append(f"id{i}")
            elif f in spec.metrics and f != "Id":
                row.append(str(10.5 * (i + 1)))
            elif "DateTime" in f:
                row.append(f"2024-01-01 0{i % 10}:00:00")
            else:
                row.append(f"v{i % 3}")
        rows.append(row)
    return spark.createDataFrame(rows, schema)


def test_all_23_objects_registered():
    assert len(REFERENCE_SPECS) == 23


@pytest.mark.parametrize("name", sorted(REFERENCE_SPECS))
def test_spec_compiles_with_reference_output_shape(spark, name):
    spec = REFERENCE_SPECS[name]
    df = _fake_frame(spark, spec)
    prepared = prepare_input(df, spec)
    out = prepared.groupBy(*spec.group_by).agg(*build_agg_exprs(spec))
    cols = out.columns
    # group keys first, then records, then metric columns (process.py:28+)
    assert cols[: len(spec.group_by)] == list(spec.group_by)
    assert "records" in cols
    for mcol, ops in spec.metrics.items():
        for op in ops:
            if op == "count":
                continue  # folds into records
            prefix = "avg" if op == "mean" else op
            assert f"{prefix}_{mcol.lower()}" in cols
    assert out.count() > 0
    # SOQL plan builds for every spec (extract surface)
    soql = build_soql(spec)
    assert soql.startswith("SELECT Id") and f"FROM {spec.table}" in soql


def test_event_duration_semantics(spark):
    spec = REFERENCE_SPECS["Event"]
    schema = T.StructType([T.StructField(f, T.StringType()) for f in spec.fields])
    rows = [
        ["1", "s", "2024-01-01 00:00:00", "2024-01-01 06:00:00", "own1", "w", "l"],
        ["2", "s", "2024-01-01 00:00:00", None, "own1", "w", "l"],  # -> 0.0
        ["3", "s", "bogus", "2024-01-01 01:00:00", "own1", "w", "l"],  # -> 0.0
    ]
    df = spark.createDataFrame(rows, schema)
    out = (
        prepare_input(df, spec)
        .groupBy(*spec.group_by)
        .agg(*build_agg_exprs(spec))
        .collect()[0]
    )
    assert out["sum_duration_hours"] == 6.0
    assert out["avg_duration_hours"] == 2.0  # nulls filled to 0.0 pre-agg
    assert out["records"] == 3
