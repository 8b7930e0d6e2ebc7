"""Unit tests for the spec -> plan compiler (reference semantics:
tasks/process.py edge cases per FIXTURES.md §B)."""

from __future__ import annotations

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F
from pyspark.sql import types as T

from salesforce_prefect_etl_pipeline_spark.plans.compiler import (
    build_agg_exprs,
    prepare_input,
    spec_oracle_sql,
)
from salesforce_prefect_etl_pipeline_spark.specs import SPECS, TableSpec

from tests.conftest import SF_SMALL, assert_matches_oracle


def run_spec_on(df, spec):
    prepared = prepare_input(df, spec)
    keys = list(spec.group_by)
    aggs = build_agg_exprs(spec)
    if keys:
        return prepared.groupBy(*keys).agg(*aggs).orderBy(F.asc_nulls_first(keys[0]))
    return prepared.agg(*aggs)


OPP_SCHEMA = T.StructType(
    [
        T.StructField("Id", T.StringType()),
        T.StructField("StageName", T.StringType()),
        T.StructField("Amount", T.StringType()),
    ]
)

OPP_SPEC = TableSpec(
    name="opportunity_by_stage",
    table="opportunity",
    group_by=("StageName",),
    metrics={"Amount": ("sum", "mean", "count")},
)


def test_flagship_shape_and_semantics(spark):
    """B1 fixture: garbage amounts -> null; all-null group sum -> 0.0;
    null group key kept; sorted nulls-first by first key."""
    rows = [
        ("1", "Won", "100.5"),
        ("2", "Won", "N/A"),  # tolerant cast -> null
        ("3", "Lost", None),
        ("4", "Lost", None),  # all-null group
        ("5", None, "7.25"),  # null group key
    ]
    df = spark.createDataFrame(rows, OPP_SCHEMA)
    out = run_spec_on(df, OPP_SPEC)
    assert out.columns == ["StageName", "records", "sum_amount", "avg_amount"]
    got = [r.asDict() for r in out.collect()]
    # nulls first on ascending sort (tasks/process.py:107 + Polars default)
    assert got[0]["StageName"] is None and got[0]["sum_amount"] == 7.25
    lost = next(r for r in got if r["StageName"] == "Lost")
    assert lost["records"] == 2
    assert lost["sum_amount"] == 0.0  # Polars all-null-sum parity
    assert lost["avg_amount"] is None  # mean of all-null stays null
    won = next(r for r in got if r["StageName"] == "Won")
    assert won["records"] == 2 and won["sum_amount"] == 100.5
    assert won["avg_amount"] == 100.5  # null-ignoring mean


def test_empty_input_schema_synthesis(spark):
    """tasks/process.py:76-87: 0-row input -> typed 0-row aggregate."""
    df = spark.createDataFrame([], OPP_SCHEMA)
    out = run_spec_on(df, OPP_SPEC)
    assert out.count() == 0
    assert out.columns == ["StageName", "records", "sum_amount", "avg_amount"]
    dt = dict(out.dtypes)
    assert dt["records"] == "bigint"
    assert dt["sum_amount"] == "double"


def test_empty_input_global_agg(spark):
    """Global agg over empty input -> one row, records=0, sum=0.0."""
    spec = TableSpec(name="g", table="t", metrics={"Amount": ("sum",)})
    df = spark.createDataFrame([], OPP_SCHEMA)
    row = run_spec_on(df, spec).collect()[0]
    assert row["records"] == 0 and row["sum_amount"] == 0.0


def test_missing_group_key_unknown_fill(spark):
    """FIXTURES B4 missing_groupkey: _ensure_cols fills 'UNKNOWN'."""
    df = spark.createDataFrame([("1", "Won", "5")], OPP_SCHEMA)
    spec = TableSpec(name="m", table="t", group_by=("Region",), metrics={"Amount": ("sum",)})
    got = run_spec_on(df, spec).collect()
    assert got[0]["Region"] == "UNKNOWN" and got[0]["sum_amount"] == 5.0


def test_missing_metric_zero_fill(spark):
    """FIXTURES B4 missing_metric: synthesized literal 0.0."""
    df = spark.createDataFrame([("1", "Won", "5"), ("2", "Won", "6")], OPP_SCHEMA)
    spec = TableSpec(name="m", table="t", group_by=("StageName",), metrics={"Bogus": ("sum", "mean")})
    got = run_spec_on(df, spec).collect()[0]
    assert got["sum_bogus"] == 0.0 and got["avg_bogus"] == 0.0


def test_derived_column_metric(spark):
    """__DURATION_HOURS__ generalization: derived expr usable as metric."""
    schema = T.StructType(
        [
            T.StructField("k", T.StringType()),
            T.StructField("start_ts", T.StringType()),
            T.StructField("end_ts", T.StringType()),
        ]
    )
    df = spark.createDataFrame(
        [("a", "2024-01-01 00:00:00", "2024-01-01 06:00:00"),
         ("a", "2024-01-01 00:00:00", None)],
        schema,
    )
    spec = TableSpec(
        name="d",
        table="t",
        group_by=("k",),
        derived={
            "duration_hours": (
                "coalesce((cast(try_to_timestamp(end_ts) as double) -"
                " cast(try_to_timestamp(start_ts) as double)) / 3600.0, 0.0)"
            )
        },
        metrics={"duration_hours": ("sum", "mean", "max")},
    )
    got = run_spec_on(df, spec).collect()[0]
    # null end -> duration fill 0.0 (tasks/process.py:95)
    assert got["sum_duration_hours"] == 6.0
    assert got["avg_duration_hours"] == 3.0
    assert got["max_duration_hours"] == 6.0


def test_count_folds_into_records(spark):
    """'count' op emits no extra column (tasks/process.py:53)."""
    df = spark.createDataFrame([("1", "Won", "5")], OPP_SCHEMA)
    spec = TableSpec(name="c", table="t", group_by=("StageName",), metrics={"Amount": ("count",)})
    out = run_spec_on(df, spec)
    assert out.columns == ["StageName", "records"]


def test_invalid_op_rejected():
    with pytest.raises(ValueError):
        TableSpec(name="bad", table="t", metrics={"x": ("median",)})


@pytest.mark.parametrize("spec_name", sorted(SPECS))
def test_registered_specs_match_oracle(spark, duck, spec_name):
    """Every registered spec hash-matches its generated DuckDB oracle at
    sf0.001 (the driver does the same at sf0.01)."""
    from salesforce_prefect_etl_pipeline_spark.plans import compile_spec

    spec = SPECS[spec_name]
    if spec.limit is not None:
        pytest.skip("LIMIT specs are nondeterministic")
    assert_matches_oracle(
        spark,
        duck,
        lambda s, d: compile_spec(s, spec, d),
        spec_oracle_sql(spec),
    )


def test_where_on_unprojected_column(spark):
    """A spec may filter on a column absent from `fields` (the reference
    applies WHERE in SOQL before projection); the filter column must
    survive prepare_input's pruning."""
    from salesforce_prefect_etl_pipeline_spark.plans import compile_spec

    spec = TableSpec(
        name="open_orders_total",
        table="orders",
        fields=("o_totalprice",),
        where="o_orderstatus = 'O'",
        metrics={"o_totalprice": ("sum",)},
    )
    row = compile_spec(spark, spec, SF_SMALL).collect()[0]
    assert row.records > 0 and row.sum_o_totalprice > 0
