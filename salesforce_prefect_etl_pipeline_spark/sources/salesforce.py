"""Salesforce SOQL source (SURVEY.md §2.1 S1/S2, §2.2 P1-P5, P8).

The SOQL plan building is pure logic, ported faithfully from
tasks/extract.py:16-57; the network client (simple-salesforce) is
optional — inject any ``fetch(soql) -> list[dict]`` callable (tests use a
stub). At cluster scale the driver-side pager feeds
``spark.createDataFrame``; a genuinely large extract would wrap the REST
cursor in ``mapInPandas`` over a frame of page offsets, but Salesforce
API limits make the driver pager the realistic design point.
"""

from __future__ import annotations

from collections.abc import Callable, Iterable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from salesforce_prefect_etl_pipeline_spark.specs import TableSpec


def parse_select_fields(soql: str) -> list[str]:
    """Field names of the SELECT list, honoring `expr AS alias`
    (tasks/extract.py:16-27)."""
    s = soql.strip()
    upper = s.upper()
    start = upper.find("SELECT")
    end = upper.find(" FROM ")
    if start < 0 or end < 0:
        return []
    fields = []
    for tok in s[start + len("SELECT") : end].split(","):
        parts = tok.strip().split()
        if len(parts) >= 3 and parts[-2].upper() == "AS":
            fields.append(parts[-1])
        elif parts:
            fields.append(parts[-1])
    return fields


def build_soql(spec: TableSpec, limit: int | None = 100) -> str:
    """`SELECT {fields} FROM {table}[ WHERE ...][ LIMIT n]`
    (tasks/extract.py:29-33,44-57)."""
    fields = ", ".join(spec.fields) if spec.fields else "Id"
    soql = f"SELECT {fields} FROM {spec.table}"
    if spec.where:
        soql += f" WHERE {spec.where}"
    n = spec.limit if spec.limit is not None else limit
    if n is not None:
        soql += f" LIMIT {n}"
    return soql


def records_to_df(
    spark: SparkSession, records: Iterable[dict], soql: str
) -> DataFrame:
    """list[dict] -> DataFrame with the reference's arrival contract:
    drop the per-record `attributes` dict (tasks/extract.py:82-83); on 0
    records return a 0-row all-string frame shaped by the SELECT list
    (:85-90); targeted ingest casts — Amount -> double, CloseDate -> date
    (:94-97, tolerant)."""
    rows = [{k: v for k, v in r.items() if k != "attributes"} for r in records]
    if not rows:
        fields = parse_select_fields(soql)
        schema = T.StructType([T.StructField(f, T.StringType()) for f in fields])
        return spark.createDataFrame([], schema)
    cols = list(rows[0].keys())
    schema = T.StructType([T.StructField(c, T.StringType()) for c in cols])
    df = spark.createDataFrame(
        [[None if r.get(c) is None else str(r.get(c)) for c in cols] for r in rows],
        schema,
    )
    if "Amount" in df.columns:
        df = df.withColumn("Amount", F.col("Amount").try_cast("double"))
    if "CloseDate" in df.columns:
        df = df.withColumn("CloseDate", F.try_to_timestamp("CloseDate").cast("date"))
    return df


def extract_object(
    spark: SparkSession,
    spec: TableSpec,
    fetch: Callable[[str], list[dict]],
    soql: str | None = None,
    limit: int | None = 100,
) -> tuple[DataFrame, str]:
    """S2: resolve the extract plan (user SOQL overrides the spec-built
    one) and run it through the injected fetcher."""
    plan = soql or build_soql(spec, limit)
    return records_to_df(spark, fetch(plan), plan), plan


def simple_salesforce_fetcher(
    username: str, password: str, security_token: str, domain: str = "login"
) -> Callable[[str], list[dict]]:
    """Real client factory (S1's login + query_all), optional dependency."""
    try:
        from simple_salesforce import Salesforce  # type: ignore
    except ImportError as e:  # pragma: no cover - optional dep
        raise ImportError(
            "simple-salesforce is not installed; inject a custom fetch callable"
        ) from e
    sf = Salesforce(
        username=username, password=password, security_token=security_token, domain=domain
    )
    return lambda soql: sf.query_all(soql).get("records", [])
