"""Salesforce SOQL source (SURVEY.md §2.1 S1/S2, §2.2 P1-P5, P8).

The SOQL plan building is pure logic, ported faithfully from
tasks/extract.py:16-57; the network client (simple-salesforce) is
optional — inject any ``fetch(soql) -> list[dict]`` callable (tests use a
stub).

Two extract shapes:

- :func:`extract_object` — driver-side fetch feeding
  ``spark.createDataFrame`` (right at the reference's LIMIT-100
  envelope).
- :func:`extract_object_paged` — the scale path (SURVEY.md:115): a tiny
  frame of id-range pages is ``mapInPandas``-mapped so each PARTITION
  runs its own SOQL page fetch on an executor; rows never pass through
  the driver. The injected ``fetch_page(soql, lo, hi)`` is shipped to
  executors via cloudpickle (a real client builds its connection lazily
  per worker — connections don't pickle).
"""

from __future__ import annotations

from collections.abc import Callable, Iterable, Iterator

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


def apply_ingest_casts(df: DataFrame) -> DataFrame:
    """Targeted tolerant ingest casts (tasks/extract.py:94-97): Amount ->
    double, CloseDate -> date; shared by both extract shapes."""
    if "Amount" in df.columns:
        df = df.withColumn("Amount", F.col("Amount").try_cast("double"))
    if "CloseDate" in df.columns:
        df = df.withColumn("CloseDate", F.try_to_timestamp("CloseDate").cast("date"))
    return df


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
    return apply_ingest_casts(df)


def _keyword_pos(soql: str, keyword: str) -> int:
    """Position of the OUTER ``keyword`` clause: case-insensitive,
    space-delimited, outside single-quoted string literals (SOQL escapes
    embedded quotes as ``\\'``) and at parenthesis depth 0 — subqueries
    in SELECT or WHERE are always parenthesized, so depth 0 is exactly
    the outer query. Returns -1 if absent."""
    target = f" {keyword.upper()} "
    in_str = False
    depth = 0
    i = 0
    while i < len(soql):
        ch = soql[i]
        if in_str:
            if ch == "\\":
                i += 1  # skip escaped char inside the literal
            elif ch == "'":
                in_str = False
        elif ch == "'":
            in_str = True
        elif ch == "(":
            depth += 1
        elif ch == ")":
            depth -= 1
        elif depth == 0 and soql[i : i + len(target)].upper() == target:
            return i
        i += 1
    return -1


def soql_with_id_range(soql: str, lo: str, hi: str, id_col: str = "Id") -> str:
    """Compose the page predicate into a SOQL plan: AND-append
    ``id_col >= lo AND id_col < hi`` to the WHERE clause (creating one if
    absent), preserving any trailing LIMIT.

    Clause detection is structural: keywords match case-insensitively,
    outside quoted string literals (so ``Name = 'see where it goes'`` is
    safe) and at parenthesis depth 0 (so a ``WHERE`` or ``LIMIT`` inside
    a parenthesized subquery is never mistaken for the outer clause)."""
    return soql_with_predicate(soql, f"{id_col} >= '{lo}' AND {id_col} < '{hi}'")


def soql_with_predicate(soql: str, pred: str) -> str:
    """AND-compose ``pred`` into the outer WHERE clause of a SOQL plan
    (creating one if absent), preserving any trailing LIMIT. Clause
    detection is structural (see ``_keyword_pos``)."""
    li = _keyword_pos(soql, "LIMIT")
    body, limit = (soql[:li], soql[li + len(" LIMIT ") :]) if li >= 0 else (soql, None)
    wi = _keyword_pos(body, "WHERE")
    if wi >= 0:
        cut = wi + len(" WHERE ")
        body = f"{body[:cut]}({body[cut:]}) AND {pred}"
    else:
        body = f"{body} WHERE {pred}"
    return f"{body} LIMIT {limit}" if limit is not None else body


def extract_object_incremental(
    spark: SparkSession,
    spec: TableSpec,
    fetch: Callable[[str], list[dict]],
    store,
    modstamp_col: str = "SystemModstamp",
    soql: str | None = None,
) -> tuple[DataFrame, str, str | None]:
    """Watermark-based incremental extract: fetch only records whose
    ``modstamp_col`` is strictly greater than the persisted watermark,
    then advance the watermark to the max modstamp seen. Extension
    beyond the reference (tasks/extract.py re-extracts fully each run) —
    at real extract volumes, incremental + the paged scale path is how a
    Salesforce source keeps up.

    Contract notes: SOQL datetime literals are UNQUOTED ISO-8601, and
    ISO-8601 strings in one timezone format order lexicographically, so
    the max-seen watermark needs no datetime parsing.

    The extractor itself never persists the watermark — it returns the
    candidate and the CALLER commits it (``store.set_watermark``) only
    after the batch is durably written. Committing inside the extractor
    would make a crash between fetch and load silently skip those
    records on the re-run (at-most-once); commit-after-write keeps the
    pipeline at-least-once — re-runs re-fetch the same window, and the
    strictly-greater predicate plus run-id dedup downstream makes the
    replay harmless. Returns (df, soql_used, new_watermark).
    """
    base = soql or build_soql(spec, limit=None)
    wm = store.get_watermark(spec.name)
    plan = soql_with_predicate(base, f"{modstamp_col} > {wm}") if wm else base
    records = fetch(plan)
    df = records_to_df(spark, records, plan)
    stamps = [
        r[modstamp_col]
        for r in records
        if isinstance(r, dict) and r.get(modstamp_col) is not None
    ]
    new_wm = max(stamps) if stamps else wm
    return df, plan, new_wm


def extract_object_paged(
    spark: SparkSession,
    spec: TableSpec,
    fetch_page: Callable[[str], list[dict]],
    id_ranges: list[tuple[str, str]],
    soql: str | None = None,
    id_col: str = "Id",
) -> tuple[DataFrame, str]:
    """S1 scale path: partition-parallel paged extract.

    Each element of ``id_ranges`` becomes one row of a tiny driver frame
    that is repartitioned so every page lands in its own partition; the
    ``mapInPandas`` kernel runs ``fetch_page(page_soql)`` ON THE
    EXECUTOR and emits that page's records — rows go straight from the
    API into executor memory, never through the driver. The output
    contract is identical to :func:`records_to_df` (attributes dropped,
    all-string arrival schema from the SELECT list, targeted ingest
    casts) — verified by equivalence tests against the driver-side path.

    At 100 TB-scale extract volumes, id-range pages are the standard
    Salesforce parallel-read strategy (PK chunking); cursor-style
    queryMore paging can be wrapped the same way with (cursor, batch)
    rows instead of ranges.
    """
    plan = soql or build_soql(spec, limit=None)
    fields = parse_select_fields(plan)
    schema = T.StructType([T.StructField(f, T.StringType()) for f in fields])
    pages = spark.createDataFrame(
        [(lo, hi) for lo, hi in id_ranges], "lo string, hi string"
    ).repartition(max(len(id_ranges), 1))

    def _fetch(batches: Iterator) -> Iterator:
        import pandas as pd

        for pdf in batches:
            for lo, hi in zip(pdf["lo"], pdf["hi"]):
                page_soql = soql_with_id_range(plan, lo, hi, id_col)
                recs = [
                    {k: v for k, v in r.items() if k != "attributes"}
                    for r in fetch_page(page_soql)
                ]
                yield pd.DataFrame(
                    {
                        f: [
                            None if r.get(f) is None else str(r.get(f))
                            for r in recs
                        ]
                        for f in fields
                    },
                    columns=fields,
                    dtype=object,
                )

    return apply_ingest_casts(pages.mapInPandas(_fetch, schema)), plan


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
