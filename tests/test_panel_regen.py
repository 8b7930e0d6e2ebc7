"""Panel fixture-regeneration invalidation (r11 verdict task 7).

`queries_llm._panel` memoizes the sizing COUNT(*) per
(app, sf_dir, table, file-fingerprint); the DuckDB twin recomputes the
count live. If a fixture is regenerated in place mid-session, a stale
memoized count would make the two engines pick DIFFERENT md5-bucket
counts and spuriously mismatch — the (mtime, size) fingerprint in the
memo key is what prevents that, and until this test nothing exercised
an actual in-place rewrite.
"""

from __future__ import annotations

import duckdb
import pyarrow.parquet as pq
from pyspark.sql import functions as F

from salesforce_prefect_etl_pipeline_spark import queries_llm as qllm
from salesforce_prefect_etl_pipeline_spark.plans import load_table

from .conftest import SF_MED


def _write_documents(spark, path: str, replicas: int) -> int:
    """Overwrite {path}/documents.parquet with `replicas` key-shifted
    copies of the sf0.01 documents table; returns the row count."""
    src = load_table(spark, SF_MED, "documents")
    out = src
    for r in range(1, replicas):
        out = out.unionByName(
            src.withColumn("doc_id", F.col("doc_id") + F.lit(r * 1_000_000))
        )
    tbl = out.toArrow() if hasattr(out, "toArrow") else None
    if tbl is None:  # pragma: no cover - older pyspark
        import pyarrow as pa

        tbl = pa.Table.from_pandas(out.toPandas())
    pq.write_table(tbl, f"{path}/documents.parquet")
    return tbl.num_rows


def _duck_panel_count(path: str) -> int:
    con = duckdb.connect()
    con.sql(
        "CREATE VIEW documents AS "
        f"SELECT * FROM read_parquet('{path}/documents.parquet')"
    )
    src = qllm._panel_source_sql("documents", "doc_id", qllm._PANEL_DOC_CAP)
    return con.sql(f"SELECT COUNT(*) FROM {src} t").fetchone()[0]


def test_panel_repicks_bucket_count_on_fixture_regeneration(spark, tmp_path):
    path = str(tmp_path)

    n1 = _write_documents(spark, path, 24)  # 12,000 rows -> 42 buckets
    p1 = qllm._docs_panel(spark, path).count()
    assert 0 < p1 < n1, "panel should be a strict md5-bucket subset"
    assert p1 == _duck_panel_count(path)

    # regenerate the fixture IN PLACE (different size and mtime): the
    # memoized count must be invalidated so Spark re-counts and both
    # engines agree on the new bucket count
    n2 = _write_documents(spark, path, 12)  # 6,000 rows -> 84 buckets
    assert n2 != n1
    p2 = qllm._docs_panel(spark, path).count()
    assert p2 == _duck_panel_count(path)
    assert p2 != p1, "panel did not repick after in-place regeneration"
