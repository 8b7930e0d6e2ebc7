"""Differential (hypothesis) tests: text operators vs their DuckDB SQL
twins on RANDOM documents — empty strings, whitespace-only, unicode,
punctuation runs — the edge inputs the well-formed parquet testdata
never exercises. Any engine-dialect divergence (tokenization of empty
text, regex class semantics, division edge cases) surfaces here."""

from __future__ import annotations

import math

import duckdb
import pandas as pd
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from salesforce_prefect_etl_pipeline_spark.operators import text

#: Letters, digits, punctuation, ASCII whitespace (incl. tabs/newlines),
#: and a few multibyte characters.
_ALPHABET = st.sampled_from(
    list("abcXYZ019 .,!?/@#-_\t\n") + ["é", "ß", "中", "🙂"]
)
_DOC = st.text(alphabet=_ALPHABET, min_size=0, max_size=60)


def _both(spark, docs_list, spark_fn, sql):
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs_list)], "doc_id long, text string"
    )
    got = spark_fn(sdf).orderBy("doc_id").toPandas()
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(docs_list)), "text": docs_list}),
    )
    want = con.sql(f"SELECT * FROM ({sql}) ORDER BY doc_id").df()
    return got, want


def _assert_frames_equal(got, want):
    assert list(got.columns) == list(want.columns)
    assert len(got) == len(want)
    for c in got.columns:
        for a, b in zip(got[c], want[c]):
            if isinstance(a, float) or isinstance(b, float):
                fa, fb = float(a), float(b)
                if math.isnan(fa) and math.isnan(fb):
                    continue
                assert fa == pytest.approx(fb, abs=0.0), (c, a, b)
            else:
                assert a == b, (c, a, b)


@settings(max_examples=12, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=6))
def test_token_stats_differential(spark, docs_list):
    got, want = _both(
        spark, docs_list, text.token_stats, text.TOKEN_STATS_SQL
    )
    _assert_frames_equal(got, want)


@settings(max_examples=12, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=6))
def test_repetition_stats_differential(spark, docs_list):
    got, want = _both(
        spark, docs_list, text.repetition_stats, text.REPETITION_STATS_SQL
    )
    _assert_frames_equal(got, want)


@settings(max_examples=12, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=6))
def test_fingerprints_differential(spark, docs_list):
    got, want = _both(spark, docs_list, text.fingerprints, text.FINGERPRINT_SQL)
    _assert_frames_equal(got, want)


@settings(max_examples=12, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=6))
def test_quality_score_differential(spark, docs_list):
    got, want = _both(
        spark, docs_list, text.quality_score, text.QUALITY_SCORE_SQL
    )
    _assert_frames_equal(got, want)


@settings(max_examples=10, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=6))
def test_length_filter_report_differential(spark, docs_list):
    from salesforce_prefect_etl_pipeline_spark.operators import corpus

    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs_list)], "doc_id long, text string"
    )
    got = corpus.length_filter_report(sdf).toPandas()
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(docs_list)), "text": docs_list}),
    )
    want = con.sql(corpus.length_filter_report_sql()).df()
    _assert_frames_equal(got, want)
