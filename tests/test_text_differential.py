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


@settings(max_examples=8, deadline=None)
@given(st.lists(_DOC, min_size=2, max_size=5), st.data())
def test_jaccard_pairs_differential(spark, docs_list, data):
    """Exact n-gram Jaccard vs its SQL twin on random docs, with forced
    duplicates so pairs actually exist; k=4 so short docs still shingle.
    Locks in the short-doc shingle guard (sequence(1,0) is descending in
    Spark, empty in DuckDB)."""
    from salesforce_prefect_etl_pipeline_spark.operators import dedup

    # duplicate a random subset so near-dup pairs exist
    dups = data.draw(st.lists(st.sampled_from(docs_list), max_size=3))
    full = docs_list + dups
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(full)], "doc_id long, text string"
    )
    got = dedup.jaccard_pairs(sdf, k=4, threshold=0.2).toPandas()
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(full)), "text": full})
    )
    want = con.sql(dedup.jaccard_pairs_sql(k=4, threshold=0.2)).df()
    _assert_frames_equal(got, want)


@settings(max_examples=8, deadline=None)
@given(st.lists(st.integers(min_value=0, max_value=2**61), min_size=1, max_size=8, unique=True))
def test_split_bucket_differential(spark, ids):
    """md5-hex bucketing (the split/shard primitive) must agree across
    engines for arbitrary 63-bit ids."""
    from salesforce_prefect_etl_pipeline_spark.operators import corpus

    sdf = spark.createDataFrame([(i, "x") for i in ids], "doc_id long, text string")
    got = corpus.split_counts(sdf).toPandas()
    con = duckdb.connect()
    con.register("documents", pd.DataFrame({"doc_id": ids, "text": ["x"] * len(ids)}))
    want = con.sql(corpus.split_counts_sql()).df()
    _assert_frames_equal(got, want)


@settings(max_examples=8, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=5))
def test_pii_url_regex_differential(spark, docs_list):
    """Email/phone/URL regex semantics (count + replace) must be
    byte-identical between Java regex and DuckDB RE2 on arbitrary text,
    including text that embeds plausible matches."""
    from pyspark.sql import functions as F

    from salesforce_prefect_etl_pipeline_spark.operators import corpus

    # salt in genuine matches so replacement paths execute
    salted = [
        t + " a@b.co +1-555-0199 https://x.io/p " for t in docs_list
    ] + docs_list
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(salted)], "doc_id long, text string"
    )
    got = (
        sdf.select(
            "doc_id",
            F.regexp_count("text", F.lit(corpus.EMAIL_RE)).alias("n_emails"),
            F.regexp_count("text", F.lit(corpus.PHONE_RE)).alias("n_phones"),
            F.regexp_count("text", F.lit(corpus.URL_RE)).alias("n_urls"),
            F.regexp_replace(
                F.regexp_replace(
                    F.regexp_replace("text", corpus.EMAIL_RE, "<EMAIL>"),
                    corpus.PHONE_RE,
                    "<PHONE>",
                ),
                corpus.URL_RE,
                "",
            ).alias("redacted"),
        )
        .orderBy("doc_id")
        .toPandas()
    )
    con = duckdb.connect()
    con.register(
        "documents", pd.DataFrame({"doc_id": range(len(salted)), "text": salted})
    )
    want = con.sql(f"""
SELECT doc_id,
       len(regexp_extract_all(text, '{corpus.EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(text, '{corpus.PHONE_RE}')) AS n_phones,
       len(regexp_extract_all(text, '{corpus.URL_RE}')) AS n_urls,
       regexp_replace(regexp_replace(regexp_replace(
         text, '{corpus.EMAIL_RE}', '<EMAIL>', 'g'),
         '{corpus.PHONE_RE}', '<PHONE>', 'g'),
         '{corpus.URL_RE}', '', 'g') AS redacted
FROM documents ORDER BY doc_id
""").df()
    _assert_frames_equal(got, want)


@settings(max_examples=12, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=6))
def test_bpe_token_estimate_differential(spark, docs_list):
    """The BPE pre-tokenizer regex must match identically under Java
    (Spark) and RE2 (DuckDB) — alternation order, greedy runs, the
    apostrophe contractions, unicode falling into the punctuation
    class — including empty/whitespace-only docs (0 pieces, NULL
    chars-per-token)."""
    got, want = _both(
        spark, docs_list, text.bpe_token_estimate, text.BPE_TOKEN_ESTIMATE_SQL
    )
    _assert_frames_equal(got, want)


@settings(max_examples=12, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=6))
def test_rolling_fingerprint_differential(spark, docs_list):
    """Rabin-Karp fold parity: Spark aggregate() vs DuckDB list_reduce()
    over the printable-ASCII projection — unicode stripped identically,
    empty/whitespace-only docs hash to 0 in both engines."""
    got, want = _both(
        spark, docs_list, text.rolling_fingerprint, text.ROLLING_FINGERPRINT_SQL
    )
    _assert_frames_equal(got, want)


@settings(max_examples=8, deadline=None)
@given(st.lists(_DOC, min_size=2, max_size=5))
def test_simhash_pairs_differential(spark, docs_list):
    """Full SimHash pipeline parity on adversarial docs: md5 token hash,
    per-bit sign sums, packed signature, banded candidates vs the
    brute-force SQL replay — empty docs, unicode tokens, duplicate
    texts (Hamming 0) included."""
    from salesforce_prefect_etl_pipeline_spark.operators import dedup

    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs_list)], "doc_id long, text string"
    )
    got = (
        dedup.simhash_near_dup_pairs(sdf, max_hamming=3)
        .toPandas()
        .sort_values(["da", "db"])
        .reset_index(drop=True)
    )
    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame({"doc_id": range(len(docs_list)), "text": docs_list}),
    )
    want = (
        con.sql(dedup.simhash_pairs_sql(max_hamming=3))
        .df()
        .sort_values(["da", "db"])
        .reset_index(drop=True)
    )
    _assert_frames_equal(got, want)


@settings(max_examples=10, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=5))
def test_chunk_fingerprints_differential(spark, docs_list):
    """CDC parity: identical boundary polynomial, bounds assembly, and
    chunk md5 across engines — including docs shorter than the window,
    empty docs, and unicode (stripped identically)."""
    got, want = _both(
        spark, docs_list, text.chunk_fingerprints, text.CHUNK_FINGERPRINTS_SQL
    )
    got = got.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    want = want.sort_values(["doc_id", "chunk_idx"]).reset_index(drop=True)
    _assert_frames_equal(got, want)


@settings(max_examples=12, deadline=None)
@given(st.lists(_DOC, min_size=1, max_size=8))
def test_tokens_py_twin_matches_engine(spark, docs_list):
    """The driver-side tokenizer twins (tokens_py / analyzed_tokens_py,
    r14 advice) must agree with the engine Column tokenizers on
    adversarial input — Unicode whitespace lookalikes, multibyte
    chars, leading/trailing runs, empty strings. NBSP (\\u00a0) is
    added explicitly: it's the exact divergence the twins fixed
    (Python str.split treats it as whitespace, Java \\s does not)."""
    docs_list = docs_list + ["a b", "  x ", "", "\t", "A, B! c"]
    sdf = spark.createDataFrame(
        [(i, t) for i, t in enumerate(docs_list)], "doc_id long, text string"
    )
    import pyspark.sql.functions as F

    raw = [
        r.t
        for r in sdf.orderBy("doc_id")
        .select(text.tokens("text").alias("t"))
        .collect()
    ]
    assert raw == [text.tokens_py(t) for t in docs_list]
    simple = [
        r.t
        for r in sdf.orderBy("doc_id")
        .select(text.analyzed_tokens("text").alias("t"))
        .collect()
    ]
    assert simple == [text.analyzed_tokens_py(t) for t in docs_list]
