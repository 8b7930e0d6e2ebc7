"""Property-based test: for randomized CSV-shaped data (nulls, garbage
numerics, duplicate keys, unicode), the compiled Spark plan must match
the generated DuckDB oracle exactly. This is the engine's semantic
contract under adversarial inputs, not just the driver's fixed testdata."""

from __future__ import annotations

import os
import tempfile

import duckdb
import pandas as pd
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from salesforce_prefect_etl_pipeline_spark.plans.compiler import (
    build_agg_exprs,
    prepare_input,
    spec_oracle_sql,
)
from salesforce_prefect_etl_pipeline_spark.specs import TableSpec

# Spec under test: group key with nulls + metric with tolerant casts.
SPEC = TableSpec(
    name="prop",
    table="documents",  # reuse a known table name for oracle generation
    group_by=("lang",),
    metrics={"n_chars": ("sum", "mean", "min", "max")},
)

amount = st.one_of(
    st.none(),
    st.just("garbage"),
    st.floats(
        min_value=-1e6, max_value=1e6, allow_nan=False, allow_infinity=False
    ).map(lambda x: f"{x:.4f}"),
)
key = st.one_of(st.none(), st.sampled_from(["en", "de", "fr", "zh", "ümläut", ""]))
rows_strategy = st.lists(st.tuples(key, amount), min_size=0, max_size=60)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(rows=rows_strategy)
def test_compiler_matches_oracle_on_random_data(spark, rows):
    pdf = pd.DataFrame(
        {
            "lang": pd.Series([r[0] for r in rows], dtype="string"),
            "n_chars": pd.Series([r[1] for r in rows], dtype="string"),
        }
    )
    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "documents.parquet")
        pdf.to_parquet(path)

        from pyspark.sql import functions as F

        df = spark.read.parquet(path)
        prepared = prepare_input(df, SPEC)
        out = (
            prepared.groupBy("lang")
            .agg(*build_agg_exprs(SPEC))
            .orderBy(F.asc_nulls_first("lang"))
        )
        spark_pdf = out.toPandas()

        con = duckdb.connect()
        con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{path}')")
        oracle_pdf = con.sql(spec_oracle_sql(SPEC)).df()
        con.close()

    assert len(spark_pdf) == len(oracle_pdf)
    assert sorted(spark_pdf.columns) == sorted(oracle_pdf.columns)
    s = spark_pdf.reindex(sorted(spark_pdf.columns), axis=1).sort_values(
        by=list(sorted(spark_pdf.columns)), ignore_index=True
    )
    o = oracle_pdf.reindex(sorted(oracle_pdf.columns), axis=1).sort_values(
        by=list(sorted(oracle_pdf.columns)), ignore_index=True
    )
    pd.testing.assert_frame_equal(s, o, check_dtype=False, check_exact=True)


@settings(
    max_examples=15,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(
    token_counts=st.lists(st.integers(min_value=0, max_value=3000), min_size=1, max_size=60),
    capacity=st.integers(min_value=64, max_value=1024),
)
def test_pack_documents_property(spark, token_counts, capacity):
    """Packing invariants hold for arbitrary token-count distributions:
    exactly-once assignment and the capacity bound for multi-doc packs."""
    from salesforce_prefect_etl_pipeline_spark.operators import corpus

    docs = spark.createDataFrame(
        [(i, " ".join(["w"] * max(t, 1))) for i, t in enumerate(token_counts)],
        ["doc_id", "text"],
    )
    out = corpus.pack_documents(docs, capacity=capacity, n_groups=4).collect()
    assert len(out) == len(token_counts)
    assert len({r.doc_id for r in out}) == len(token_counts)
    from collections import defaultdict

    packs = defaultdict(list)
    for r in out:
        packs[(r.pack_group, r.pack_seq)].append(r.n_tokens)
    for members in packs.values():
        if len(members) > 1:
            assert sum(members) <= capacity


# ----------------------------------------------------------------------
# Greedy ingest acceptance (streaming/ingest.py) — pure function, so
# hypothesis can hammer it: the result must be a maximal independent
# set in arrival order, pre-accepted nodes are law, and processing in
# batches must equal processing all at once.
edge_strategy = st.lists(
    st.tuples(st.integers(0, 30), st.integers(0, 30)).filter(lambda p: p[0] != p[1]),
    min_size=0,
    max_size=60,
)


@settings(max_examples=200, deadline=None)
@given(edges=edge_strategy, split=st.integers(0, 30))
def test_greedy_accept_properties(edges, split):
    from salesforce_prefect_etl_pipeline_spark.streaming.ingest import greedy_accept

    ids = sorted({x for e in edges for x in e})
    accepted = greedy_accept(ids, edges)
    nbrs: dict[int, set[int]] = {}
    for a, b in edges:
        nbrs.setdefault(a, set()).add(b)
        nbrs.setdefault(b, set()).add(a)
    # independent: no accepted pair adjacent
    for a, b in edges:
        assert not (a in accepted and b in accepted)
    # maximal in order: every rejected doc has an earlier accepted nbr
    for d in ids:
        if d not in accepted:
            assert nbrs[d] & accepted
    # batch-splitting invariance: [ids<split] then [ids>=split] equals
    # one pass (greedy in ascending id order is prefix-stable)
    first = [d for d in ids if d < split]
    second = [d for d in ids if d >= split]
    acc2 = greedy_accept(second, edges, pre_accepted=greedy_accept(first, edges))
    assert acc2 == accepted
    # pre-accepted law: a pre-accepted node is never evicted and always
    # blocks its neighbors
    if ids:
        pre = {ids[-1]}
        acc3 = greedy_accept(ids, edges, pre_accepted=pre)
        assert pre <= acc3
        assert not any(n in acc3 for n in nbrs.get(ids[-1], set()))


@settings(
    max_examples=8,
    deadline=None,
    suppress_health_check=[HealthCheck.function_scoped_fixture],
)
@given(edges=edge_strategy)
def test_triangle_counts_match_bruteforce(spark, edges):
    from itertools import combinations

    from salesforce_prefect_etl_pipeline_spark.operators import graph

    if not edges:
        return
    df = spark.createDataFrame(edges, "src int, dst int")
    got = {r.node: r.n_triangles for r in graph.triangle_counts(df).collect()}
    und = {frozenset(e) for e in edges}
    nodes = sorted({x for e in edges for x in e})
    expected: dict[int, int] = {}
    for a, b, c in combinations(nodes, 3):
        if (
            frozenset((a, b)) in und
            and frozenset((b, c)) in und
            and frozenset((a, c)) in und
        ):
            for v in (a, b, c):
                expected[v] = expected.get(v, 0) + 1
    assert got == expected


# ----------------------------------------------------------------------
# Pigeonhole banding property: for ANY base fingerprint and ANY set of
# <= max_hamming bit flips, banded_hamming_pairs finds the pair — the
# guarantee simhash/aHash/audio near-dup all lean on. Driver-side
# hypothesis hammers the geometry; one Spark run per example would be
# minutes, so the property drives the same chunking/verify arithmetic
# the Column expressions encode, and a single Spark run pins the
# end-to-end plumbing.
fp64 = st.integers(min_value=0, max_value=(1 << 64) - 1)
flips = st.sets(st.integers(min_value=0, max_value=63), min_size=0, max_size=3)


@given(h=fp64, fl=flips)
@settings(max_examples=300, deadline=None)
def test_band_chunks_collide_within_hamming_3(h, fl):
    h2 = h
    for b in fl:
        h2 ^= 1 << b
    chunks = lambda x: [(x >> (16 * j)) & 0xFFFF for j in range(4)]
    # pigeonhole: <= 3 flips over 4 bands leaves >= 1 band untouched
    assert any(a == b for a, b in zip(chunks(h), chunks(h2)))
    # and the verify key agrees with the flip count
    assert bin(h ^ h2).count("1") == len(fl)


def test_banded_hamming_pairs_end_to_end_spark(spark):
    """One Spark run pinning the plumbing: planted flips are found with
    the exact hamming, a >3-flip pair is excluded."""
    from salesforce_prefect_etl_pipeline_spark.operators.dedup import (
        banded_hamming_pairs,
        hash64_band_chunks,
    )

    base = 0x0123_4567_89AB_CDEF
    h2 = base ^ 0b101  # hamming 2, both flips in the low band
    h3 = base ^ (1 << 0) ^ (1 << 16) ^ (1 << 32) ^ (1 << 48)  # one flip PER band
    rows = [
        (1, base & 0xFFFFFFFF, base >> 32),
        (2, h2 & 0xFFFFFFFF, h2 >> 32),
        (3, h3 & 0xFFFFFFFF, h3 >> 32),
    ]
    sig = spark.createDataFrame(rows, "media_id long, h_lo long, h_hi long")
    got = {
        (r.da, r.db): r.hamming
        for r in banded_hamming_pairs(
            sig, "media_id", ["h_lo", "h_hi"], hash64_band_chunks(),
            n_bands=4, max_hamming=3,
        ).collect()
    }
    assert got.get((1, 2)) == 2
    assert (1, 3) not in got  # 4 flips, one per band: correctly outside contract
