"""Tests for the round-3 corpus report operators (domain mix, dedup
impact, filter report, URL scan, repetition stats, pack stats) — the
semantic invariants the per-value oracle compare doesn't express."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from salesforce_prefect_etl_pipeline_spark.operators import corpus, text
from salesforce_prefect_etl_pipeline_spark.plans import load_table

from tests.conftest import SF_SMALL


@pytest.fixture(scope="module")
def docs(spark):
    return load_table(spark, SF_SMALL, "documents").cache()


def test_domain_mix_shares_sum_to_one(spark, docs):
    rows = corpus.domain_mix(docs).collect()
    assert rows, "testdata has documents"
    assert abs(sum(r.token_share for r in rows) - 1.0) < 1e-9
    assert sum(r.n_docs for r in rows) == docs.count()
    assert all(r.total_tokens > 0 for r in rows)


def test_dedup_survivor_stats_consistency(spark, docs):
    rows = {r.split: r for r in corpus.dedup_survivor_stats(docs).collect()}
    assert sum(r.n_docs for r in rows.values()) == docs.count()
    n_unique_fp = (
        docs.select(F.md5(text.normalized("text")).alias("fp")).distinct().count()
    )
    assert sum(r.n_survivors for r in rows.values()) == n_unique_fp
    for r in rows.values():
        assert r.n_removed == r.n_docs - r.n_survivors
        assert r.n_removed >= 0 and r.chars_removed >= 0
        # removed copies hold at most as many chars as any copy kept
        if r.n_removed == 0:
            assert r.chars_removed == 0


def test_length_filter_report_counts(spark, docs):
    n = docs.count()
    rows = corpus.length_filter_report(docs).collect()
    assert {r.filter for r in rows} == {name for name, _ in corpus._LENGTH_FILTERS}
    for r in rows:
        assert r.n_fail + r.n_pass == n
        assert abs(r.fail_frac - r.n_fail / n) < 1e-12


def test_url_scan_detects_and_strips(spark, docs):
    out = corpus.url_scan(corpus.with_synthetic_urls(docs)).collect()
    planted = [r for r in out if r.doc_id % 7 == 0]
    clean = [r for r in out if r.doc_id % 7 != 0]
    assert planted and all(r.n_urls == 2 for r in planted)
    assert all(r.n_urls == 0 for r in clean)
    assert all("http" not in r.cleaned for r in planted)
    # stripping leaves the surrounding prose intact
    assert all(r.cleaned.endswith("for details.") for r in planted)


def test_repetition_stats_on_constructed_docs(spark):
    rows = spark.createDataFrame(
        [
            (1, "spam spam spam spam"),  # one token repeated
            (2, "all tokens here are unique"),
            (3, "one"),  # single token: no 2-grams
            (4, "ab cd ab cd ab cd"),  # repeated 2-grams
        ],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in text.repetition_stats(rows).collect()}
    assert out[1].dup_token_frac == pytest.approx(3 / 4)
    assert out[1].top_token_frac == 1.0
    assert out[1].dup_2gram_frac == pytest.approx(2 / 3)
    assert out[2].dup_token_frac == 0.0
    assert out[2].dup_2gram_frac == 0.0
    assert out[3].n_tokens == 1 and out[3].dup_2gram_frac == 0.0
    # "ab cd" x3 + "cd ab" x2 -> 5 grams, 2 distinct -> 3/5 repeats
    assert out[4].dup_2gram_frac == pytest.approx(3 / 5)


def test_pack_stats_fill_ratio_bounds(spark, docs):
    cap = 2048
    rows = corpus.pack_stats(docs, capacity=cap).collect()
    assert rows
    packed_docs = sum(r.n_docs for r in rows)
    assert packed_docs == docs.count()
    for r in rows:
        assert r.n_packs >= 1
        assert 0.0 < r.fill_ratio
        # fill can only exceed 1 if a single doc exceeds capacity
        if r.max_pack_tokens <= cap:
            assert r.fill_ratio <= 1.0
        assert r.total_tokens == pytest.approx(r.fill_ratio * r.n_packs * cap)


def test_write_training_shards_roundtrip(spark, docs, tmp_path):
    """Sharded egress: partitionBy(shard) layout, deterministic
    assignment, lossless round-trip, and partition pruning on read-back."""
    from pathlib import Path

    path = str(tmp_path / "shards")
    sharded = corpus.write_training_shards(docs, path, n_shards=4)
    back = spark.read.parquet(path)
    assert back.count() == docs.count()
    # directory-per-shard layout
    shard_dirs = sorted(p.name for p in Path(path).iterdir() if p.name.startswith("shard="))
    assert shard_dirs == [f"shard={i}" for i in range(4)]
    # shard_idx is a dense 0..n-1 sequence within every shard
    for row in back.groupBy("shard").agg(
        F.count(F.lit(1)).alias("n"), F.max("shard_idx").alias("mx"), F.min("shard_idx").alias("mn")
    ).collect():
        assert (row.mn, row.mx) == (0, row.n - 1)
    # assignment is deterministic across runs
    again = corpus.shard_assignment(docs, n_shards=4)
    assert sharded.select("doc_id", "shard", "shard_idx").exceptAll(again).isEmpty()
    # read-back with a shard filter prunes at the partition level
    pruned = back.filter(F.col("shard") == 2)
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "shard" in plan.split("PartitionFilters")[1][:200]


def test_pack_oracle_overflow_differential(spark, tmp_path):
    """FFD oracle vs engine on data whose groups OVERFLOW one pack.

    The sf0.01 testdata happens to fit every md5 group into a single
    pack, so the driver's green rows never exercised the oracle's
    new-pack branch — where DuckDB's ``list_position`` returns 0 (not
    NULL) on a failed fit probe and, before the ``NULLIF`` guard, every
    overflowing doc got pack_seq = -1 and a corrupted capacity list.
    This pins the branch: one over-length doc (oversize pack of its
    own), three docs that each demand a fresh pack, then smaller docs
    that must land back in earlier packs' remaining capacity."""
    import duckdb
    import pandas as pd

    counts = [600, 400, 400, 400, 300, 200, 120, 100, 60, 10]
    rows = [(i, ("tok " * c).strip()) for i, c in enumerate(counts)]
    docs = spark.createDataFrame(rows, "doc_id long, text string")

    sdf = corpus.pack_documents(docs, capacity=512, n_groups=1).toPandas()
    assert int(sdf["pack_seq"].max()) >= 4, "data must overflow several packs"
    assert (sdf["pack_seq"] >= 0).all()

    pq = str(tmp_path / "documents.parquet")
    docs.toPandas().to_parquet(pq)
    con = duckdb.connect()
    con.sql(f"CREATE VIEW documents AS SELECT * FROM read_parquet('{pq}')")
    odf = con.sql(corpus.pack_documents_sql(capacity=512, n_groups=1)).df()

    s = sdf.sort_values("doc_id").reset_index(drop=True)
    o = odf.sort_values("doc_id").reset_index(drop=True)[s.columns]
    pd.testing.assert_frame_equal(s, o, check_dtype=False)

    # the aggregated twin must agree on the same overflowing input
    stats_s = (
        corpus.pack_stats(docs, capacity=512, n_groups=1)
        .toPandas()
        .sort_values("pack_group")
        .reset_index(drop=True)
    )
    stats_o = con.sql(corpus.pack_stats_sql(capacity=512, n_groups=1)).df()
    stats_o = stats_o.sort_values("pack_group").reset_index(drop=True)[stats_s.columns]
    pd.testing.assert_frame_equal(stats_s, stats_o, check_dtype=False)


def test_binned_percentiles_match_order_statistics(spark):
    """The bin reported for pct p must be floor() of the exact p-th
    discrete order statistic (threshold = ceil(p*n/100))."""
    from salesforce_prefect_etl_pipeline_spark.queries_ext import (
        agg_binned_percentiles,
    )
    from tests.conftest import SF_SMALL

    out = {
        (r.l_returnflag, r.pct): r.value_bin
        for r in agg_binned_percentiles(spark, SF_SMALL).collect()
    }
    from salesforce_prefect_etl_pipeline_spark.plans import load_table
    import math

    rows = (
        load_table(spark, SF_SMALL, "lineitem")
        .select("l_returnflag", "l_extendedprice")
        .collect()
    )
    by_flag = {}
    for r in rows:
        by_flag.setdefault(r.l_returnflag, []).append(r.l_extendedprice)
    for flag, vals in by_flag.items():
        vals.sort()
        for pct in (50, 90, 99):
            idx = math.ceil(pct * len(vals) / 100) - 1
            assert out[(flag, pct)] == math.floor(vals[idx]), (flag, pct)


def test_bpe_merge_candidates_counts_within_token_pairs(spark):
    """'aaab aaab' yields aa x4 and ab x2; pairs never cross token
    boundaries ('ba' from 'b a' must not appear)."""
    from salesforce_prefect_etl_pipeline_spark.operators import text as text_ops

    docs = spark.createDataFrame(
        [(1, "aaab aaab"), (2, "xy")], "doc_id long, text string"
    )
    out = {r.pair: r.freq for r in text_ops.bpe_merge_candidates(docs).collect()}
    assert out == {"aa": 4, "ab": 2, "xy": 1}


def test_key_skew_profile_flags_heavy_key(spark):
    """A 100x-heavy key reports share and skew_ratio exactly."""
    from salesforce_prefect_etl_pipeline_spark.operators.quality import (
        key_skew_profile,
    )

    rows = [(1,)] * 300 + [(i,) for i in range(2, 102)]  # key 1: 300, 100 keys x1
    df = spark.createDataFrame(rows, "k long")
    out = key_skew_profile(df, "k", k=3).collect()
    assert out[0].key == 1 and out[0].n == 300
    assert abs(out[0].share - 300 / 400) < 1e-12
    assert abs(out[0].skew_ratio - 300 * 101 / 400) < 1e-9


def test_new_operator_plan_shapes(spark):
    """Plan-shape contracts for the round-7 operators: the weighted
    sample must plan as TakeOrderedAndProject with NO shuffle exchange
    (partial top-k per task, driver merge); common_ngrams and the skew
    profile each pay exactly their one counting shuffle and a
    TakeOrdered, never a global sort."""
    from salesforce_prefect_etl_pipeline_spark.operators import text as text_ops
    from salesforce_prefect_etl_pipeline_spark.operators.corpus import (
        weighted_sample,
    )
    from salesforce_prefect_etl_pipeline_spark.operators.quality import (
        key_skew_profile,
    )
    from salesforce_prefect_etl_pipeline_spark.plans import load_table
    from tests.conftest import SF_SMALL

    docs = load_table(spark, SF_SMALL, "documents")

    ws = weighted_sample(docs, k=10)
    ws.collect()
    plan = ws._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "Exchange hashpartitioning" not in plan
    assert "Sort " not in plan  # no global sort — partial top-k only

    cn = text_ops.common_ngrams(docs, k=10)
    cn.collect()
    # AQE's string repeats the pre-adaptive plan after "== Initial
    # Plan ==" — count exchanges in the FINAL plan section only
    plan = (
        cn._jdf.queryExecution().executedPlan().toString()
        .split("== Initial Plan ==")[0]
    )
    assert "TakeOrderedAndProject" in plan
    assert plan.count("Exchange hashpartitioning") == 1  # the gram count

    ks = key_skew_profile(docs, "lang", k=5)
    ks.collect()
    plan = ks._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan


def test_mixture_plan_keeps_zero_availability_targets(spark):
    """A target language with NO corpus documents is the report's most
    important row: full deficit, zero rate — it must not vanish via an
    inner join."""
    from salesforce_prefect_etl_pipeline_spark.operators import corpus

    docs = spark.createDataFrame(
        [(1, "en", "alpha beta gamma"), (2, "en", "delta epsilon")],
        "doc_id long, lang string, text string",
    )
    plan = {
        r.lang: r
        for r in corpus.mixture_plan(
            docs, budget_tokens=100, targets=(("en", 60), ("zh", 40))
        ).collect()
    }
    assert set(plan) == {"en", "zh"}
    zh = plan["zh"]
    assert zh.available_tokens == 0
    assert zh.planned_tokens == 0
    assert zh.deficit_tokens == 40  # its whole budget slice
    assert zh.rate_ppm == 0
    en = plan["en"]
    assert en.available_tokens == 5 and en.planned_tokens == 5


def test_mixture_draw_independent_of_split_bucket(spark):
    """The mixture Bernoulli draw must be a salted stream: an unsalted
    md5(doc_id) draw's low digits ARE the split bucket (draw % 100 ==
    bucket for every doc), which at sub-100ppm rates yields an all-train
    sample. The salted draw must agree with the bucket only at chance
    level."""
    from salesforce_prefect_etl_pipeline_spark.operators.corpus import split_bucket

    ids = spark.range(2000).select(F.col("id").alias("doc_id"))
    unsalted = split_bucket(F.col("doc_id"), 1_000_000) % 100
    salted = (
        split_bucket(
            F.concat(F.col("doc_id").cast("string"), F.lit(":mix")), 1_000_000
        )
        % 100
    )
    bucket = split_bucket(F.col("doc_id"), 100)
    row = ids.agg(
        F.count_if(unsalted == bucket).alias("unsalted_eq"),
        F.count_if(salted == bucket).alias("salted_eq"),
        F.count(F.lit(1)).alias("n"),
    ).collect()[0]
    assert row.unsalted_eq == row.n  # the bug class: identical streams
    assert row.salted_eq < row.n * 0.05  # ~1% chance agreement


def test_seasonal_anomalies_dense_spine_and_spike(spark):
    """The seasonal volume fence: a planted 50-event spike in an
    otherwise 1-event-per-noon stream is flagged; the dense spine
    counts EVERY (date, hour) bucket including empty ones; and a
    uniform stream yields zero anomalies."""
    from datetime import datetime

    from salesforce_prefect_etl_pipeline_spark.queries_ext import (
        seasonal_volume_anomalies,
    )

    rows = [(datetime(2024, 1, d, 12, 0, 0), "a") for d in range(1, 22)]
    rows += [(datetime(2024, 1, 10, 15, 0, 0), "a")] * 50  # the spike
    ev = spark.createDataFrame(rows, "ts timestamp, event_type string")
    got = {r.event_type: r for r in seasonal_volume_anomalies(ev).collect()}
    a = got["a"]
    assert a.n_buckets == 21 * 24  # every bucket of the span, empties included
    assert a.n_anomalous >= 1  # the spike cell: baseline median 0, dev 50
    assert a.anomaly_share == a.n_anomalous / a.n_buckets

    uniform = spark.createDataFrame(
        [(datetime(2024, 1, d, 12, 0, 0), "b") for d in range(1, 22)],
        "ts timestamp, event_type string",
    )
    b = seasonal_volume_anomalies(uniform).collect()[0]
    assert b.n_anomalous == 0  # perfectly seasonal -> dev 0 everywhere


def test_shard_provenance_partitions_the_corpus(spark, docs):
    """Provenance rows partition the corpus exactly: doc counts and
    char mass sum to the corpus totals, and every shard id is within
    range."""
    rep = corpus.shard_provenance(docs, n_shards=8).collect()
    assert sum(r.n_docs for r in rep) == docs.count()
    assert sum(r.total_chars for r in rep) == docs.agg(F.sum("n_chars")).collect()[0][0]
    assert all(0 <= r.shard < 8 for r in rep)


def test_cluster_size_histogram_consistent_with_labels(spark, docs):
    """The histogram is exactly the size distribution of the CC labels:
    sizes >= 2 (components come from pairwise edges) and component
    counts weighted by size reproduce the labeled-node count."""
    from salesforce_prefect_etl_pipeline_spark.operators import dedup

    pairs = dedup.minhash_near_dup_pairs(docs, k=8, threshold=0.8)
    labels = dedup.connected_components(pairs.select("da", "db"))
    hist = (
        labels.groupBy("component")
        .agg(F.count(F.lit(1)).alias("size"))
        .groupBy("size")
        .agg(F.count(F.lit(1)).alias("n_components"))
        .collect()
    )
    assert all(r.size >= 2 for r in hist)
    assert sum(r.size * r.n_components for r in hist) == labels.count()
