"""Composition root: importing this module registers every query.

``__spark_entry__`` (the driver contract) imports this; individual query
modules stay importable on their own (they only depend on
queries_registry, never on each other's registration).

The driver's correctness gate hard-checks only the FIRST 50 registered
queries, so ordering is part of the contract: ``_PRIORITY`` front-loads
the queries that most need an oracle row this round (round 1 checked the
first 50 in raw registration order, leaving TPC-H q4-q19, sql_*,
streaming_*, the LSH/ANN family and multimodal unchecked), followed by
re-checks of the compiler edge cases and flagship joins. Redundant
``spec_*`` registrations (9 specs exercising the identical compiler
path) are pruned from the driver registry — they remain fully covered by
``tests/test_spec_compiler.py::test_registered_specs_match_oracle``.
"""

from __future__ import annotations

from salesforce_prefect_etl_pipeline_spark import queries_ext  # noqa: F401
from salesforce_prefect_etl_pipeline_spark import queries_llm  # noqa: F401
from salesforce_prefect_etl_pipeline_spark import queries_sql  # noqa: F401
from salesforce_prefect_etl_pipeline_spark import queries_streaming  # noqa: F401
from salesforce_prefect_etl_pipeline_spark import queries_tpch  # noqa: F401
from salesforce_prefect_etl_pipeline_spark import queries_train  # noqa: F401
from salesforce_prefect_etl_pipeline_spark.queries_registry import ORACLES, QUERIES

#: spec_* queries that duplicate the same plans/compiler.py path; the four
#: kept ones (orders_by_status, orders_by_missing_channel,
#: orders_missing_metric, lineitem_global) cover its edge cases.
_PRUNE = {
    "spec_customer_by_mktsegment",
    "spec_part_by_brand_type",
    "spec_lineitem_revenue_by_flag",
    "spec_orders_open_by_priority",
    "spec_events_value_by_type",
}

#: Names listed here are registered first, in this order; everything else
#: follows in raw registration order. Unknown names are ignored so the
#: list may reference queries introduced in a later module version.
#: Each round the list is regenerated verbatim from tools/staleness.py's
#: suggested window (oldest driver row first); a pytest
#: (tests/test_registry.py) fails if the list drifts from that output,
#: so the rotation discipline is self-auditing.
_PRIORITY = [
    # --- round-17 window (tools/staleness.py suggested list, verbatim):
    # the 5 r12 streaming/window stragglers the r16 window didn't reach,
    # then the oldest 45 (the r13 agg/corpus/dedup/sql/text cohort).
    "streaming_dedup_user_counts",  # r12
    "streaming_enriched_segment_counts",  # r12
    "streaming_events_hourly",  # r12
    "streaming_sessionization",  # r12
    "window_percentile_ranks",  # r12
    "agg_binned_percentiles",  # r13
    "agg_distinct_suppliers_per_flag",  # r13
    "agg_median_acctbal_by_nation",  # r13
    "agg_stddev_acctbal_by_segment",  # r13
    "ann_cosine_topk_np",  # r13
    "corpus_contamination",  # r13
    "corpus_dedup_survivor_stats",  # r13
    "corpus_domain_mix",  # r13
    "corpus_e2e_curation",  # r13
    "corpus_length_filter_report",  # r13
    "corpus_pack_stats",  # r13
    "corpus_split_counts",  # r13
    "corpus_token_length_histogram",  # r13
    "corpus_url_scan",  # r13
    "corpus_weighted_sample",  # r13
    "cube_orders",  # r13
    "dedup_containment_pairs",  # r13
    "dedup_exact_groups",  # r13
    "dedup_exact_substring",  # r13
    "dedup_incremental_probe",  # r13
    "dedup_jaccard_pairs",  # r13
    "dedup_minhash_lsh",  # r13
    "dedup_near_dup_clusters",  # r13
    "emb_cluster_sample",  # r13
    "emb_pq_codes_panel",  # r13
    "emb_semdedup_prune_panel",  # r13
    "spec_orders_missing_metric",  # r13
    "sql_correlated_exists",  # r13
    "sql_embedding_dim_stats",  # r13
    "sql_in_subquery_having",  # r13
    "sql_orders_above_avg",  # r13
    "sql_q5_local_supplier",  # r13
    "text_bigram_counts",  # r13
    "text_bm25_appended",  # r13
    "text_bm25_champion",  # r13
    "text_bm25_indexed",  # r13
    "text_bm25_topk",  # r13
    "text_bpe_encode",  # r13
    "text_bpe_token_estimate",  # r13
    "text_bpe_train_merges",  # r13
    "text_chunk_fingerprints",  # r13
    "text_cms_top_tokens",  # r13
    "text_perceptron_quality",  # r13
    "text_phrase_indexed",  # r13
    "text_phrase_search",  # r13
]


def _prioritize() -> None:
    ordered = [n for n in _PRIORITY if n in QUERIES]
    ordered += [n for n in QUERIES if n not in set(ordered) and n not in _PRUNE]
    reordered = {n: QUERIES[n] for n in ordered}
    QUERIES.clear()
    QUERIES.update(reordered)
    for n in _PRUNE:
        ORACLES.pop(n, None)


_prioritize()

__all__ = ["QUERIES", "ORACLES"]
