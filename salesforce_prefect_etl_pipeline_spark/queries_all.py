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
    # --- round-13 window (tools/staleness.py suggested list, verbatim):
    # the 15 remaining r9 rows (spec_orders_missing_metric, the sql_*
    # five, the text_* seven, two window_*), then the 35 oldest r10
    # rows. After this round no registered query's latest hard row is
    # older than r10 (r12 verdict task 1). Never-driver-checked queries
    # added this round sort first in the suggestion, displacing the
    # newest tail.
    "dedup_exact_substring",  # new (r13)
    "emb_pq_codes_panel",  # new (r13)
    "emb_semdedup_prune_panel",  # new (r13)
    "text_bm25_appended",  # new (r13)
    "text_bm25_champion",  # new (r13)
    "text_bm25_indexed",  # new (r13)
    "text_bm25_topk",  # new (r13)
    "text_bpe_encode",  # new (r13)
    "text_bpe_train_merges",  # new (r13)
    "text_perceptron_quality",  # new (r13)
    "text_phrase_indexed",  # new (r13)
    "text_phrase_search",  # new (r13)
    "spec_orders_missing_metric",  # r9
    "sql_correlated_exists",  # r9
    "sql_embedding_dim_stats",  # r9
    "sql_in_subquery_having",  # r9
    "sql_orders_above_avg",  # r9
    "sql_q5_local_supplier",  # r9
    "text_bigram_counts",  # r9
    "text_bpe_token_estimate",  # r9
    "text_chunk_fingerprints",  # r9
    "text_cms_top_tokens",  # r9
    "text_rolling_fingerprint",  # r9
    "text_tfidf_top_terms",  # r9
    "text_unigram_familiarity",  # r9
    "window_order_gap_days",  # r9
    "window_top3_orders_per_customer",  # r9
    "agg_binned_percentiles",  # r10
    "agg_distinct_suppliers_per_flag",  # r10
    "agg_median_acctbal_by_nation",  # r10
    "agg_stddev_acctbal_by_segment",  # r10
    "ann_cosine_topk_np",  # r10
    "corpus_contamination",  # r10
    "corpus_dedup_survivor_stats",  # r10
    "corpus_domain_mix",  # r10
    "corpus_e2e_curation",  # r10
    "corpus_length_filter_report",  # r10
    "corpus_pack_stats",  # r10
    "corpus_split_counts",  # r10
    "corpus_token_length_histogram",  # r10
    "corpus_url_scan",  # r10
    "corpus_weighted_sample",  # r10
    "cube_orders",  # r10
    "dedup_containment_pairs",  # r10
    "dedup_exact_groups",  # r10
    "dedup_incremental_probe",  # r10
    "dedup_jaccard_pairs",  # r10
    "dedup_minhash_lsh",  # r10
    "dedup_near_dup_clusters",  # r10
    "emb_cluster_sample",  # r10
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
