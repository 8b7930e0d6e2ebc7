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
_PRIORITY = [
    # --- round-1 unchecked, oracle-backed: TPC-H tail ---
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q15_top_supplier",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive",
    # --- round-1 unchecked, oracle-backed: SQL surface ---
    "sql_q5_local_supplier",
    "sql_orders_above_avg",
    "sql_correlated_exists",
    "sql_in_subquery_having",
    "sql_pivot_counts",
    "sql_union_all_counts",
    "sql_embedding_dim_stats",
    # --- round-1 unchecked, oracle-backed: sessionization/streaming ---
    "events_sessionization",
    "events_sliding_counts",
    "streaming_events_hourly",
    "streaming_sessionization",
    "streaming_dedup_user_counts",
    "streaming_enriched_segment_counts",
    # --- round-1 unchecked, oracle-backed: LLM-data ops ---
    "dedup_minhash_lsh",
    "emb_near_dup_pairs",
    "emb_near_dup_banded",
    "ann_cosine_topk",
    "media_frame_sample",
    "media_feature_stats",
    "media_decode_stats",
    "qa_profile_orders",
    "qa_profile_orders_topk",
    "corpus_split_counts",
    "corpus_contamination",
    "corpus_canonical_by_quality",
    "corpus_token_length_histogram",
    "corpus_pii_scan",
    "corpus_pack_documents",
    "corpus_training_manifest",
    "corpus_stratified_sample",
    # --- round-1 unchecked, rows-only (approximate / iterative) ---
    "dedup_near_dup_clusters",
    "dedup_simhash_pairs",
    "ann_srp_topk",
    "ann_ivf_probe",
    "ann_ivf_topk",
    "ann_cosine_topk_np",
    # --- re-checks: compiler edge cases + flagship joins/windows ---
    "spec_orders_by_status",
    "spec_orders_by_missing_channel",
    "spec_orders_missing_metric",
    "spec_lineitem_global",
    "q1_pricing_summary",
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q10_returned_items",
    "join_revenue_by_region",
    "join_asof_clicks_to_purchases",
    "join_range_ship_within_30d",
    "window_top3_orders_per_customer",
    "dedup_exact_groups",
    "dedup_jaccard_pairs",
    "udtf_sentence_stats",
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
