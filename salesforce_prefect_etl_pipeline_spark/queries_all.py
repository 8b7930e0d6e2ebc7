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
#:
#: Round-9 window, retiring the pre-r7 staleness debt (r8 verdict task
#: 1) with two tiers filling the 50-slot gate exactly:
#: (1) the 20 oldest hard-signal rows: the 18-query round-5-stale
#: cohort that slipped past slot 50 last round (spec_* compiler cores,
#: text unigram/bigram/rolling/bpe-estimate, agg corr/mode,
#: media_audio_stats, corpus_shard_assignment, dedup_chunk_overlap,
#: dedup_simhash_pairs, ann_cosine_topk, emb_near_dup_pairs,
#: sql_q5_local_supplier, sql_orders_above_avg) plus
#: agg_approx_distinct_suppliers (last row r2; its 10-sigma
#: error-contract oracle has never seen a driver run) and
#: ann_ivf_probe (last row r2; gains its within-probed-lists contract
#: oracle THIS round);
#: (2) 30 of the 43-query round-6 cohort. The 13 deferred to r10 each
#: have an in-window sibling exercising the same code path this round
#: (set_{union,intersect,except}_nationkeys, sql_union_all_counts,
#: sql_pivot_counts, window_{running_total,first_last_order,
#: ntile_order_quartiles,rank_nations_by_acctbal},
#: qa_profile_orders_topk, corpus_pack_stats, emb_cluster_sample,
#: media_frame_sample) and stay green in the local 100%-registry sweep
#: (tools/check_oracle.py).
_PRIORITY = [
    # --- tier 1: the 20 oldest driver rows (r5 cohort + the two
    # sketch queries stuck at r2) ---
    "spec_orders_by_status",
    "spec_orders_by_missing_channel",
    "spec_orders_missing_metric",
    "spec_lineitem_global",
    "text_unigram_familiarity",
    "text_bigram_counts",
    "text_rolling_fingerprint",
    "text_bpe_token_estimate",
    "agg_corr_price_qty",
    "agg_mode_priority_by_segment",
    "media_audio_stats",
    "corpus_shard_assignment",
    "dedup_chunk_overlap",
    "dedup_simhash_pairs",
    "ann_cosine_topk",
    "emb_near_dup_pairs",
    "sql_q5_local_supplier",
    "sql_orders_above_avg",
    "agg_approx_distinct_suppliers",  # r2; error-contract oracle, never driver-run
    "ann_ivf_probe",  # r2; within-probed-lists contract oracle new this round
    # --- tier 2: 30 of the round-6-stale cohort ---
    "agg_mad_value_by_type",
    "ann_ivf_probe_exact",
    "ann_srp_topk",
    "corpus_canonical_by_quality",
    "corpus_pack_documents",
    "corpus_pii_scan",
    "corpus_stratified_sample",
    "corpus_training_manifest",
    "emb_cluster_mix",
    "emb_near_dup_banded",
    "media_decode_stats",
    "media_feature_stats",
    "q4_order_priority",
    "q7_volume_shipping",
    "q8_market_share",
    "q10_returned_items",
    "q13_customer_distribution",
    "q14_promo_revenue",
    "q17_small_qty_revenue",
    "q18_large_orders",
    "q19_disjunctive",
    "qa_profile_orders",
    "sql_correlated_exists",
    "sql_embedding_dim_stats",
    "sql_in_subquery_having",
    "text_chunk_fingerprints",
    "text_cms_top_tokens",
    "text_tfidf_top_terms",
    "window_order_gap_days",
    "window_top3_orders_per_customer",
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
