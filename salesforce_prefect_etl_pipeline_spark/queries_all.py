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
    # --- round-10 window: the two NEVER-driver-checked queries added
    # this round (a query with no hard row at all is the weakest
    # signal in the registry), then the 48 oldest driver rows as
    # tools/staleness.py orders them — the 13 queries whose latest
    # hard row is r6, then the 35 alphabetically-first of the 49 r7
    # rows.
    "media_audio_families",  # new in r10
    "media_video_families",  # new in r10
    "corpus_pack_stats",  # r6
    "emb_cluster_sample",  # r6
    "media_frame_sample",  # r6
    "qa_profile_orders_topk",  # r6
    "set_except_nationkeys",  # r6
    "set_intersect_nationkeys",  # r6
    "set_union_nationkeys",  # r6
    "sql_pivot_counts",  # r6
    "sql_union_all_counts",  # r6
    "window_first_last_order",  # r6
    "window_ntile_order_quartiles",  # r6
    "window_rank_nations_by_acctbal",  # r6
    "window_running_total",  # r6
    "agg_binned_percentiles",  # r7
    "agg_distinct_suppliers_per_flag",  # r7
    "agg_median_acctbal_by_nation",  # r7
    "agg_stddev_acctbal_by_segment",  # r7
    "ann_cosine_topk_np",  # r7
    "corpus_contamination",  # r7
    "corpus_dedup_survivor_stats",  # r7
    "corpus_domain_mix",  # r7
    "corpus_e2e_curation",  # r7
    "corpus_length_filter_report",  # r7
    "corpus_split_counts",  # r7
    "corpus_token_length_histogram",  # r7
    "corpus_url_scan",  # r7
    "corpus_weighted_sample",  # r7
    "cube_orders",  # r7
    "dedup_containment_pairs",  # r7
    "dedup_exact_groups",  # r7
    "dedup_incremental_probe",  # r7
    "dedup_jaccard_pairs",  # r7
    "dedup_minhash_lsh",  # r7
    "dedup_near_dup_clusters",  # r7
    "emb_pq_codes",  # r7
    "events_zorder_layout",  # r7
    "graph_nation_pagerank",  # r7
    "grouping_sets_lineitem",  # r7
    "join_anti_customers_without_orders",  # r7
    "join_range_ship_within_30d",  # r7
    "join_revenue_by_region",  # r7
    "join_salted_revenue_by_priority",  # r7
    "join_semi_customers_with_orders",  # r7
    "lineitem_unpivot_stats",  # r7
    "orders_by_month",  # r7
    "pivot_status_by_priority",  # r7
    "q11_supply_value_share",  # r7
    "q15_top_supplier",  # r7
    # --- round-11 queue (pre-staged so the rotation discipline survives
    # a context reset): front these 14 remaining r7 rows, then fill the
    # window with the oldest r8 cohort per tools/staleness.py ---
    #   "q3_shipping_priority",
    #   "q6_forecast_revenue",
    #   "qa_key_skew_suppkey",
    #   "rollup_lineitem",
    #   "streaming_dedup_ingest",
    #   "text_bpe_merge_candidates",
    #   "text_common_ngrams",
    #   "text_fingerprints",
    #   "text_lang_id",
    #   "text_quality_score",
    #   "text_repetition_stats",
    #   "text_token_stats",
    #   "text_top_tokens",
    #   "udtf_sentence_stats",
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
