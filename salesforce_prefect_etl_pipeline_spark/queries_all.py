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
    # --- round-14 window (tools/staleness.py suggested list, verbatim):
    # the 27 remaining r10 rows (joins/sets/windows/pivots, the media
    # trio, emb_pq_codes, graph/zorder), then the 23 oldest r11 rows
    # (agg_*, ann_*, corpus_*, dedup_*, events_*). After this round no
    # registered query's latest hard row is older than r11 (r13 verdict
    # task 1). Never-driver-checked queries added this round sort first
    # in the suggestion, displacing the newest tail.
    "corpus_dsir_sample",  # new (r14)
    "corpus_dsir_weights",  # new (r14)
    "streaming_bm25_index_ingest",  # new (r14)
    "streaming_phrase_index_ingest",  # new (r14)
    "text_bm25_analyzed_topk",  # new (r14)
    "text_bm25_champion_appended",  # new (r14)
    "text_bpe_train_merges16",  # new (r14)
    "text_hybrid_rrf_indexed",  # new (r14)
    "text_hybrid_rrf_topk",  # new (r14)
    "text_phrase_appended",  # new (r14)
    "emb_pq_codes",  # r10
    "events_zorder_layout",  # r10
    "graph_nation_pagerank",  # r10
    "grouping_sets_lineitem",  # r10
    "join_anti_customers_without_orders",  # r10
    "join_range_ship_within_30d",  # r10
    "join_revenue_by_region",  # r10
    "join_salted_revenue_by_priority",  # r10
    "join_semi_customers_with_orders",  # r10
    "lineitem_unpivot_stats",  # r10
    "media_audio_families",  # r10
    "media_frame_sample",  # r10
    "media_video_families",  # r10
    "orders_by_month",  # r10
    "pivot_status_by_priority",  # r10
    "q11_supply_value_share",  # r10
    "q15_top_supplier",  # r10
    "qa_profile_orders_topk",  # r10
    "set_except_nationkeys",  # r10
    "set_intersect_nationkeys",  # r10
    "set_union_nationkeys",  # r10
    "sql_pivot_counts",  # r10
    "sql_union_all_counts",  # r10
    "window_first_last_order",  # r10
    "window_ntile_order_quartiles",  # r10
    "window_rank_nations_by_acctbal",  # r10
    "window_running_total",  # r10
    "agg_approx_percentile_price",  # r11
    "agg_chi2_type_by_daypart",  # r11
    "ann_ivf_probe_appended",  # r11
    "ann_pq_topk",  # r11
    "corpus_mixture_plan",  # r11
    "corpus_mixture_sample",  # r11
    "corpus_multimodal_gate",  # r11
    "corpus_shard_provenance",  # r11
    "dedup_bloom_snapshot",  # r11
    "dedup_cluster_size_histogram",  # r11
    "dedup_containment_lsh",  # r11
    "dedup_greedy_accept_distributed",  # r11
    "emb_e2e_curation",  # r11
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
