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
#: Each round the list is regenerated verbatim from tools/staleness.py's
#: suggested window (oldest driver row first); a pytest
#: (tests/test_registry.py) fails if the list drifts from that output,
#: so the rotation discipline is self-auditing.
_PRIORITY = [
    # --- round-12 window (tools/staleness.py suggested list, verbatim):
    # the 14 remaining r8 rows (the TPC-H flagships q1/q2/q9/q20-q22,
    # the 6 streaming rows, sql_recursive_month_spine,
    # window_percentile_ranks), then the 36 oldest r9 rows. After this
    # round no registered query's latest hard row is older than r9
    # (r11 verdict task 1). Never-driver-checked queries added this
    # round sort first in the suggestion, displacing the newest tail.
    "dedup_containment_lsh_panel",  # new (r12)
    "q1_pricing_summary",  # r8
    "q20_dominant_suppliers",  # r8
    "q21_suppliers_kept_waiting",  # r8
    "q22_idle_balance",  # r8
    "q2_min_cost_supplier",  # r8
    "q9_product_profit",  # r8
    "sql_recursive_month_spine",  # r8
    "streaming_click_attribution",  # r8
    "streaming_click_attribution_outer",  # r8
    "streaming_dedup_user_counts",  # r8
    "streaming_enriched_segment_counts",  # r8
    "streaming_events_hourly",  # r8
    "streaming_sessionization",  # r8
    "window_percentile_ranks",  # r8
    "agg_approx_distinct_suppliers",  # r9
    "agg_corr_price_qty",  # r9
    "agg_mad_value_by_type",  # r9
    "agg_mode_priority_by_segment",  # r9
    "ann_cosine_topk",  # r9
    "ann_ivf_probe",  # r9
    "ann_ivf_probe_exact",  # r9
    "ann_srp_topk",  # r9
    "corpus_canonical_by_quality",  # r9
    "corpus_pack_documents",  # r9
    "corpus_pii_scan",  # r9
    "corpus_shard_assignment",  # r9
    "corpus_stratified_sample",  # r9
    "corpus_training_manifest",  # r9
    "dedup_chunk_overlap",  # r9
    "dedup_simhash_pairs",  # r9
    "emb_cluster_mix",  # r9
    "emb_near_dup_banded",  # r9
    "emb_near_dup_pairs",  # r9
    "media_audio_stats",  # r9
    "media_decode_stats",  # r9
    "media_feature_stats",  # r9
    "q10_returned_items",  # r9
    "q13_customer_distribution",  # r9
    "q14_promo_revenue",  # r9
    "q17_small_qty_revenue",  # r9
    "q18_large_orders",  # r9
    "q19_disjunctive",  # r9
    "q4_order_priority",  # r9
    "q7_volume_shipping",  # r9
    "q8_market_share",  # r9
    "qa_profile_orders",  # r9
    "spec_lineitem_global",  # r9
    "spec_orders_by_missing_channel",  # r9
    "spec_orders_by_status",  # r9
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
