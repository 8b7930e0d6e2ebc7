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
    # --- round-16 window (tools/staleness.py suggested list, verbatim):
    # the 5 new r16 rows (never driver-checked; sort first), then the
    # oldest 45 (r12 TPC-H/ann/corpus/media/streaming stragglers).
    "ann_ivfpq_residual_topk",  # new (r16, late)
    "dedup_minhash_index_stats",  # new (r16, late)
    "ann_ivfpq_topk",  # new (r16)
    "streaming_ivf_retraction",  # new (r16)
    "streaming_text_retraction",  # new (r16)
    "text_bm25_stemmed_topk",  # new (r16)
    "text_index_stats",  # new (r16)
    "agg_mad_value_by_type",  # r12
    "agg_mode_priority_by_segment",  # r12
    "ann_cosine_topk",  # r12
    "ann_ivf_probe",  # r12
    "ann_ivf_probe_exact",  # r12
    "ann_srp_topk",  # r12
    "corpus_canonical_by_quality",  # r12
    "corpus_pack_documents",  # r12
    "corpus_pii_scan",  # r12
    "corpus_shard_assignment",  # r12
    "corpus_stratified_sample",  # r12
    "corpus_training_manifest",  # r12
    "dedup_chunk_overlap",  # r12
    "dedup_containment_lsh_panel",  # r12
    "dedup_simhash_pairs",  # r12
    "emb_cluster_mix",  # r12
    "emb_near_dup_banded",  # r12
    "emb_near_dup_pairs",  # r12
    "media_audio_stats",  # r12
    "media_decode_stats",  # r12
    "media_feature_stats",  # r12
    "q10_returned_items",  # r12
    "q13_customer_distribution",  # r12
    "q14_promo_revenue",  # r12
    "q17_small_qty_revenue",  # r12
    "q18_large_orders",  # r12
    "q19_disjunctive",  # r12
    "q1_pricing_summary",  # r12
    "q20_dominant_suppliers",  # r12
    "q21_suppliers_kept_waiting",  # r12
    "q22_idle_balance",  # r12
    "q2_min_cost_supplier",  # r12
    "q4_order_priority",  # r12
    "q7_volume_shipping",  # r12
    "q8_market_share",  # r12
    "q9_product_profit",  # r12
    "qa_profile_orders",  # r12
    "spec_lineitem_global",  # r12
    "spec_orders_by_missing_channel",  # r12
    "spec_orders_by_status",  # r12
    "sql_recursive_month_spine",  # r12
    "streaming_click_attribution",  # r12
    "streaming_click_attribution_outer",  # r12
    "streaming_dedup_user_counts",  # r12
    "streaming_enriched_segment_counts",  # r12
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
