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
    # --- round-11 window (tools/staleness.py suggested list, verbatim):
    # the 14 remaining r7 rows (the last of the r7 staleness debt:
    # q3/q6_forecast, qa_key_skew, rollup, streaming_dedup_ingest, the
    # 8-query text family + text_common_ngrams, udtf_sentence_stats),
    # then the 36 alphabetically-first of the 58-row r8 cohort. After
    # this round no registered query's latest hard row is older than r8
    # (r11 verdict task 1).
    "q3_shipping_priority",  # r7
    "q6_forecast_revenue",  # r7
    "qa_key_skew_suppkey",  # r7
    "rollup_lineitem",  # r7
    "streaming_dedup_ingest",  # r7
    "text_bpe_merge_candidates",  # r7
    "text_common_ngrams",  # r7
    "text_fingerprints",  # r7
    "text_lang_id",  # r7
    "text_quality_score",  # r7
    "text_repetition_stats",  # r7
    "text_token_stats",  # r7
    "text_top_tokens",  # r7
    "udtf_sentence_stats",  # r7
    "agg_approx_percentile_price",  # r8
    "agg_chi2_type_by_daypart",  # r8
    "ann_ivf_probe_appended",  # r8
    "ann_pq_topk",  # r8
    "corpus_mixture_plan",  # r8
    "corpus_mixture_sample",  # r8
    "corpus_multimodal_gate",  # r8
    "corpus_shard_provenance",  # r8
    "dedup_bloom_snapshot",  # r8
    "dedup_cluster_size_histogram",  # r8
    "dedup_containment_lsh",  # r8
    "dedup_greedy_accept_distributed",  # r8
    "emb_e2e_curation",  # r8
    "emb_semdedup_prune",  # r8
    "events_funnel",  # r8
    "events_hourly_by_type",  # r8
    "events_json_extract",  # r8
    "events_mad_outliers",  # r8
    "events_props_explode",  # r8
    "events_props_variant",  # r8
    "events_retention_cohorts",  # r8
    "events_seasonal_anomalies",  # r8
    "events_session_sequences",  # r8
    "events_sessionization",  # r8
    "events_sliding_counts",  # r8
    "events_transition_counts",  # r8
    "graph_nation_triangles",  # r8
    "join_asof_clicks_to_purchases",  # r8
    "join_asof_forward",  # r8
    "join_asof_nearest",  # r8
    "media_audio_near_dup",  # r8
    "media_phash_families",  # r8
    "media_phash_near_dup",  # r8
    "media_video_near_dup",  # r8
    "q12_ship_latency",  # r8
    "q16_supplier_part_counts",  # r8
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
