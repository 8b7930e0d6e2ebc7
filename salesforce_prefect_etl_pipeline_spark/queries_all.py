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
#: Round-3 window: slots 1-2 re-check the two oracle-cast fixes (the only
#: red r2 rows), slots 3-10 are reserved for queries NEW this round, and
#: the remaining 40 are every query whose latest driver row predates the
#: round-2 code changes (r1-only rows are stale after the shingle-guard /
#: as-of / profiler rewrites). Together with CORRECTNESS_r02 this gives
#: every registered query a post-round-2-code driver row.
_PRIORITY = [
    # --- the two r2 hash-fail fixes (HUGEINT casts + split inline) ---
    "corpus_split_counts",
    "corpus_token_length_histogram",
    # --- new or oracle-upgraded in round 3 ---
    "corpus_pack_stats",
    "corpus_pack_documents",  # rows-only -> recursive-FFD oracle
    "dedup_near_dup_clusters",  # rows-only -> recursive-closure oracle
    "text_repetition_stats",
    "corpus_domain_mix",
    "corpus_dedup_survivor_stats",
    "corpus_length_filter_report",
    "corpus_url_scan",
    # --- stale (r1-only row, code changed since): TPC-H + joins ---
    "q3_shipping_priority",
    "q6_forecast_revenue",
    "q10_returned_items",
    "join_revenue_by_region",
    "join_semi_customers_with_orders",
    "join_anti_customers_without_orders",
    "join_salted_revenue_by_priority",
    "join_asof_clicks_to_purchases",
    "join_range_ship_within_30d",
    # --- stale: windows ---
    "window_top3_orders_per_customer",
    "window_running_total",
    "window_order_gap_days",
    "window_rank_nations_by_acctbal",
    "window_ntile_order_quartiles",
    "window_first_last_order",
    # --- stale: grouping extensions + set ops + sketches ---
    "rollup_lineitem",
    "cube_orders",
    "grouping_sets_lineitem",
    "pivot_status_by_priority",
    "set_union_nationkeys",
    "set_intersect_nationkeys",
    "set_except_nationkeys",
    "agg_distinct_suppliers_per_flag",
    "agg_approx_distinct_suppliers",
    "agg_median_acctbal_by_nation",
    "agg_stddev_acctbal_by_segment",
    "agg_approx_percentile_price",
    # --- stale: events/json/unpivot ---
    "orders_by_month",
    "events_json_extract",
    "events_props_explode",
    "events_hourly_by_type",
    "lineitem_unpivot_stats",
    # --- stale: text + dedup + UDTF ---
    "text_token_stats",
    "text_quality_score",
    "text_lang_id",
    "text_fingerprints",
    "text_top_tokens",
    "dedup_exact_groups",
    "dedup_jaccard_pairs",
    "udtf_sentence_stats",
    # --- beyond slot 50: new late-round-3 queries, verified by the local
    # sweep this round; they lead the round-4 window rotation ---
    "streaming_click_attribution",
    "text_unigram_familiarity",
    "corpus_shard_assignment",
    "events_funnel",
    "events_retention_cohorts",
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
