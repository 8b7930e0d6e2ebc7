"""Plan-shape regression gate over the FULL query registry.

Builds (does not execute) every registered query's physical plan at
sf0.001 and asserts no CartesianProduct anywhere: an unkeyed join
slipping into any of the 164 registered plans is the classic silent
scale-killer — fine at 500 rows, quadratic at 100 TB.
BroadcastNestedLoopJoin is allowed: every current use is a scalar
1-row relation broadcast (chi-square totals, avg-threshold
subqueries, funnel denominators), which is the correct plan for a
scalar subquery.
"""

from __future__ import annotations

from tests.conftest import SF_SMALL


def test_no_cartesian_product_in_any_registered_plan(spark):
    import __spark_entry__ as e

    offenders = []
    for name, fn in e.queries().items():
        df = fn(spark, SF_SMALL)
        plan = df._jdf.queryExecution().executedPlan().toString()
        if "CartesianProduct" in plan:
            offenders.append(name)
    assert not offenders, f"cartesian product in: {offenders}"


def test_containment_lsh_never_broadcasts_unbounded_sides(spark):
    """r12: Catalyst's size estimate for an exploded child is the
    UNEXPLODED child's size, so without explicit hints the static plan
    broadcast the shingle inventory (12 GiB at sf10 — query death on
    the 8 GiB broadcast hard limit) and the full profile sides of the
    verification joins. The shuffle strategy exists for corpora too
    big to broadcast; its plan must contain NO BroadcastExchange at
    all, and in BOTH strategies the verification joins must build on
    the cutoff-bounded candidate side, never the corpus-sized profile."""
    from salesforce_prefect_etl_pipeline_spark.operators import dedup
    from salesforce_prefect_etl_pipeline_spark.plans import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    prof = dedup.joint_shingle_profile(docs, k=8).select(
        "doc_id", "shingles", "argmins"
    )

    def plan_of(strat):
        return (
            dedup.containment_lsh_pairs(None, profile=prof, strategy=strat)
            ._jdf.queryExecution()
            .executedPlan()
            .toString()
        )

    for strat in ("shuffle", "broadcast"):
        plan = plan_of(strat)
        assert "BroadcastExchange" not in plan, f"{strat}: {plan[:2000]}"
        assert "ShuffledHashJoin" in plan, f"{strat}: verification join unpinned"
    # broadcast_inv broadcasts exactly ONE bounded relation (the
    # below-floor inventory) — anything more means the planner is
    # broadcasting profile-sized sides again
    plan = plan_of("broadcast_inv")
    assert plan.count("BroadcastExchange") == 1, plan[:2000]
    assert "ShuffledHashJoin" in plan, "verification join unpinned"


def test_binned_percentiles_plan_is_join_free(spark):
    """r16 optimization: the per-flag totals come out of the same
    window pass as the cumulative sums (whole-partition frame), so the
    exact-percentile plan must contain NO join of any kind — the old
    shape's totals branch re-aggregated the bin counts and
    broadcast-joined them back."""
    import __spark_entry__ as e

    df = e.queries()["agg_binned_percentiles"](spark, SF_SMALL)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in plan, plan[:2000]


def test_perceptron_epoch_agg_reuses_cached_partitioning(spark):
    """r16 optimization, rebuilt on the PRODUCTION code path (r17
    advice — the old test hand-reconstructed the epoch plan, so it kept
    passing even if train.py drifted): _cached_training_frames
    materializes both caches doc_id-partitioned, so the per-epoch
    dot-product group-by built by _epoch_dots must consume the cached
    partitioning — no hash Exchange above the InMemoryRelation."""
    from pyspark.sql import functions as F

    from salesforce_prefect_etl_pipeline_spark.operators import train as tr
    from salesforce_prefect_etl_pipeline_spark.plans import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    feats, labels = tr._cached_training_frames(docs, 64)
    try:
        w = spark.range(-1, 64).select(
            F.col("id").alias("d"), F.lit(0).cast("long").alias("w")
        )
        dots = tr._epoch_dots(feats, w)
        plan = dots._jdf.queryExecution().executedPlan().toString()
        above_cache = plan.split("InMemoryRelation")[0]
        assert "Exchange hashpartitioning" not in above_cache, above_cache
    finally:
        feats.unpersist()
        labels.unpersist()


def test_perceptron_epoch_update_never_broadcasts_unbounded_sides(spark):
    """r17 advice: with zero-initialized weights, epoch 1 misclassifies
    EVERY document, so the misclassified frame (and the labels frame it
    derives from) is corpus-sized — broadcasting either dies on the
    8 GiB broadcast cap at scale. The epoch update plan must contain
    exactly ONE BroadcastExchange (the (dims+1)-row weight vector) and
    pin both doc_id joins to ShuffledHashJoin, which consume the cached
    doc_id partitioning with no new Exchange."""
    from salesforce_prefect_etl_pipeline_spark.operators import train as tr
    from salesforce_prefect_etl_pipeline_spark.plans import load_table

    docs = load_table(spark, SF_SMALL, "documents")
    feats, labels = tr._cached_training_frames(docs, 64)
    try:
        w = feats.sparkSession.range(-1, 64).selectExpr(
            "id as d", "cast(0 as long) as w"
        )
        upd = tr._epoch_update(feats, labels, w)
        plan = upd._jdf.queryExecution().executedPlan().toString()
        above_cache = plan.split("InMemoryRelation")[0]
        assert plan.count("BroadcastExchange") == 1, plan[:3000]
        assert plan.count("ShuffledHashJoin") == 2, plan[:3000]
        # the only exchange above the caches is the dims-sized update agg
        assert above_cache.count("Exchange hashpartitioning") <= 1, above_cache
    finally:
        feats.unpersist()
        labels.unpersist()
