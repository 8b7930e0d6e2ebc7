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
