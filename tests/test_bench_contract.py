"""The bench reporting channel's contract with the driver: ONE compact
final stdout line that fits the driver's bounded tail capture. Round
9's line carried the per-query spread dict, outgrew the buffer, and
the round's official perf record was lost (BENCH_r09 parsed: null) —
this pins the line shape so that class of loss cannot recur."""

from __future__ import annotations

import json

import bench


def test_final_line_is_compact_for_a_full_registry_worst_case():
    # worst case: every headline query present with a wide median value
    timings = {name: 9999.999 for name in bench.HEADLINE}
    line = bench.compact_line(timings, "0.1")
    assert len(line.encode()) <= bench.MAX_FINAL_LINE_BYTES
    parsed = json.loads(line)
    assert parsed["metric"] == "headline_suite_wall_seconds"
    assert set(parsed) == {"metric", "value", "unit", "queries", "sf"}
    assert "spread" not in parsed and "runs_per_query" not in parsed
    assert parsed["sf"] == 0.1
    assert parsed["value"] == round(sum(timings.values()), 3)


def test_final_line_headroom_for_registry_growth():
    # 2x the current headline count at the current longest name length
    # must still fit — growth should hit this assert in review, not the
    # driver's buffer
    width = max(len(n) for n in bench.HEADLINE)
    timings = {f"q{i:03d}".ljust(width, "x"): 123.456 for i in range(2 * len(bench.HEADLINE))}
    assert len(bench.compact_line(timings, "1").encode()) <= bench.MAX_FINAL_LINE_BYTES


def test_designed_guards_are_bench_skips_not_crashes():
    """Both designed-refusal guards must be subclasses of the exception
    pair bench.main() catches per-row (r12: the sf10 ladder CRASHED on
    the iters=0 seed guard because it raised a bare ValueError the
    skip handler didn't cover — a guard firing by design must cost one
    row, never the whole suite's record)."""
    import inspect

    from salesforce_prefect_etl_pipeline_spark.operators.multimodal import (
        FamilySizeError,
    )
    from salesforce_prefect_etl_pipeline_spark.operators.similarity import (
        SeedReplayError,
    )

    src = inspect.getsource(bench.main)
    handler = "except (FamilySizeError, SeedReplayError)"
    assert handler in src, "bench lost its designed-guard skip handler"
    # both stay ValueErrors so non-bench callers' existing handling holds
    assert issubclass(FamilySizeError, ValueError)
    assert issubclass(SeedReplayError, ValueError)
