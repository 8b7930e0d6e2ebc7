"""Registry rotation discipline (r10 verdict task 8).

The driver's correctness gate hard-checks only the first 50 registered
queries, so each round ``_PRIORITY`` (queries_all.py) must be
regenerated from ``tools/staleness.py``'s suggested window. This test
fails the suite at the start of a round if the rotation was forgotten —
the drift check compares the fronted window against the oldest-50
computed from CORRECTNESS_r*.json, by set (in-window reordering is
fine; missing or extra names are not).
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools"))

import staleness  # noqa: E402


def test_priority_window_matches_staleness_suggestion():
    problems = staleness.check_drift(50)
    assert not problems, (
        "rotation drift — regenerate _PRIORITY in queries_all.py from "
        "`python tools/staleness.py`:\n  " + "\n  ".join(problems)
    )


def test_drift_check_accepts_consumed_rotation(monkeypatch):
    """Time-consistency (r11 advice): once the newest CORRECTNESS round's
    file covers exactly the fronted window, the rotation has been
    consumed — the check must stay green even though that file re-dates
    every query it covers (which moves the suggested-oldest-50 on)."""
    newest = staleness.newest_round_set()
    assert newest, "driver correctness files missing from repo root"
    monkeypatch.setattr(staleness, "priority_window", lambda window=50: sorted(newest))
    assert staleness.check_drift(50) == []


def test_drift_check_rejects_stale_window(monkeypatch):
    """A fronted window that is neither the suggestion nor the newest
    round's set (e.g. two rounds old) must trip the check."""
    stale = sorted(staleness.latest_rounds())[:50]
    newest = staleness.newest_round_set()
    suggested = set(staleness.suggested_window(50))
    if set(stale) in (newest, suggested):  # pragma: no cover - fixture luck
        stale = sorted(staleness.latest_rounds())[1:51]
    monkeypatch.setattr(staleness, "priority_window", lambda window=50: stale)
    assert staleness.check_drift(50)


def test_every_query_has_unique_registration():
    from salesforce_prefect_etl_pipeline_spark.queries_all import ORACLES, QUERIES

    assert len(QUERIES) >= 164
    # every oracle key has a query; dangling oracles would silently skip
    dangling = set(ORACLES) - set(QUERIES)
    assert not dangling, f"oracles without queries: {sorted(dangling)}"
