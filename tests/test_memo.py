"""AppMemo: the one bounded per-application memo discipline behind
every driver-side query cache (see memo.py docstring)."""

import pytest

from salesforce_prefect_etl_pipeline_spark.memo import AppMemo


def test_new_application_evicts_dead_entries():
    m = AppMemo()
    m[("app-1", "sf0.01")] = "pairs-1"
    m[("app-1", "sf0.1")] = "pairs-2"
    assert len(m) == 2
    # any access under a NEW applicationId drops the dead session's
    # entries — get() included, so the leak can't outlive first touch
    assert m.get(("app-2", "sf0.01")) is None
    assert len(m) == 0
    m[("app-2", "sf0.01")] = "pairs-3"
    assert m[("app-2", "sf0.01")] == "pairs-3"
    assert ("app-1", "sf0.01") not in m


def test_within_app_bound_is_fifo():
    m = AppMemo(max_entries=3)
    for i in range(5):
        m[("app", f"dir{i}")] = i
    assert len(m) == 3
    assert m.get(("app", "dir0")) is None and m.get(("app", "dir1")) is None
    assert m[("app", "dir4")] == 4


def test_rejects_non_tuple_keys():
    m = AppMemo()
    with pytest.raises(TypeError):
        m["not-a-tuple"] = 1
    with pytest.raises(TypeError):
        m.get("not-a-tuple")


def test_concurrent_access_is_safe():
    """Query helpers run under the concurrent flow runner's thread
    pool; hammered get/set/evict from many threads must neither raise
    (dict-changed-during-iteration in the eviction loop) nor break the
    bound/eviction invariants."""
    import threading

    m = AppMemo(max_entries=8)
    errors = []

    def worker(app):
        try:
            for i in range(300):
                m[(app, i % 12)] = i
                m.get((app, (i + 1) % 12))
                m.pop((app, (i + 5) % 12))
        except Exception as exc:  # pragma: no cover - failure path
            errors.append(exc)

    threads = [
        threading.Thread(target=worker, args=(f"app-{t % 3}",)) for t in range(6)
    ]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert not errors
    assert len(m) <= 8
    m.get(("final-app", "x"))
    assert len(m) == 0  # everything belonged to other apps


def test_query_layer_caches_are_appmemos():
    """The ad-hoc dicts the r8/r9 advice flagged are gone: every cache
    in queries_llm runs through AppMemo — including the centroid cache,
    now keyed by (app, index_dir, resolved CURRENT version) so a
    versioned rebuild misses the stale entry."""
    from salesforce_prefect_etl_pipeline_spark import queries_llm as q

    for name in [
        "_QVEC_CACHE",
        "_CENTROID_CACHE",
        "_PANEL_COUNT_CACHE",
        "_MINHASH_PAIRS_CACHE",
        "_JOINT_PROFILE_CACHE",
        "_NEAR_DUP_LABELS_CACHE",
        "_PQ_BOOK_CACHE",
        "_MULTIMODAL_GATE_CACHE",
        "_SEED_CENT_CACHE",
    ]:
        assert isinstance(getattr(q, name), AppMemo), name
    assert not hasattr(q, "_IVF_CENTROID_CACHE")
