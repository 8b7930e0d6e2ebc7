"""Per-stage orchestration contracts: the reference's retry/cache
posture (tasks/extract.py:59-65, quality tasks 2x/5s) and the
ConcurrentTaskRunner-style QA fan-out with wait_for gates."""

from __future__ import annotations

import threading
import time

import pytest

from salesforce_prefect_etl_pipeline_spark.flows.stages import (
    EXTRACT_CACHE_EXPIRATION_S,
    EXTRACT_POLICY,
    PROCESS_POLICY,
    QA_MAX_WORKERS,
    QA_POLICY,
    LocalTaskRunner,
    Stage,
)


def test_policies_match_reference_posture():
    # tasks/extract.py:59-65
    assert (EXTRACT_POLICY.retries, EXTRACT_POLICY.retry_delay_seconds) == (3, 10.0)
    assert EXTRACT_CACHE_EXPIRATION_S == 2 * 3600
    # process/QA task decorators
    assert (PROCESS_POLICY.retries, PROCESS_POLICY.retry_delay_seconds) == (2, 5.0)
    assert (QA_POLICY.retries, QA_POLICY.retry_delay_seconds) == (2, 5.0)
    # flows/sf_etl_orchestrator_flow.py:82
    assert QA_MAX_WORKERS == 8


def test_stage_retries_with_configured_delay():
    calls, delays = [], []

    def flaky():
        calls.append(1)
        if len(calls) < 3:
            raise RuntimeError("transient")
        return "ok"

    st = Stage(flaky, policy=EXTRACT_POLICY, sleep=delays.append)
    assert st() == "ok"
    assert len(calls) == 3  # 1 initial + 2 retries (within the 3-retry budget)
    assert delays == [10.0, 10.0]


def test_stage_exhausts_retries_and_raises():
    st = Stage(
        lambda: (_ for _ in ()).throw(ValueError("nope")),
        policy=QA_POLICY,
        sleep=lambda s: None,
    )
    with pytest.raises(ValueError):
        st()
    assert st.attempts == 3  # 1 + retries(2)


def test_stage_input_hash_cache():
    calls = []

    def extract(soql):
        calls.append(soql)
        return f"frame::{soql}"

    st = Stage(
        extract,
        policy=EXTRACT_POLICY,
        cache_expiration_s=EXTRACT_CACHE_EXPIRATION_S,
        sleep=lambda s: None,
    )
    assert st("SELECT Id FROM Account") == "frame::SELECT Id FROM Account"
    assert st("SELECT Id FROM Account") == "frame::SELECT Id FROM Account"
    assert len(calls) == 1  # second call served from the input-hash cache
    assert st("SELECT Id FROM Contact") == "frame::SELECT Id FROM Contact"
    assert len(calls) == 2  # different input -> different key


def test_runner_executes_concurrently():
    """Three tasks that rendezvous on a barrier can only finish if the
    runner genuinely overlaps them."""
    barrier = threading.Barrier(3, timeout=10)
    with LocalTaskRunner(max_workers=8) as runner:
        futs = [runner.submit(barrier.wait) for _ in range(3)]
        for f in futs:
            f.result(timeout=15)  # would raise BrokenBarrierError if serialized


def test_runner_wait_for_gates_order_and_failure():
    order = []
    with LocalTaskRunner(max_workers=4) as runner:
        slow = runner.submit(lambda: (time.sleep(0.2), order.append("gate"))[-1])
        gated = runner.submit(lambda: order.append("worker"), wait_for=(slow,))
        gated.result()
        assert order == [None, None] or order == ["gate", "worker"] or order[-1] == "worker"
        assert order.index("worker") > order.index("gate")

        failing = runner.submit(lambda: (_ for _ in ()).throw(RuntimeError("gate down")))
        dependent = runner.submit(lambda: "ran", wait_for=(failing,))
        with pytest.raises(RuntimeError, match="gate down"):
            dependent.result()


def test_pipeline_qa_branch_runs_concurrently(spark, tmp_path, monkeypatch):
    """dedup/profile/snapshot must overlap: each records its active
    window; at least two windows must intersect."""
    from salesforce_prefect_etl_pipeline_spark.flows import pipeline as P
    from salesforce_prefect_etl_pipeline_spark.specs import TableSpec

    windows = {}
    lock = threading.Lock()

    real_profile = P.profile_columns
    real_dedup = P.dedup_keep_first

    def traced(name, fn):
        def wrapper(*a, **kw):
            t0 = time.time()
            time.sleep(0.3)  # widen the window so overlap is measurable
            out = fn(*a, **kw)
            with lock:
                windows[name] = (t0, time.time())
            return out

        return wrapper

    monkeypatch.setattr(P, "profile_columns", traced("profile", real_profile))
    monkeypatch.setattr(P, "dedup_keep_first", traced("dedup", real_dedup))

    spec = TableSpec(
        name="conc",
        table="orders",
        group_by=("o_orderstatus",),
        metrics={"o_totalprice": ("sum",)},
        required_cols=("o_orderkey",),
    )
    df = spark.read.parquet("/root/testdata/sf0.001/orders.parquet")
    res = P.run_pipeline(
        spark, spec, df, str(tmp_path / "out"),
        dedup_key="o_orderkey", retry_sleep=lambda s: None,
    )
    assert res.states["dedup"] == "ok" and res.states["profile"] == "ok"
    (a0, a1), (b0, b1) = windows["profile"], windows["dedup"]
    assert a0 < b1 and b0 < a1, f"QA tasks did not overlap: {windows}"
