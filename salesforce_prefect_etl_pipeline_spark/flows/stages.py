"""Per-stage task execution with the reference's retry/cache posture.

The reference gives each pipeline stage its own Prefect task config:

- extract: ``retries=3, retry_delay_seconds=10,
  cache_key_fn=task_input_hash, cache_expiration=2h``
  (/root/reference/tasks/extract.py:59-65)
- process / load: ``retries=2, retry_delay_seconds=5``
- QA tasks: ``retries=2, retry_delay_seconds=5``, fanned out under
  ``ConcurrentTaskRunner(max_workers=8)`` with ``wait_for`` gates
  (/root/reference/flows/sf_etl_orchestrator_flow.py:81-84,145-152)

Prefect is an optional dependency, so this module provides the same
semantics stand-alone: :class:`Stage` is the ``@task`` analog (bounded
retries, optional input-hash result cache) and :class:`LocalTaskRunner`
is the ``ConcurrentTaskRunner`` analog (thread-pool ``submit`` with
``wait_for`` gates — Spark actions block in py4j and release the GIL, so
QA branches genuinely overlap; on a cluster each branch's jobs run
concurrently under the scheduler's fair pool). ``build_prefect_flow``
(flows/pipeline.py) maps the same stages onto real Prefect tasks when
Prefect is installed.
"""

from __future__ import annotations

import hashlib
import json
import threading
import time
from collections.abc import Callable
from concurrent.futures import Future, ThreadPoolExecutor
from dataclasses import dataclass


@dataclass(frozen=True)
class RetryPolicy:
    """Prefect semantics: ``retries`` = extra attempts after the first."""

    retries: int
    retry_delay_seconds: float


#: tasks/extract.py:59-65
EXTRACT_POLICY = RetryPolicy(retries=3, retry_delay_seconds=10.0)
#: tasks/process.py / tasks/load.py task decorators
PROCESS_POLICY = RetryPolicy(retries=2, retry_delay_seconds=5.0)
#: tasks/quality_parallel.py task decorators
QA_POLICY = RetryPolicy(retries=2, retry_delay_seconds=5.0)
#: extract.py cache_expiration=timedelta(hours=2)
EXTRACT_CACHE_EXPIRATION_S = 2 * 3600.0
#: flows/sf_etl_orchestrator_flow.py:82 ConcurrentTaskRunner(max_workers=8)
QA_MAX_WORKERS = 8


def task_input_hash(name: str, args: tuple, kwargs: dict) -> str:
    """Deterministic key over the stage name + repr of the inputs (the
    Prefect ``task_input_hash`` analog; inputs are the small driver-side
    values — SOQL strings, paths — never DataFrames)."""
    payload = json.dumps(
        [name, [repr(a) for a in args], {k: repr(v) for k, v in sorted(kwargs.items())}]
    )
    return hashlib.sha256(payload.encode()).hexdigest()


class Stage:
    """A retryable, optionally input-hash-cached unit of work — the
    ``@task`` analog. ``sleep`` is injectable so tests assert the retry
    schedule without waiting it out."""

    def __init__(
        self,
        fn: Callable,
        name: str | None = None,
        policy: RetryPolicy = QA_POLICY,
        cache_expiration_s: float | None = None,
        sleep: Callable[[float], None] = time.sleep,
    ) -> None:
        self.fn = fn
        self.name = name or getattr(fn, "__name__", "stage")
        self.policy = policy
        self.cache_expiration_s = cache_expiration_s
        self._sleep = sleep
        self._cache: dict[str, tuple[float, object]] = {}
        self._lock = threading.Lock()
        self.attempts = 0  # cumulative, for observability/tests

    def __call__(self, *args, **kwargs):
        key = None
        if self.cache_expiration_s is not None:
            key = task_input_hash(self.name, args, kwargs)
            with self._lock:
                hit = self._cache.get(key)
                if hit is not None and time.monotonic() - hit[0] < self.cache_expiration_s:
                    return hit[1]
        last: Exception | None = None
        for attempt in range(self.policy.retries + 1):
            with self._lock:
                self.attempts += 1
            try:
                out = self.fn(*args, **kwargs)
            except Exception as e:  # noqa: BLE001 - retry any task failure
                last = e
                if attempt < self.policy.retries:
                    self._sleep(self.policy.retry_delay_seconds)
                continue
            if key is not None:
                with self._lock:
                    self._cache[key] = (time.monotonic(), out)
            return out
        raise last  # type: ignore[misc]


class LocalTaskRunner:
    """``ConcurrentTaskRunner`` analog: thread-pool ``submit`` with
    ``wait_for`` gates; an upstream failure propagates to dependents when
    their future is resolved (Prefect's wait_for contract)."""

    def __init__(self, max_workers: int = QA_MAX_WORKERS) -> None:
        self._pool = ThreadPoolExecutor(max_workers=max_workers)

    def submit(self, fn: Callable, *args, wait_for: tuple = (), **kwargs) -> Future:
        def run():
            for f in wait_for:
                f.result()
            return fn(*args, **kwargs)

        return self._pool.submit(run)

    def shutdown(self) -> None:
        self._pool.shutdown(wait=True)

    def __enter__(self) -> LocalTaskRunner:
        return self

    def __exit__(self, *exc) -> None:
        self.shutdown()
