"""Bounded per-application driver-side memo.

Query helpers memoize small control-plane artifacts between calls in one
process — lazily checkpointed DataFrames (LSH pairs, CC labels), trained
seed centroids / PQ codebooks (tiny ndarrays), collected query vectors.
Those artifacts are only valid for the SparkSession that created them
(checkpointed frames die with their application), and an unbounded
module dict in a long-lived process is a slow leak. ``AppMemo`` replaces
the ad-hoc dicts with one discipline:

- every key is a tuple whose FIRST element is the applicationId;
- any access under a new applicationId evicts every entry belonging to
  other applications (their session is gone — the references are dead);
- within an application, insertion order is bounded by ``max_entries``
  (oldest evicted first), so even a pathological caller cycling through
  thousands of distinct sf_dirs cannot grow the memo without bound;
- access is lock-serialized: query helpers run under the concurrent
  flow runner (flows/stages.py uses a thread pool), and the
  evict-then-mutate sequences here are not otherwise atomic.
"""

from __future__ import annotations

import threading
from collections import OrderedDict
from typing import Any, Hashable


class AppMemo:
    """Dict-like memo keyed by ``(application_id, *rest)`` tuples."""

    def __init__(self, max_entries: int = 64):
        if max_entries < 1:
            raise ValueError("max_entries must be >= 1")
        self._max = max_entries
        self._entries: OrderedDict[tuple, Any] = OrderedDict()
        self._lock = threading.Lock()

    def _check_key(self, key: Hashable) -> tuple:
        if not isinstance(key, tuple) or not key:
            raise TypeError("AppMemo keys are (application_id, ...) tuples")
        return key

    def _evict_other_apps(self, app_id) -> None:
        for k in [k for k in self._entries if k[0] != app_id]:
            del self._entries[k]

    def get(self, key: tuple, default=None):
        key = self._check_key(key)
        with self._lock:
            self._evict_other_apps(key[0])
            return self._entries.get(key, default)

    def __getitem__(self, key: tuple):
        key = self._check_key(key)
        with self._lock:
            self._evict_other_apps(key[0])
            return self._entries[key]

    def __setitem__(self, key: tuple, value) -> None:
        key = self._check_key(key)
        with self._lock:
            self._evict_other_apps(key[0])
            self._entries[key] = value
            self._entries.move_to_end(key)
            while len(self._entries) > self._max:
                self._entries.popitem(last=False)

    def pop(self, key: tuple, default=None):
        with self._lock:
            return self._entries.pop(self._check_key(key), default)

    def __contains__(self, key) -> bool:
        # Same lock + dead-app eviction as every other accessor: an
        # unlocked membership test could report an entry a subsequent
        # locked __getitem__ immediately evicts (TOCTOU under the
        # concurrent flow runner).
        if not isinstance(key, tuple) or not key:
            return False
        with self._lock:
            self._evict_other_apps(key[0])
            return key in self._entries

    def __len__(self) -> int:
        with self._lock:
            return len(self._entries)

    def clear(self) -> None:
        with self._lock:
            self._entries.clear()
