"""Run-metadata store (SURVEY.md §2.1 S8/S9, §2.10 X7/X11).

Control-plane, driver-side JSONL — one line per pipeline run, per object
plus a global log — with the reference's lifecycle semantics
(tasks/metadata.py):

- append one JSON line per run (:94-99)
- size-based rotation: rotate at ``max_bytes`` keeping ``backups`` files
  (:76-92, default 50 MB / 5 backups via env knobs :20-21)
- dedup lines by run_id, keep-last (:102-119)
- latest-run pretty JSON + bounded global history array (:122-142)
- normalization of legacy-named logs into the canonical file
  (utils/paths.py:99-144)

At warehouse scale this same record shape appends to a parquet/Delta
run-log table; the JSONL form is kept for reference-contract parity and
because run metadata is tiny by construction.
"""

from __future__ import annotations

import json
import os
import time
import uuid

DEFAULT_MAX_BYTES = 50 * 1024 * 1024
DEFAULT_BACKUPS = 5

#: Legacy filenames merged by normalization (utils/paths.py:99-144).
LEGACY_NAMES = ("runs.josnl", "runs_jsonl", "runs")
CANONICAL = "runs.jsonl"


def make_run_record(
    object_name: str,
    *,
    run_id: str | None = None,
    states: dict | None = None,
    artifacts: dict | None = None,
    row_counts: dict | None = None,
    timings: dict | None = None,
    extra: dict | None = None,
) -> dict:
    return {
        "run_id": run_id or uuid.uuid4().hex,
        "object": object_name,
        "ts": time.time(),
        "states": states or {},
        "artifacts": artifacts or {},
        "row_counts": row_counts or {},
        "timings": timings or {},
        **(extra or {}),
    }


class RunMetadataStore:
    def __init__(
        self,
        root: str,
        max_bytes: int = DEFAULT_MAX_BYTES,
        backups: int = DEFAULT_BACKUPS,
    ) -> None:
        self.root = root
        self.max_bytes = max_bytes
        self.backups = backups
        os.makedirs(root, exist_ok=True)

    def _obj_dir(self, object_name: str) -> str:
        d = os.path.join(self.root, object_name)
        os.makedirs(d, exist_ok=True)
        return d

    def _log_path(self, object_name: str | None) -> str:
        base = self._obj_dir(object_name) if object_name else self.root
        return os.path.join(base, CANONICAL)

    # -- rotation (tasks/metadata.py:76-92) ---------------------------
    def _rotate_if_needed(self, path: str) -> None:
        if not os.path.exists(path) or os.path.getsize(path) < self.max_bytes:
            return
        for i in range(self.backups - 1, 0, -1):
            src, dst = f"{path}.{i}", f"{path}.{i + 1}"
            if os.path.exists(src):
                os.replace(src, dst)
        os.replace(path, f"{path}.1")

    # -- append (:94-99) ----------------------------------------------
    def append(self, record: dict, object_name: str | None = None) -> str:
        path = self._log_path(object_name or record.get("object"))
        self._rotate_if_needed(path)
        with open(path, "a") as f:
            f.write(json.dumps(record, default=str) + "\n")
        # global log mirrors every record (flow:221-246 shape)
        if object_name is None and record.get("object"):
            gpath = os.path.join(self.root, CANONICAL)
            self._rotate_if_needed(gpath)
            with open(gpath, "a") as f:
                f.write(json.dumps(record, default=str) + "\n")
        return path

    # -- read + dedup by run_id keep-last (:102-119) --------------------
    def read_runs(self, object_name: str | None = None) -> list[dict]:
        path = self._log_path(object_name)
        if not os.path.exists(path):
            return []
        dedup: dict[str, dict] = {}
        with open(path) as f:
            for line in f:
                line = line.strip()
                if not line:
                    continue
                try:
                    rec = json.loads(line)
                except json.JSONDecodeError:
                    continue
                dedup[rec.get("run_id", uuid.uuid4().hex)] = rec
        return list(dedup.values())

    def compact(self, object_name: str | None = None) -> int:
        """Rewrite the log with run_id-deduped lines; returns row count."""
        runs = self.read_runs(object_name)
        path = self._log_path(object_name)
        with open(path, "w") as f:
            for rec in runs:
                f.write(json.dumps(rec, default=str) + "\n")
        return len(runs)

    # -- latest + bounded history (:122-142) ----------------------------
    def write_latest(self, record: dict, object_name: str, keep_last: int = 50) -> str:
        d = self._obj_dir(object_name)
        latest = os.path.join(d, "latest_run.json")
        with open(latest, "w") as f:
            json.dump(record, f, indent=2, default=str)
        hist_path = os.path.join(d, "history.json")
        history: list[dict] = []
        if os.path.exists(hist_path):
            try:
                with open(hist_path) as f:
                    history = json.load(f)
            except json.JSONDecodeError:
                history = []
        history.append(record)
        with open(hist_path, "w") as f:
            json.dump(history[-keep_last:], f, indent=2, default=str)
        return latest

    # -- incremental-extract watermarks ---------------------------------
    # Extension beyond the reference (which re-extracts fully each run):
    # one watermark value per object, written atomically (tmp + replace)
    # so a crash mid-write never corrupts the cursor that decides what
    # the NEXT run extracts.
    def get_watermark(self, object_name: str) -> str | None:
        path = os.path.join(self._obj_dir(object_name), "watermark.json")
        if not os.path.exists(path):
            return None
        try:
            with open(path) as f:
                return json.load(f).get("watermark")
        except json.JSONDecodeError:
            return None

    def set_watermark(self, object_name: str, value: str) -> str:
        d = self._obj_dir(object_name)
        path = os.path.join(d, "watermark.json")
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"object": object_name, "watermark": value}, f, indent=2)
        os.replace(tmp, path)
        return path

    # -- legacy normalization (utils/paths.py:99-144) -------------------
    def normalize(self, object_name: str) -> int:
        """Merge legacy-named logs into the canonical file, dedup, remove
        the legacy files. Returns final run count."""
        d = self._obj_dir(object_name)
        canonical = os.path.join(d, CANONICAL)
        with open(canonical, "a") as out:
            for legacy in LEGACY_NAMES:
                lp = os.path.join(d, legacy)
                if os.path.exists(lp):
                    with open(lp) as f:
                        out.write(f.read())
                    os.remove(lp)
        return self.compact(object_name)
