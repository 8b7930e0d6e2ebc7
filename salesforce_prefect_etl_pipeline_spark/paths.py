"""Artifact path conventions (reference utils/paths.py:15-52 + the
timestamped raw naming of flows/sf_etl_orchestrator_flow.py:30-47)."""

from __future__ import annotations

import os
import re
import uuid
from datetime import datetime, timezone


def obj_slug(object_name: str) -> str:
    """Filesystem-safe lowercase slug (utils/paths.py:10-12)."""
    return re.sub(r"[^a-z0-9_]+", "_", object_name.lower()).strip("_")


def build_paths(base_dir: str, object_name: str) -> dict[str, str]:
    """Per-object artifact tree (utils/paths.py:15-37): raw / processed /
    output / qc / metadata directories."""
    slug = obj_slug(object_name)
    root = os.path.join(base_dir, slug)
    paths = {
        "root": root,
        "raw_dir": os.path.join(root, "raw"),
        "processed_dir": os.path.join(root, "processed"),
        "output_dir": os.path.join(root, "output"),
        "qc_dir": os.path.join(root, "qc"),
        "qc_state_dir": os.path.join(root, "qc", "state"),
        "metadata_dir": os.path.join(root, "metadata"),
    }
    for p in paths.values():
        os.makedirs(p, exist_ok=True)
    paths["raw_csv"] = os.path.join(paths["raw_dir"], f"{slug}.csv")
    paths["processed_csv"] = os.path.join(paths["processed_dir"], f"{slug}_summary.csv")
    paths["output_json"] = os.path.join(paths["output_dir"], f"{slug}.json")
    paths["snapshot_parquet"] = os.path.join(paths["qc_dir"], f"{slug}_snapshot.parquet")
    return paths


def timestamped_raw_path(raw_dir: str, object_name: str, run_id: str | None = None) -> str:
    """`<object>_<UTCts>_<runid8>.csv` — avoids clobbering concurrent
    runs (flow:30-47)."""
    ts = datetime.now(timezone.utc).strftime("%Y%m%dT%H%M%SZ")
    rid = (run_id or uuid.uuid4().hex)[:8]
    return os.path.join(raw_dir, f"{obj_slug(object_name)}_{ts}_{rid}.csv")
