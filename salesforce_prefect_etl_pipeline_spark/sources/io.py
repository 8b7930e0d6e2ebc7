"""Source/sink edges with the reference's artifact contracts
(SURVEY.md §2.1 S3-S7).

Internal format is parquet; CSV/JSON exist only at the ingest/egress
edges, exactly like the reference's raw-CSV-in / JSON-records-out shape —
but without the reference's materialize-per-stage round-tripping.

Single-file semantics: the reference writes one CSV / one JSON per
artifact. For aggregated (small) outputs we reproduce that exactly
(coalesce(1) / driver-side dump). For large raw egress ``write_jsonl``
is the documented scale contract (one JSON object per line, parallel
writers).
"""

from __future__ import annotations

import glob
import json
import os
import shutil
import tempfile

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

TEMPORAL_TYPES = (T.DateType, T.TimestampType, T.TimestampNTZType)


def read_csv(spark: SparkSession, path: str, schema: T.StructType | None = None) -> DataFrame:
    """CSV scan (S4). Prefer an explicit schema (the engine's stance —
    SURVEY §1.2); fall back to inference for reference fidelity."""
    reader = spark.read.option("header", True)
    if schema is not None:
        return reader.schema(schema).csv(path)
    return reader.option("inferSchema", True).csv(path)


def write_csv_single(df: DataFrame, out_csv: str) -> str:
    """Single CSV file with a header row, even for 0 rows (S3 + S5:
    the reference always emits headers, tasks/extract.py:85-90).

    Spark's csv writer emits a directory of part files; for the
    reference's one-file artifact contract we write to a temp dir and
    move the single part into place. Aggregated outputs are small by
    construction; do NOT use this for big facts — use write_parquet.
    """
    tmp = tempfile.mkdtemp(prefix="csv_out_")
    try:
        df.coalesce(1).write.mode("overwrite").option("header", True).csv(tmp)
        parts = glob.glob(os.path.join(tmp, "part-*.csv"))
        os.makedirs(os.path.dirname(os.path.abspath(out_csv)), exist_ok=True)
        if parts:
            shutil.move(parts[0], out_csv)
        else:
            # 0-row frame with no partitions: synthesize the header line.
            with open(out_csv, "w") as f:
                f.write(",".join(df.columns) + "\n")
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    return out_csv


def empty_csv_with_headers(spark: SparkSession, fields: list[str], out_csv: str) -> str:
    """S5: 0-row all-string CSV from a projected field list
    (tasks/extract.py:16-27,85-90 — including `a AS b` alias handling,
    which callers resolve before passing ``fields``)."""
    schema = T.StructType([T.StructField(f, T.StringType()) for f in fields])
    return write_csv_single(spark.createDataFrame([], schema), out_csv)


def stringify_temporals(df: DataFrame) -> DataFrame:
    """Cast date/timestamp columns to string (tasks/load.py:64-71)."""
    cols = [
        F.col(c).cast("string").alias(c)
        if isinstance(f.dataType, TEMPORAL_TYPES)
        else F.col(c)
        for c, f in zip(df.columns, df.schema.fields)
    ]
    return df.select(*cols)


def write_json_records(df: DataFrame, out_json: str, indent: int = 2) -> str:
    """S6: ONE json file holding an array of flat record objects with
    temporals stringified (tasks/load.py:39-86). Collects to the driver —
    correct for aggregated results (the reference's use), not for facts."""
    records = [r.asDict(recursive=True) for r in stringify_temporals(df).collect()]
    os.makedirs(os.path.dirname(os.path.abspath(out_json)), exist_ok=True)
    with open(out_json, "w") as f:
        json.dump(records, f, indent=indent, default=str)
    return out_json


def write_jsonl(df: DataFrame, out_dir: str) -> str:
    """Scale egress: JSON-lines directory, written in parallel."""
    stringify_temporals(df).write.mode("overwrite").json(out_dir)
    return out_dir


def snapshot_parquet(df: DataFrame, out_path: str, compression: str = "snappy") -> str:
    """S7: parquet snapshot with snappy compression
    (tasks/quality_parallel.py:143-156)."""
    df.write.mode("overwrite").option("compression", compression).parquet(out_path)
    return out_path


def write_partitioned(df: DataFrame, out_path: str, partition_cols: list[str]) -> str:
    """Hive-layout partitioned parquet — the warehouse-scale sink: a
    filter on a partition column prunes whole directories at read time
    (PartitionFilters in the scan, zero data touched for pruned values).
    Partition columns should be low-cardinality (status, date, region) —
    one directory per value per task otherwise."""
    df.write.mode("overwrite").partitionBy(*partition_cols).parquet(out_path)
    return out_path


def merge_snapshot(
    spark: SparkSession,
    snapshot_path: str,
    batch: DataFrame,
    key: str,
    version_col: str,
) -> str:
    """Idempotent incremental merge-load: fold a (possibly replayed)
    extract batch into a keyed parquet snapshot, keeping ONE row per
    ``key`` — the one with the highest ``version_col`` (ties resolved
    toward the incoming batch). This is the load half of the
    at-least-once watermark extractor (``extract_object_incremental``):
    replayed records overwrite themselves, so fetch-retry + merge
    composes to an exactly-once END STATE without distributed
    transactions. CDC DELETES: carry a tombstone flag column in the
    batch (latest version wins like any upsert) and read through
    :func:`read_live_snapshot` — the tombstone row STAYS in the
    snapshot so a replayed earlier upsert can never resurrect the key
    (dropping it at merge time would lose exactly that protection);
    physical removal is a later compaction's job, as in Delta/Iceberg.

    Plan shape: union(current, batch) -> row_number per key by
    (version desc, source desc) -> keep rank 1 -> atomic swap via
    rename. One shuffle on the merge key — at warehouse scale the same
    statement a MERGE INTO pushes into Delta/Iceberg; the swap here is
    the plain-parquet equivalent of their snapshot commit.

    Crash-safety: the new snapshot is fully written to a temp dir
    before the swap, so a failure mid-merge leaves the old snapshot
    intact (re-run = same result, by idempotence). The swap itself is
    two renames (snapshot -> .__merge_old__, tmp -> snapshot), which is
    NOT atomic: a crash between them leaves no snapshot but a live
    ``.__merge_old__``. We recover on entry — if the snapshot is
    missing and ``.__merge_old__`` exists, it IS the last committed
    snapshot and is renamed back before merging — so the prior state is
    never silently discarded as a fresh initial load.
    """
    from pyspark.sql.window import Window

    _recover_torn_swap(snapshot_path)

    incoming = batch.withColumn("__src", F.lit(1))
    if os.path.exists(snapshot_path):
        current = spark.read.parquet(snapshot_path).withColumn("__src", F.lit(0))
        unioned = current.unionByName(incoming, allowMissingColumns=True)
    else:
        unioned = incoming
    w = Window.partitionBy(key).orderBy(
        F.desc(version_col), F.desc("__src")
    )
    merged = (
        unioned.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__src")
    )

    tmp = snapshot_path.rstrip("/") + ".__merge_tmp__"
    merged.write.mode("overwrite").parquet(tmp)
    _swap_snapshot(snapshot_path, tmp)
    return snapshot_path


def _recover_torn_swap(snapshot_path: str) -> None:
    """If a crash landed between the two swap renames (snapshot moved
    aside, replacement not yet in place), the `.__merge_old__` dir IS
    the last committed snapshot — restore it instead of treating the
    situation as a fresh initial load."""
    old = snapshot_path.rstrip("/") + ".__merge_old__"
    if not os.path.exists(snapshot_path) and os.path.exists(old):
        os.rename(old, snapshot_path)


def _swap_snapshot(snapshot_path: str, tmp: str) -> None:
    """Two-rename swap of a fully-written temp dir into place (the
    plain-parquet snapshot commit; torn-swap recovery on next entry)."""
    old = snapshot_path.rstrip("/") + ".__merge_old__"
    shutil.rmtree(old, ignore_errors=True)
    if os.path.exists(snapshot_path):
        os.rename(snapshot_path, old)
    os.rename(tmp, snapshot_path)
    shutil.rmtree(old, ignore_errors=True)


def read_live_snapshot(
    spark: SparkSession, snapshot_path: str, delete_col: str | None = None
) -> DataFrame:
    """Read a merge_snapshot, hiding CDC-tombstoned keys. The tombstone
    rows remain on disk on purpose: they outrank any replayed earlier
    upsert by version, which is what makes delete + at-least-once
    replay converge (a snapshot that physically dropped them would
    resurrect deleted keys on replay). Compaction may physically drop
    tombstones older than the replay horizon."""
    df = spark.read.parquet(snapshot_path)
    if delete_col is not None and delete_col in df.columns:
        df = df.filter(
            ~F.coalesce(F.col(delete_col).cast("boolean"), F.lit(False))
        )
    return df


def compact_parquet(
    spark: SparkSession,
    path: str,
    target_file_bytes: int = 128 * 1024 * 1024,
) -> dict:
    """Small-file compaction: rewrite a parquet directory into
    ~``target_file_bytes`` files and swap atomically (same torn-swap-
    safe commit as ``merge_snapshot``). Streaming sinks, incremental
    merges and per-batch appends all accrete small files; at 100 TB
    the resulting open/footer/seek overhead dominates scan time long
    before data volume does, and a periodic OPTIMIZE-style rewrite is
    the standard fix (what Delta/Iceberg `OPTIMIZE`/`rewrite_data_files`
    runs; here the plain-parquet equivalent).

    The output partition count comes from the directory's CURRENT
    on-disk bytes (control-plane listing, no data read), so compaction
    cost is one read + one write of the data, no shuffle beyond the
    coalesce. Returns {"files_before", "files_after", "bytes"}."""
    from pathlib import Path as _P

    # same commit, same recovery: a crash between the two swap renames
    # leaves the committed data under .__merge_old__ — restore it before
    # listing, or a compaction-only dataset would brick on that crash
    _recover_torn_swap(path)
    files = [f for f in _P(path).rglob("*.parquet") if f.is_file()]
    n_before = len(files)
    total = sum(f.stat().st_size for f in files)
    n_parts = max(1, -(-total // target_file_bytes))  # ceil
    df = spark.read.parquet(path)
    tmp = path.rstrip("/") + ".__merge_tmp__"
    # coalesce (no shuffle) when reducing files — the compaction case;
    # repartition only when SPLITTING oversized files, which needs one
    sized = (
        df.coalesce(int(n_parts))
        if n_parts <= df.rdd.getNumPartitions()
        else df.repartition(int(n_parts))
    )
    sized.write.mode("overwrite").parquet(tmp)
    _swap_snapshot(path, tmp)
    n_after = len([f for f in _P(path).rglob("*.parquet") if f.is_file()])
    return {"files_before": n_before, "files_after": n_after, "bytes": total}


def read_parquet_evolving(
    spark: SparkSession, paths: list[str], required_cols: dict[str, str]
) -> DataFrame:
    """Schema-evolution read: union parquet directories written at
    different schema epochs (``mergeSchema`` unions the physical
    schemas; files missing a column yield nulls) and guarantee the
    engine-facing contract columns exist with the right types — the
    SOURCE-level generalization of the compiler's ensure-column
    semantics (P6, tasks/process.py:11-16): a column added to the feed
    last month must not break reading the files from before it existed.

    ``required_cols``: {name: spark_type_ddl}; missing columns are
    synthesized as typed nulls, present ones cast."""
    df = spark.read.option("mergeSchema", "true").parquet(*paths)
    for c, t in required_cols.items():
        if c in df.columns:
            df = df.withColumn(c, F.col(c).cast(t))
        else:
            df = df.withColumn(c, F.lit(None).cast(t))
    return df
