"""Structured Streaming tests: windowed aggregation equivalence and the
custom stateful drift operator across real micro-batches."""

from __future__ import annotations

import os
import shutil
import tempfile

import pytest
from pyspark.sql import functions as F

from salesforce_prefect_etl_pipeline_spark.plans import load_table
from salesforce_prefect_etl_pipeline_spark.streaming.drift import drift_stream
from salesforce_prefect_etl_pipeline_spark.streaming.windows import (
    EVENTS_SCHEMA,
    run_stream_to_batch,
    stream_events,
    tumbling_agg,
)

from tests.conftest import SF_SMALL


def test_streaming_tumbling_equals_batch(spark):
    streaming = run_stream_to_batch(
        tumbling_agg(stream_events(spark, SF_SMALL)), "t_stream_eq"
    )
    batch = tumbling_agg(load_table(spark, SF_SMALL, "events"))
    s = {tuple(r) for r in streaming.collect()}
    b = {tuple(r) for r in batch.collect()}
    assert s == b


@pytest.fixture()
def two_batch_dir(spark):
    """Split the events table into two parquet files in a temp dir so the
    file source (maxFilesPerTrigger=1) delivers two real micro-batches."""
    # raw read keeps ts as epoch-nanos long, matching EVENTS_SCHEMA
    events = spark.read.parquet(f"{SF_SMALL}/events.parquet")
    d = tempfile.mkdtemp(prefix="drift_batches_")
    # batch 1: full data; batch 2: roughly 40% (triggers >=50% drift)
    events.coalesce(1).write.parquet(os.path.join(d, "b1"))
    events.filter(F.col("user_id") % 5 <= 1).coalesce(1).write.parquet(
        os.path.join(d, "b2")
    )
    src = os.path.join(d, "src")
    os.makedirs(src)
    for i, sub in enumerate(["b1", "b2"]):
        part = [f for f in os.listdir(os.path.join(d, sub)) if f.endswith(".parquet")][0]
        # file source processes files in modification-time order; keep b1 first
        dst = os.path.join(src, f"batch_{i}.parquet")
        shutil.copy(os.path.join(d, sub, part), dst)
        os.utime(dst, (1_700_000_000 + i * 1000, 1_700_000_000 + i * 1000))
    yield src
    shutil.rmtree(d, ignore_errors=True)


def test_stateful_drift_across_microbatches(spark, two_batch_dir):
    raw = (
        spark.readStream.schema(EVENTS_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(two_batch_dir)
    )
    events = raw.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    out = run_stream_to_batch_append(drift_stream(events, threshold=0.5), "drift_out")
    rows = out.collect()
    # two batches x n event_types
    types = {r.event_type for r in rows}
    first = [r for r in rows if r.prev_rows is None]
    second = [r for r in rows if r.prev_rows is not None]
    assert len(first) == len(types)  # batch 1: no previous state
    assert len(second) == len(types)  # batch 2: compared against batch 1
    for r in second:
        assert r.relative_change is not None and r.relative_change >= 0.5
        assert r.alert  # ~60% drop


def run_stream_to_batch_append(result, name):
    """Append-mode variant of run_stream_to_batch (applyInPandasWithState
    emits append output)."""
    spark = result.sparkSession
    import tempfile as tf

    with tf.TemporaryDirectory(prefix=f"ckpt_{name}_") as ckpt:
        q = (
            result.writeStream.format("memory")
            .queryName(name)
            .outputMode("append")
            .option("checkpointLocation", ckpt)
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination()
    return spark.table(name)
