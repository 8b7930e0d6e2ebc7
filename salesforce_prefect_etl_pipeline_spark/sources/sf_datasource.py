"""Spark 4 Python DataSource for the Salesforce extract surface:

    spark.dataSource.register(SalesforceSimDataSource)
    spark.read.format("salesforce_sim")
         .option("object", "Opportunity").option("rows", "1000").load()

The modern connector API for the same contract the mapInPandas paged
extractor (sources/salesforce.py::extract_object_paged) implements by
hand: the driver plans id-range page partitions, each EXECUTOR fetches
its own page (rows never pass through the driver), and the result is a
plain DataFrame any downstream plan consumes — but here partition
planning, schema, and per-partition reads are first-class
(`DataSource` / `DataSourceReader` / `InputPartition`) instead of a
tiny-frame mapInPandas trick: Spark owns task scheduling, retries and
pushdown plumbing.

Like every Salesforce path in this repo the NETWORK client is
swappable; the container has no simple-salesforce, so the backend here
is a deterministic simulator producing the reference's arrival shape
(all-string fields, planted NULLs and garbage numerics that exercise
the tolerant ingest casts — tasks/extract.py:82-97). A real
implementation replaces ``_simulated_page`` with a per-executor SOQL
client; everything else stands.
"""

from __future__ import annotations

import hashlib
from collections.abc import Iterator

from pyspark.sql.datasource import DataSource, DataSourceReader, InputPartition

#: Arrival schema is ALL STRINGS (the SOQL JSON contract); typed columns
#: come from apply_ingest_casts downstream, exactly like extract_object.
ARRIVAL_SCHEMA = "Id string, StageName string, Amount string, CloseDate string"

_STAGES = ("Prospecting", "Qualification", "Proposal", "Negotiation", "Closed Won")


def _simulated_page(obj: str, lo: int, hi: int) -> Iterator[tuple]:
    """Deterministic md5-derived records for id range [lo, hi): the
    network-client stand-in. ~6% NULL amounts and ~3% garbage strings,
    mirroring the adversarial arrival data the property tests use."""
    for i in range(lo, hi):
        h = hashlib.md5(f"{obj}:{i}".encode()).hexdigest()
        b0, b1 = int(h[:4], 16), int(h[4:8], 16)
        stage = _STAGES[b0 % len(_STAGES)]
        if b1 % 100 < 6:
            amount = None
        elif b1 % 100 < 9:
            amount = "not-a-number"
        else:
            amount = f"{(b0 * 100 + b1 % 100) / 100:.2f}"
        close = f"2024-{(b0 % 12) + 1:02d}-{(b1 % 28) + 1:02d}"
        yield (f"{obj[:3].upper()}{i:08d}", stage, amount, close)


class _IdRangePartition(InputPartition):
    def __init__(self, lo: int, hi: int):
        self.lo, self.hi = lo, hi


class _SalesforceSimReader(DataSourceReader):
    def __init__(self, options: dict):
        self.obj = options.get("object", "Opportunity")
        self.rows = int(options.get("rows", "1000"))
        self.page = int(options.get("page_size", "250"))

    def partitions(self) -> list[InputPartition]:
        # one partition per SOQL id-range page — the unit of executor
        # parallelism AND of retry (a failed page refetches alone)
        return [
            _IdRangePartition(lo, min(lo + self.page, self.rows))
            for lo in range(0, self.rows, self.page)
        ]

    def read(self, partition: _IdRangePartition) -> Iterator[tuple]:
        # runs ON AN EXECUTOR; a real client opens its connection here
        # (lazily per worker — connections don't pickle)
        yield from _simulated_page(self.obj, partition.lo, partition.hi)


class SalesforceSimDataSource(DataSource):
    @classmethod
    def name(cls) -> str:
        return "salesforce_sim"

    def schema(self) -> str:
        return ARRIVAL_SCHEMA

    def reader(self, schema) -> DataSourceReader:
        return _SalesforceSimReader(self.options)
