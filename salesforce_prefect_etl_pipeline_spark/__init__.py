"""PySpark-native analytics engine with the query and data-processing
capabilities of the reference config-driven ETL + data-quality pipeline
(SiddharthaAlwala/salesforce-prefect-etl-pipeline), re-expressed Spark-first.

Layout
------
- ``session``    : SparkSession factory tuned for local[N] testing and
                   cluster-scale defaults (AQE, Arrow, shuffle partitions).
- ``specs``      : declarative ``TableSpec`` registry — the "query language"
                   (port of the reference's ObjectSpec,
                   configs/salesforce_objects.py:5-12).
- ``plans``      : spec -> lazy DataFrame plan compiler (port of
                   tasks/process.py:27-112, Catalyst-friendly).
- ``operators``  : aggregation, dedup (exact/minhash/simhash/jaccard/cosine),
                   similarity search, text analysis, data-quality gates.
- ``sources``    : CSV/JSON/Parquet edges with the reference's IO contracts.
- ``functions``  : scalar expression helpers (tolerant casts, durations).
- ``streaming``  : Structured Streaming windows/sessionization/drift.
- ``flows``      : orchestration (Prefect when available, plain Python
                   otherwise) mirroring flows/sf_etl_orchestrator_flow.py.
"""

__version__ = "0.1.0"
