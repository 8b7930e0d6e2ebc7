"""Registered queries: in-engine retrieval and model training.

Three capabilities a training-data platform grows after curation works —
search the corpus (BM25), train the tokenizer on it (BPE merges), train
a quality classifier over it (batch perceptron) — each integer-exact and
registered with a full value-hash oracle (the training replays unroll
the fixed iteration count into chained CTEs, same discipline as
``graph_nation_pagerank``).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from salesforce_prefect_etl_pipeline_spark.operators import retrieval, train
from salesforce_prefect_etl_pipeline_spark.plans.compiler import load_table
from salesforce_prefect_etl_pipeline_spark.queries_llm import _spread_scan
from salesforce_prefect_etl_pipeline_spark.queries_registry import register_query


def text_bm25_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BM25 top-5 documents for the fixed benchmark query set —
    integer-exact lexical ranking (operators/retrieval.py)."""
    docs = _spread_scan(load_table(spark, sf_dir, "documents"))
    return retrieval.bm25_topk(docs, spark)


def text_bpe_train_merges(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First 4 learned BPE merges over the corpus word frequencies —
    iterative tokenizer training in the engine (operators/train.py)."""
    docs = _spread_scan(load_table(spark, sf_dir, "documents"))
    return train.bpe_train_merges(docs, n_merges=4)


def text_perceptron_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-epoch batch-perceptron weight trajectory for the hashed
    bag-of-words quality classifier (operators/train.py)."""
    docs = _spread_scan(load_table(spark, sf_dir, "documents"))
    return train.perceptron_train(docs, epochs=3)


register_query("text_bm25_topk", text_bm25_topk, retrieval.bm25_topk_sql())
register_query(
    "text_bpe_train_merges",
    text_bpe_train_merges,
    train.bpe_train_merges_sql(n_merges=4),
)
register_query(
    "text_perceptron_quality",
    text_perceptron_quality,
    train.perceptron_train_sql(epochs=3),
)
