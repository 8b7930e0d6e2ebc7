"""Python UDTFs (table functions) — Spark 4's user-defined table
function surface (SURVEY.md §2.11: the reference has no UDF/UDTF
mechanism at all, so this is extension surface; kept off the hot path
per the engine's native-expressions-first rule).

``SentenceSplitter``: one row per sentence with its index — the typical
text-pipeline exploder when logic outgrows split()/explode()
expressions. Lazily analyzed, deterministic.
"""

from __future__ import annotations

import re

from pyspark.sql.functions import udtf


@udtf(returnType="doc_id: bigint, sentence_idx: int, sentence: string, n_tokens: int")
class SentenceSplitter:
    """Split a document into sentences on [.!?] boundaries; emit one row
    per non-empty sentence with a per-document index and token count."""

    def eval(self, doc_id: int, text: str):  # noqa: D401
        if text is None:
            return
        parts = re.split(r"[.!?]+", text)
        idx = 0
        for part in parts:
            s = part.strip()
            if not s:
                continue
            yield doc_id, idx, s, len(s.split())
            idx += 1


def register_udtfs(spark) -> None:
    """Register SQL-callable table functions on a session."""
    spark.udtf.register("split_sentences", SentenceSplitter)
