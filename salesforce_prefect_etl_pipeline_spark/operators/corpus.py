"""Corpus-management operators for LLM training-data pipelines.

The operations that turn a deduplicated document corpus into training
data: deterministic train/val/test splitting, benchmark-contamination
checking, duplicate-group canonicalization by quality, context-length
bucketing, sequence packing, and PII detection/redaction. All but the
packer are pure native-expression plans with exact DuckDB oracle twins;
the packer is an ``applyInPandas`` stage whose invariants are
pytest-verified (packing is inherently order-dependent, not
SQL-expressible).

Scale notes per operator are inline; none of these shuffle more than
once except canonicalization (one shuffle + window).
"""

from __future__ import annotations

from collections.abc import Iterator

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T
from pyspark.sql.window import Window

from salesforce_prefect_etl_pipeline_spark.operators.dedup import (
    char_shingle_hashes,
    connected_components,
    minhash_lsh_pairs_sql,
    minhash_near_dup_pairs,
)
from salesforce_prefect_etl_pipeline_spark.operators.text import (
    NORMALIZED_SQL,
    normalized,
    tokens,
)

# ----------------------------------------------------------------------
# Deterministic splits
def split_bucket(id_col: Column, buckets: int = 100) -> Column:
    """Content-addressed bucket in [0, buckets): first 8 hex digits of
    md5(id) mod buckets. md5 is identical across engines (unlike
    xxhash64 seeds/murmur variants), partitioning-independent, and
    stable run-to-run — the property a reproducible corpus split needs.
    """
    return (
        F.conv(F.substring(F.md5(id_col.cast("string")), 1, 8), 16, 10).cast("long")
        % buckets
    )


def split_bucket_sql(id_expr: str, buckets: int = 100) -> str:
    return (
        f"CAST(concat('0x', substr(md5(CAST({id_expr} AS VARCHAR)), 1, 8)) "
        f"AS UBIGINT) % {buckets}"
    )


def hash_split(
    docs: DataFrame, train_pct: int = 90, val_pct: int = 5
) -> DataFrame:
    """Deterministic train/val/test assignment: bucket < train -> train,
    < train+val -> val, else test. A doc's split never changes as the
    corpus grows (content-addressed), so re-runs and incremental loads
    stay consistent — no global shuffle, pure projection."""
    b = split_bucket(F.col("doc_id"))
    split = (
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return docs.select("doc_id", split.alias("split"))


def split_counts(docs: DataFrame, train_pct: int = 90, val_pct: int = 5) -> DataFrame:
    """Per-split doc/char totals — the sanity report after splitting.

    The split is a pure expression of doc_id, so it is computed inline:
    one scan + one tiny groupBy, no join (a self-join here would become
    a full sort-merge join of the corpus against itself at scale)."""
    b = split_bucket(F.col("doc_id"))
    split = (
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return (
        docs.select(split.alias("split"), F.length("text").alias("__chars"))
        .groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum("__chars").alias("total_chars"),
        )
        .orderBy("split")
    )


def split_counts_sql(train_pct: int = 90, val_pct: int = 5) -> str:
    b = split_bucket_sql("doc_id")
    return f"""
SELECT CASE WHEN {b} < {train_pct} THEN 'train'
            WHEN {b} < {train_pct + val_pct} THEN 'val'
            ELSE 'test' END AS split,
       COUNT(*) AS n_docs,
       CAST(SUM(length(text)) AS BIGINT) AS total_chars
FROM documents GROUP BY 1 ORDER BY split
"""


# ----------------------------------------------------------------------
# Benchmark contamination
def contamination_report(
    docs: DataFrame, bench_every: int = 50, k: int = 8
) -> DataFrame:
    """N-gram contamination check: which corpus docs share character
    k-shingles with a benchmark/eval set (here: every ``bench_every``-th
    doc stands in for the benchmark). Output per contaminated doc:
    (doc_id, n_shingles, n_overlap, overlap_frac).

    Scale shape: the benchmark shingle set is small -> broadcast
    semi-side; the corpus side is one scan + one groupBy(doc_id) that
    reuses the pre-shingle partitioning (see char_shingle_hashes). This
    is the standard decontamination pass before training."""
    bench_ids = F.col("doc_id") % bench_every == 0
    bench_sh = (
        char_shingle_hashes(docs.filter(bench_ids), k).select("h").distinct()
    )
    corpus_sh = char_shingle_hashes(docs.filter(~bench_ids), k)
    marked = corpus_sh.join(
        F.broadcast(bench_sh.withColumn("__hit", F.lit(1))), "h", "left"
    )
    per_doc = marked.groupBy("doc_id").agg(
        F.count(F.lit(1)).alias("n_shingles"),
        F.count("__hit").alias("n_overlap"),
    )
    return (
        per_doc.filter(F.col("n_overlap") > 0)
        .select(
            "doc_id",
            "n_shingles",
            "n_overlap",
            (F.col("n_overlap").cast("double") / F.col("n_shingles")).alias(
                "overlap_frac"
            ),
        )
        .orderBy("doc_id")
    )


def contamination_report_sql(bench_every: int = 50, k: int = 8) -> str:
    shingles = f"""
  SELECT DISTINCT doc_id, substr({NORMALIZED_SQL}, i, {k}) AS s
  FROM documents,
       unnest(generate_series(1, greatest(length({NORMALIZED_SQL}) - {k - 1}, 0))) AS t(i)
  WHERE length({NORMALIZED_SQL}) >= {k}
"""
    return f"""
WITH sh AS ({shingles}),
bench AS (SELECT DISTINCT s FROM sh WHERE doc_id % {bench_every} = 0),
corpus AS (SELECT * FROM sh WHERE doc_id % {bench_every} <> 0),
per_doc AS (
  SELECT c.doc_id,
         COUNT(*) AS n_shingles,
         COUNT(b.s) AS n_overlap
  FROM corpus c LEFT JOIN bench b ON c.s = b.s
  GROUP BY c.doc_id
)
SELECT doc_id, n_shingles, n_overlap,
       CAST(n_overlap AS DOUBLE) / n_shingles AS overlap_frac
FROM per_doc WHERE n_overlap > 0 ORDER BY doc_id
"""


# ----------------------------------------------------------------------
# Duplicate-group canonicalization by quality
def canonical_by_quality(docs: DataFrame) -> DataFrame:
    """For every EXACT-duplicate group (md5 of normalized text), rank
    members by quality (longer original text wins, then min doc_id) and
    mark the canonical survivor. Output: duplicate-group members only,
    (doc_id, fingerprint, n_chars, rnk) — rnk 1 is the keeper.

    This is the "which copy do we keep" step after dedup: one shuffle on
    the fingerprint + a bounded window (groups are tiny)."""
    fp = docs.select(
        "doc_id",
        F.md5(normalized("text")).alias("fingerprint"),
        F.length("text").alias("n_chars"),
    )
    w = Window.partitionBy("fingerprint").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    grp = Window.partitionBy("fingerprint")
    return (
        fp.withColumn("rnk", F.row_number().over(w))
        .withColumn("__n", F.count(F.lit(1)).over(grp))
        .filter(F.col("__n") > 1)
        .select("doc_id", "fingerprint", "n_chars", "rnk")
        .orderBy("fingerprint", "rnk")
    )


CANONICAL_BY_QUALITY_SQL = f"""
WITH fp AS (
  SELECT doc_id, md5({NORMALIZED_SQL}) AS fingerprint, length(text) AS n_chars
  FROM documents
), ranked AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY fingerprint
                            ORDER BY n_chars DESC, doc_id ASC) AS rnk,
         COUNT(*) OVER (PARTITION BY fingerprint) AS n
  FROM fp
)
SELECT doc_id, fingerprint, n_chars, rnk
FROM ranked WHERE n > 1 ORDER BY fingerprint, rnk
"""


# ----------------------------------------------------------------------
# Context-length bucketing + packing
def token_length_histogram(docs: DataFrame, bin_width: int = 64, max_bin: int = 15) -> DataFrame:
    """Histogram of documents by token count (capped bins) — the
    planning input for sequence packing / curriculum bucketing. One
    scan, one tiny groupBy."""
    n_tokens = F.size(tokens("text"))
    bucket = F.least(F.floor(n_tokens / bin_width), F.lit(max_bin)).cast("long")
    return (
        docs.select(bucket.alias("length_bin"), n_tokens.alias("__t"))
        .groupBy("length_bin")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("__t").alias("total_tokens"))
        .orderBy("length_bin")
    )


def token_length_histogram_sql(bin_width: int = 64, max_bin: int = 15) -> str:
    nt = "len(string_split_regex(trim(text), '\\s+'))"
    return f"""
SELECT least({nt} // {bin_width}, {max_bin}) AS length_bin,
       COUNT(*) AS n_docs,
       CAST(SUM({nt}) AS BIGINT) AS total_tokens
FROM documents GROUP BY 1 ORDER BY length_bin
"""


PACK_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.LongType()),
        T.StructField("n_tokens", T.LongType()),
        T.StructField("pack_group", T.LongType()),
        T.StructField("pack_seq", T.LongType()),
    ]
)


def pack_documents(
    docs: DataFrame,
    capacity: int = 2048,
    n_groups: int = 64,
    extra_keys: tuple[str, ...] = (),
) -> DataFrame:
    """Greedy sequence packing: assign docs to fixed-capacity context
    windows. Docs are hashed into ``n_groups`` independent groups
    (deterministic md5 bucket) and packed greedily WITHIN each group by
    (n_tokens desc, doc_id) order — first-fit-decreasing per group. A
    pack is identified by (pack_group, pack_seq).

    ``extra_keys`` names string columns already on ``docs`` that join the
    packing key — e.g. a ``split`` tag, so no context window ever mixes
    train/val/test documents (cross-split leakage through shared packs).
    Packs are then identified by (*extra_keys, pack_group, pack_seq).

    Packing is order-dependent (not SQL-expressible), so the oracle
    harness gets no twin; pytest verifies the invariants instead: every
    doc assigned exactly once, no pack over capacity (except single
    over-length docs, which get a pack of their own), determinism across
    runs. Scale shape: groups are independent -> applyInPandas
    parallelizes perfectly; state per task is one group's doc list."""
    n_tokens = F.size(tokens("text")).cast("long")
    grouped = docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        (split_bucket(F.col("doc_id"), n_groups)).alias("pack_group"),
        *extra_keys,
    )
    schema = T.StructType(
        list(PACK_SCHEMA.fields)
        + [T.StructField(k, T.StringType()) for k in extra_keys]
    )
    out_cols = ["doc_id", "n_tokens", "pack_group", "pack_seq", *extra_keys]

    def _pack(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(
            ["n_tokens", "doc_id"], ascending=[False, True]
        ).reset_index(drop=True)
        packs: list[int] = []  # remaining capacity per open pack
        assign = []
        for t in pdf["n_tokens"]:
            placed = None
            for i, rem in enumerate(packs):
                if rem >= t:
                    placed = i
                    packs[i] = rem - t
                    break
            if placed is None:
                packs.append(max(capacity - t, 0))
                placed = len(packs) - 1
            assign.append(placed)
        out = pdf[["doc_id", "n_tokens", "pack_group", *extra_keys]].copy()
        out["pack_seq"] = pd.Series(assign, dtype="int64")
        return out[out_cols]

    return grouped.groupBy("pack_group", *extra_keys).applyInPandas(_pack, schema)


def pack_documents_sql(
    capacity: int = 2048,
    n_groups: int = 64,
    source: str = "documents",
    extra_keys: tuple[str, ...] = (),
) -> str:
    """Exact SQL twin of ``pack_documents``: first-fit-decreasing replayed
    as a recursive CTE that threads each group's open-pack remaining
    capacities (a list column) doc by doc in (n_tokens DESC, doc_id)
    order. ``extra_keys`` columns (carried from ``source``) join the
    packing key exactly as in the engine. Sequential by construction —
    this is the ORACLE for the distributed ``applyInPandas`` packer at
    verification scale, not a path anyone should run at corpus scale
    (the recursion is one step per document)."""
    b = split_bucket_sql("doc_id", n_groups)
    nt = "len(string_split_regex(trim(text), '\\s+'))"
    xk = "".join(f", {k}" for k in extra_keys)
    part = "pack_group" + xk
    f_xk = "".join(f", f.{k}" for k in extra_keys)
    r_xk = "".join(f", r.{k}" for k in extra_keys)
    join_xk = "".join(f" AND r.{k} = f.{k}" for k in extra_keys)
    return f"""
WITH RECURSIVE
toks AS (
  SELECT doc_id, CAST({nt} AS BIGINT) AS n_tokens,
         CAST({b} AS BIGINT) AS pack_group{xk}
  FROM {source}
),
ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY {part}
                               ORDER BY n_tokens DESC, doc_id ASC) AS idx
  FROM toks
),
fit(pack_group{xk}, idx, packs, doc_id, n_tokens, pack_seq) AS (
  SELECT pack_group{xk}, idx, [greatest({capacity} - n_tokens, 0)], doc_id,
         n_tokens, CAST(0 AS BIGINT)
  FROM ranked WHERE idx = 1
  UNION ALL
  SELECT r.pack_group{r_xk}, r.idx,
         CASE WHEN j IS NULL THEN f.packs || [greatest({capacity} - r.n_tokens, 0)]
              ELSE list_slice(f.packs, 1, j - 1) || [f.packs[j] - r.n_tokens]
                   || list_slice(f.packs, j + 1, len(f.packs)) END,
         r.doc_id, r.n_tokens,
         CAST(coalesce(j, len(f.packs) + 1) - 1 AS BIGINT)
  FROM fit f
  JOIN ranked r ON r.pack_group = f.pack_group{join_xk} AND r.idx = f.idx + 1,
  LATERAL (SELECT NULLIF(list_position(list_transform(f.packs,
             x -> CASE WHEN x >= r.n_tokens THEN 1 ELSE 0 END), 1), 0) AS j) l
)
SELECT doc_id, n_tokens, pack_group, pack_seq{xk}
FROM fit ORDER BY {part}, pack_seq, doc_id
"""


def pack_stats(
    docs: DataFrame, capacity: int = 2048, n_groups: int = 64
) -> DataFrame:
    """Packing-quality report: per pack_group, how many packs FFD opened
    and how full they are. fill_ratio = total_tokens / (n_packs *
    capacity) — the fraction of context-window budget actually used
    (can exceed 1 only if oversize single-doc packs exist). All columns
    are integer totals plus one exact IEEE division, so the recursive
    FFD oracle reproduces them bit-for-bit. Two tiny aggregations over
    the packer output; the packer itself is the only non-relational
    stage."""
    per_pack = (
        pack_documents(docs, capacity, n_groups)
        .groupBy("pack_group", "pack_seq")
        .agg(
            F.count(F.lit(1)).alias("__docs"),
            F.sum("n_tokens").alias("__tok"),
        )
    )
    return (
        per_pack.groupBy("pack_group")
        .agg(
            F.count(F.lit(1)).alias("n_packs"),
            F.sum("__docs").alias("n_docs"),
            F.sum("__tok").alias("total_tokens"),
            F.max("__tok").alias("max_pack_tokens"),
        )
        .select(
            "pack_group",
            "n_packs",
            "n_docs",
            "total_tokens",
            "max_pack_tokens",
            (
                F.col("total_tokens").cast("double")
                / (F.col("n_packs") * F.lit(capacity)).cast("double")
            ).alias("fill_ratio"),
        )
        .orderBy("pack_group")
    )


def pack_stats_sql(capacity: int = 2048, n_groups: int = 64) -> str:
    ffd = pack_documents_sql(capacity, n_groups)
    return f"""
WITH assignment AS ({ffd}),
per_pack AS (
  SELECT pack_group, pack_seq, COUNT(*) AS n_docs,
         CAST(SUM(n_tokens) AS BIGINT) AS pack_tokens
  FROM assignment GROUP BY pack_group, pack_seq
)
SELECT pack_group,
       COUNT(*) AS n_packs,
       CAST(SUM(n_docs) AS BIGINT) AS n_docs,
       CAST(SUM(pack_tokens) AS BIGINT) AS total_tokens,
       CAST(MAX(pack_tokens) AS BIGINT) AS max_pack_tokens,
       CAST(SUM(pack_tokens) AS DOUBLE) / (COUNT(*) * {capacity}) AS fill_ratio
FROM per_pack GROUP BY pack_group ORDER BY pack_group
"""


# ----------------------------------------------------------------------
# PII detection / redaction
#: Simple-dialect-safe patterns (identical semantics in Java regex and
#: RE2/DuckDB): no backrefs, no lookaround.
EMAIL_RE = r"[a-zA-Z0-9._%+-]+@[a-zA-Z0-9.-]+\.[a-zA-Z]{2,}"
PHONE_RE = r"\+[0-9]{1,3}-[0-9]{3}-[0-9]{4}"


def with_synthetic_pii(docs: DataFrame, every: int = 10) -> DataFrame:
    """Testdata contains no PII, so plant deterministic addresses in
    every ``every``-th doc (the SQL twin plants the identical strings) —
    the detection/redaction pipeline then has real positives AND real
    negatives to prove both directions."""
    planted = F.when(
        F.col("doc_id") % every == 0,
        F.concat(
            F.col("text"),
            F.lit(" contact user"),
            F.col("doc_id").cast("string"),
            F.lit("@example.com or +1-555-01"),
            F.lpad((F.col("doc_id") % 100).cast("string"), 2, "0"),
            F.lit("."),
        ),
    ).otherwise(F.col("text"))
    return docs.select("doc_id", planted.alias("text"))


WITH_PII_SQL = """
  SELECT doc_id,
         CASE WHEN doc_id % 10 = 0
              THEN concat(text, ' contact user', CAST(doc_id AS VARCHAR),
                          '@example.com or +1-555-01',
                          lpad(CAST(doc_id % 100 AS VARCHAR), 2, '0'), '.')
              ELSE text END AS text
  FROM documents
"""


def pii_scan(docs: DataFrame) -> DataFrame:
    """Per-doc PII counts + redacted text (emails -> <EMAIL>, phones ->
    <PHONE>). Native regexp expressions — scan-speed over 100 TB; the
    patterns avoid constructs whose semantics differ between Java regex
    and RE2, so the oracle redacts identically."""
    redacted = F.regexp_replace(
        F.regexp_replace("text", EMAIL_RE, "<EMAIL>"), PHONE_RE, "<PHONE>"
    )
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(EMAIL_RE)).alias("n_emails"),
        F.regexp_count("text", F.lit(PHONE_RE)).alias("n_phones"),
        redacted.alias("redacted"),
    ).orderBy("doc_id")


def pii_scan_sql() -> str:
    return f"""
WITH src AS ({WITH_PII_SQL})
SELECT doc_id,
       len(regexp_extract_all(text, '{EMAIL_RE}')) AS n_emails,
       len(regexp_extract_all(text, '{PHONE_RE}')) AS n_phones,
       regexp_replace(regexp_replace(text, '{EMAIL_RE}', '<EMAIL>', 'g'),
                      '{PHONE_RE}', '<PHONE>', 'g') AS redacted
FROM src ORDER BY doc_id
"""


# ----------------------------------------------------------------------
# End-to-end curation manifest
def training_manifest(
    docs: DataFrame,
    min_quality: float = 0.5,
    train_pct: int = 90,
    val_pct: int = 5,
) -> DataFrame:
    """The whole curation flow as ONE declarative plan: exact-dedup with
    quality-aware survivor selection -> quality-threshold filter ->
    deterministic split assignment -> the training manifest
    (doc_id, split, n_tokens, quality_score).

    This is the query a user actually runs end-to-end before training;
    Catalyst fuses the projection/filter stages, so the plan is one scan
    + one fingerprint shuffle/window + one doc_id join. Near-dup
    clustering (iterative) intentionally sits OUTSIDE this manifest so
    the whole thing stays a pure, oracle-checkable SQL plan; feed
    `near_dup_clusters` survivors in as a pre-filter when needed."""
    from salesforce_prefect_etl_pipeline_spark.operators.text import quality_score

    fp = docs.select(
        "doc_id",
        F.md5(normalized("text")).alias("fingerprint"),
        F.length("text").alias("n_chars"),
    )
    w = Window.partitionBy("fingerprint").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    kept = fp.withColumn("rnk", F.row_number().over(w)).filter(F.col("rnk") == 1)
    q = quality_score(docs).select("doc_id", "n_tokens", "quality_score")
    b = split_bucket(F.col("doc_id"))
    split = (
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test")
    )
    return (
        kept.join(q, "doc_id")
        .filter(F.col("quality_score") >= min_quality)
        .select("doc_id", split.alias("split"), "n_tokens", "quality_score")
        .orderBy("doc_id")
    )


def training_manifest_sql(
    min_quality: float = 0.5, train_pct: int = 90, val_pct: int = 5
) -> str:
    from salesforce_prefect_etl_pipeline_spark.operators.text import QUALITY_SCORE_SQL

    b = split_bucket_sql("doc_id")
    return f"""
WITH fp AS (
  SELECT doc_id, md5({NORMALIZED_SQL}) AS fingerprint, length(text) AS n_chars
  FROM documents
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY fingerprint
                               ORDER BY n_chars DESC, doc_id ASC) AS rnk
  FROM fp
), q AS ({QUALITY_SCORE_SQL})
SELECT r.doc_id,
       CASE WHEN {b.replace('doc_id', 'r.doc_id')} < {train_pct} THEN 'train'
            WHEN {b.replace('doc_id', 'r.doc_id')} < {train_pct + val_pct} THEN 'val'
            ELSE 'test' END AS split,
       q.n_tokens, q.quality_score
FROM ranked r JOIN q ON q.doc_id = r.doc_id
WHERE r.rnk = 1 AND q.quality_score >= {min_quality}
ORDER BY r.doc_id
"""


# ----------------------------------------------------------------------
# Deterministic stratified sampling
def stratified_sample(
    docs: DataFrame, strata_col: str = "lang", n_per_stratum: int = 20
) -> DataFrame:
    """Exactly-n-per-stratum sample, deterministic and
    partitioning-independent: rank docs within each stratum by
    md5(doc_id) (a stable pseudo-random order both engines reproduce)
    and keep the first n. One shuffle on the stratum + bounded window —
    the standard eval-set / inspection draw from a giant corpus."""
    w = Window.partitionBy(strata_col).orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    return (
        docs.select("doc_id", strata_col)
        .withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= n_per_stratum)
        .orderBy(strata_col, "rnk")
    )


def stratified_sample_sql(strata_col: str = "lang", n_per_stratum: int = 20) -> str:
    return f"""
SELECT doc_id, {strata_col}, rnk FROM (
  SELECT doc_id, {strata_col},
         ROW_NUMBER() OVER (PARTITION BY {strata_col}
                            ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id ASC) AS rnk
  FROM documents
) WHERE rnk <= {n_per_stratum} ORDER BY {strata_col}, rnk
"""


# ----------------------------------------------------------------------
# Training-mixture planning
#: Default target language mix (pct) for mixture_plan — an
#: English-heavy training recipe; callers pass their own.
DEFAULT_MIX_TARGETS = (("en", 50), ("de", 15), ("fr", 15), ("es", 10), ("zh", 10))


def mixture_plan(
    docs: DataFrame,
    budget_tokens: int,
    targets: tuple[tuple[str, int], ...] = DEFAULT_MIX_TARGETS,
) -> DataFrame:
    """The DECIDE step between the mixture report and the samplers:
    given a token budget and target per-language shares, compute what
    each language can actually contribute and the per-language sampling
    rate to apply. planned = min(available, budget * pct / 100) — a
    language short of its target contributes everything it has (the
    shortfall surfaces as deficit_tokens; real pipelines re-weight or
    up-epoch those languages). rate_ppm = planned * 1e6 / available,
    all integer floor arithmetic — deterministic, hash-exact.

    One corpus scan + a tiny groupBy; the target table is a broadcast
    literal. Feeds stratified/weighted sampling with per-language rates."""
    tgt = docs.sparkSession.createDataFrame(
        list(targets), "lang string, target_pct long"
    )
    avail = docs.select(
        "lang", F.size(tokens("text")).cast("long").alias("__t")
    ).groupBy("lang").agg(F.sum("__t").alias("available_tokens"))
    planned = F.least(
        F.col("available_tokens"),
        F.expr(f"CAST({budget_tokens} AS BIGINT) * target_pct DIV 100"),
    )
    # LEFT join from the TARGETS: a target language with zero corpus
    # availability is the report's most important row (deficit = its
    # whole budget slice), not one to silently drop.
    return (
        tgt.join(F.broadcast(avail), "lang", "left")
        .withColumn(
            "available_tokens", F.coalesce("available_tokens", F.lit(0).cast("long"))
        )
        .select(
            "lang",
            "target_pct",
            "available_tokens",
            planned.alias("planned_tokens"),
            (
                F.expr(f"CAST({budget_tokens} AS BIGINT) * target_pct DIV 100")
                - planned
            ).alias("deficit_tokens"),
        )
        .withColumn(
            "rate_ppm",
            F.when(F.col("available_tokens") == 0, F.lit(0).cast("long")).otherwise(
                F.expr(
                    "CAST(planned_tokens * 1000000 DIV available_tokens AS BIGINT)"
                )
            ),
        )
        .orderBy("lang")
    )


def mixture_plan_sql(
    budget_tokens: int,
    targets: tuple[tuple[str, int], ...] = DEFAULT_MIX_TARGETS,
) -> str:
    nt = r"len(string_split_regex(trim(text), '\s+'))"
    tgt_rows = ", ".join(f"('{lang}', {pct})" for lang, pct in targets)
    return f"""
WITH avail AS (
  SELECT lang, CAST(SUM({nt}) AS BIGINT) AS available_tokens
  FROM documents GROUP BY lang
),
tgt(lang, target_pct) AS (SELECT * FROM (VALUES {tgt_rows})),
p AS (
  SELECT t.lang, CAST(t.target_pct AS BIGINT) AS target_pct,
         COALESCE(a.available_tokens, 0) AS available_tokens,
         least(COALESCE(a.available_tokens, 0),
               CAST({budget_tokens} AS BIGINT) * t.target_pct // 100)
           AS planned_tokens
  FROM tgt t LEFT JOIN avail a USING (lang)
)
SELECT lang, target_pct, available_tokens, planned_tokens,
       CAST({budget_tokens} AS BIGINT) * target_pct // 100
         - planned_tokens AS deficit_tokens,
       CASE WHEN available_tokens = 0 THEN CAST(0 AS BIGINT)
            ELSE CAST(planned_tokens * 1000000 // available_tokens AS BIGINT)
       END AS rate_ppm
FROM p ORDER BY lang
"""


def mixture_sample(
    docs: DataFrame,
    budget_tokens: int,
    targets: tuple[tuple[str, int], ...] = DEFAULT_MIX_TARGETS,
) -> DataFrame:
    """The ACT step: apply the mixture plan's per-language rate_ppm as
    a content-addressed Bernoulli filter — doc kept iff its md5 ppm
    bucket falls below its language's rate. Deterministic, partition-
    independent, and STABLE under corpus growth within a language's
    existing docs (a doc's draw never changes; only the rate moves) —
    the property that lets the same plan re-run incrementally. One scan
    + a broadcast of the tiny plan frame; no shuffle."""
    plan = mixture_plan(docs, budget_tokens, targets).select("lang", "rate_ppm")
    # SALTED draw: split_bucket and this Bernoulli draw must be
    # independent streams — both deriving from md5(doc_id) would make a
    # sub-100ppm rate keep only docs whose split bucket is also small
    # (draw mod 100 IS the split bucket), i.e. an all-train sample.
    draw = split_bucket(F.concat(F.col("doc_id").cast("string"), F.lit(":mix")), 1_000_000)
    return (
        docs.join(F.broadcast(plan), "lang")
        .filter(draw < F.col("rate_ppm"))
        .select(
            "doc_id", "lang", F.size(tokens("text")).cast("long").alias("n_tokens")
        )
        .orderBy("doc_id")
    )


def mixture_sample_sql(
    budget_tokens: int,
    targets: tuple[tuple[str, int], ...] = DEFAULT_MIX_TARGETS,
) -> str:
    nt = r"len(string_split_regex(trim(text), '\s+'))"
    draw = split_bucket_sql("concat(CAST(doc_id AS VARCHAR), ':mix')", 1_000_000)
    return f"""
WITH plan AS ({mixture_plan_sql(budget_tokens, targets)})
SELECT d.doc_id, d.lang, CAST({nt} AS BIGINT) AS n_tokens
FROM documents d JOIN plan USING (lang)
WHERE {draw} < plan.rate_ppm
ORDER BY doc_id
"""


# ----------------------------------------------------------------------
# Deterministic weighted sampling (Efraimidis–Spirakis)
def weighted_sample(docs: DataFrame, k: int = 100) -> DataFrame:
    """Weighted sample WITHOUT replacement, k docs, inclusion odds
    proportional to token count — the Efraimidis–Spirakis exponential-
    sort trick (key = ln(u)/w with u uniform, take the k largest),
    determinized: u = (hash60(doc_id)+1) / 2^60, the same md5-derived
    uniform both engines reproduce bit-for-bit, so the draw is stable
    across runs AND partitionings. The key is quantized to a BIGINT
    (floor(1e9 * ln(u)/w)) so last-ulp ln() differences between libm
    implementations cannot flip the ranking (same discipline as qcos).

    This is how you draw a token-budget-proportional subcorpus (longer
    docs proportionally likelier) for eval sets or pilot runs. Shape:
    pure scan + TakeOrderedAndProject — no shuffle, no RNG state; at
    100 TB each task emits its local top-k and the driver merges."""
    from salesforce_prefect_etl_pipeline_spark.operators.dedup import hash60

    w = F.size(tokens("text")).cast("double")
    # salted uniform: ':ws' keeps this stream independent of the split
    # bucket / mixture draw (all md5-of-doc_id family — see the
    # mixture_sample salting note)
    u = (
        hash60(F.concat(F.col("doc_id").cast("string"), F.lit(":ws"))) + F.lit(1)
    ).cast("double") / F.lit(float(1 << 60))
    qkey = F.floor(F.log(u) / w * F.lit(1e9)).cast("long")
    return (
        docs.select(
            "doc_id",
            F.size(tokens("text")).cast("long").alias("n_tokens"),
            qkey.alias("qkey"),
        )
        .orderBy(F.desc("qkey"), F.asc("doc_id"))
        .limit(k)
    )


def weighted_sample_sql(k: int = 100) -> str:
    from salesforce_prefect_etl_pipeline_spark.operators.dedup import hash60_sql

    nt = r"len(string_split_regex(trim(text), '\s+'))"
    salted_id = "concat(CAST(doc_id AS VARCHAR), ':ws')"
    u = (
        f"(CAST({hash60_sql(salted_id)} + 1 AS DOUBLE)"
        f" / {float(1 << 60)!r})"
    )
    return f"""
SELECT doc_id,
       CAST({nt} AS BIGINT) AS n_tokens,
       CAST(FLOOR(ln({u}) / CAST({nt} AS DOUBLE) * 1e9) AS BIGINT) AS qkey
FROM documents
ORDER BY qkey DESC, doc_id ASC
LIMIT {k}
"""


# ----------------------------------------------------------------------
# Data-mixture report
def domain_mix(docs: DataFrame, train_pct: int = 90, val_pct: int = 5) -> DataFrame:
    """The data-mixture report: per (source, lang, split), doc count,
    token total, and the share of all corpus tokens — what you check
    before setting sampling weights for a training run. One scan + one
    tiny groupBy; the share is an unpartitioned window over the already
    tiny grouped result (a handful of rows, not the corpus)."""
    b = split_bucket(F.col("doc_id"))
    split = (
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test")
    )
    grouped = (
        docs.select(
            "source",
            "lang",
            split.alias("split"),
            F.size(tokens("text")).cast("long").alias("__t"),
        )
        .groupBy("source", "lang", "split")
        .agg(F.count(F.lit(1)).alias("n_docs"), F.sum("__t").alias("total_tokens"))
    )
    # Global window over a BOUNDED frame: one row per (source, lang,
    # split) — dozens of rows regardless of corpus size, so the
    # single-partition WindowExec is safe at any SF.
    w = Window.partitionBy()
    return grouped.select(
        "source",
        "lang",
        "split",
        "n_docs",
        "total_tokens",
        (
            F.col("total_tokens").cast("double")
            / F.sum("total_tokens").over(w).cast("double")
        ).alias("token_share"),
    ).orderBy("source", "lang", "split")


def domain_mix_sql(train_pct: int = 90, val_pct: int = 5) -> str:
    b = split_bucket_sql("doc_id")
    nt = "len(string_split_regex(trim(text), '\\s+'))"
    return f"""
WITH g AS (
  SELECT source, lang,
         CASE WHEN {b} < {train_pct} THEN 'train'
              WHEN {b} < {train_pct + val_pct} THEN 'val'
              ELSE 'test' END AS split,
         COUNT(*) AS n_docs,
         CAST(SUM({nt}) AS BIGINT) AS total_tokens
  FROM documents GROUP BY 1, 2, 3
)
SELECT source, lang, split, n_docs, total_tokens,
       CAST(total_tokens AS DOUBLE)
         / CAST(SUM(total_tokens) OVER () AS DOUBLE) AS token_share
FROM g ORDER BY source, lang, split
"""


# ----------------------------------------------------------------------
# Dedup impact report
def dedup_survivor_stats(
    docs: DataFrame, train_pct: int = 90, val_pct: int = 5
) -> DataFrame:
    """Dedup impact per split: how many docs survive exact dedup
    (quality-aware survivor = longest text, then min doc_id — the same
    rule as training_manifest) and how many chars the removed copies
    held. One fingerprint shuffle + window, then one tiny groupBy."""
    b = split_bucket(F.col("doc_id"))
    split = (
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test")
    )
    fp = docs.select(
        split.alias("split"),
        F.md5(normalized("text")).alias("fingerprint"),
        F.length("text").alias("n_chars"),
        F.col("doc_id"),
    )
    w = Window.partitionBy("fingerprint").orderBy(F.desc("n_chars"), F.asc("doc_id"))
    ranked = fp.withColumn("rnk", F.row_number().over(w))
    survivor = (F.col("rnk") == 1).cast("long")
    return (
        ranked.groupBy("split")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(survivor).alias("n_survivors"),
            F.sum("n_chars").alias("total_chars"),
            F.sum(F.col("n_chars") * survivor).alias("survivor_chars"),
        )
        .select(
            "split",
            "n_docs",
            "n_survivors",
            (F.col("n_docs") - F.col("n_survivors")).alias("n_removed"),
            (F.col("total_chars") - F.col("survivor_chars")).alias("chars_removed"),
        )
        .orderBy("split")
    )


def dedup_survivor_stats_sql(train_pct: int = 90, val_pct: int = 5) -> str:
    b = split_bucket_sql("doc_id")
    return f"""
WITH fp AS (
  SELECT CASE WHEN {b} < {train_pct} THEN 'train'
              WHEN {b} < {train_pct + val_pct} THEN 'val'
              ELSE 'test' END AS split,
         md5({NORMALIZED_SQL}) AS fingerprint,
         length(text) AS n_chars, doc_id
  FROM documents
), ranked AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY fingerprint
                               ORDER BY n_chars DESC, doc_id ASC) AS rnk
  FROM fp
)
SELECT split,
       COUNT(*) AS n_docs,
       CAST(SUM(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) AS BIGINT) AS n_survivors,
       CAST(COUNT(*) - SUM(CASE WHEN rnk = 1 THEN 1 ELSE 0 END) AS BIGINT)
         AS n_removed,
       CAST(SUM(n_chars) - SUM(CASE WHEN rnk = 1 THEN n_chars ELSE 0 END)
            AS BIGINT) AS chars_removed
FROM ranked GROUP BY split ORDER BY split
"""


# ----------------------------------------------------------------------
# Per-filter quality gate report
#: (name, fail-predicate SQL over the stats CTE) — the C4/Gopher-style
#: cheap document filters; thresholds are parameters, not semantics.
_LENGTH_FILTERS: tuple[tuple[str, str], ...] = (
    ("too_few_tokens", "n_tokens < 16"),
    ("too_many_tokens", "n_tokens > 1024"),
    ("mean_word_len_out_of_range", "avg_token_len < 2.0 OR avg_token_len > 12.0"),
    ("symbol_heavy", "punct_ratio > 0.2"),
    ("repetitive", "dup_token_frac > 0.9"),
)


def length_filter_report(docs: DataFrame) -> DataFrame:
    """Per-filter pass/fail counts for the standard cheap document
    filters (token-count bounds, mean word length, symbol ratio,
    repetition) — the report a pipeline prints before dropping docs, so
    threshold tuning is informed. One scan computes every flag, one
    global aggregate, then a 5-row unpivot of the counters; nothing here
    shuffles more than the 1-row aggregate."""
    t = tokens("text")
    n = F.size(t)
    nd = F.size(F.array_distinct(t))
    avg_len = (
        F.length(F.regexp_replace("text", r"\s+", "")).cast("double") / n
    )
    # Empty text: punct ratio defined as 0 (ANSI mode raises on x/0;
    # empty docs must flow through the filter report, not crash it).
    punct = F.when(
        F.length("text") > 0,
        F.length(F.regexp_replace("text", r"[a-zA-Z0-9\s]", "")).cast("double")
        / F.length("text"),
    ).otherwise(F.lit(0.0))
    dup_frac = (n - nd).cast("double") / n
    flags = {
        "too_few_tokens": n < 16,
        "too_many_tokens": n > 1024,
        "mean_word_len_out_of_range": (avg_len < 2.0) | (avg_len > 12.0),
        "symbol_heavy": punct > 0.2,
        "repetitive": dup_frac > 0.9,
    }
    agg = docs.agg(
        F.count(F.lit(1)).alias("__n"),
        *[F.sum(c.cast("long")).alias(f"__f_{name}") for name, c in flags.items()],
    )
    stack_expr = ", ".join(f"'{name}', __f_{name}" for name in flags)
    return (
        agg.selectExpr("__n", f"stack({len(flags)}, {stack_expr}) AS (filter, n_fail)")
        .select(
            "filter",
            "n_fail",
            (F.col("__n") - F.col("n_fail")).alias("n_pass"),
            (F.col("n_fail").cast("double") / F.col("__n")).alias("fail_frac"),
        )
        .orderBy("filter")
    )


def length_filter_report_sql() -> str:
    nt = "len(string_split_regex(trim(text), '\\s+'))"
    stats = f"""
  SELECT {nt} AS n_tokens,
         CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
           / {nt} AS avg_token_len,
         CASE WHEN length(text) > 0
              THEN CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
                        AS DOUBLE) / length(text)
              ELSE 0.0 END AS punct_ratio,
         CAST({nt} - len(list_distinct(string_split_regex(trim(text), '\\s+')))
              AS DOUBLE) / {nt} AS dup_token_frac
  FROM documents
"""
    branches = "\nUNION ALL\n".join(
        f"SELECT '{name}' AS filter, "
        f"CAST(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS BIGINT) AS n_fail, "
        f"CAST(SUM(CASE WHEN {pred} THEN 0 ELSE 1 END) AS BIGINT) AS n_pass, "
        f"CAST(SUM(CASE WHEN {pred} THEN 1 ELSE 0 END) AS DOUBLE) / COUNT(*) "
        f"AS fail_frac FROM s"
        for name, pred in _LENGTH_FILTERS
    )
    return f"WITH s AS ({stats})\nSELECT * FROM ({branches}) ORDER BY filter"


# ----------------------------------------------------------------------
# Deterministic shard assignment (the pre-write global shuffle)
def shard_assignment(docs: DataFrame, n_shards: int = 8) -> DataFrame:
    """Deterministic global shuffle + sharding: every doc gets a
    (shard, shard_idx) that is a pure function of content-addressed ids
    — shard = md5 bucket, shard_idx = position in md5 pseudo-random
    order within the shard. This is the step before writing N training
    shards: the "shuffle" is reproducible run-to-run and independent of
    input partitioning (unlike zipWithIndex/monotonically_increasing_id,
    which both depend on physical partition layout). One shuffle on the
    shard key + a bounded per-shard window."""
    shard = split_bucket(F.col("doc_id"), n_shards)
    w = Window.partitionBy("shard").orderBy(
        F.md5(F.col("doc_id").cast("string")), F.asc("doc_id")
    )
    return (
        docs.select("doc_id", shard.alias("shard"))
        .withColumn("shard_idx", F.row_number().over(w) - 1)
        .orderBy("shard", "shard_idx")
    )


def shard_assignment_sql(n_shards: int = 8) -> str:
    b = split_bucket_sql("doc_id", n_shards)
    return f"""
SELECT doc_id, shard,
       ROW_NUMBER() OVER (PARTITION BY shard
                          ORDER BY md5(CAST(doc_id AS VARCHAR)), doc_id ASC)
         - 1 AS shard_idx
FROM (SELECT doc_id, CAST({b} AS BIGINT) AS shard FROM documents)
ORDER BY shard, shard_idx
"""


def shard_provenance(docs: DataFrame, n_shards: int = 8) -> DataFrame:
    """Per-shard source composition — the provenance manifest a
    reproducible training run records next to its shards: for every
    (shard, source), the document count and character mass. A skewed
    row here means the content-addressed shuffle (see
    ``shard_assignment``) is NOT mixing sources evenly and a
    data-parallel trainer would see source-correlated batches. One
    hash aggregation; counts and char sums are integers, so the report
    value-hashes."""
    shard = split_bucket(F.col("doc_id"), n_shards)
    return (
        docs.select(shard.alias("shard"), "source", "n_chars")
        .groupBy("shard", "source")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("n_chars").cast("long").alias("total_chars"),
        )
        .orderBy("shard", "source")
    )


def shard_provenance_sql(n_shards: int = 8) -> str:
    b = split_bucket_sql("doc_id", n_shards)
    return f"""
SELECT CAST({b} AS BIGINT) AS shard, source,
       CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(n_chars) AS BIGINT) AS total_chars
FROM documents
GROUP BY shard, source ORDER BY shard, source
"""


def write_training_shards(
    docs: DataFrame, path: str, n_shards: int = 8
) -> DataFrame:
    """Write the corpus as ``n_shards`` deterministic parquet shards
    (directory per shard via partitionBy — partition pruning applies on
    read-back; within-shard order is carried by shard_idx, since parquet
    row order is not a contract). Returns the sharded frame."""
    sharded = shard_assignment(docs, n_shards).join(docs, "doc_id")
    sharded.repartition("shard").write.mode("overwrite").partitionBy(
        "shard"
    ).parquet(path)
    return sharded


# ----------------------------------------------------------------------
# URL detection / stripping
#: Dialect-safe (no lookaround; identical under Java regex and RE2).
URL_RE = r"https?://[a-zA-Z0-9./_-]+"


def with_synthetic_urls(docs: DataFrame, every: int = 7) -> DataFrame:
    """Testdata contains no URLs; plant deterministic ones in every
    ``every``-th doc (mirrored exactly in the SQL twin) so detection and
    stripping both have real positives and negatives."""
    planted = F.when(
        F.col("doc_id") % every == 0,
        F.concat(
            F.col("text"),
            F.lit(" see https://example.com/d/"),
            F.col("doc_id").cast("string"),
            F.lit(" and http://mirror.example.org/d-"),
            F.col("doc_id").cast("string"),
            F.lit(" for details."),
        ),
    ).otherwise(F.col("text"))
    return docs.select("doc_id", planted.alias("text"))


WITH_URLS_SQL = """
  SELECT doc_id,
         CASE WHEN doc_id % 7 = 0
              THEN concat(text, ' see https://example.com/d/',
                          CAST(doc_id AS VARCHAR),
                          ' and http://mirror.example.org/d-',
                          CAST(doc_id AS VARCHAR), ' for details.')
              ELSE text END AS text
  FROM documents
"""


def url_scan(docs: DataFrame) -> DataFrame:
    """Per-doc URL count + URL-stripped text — boilerplate/link removal
    before training. Native regexp expressions, scan speed at 100 TB."""
    return docs.select(
        "doc_id",
        F.regexp_count("text", F.lit(URL_RE)).alias("n_urls"),
        F.regexp_replace("text", URL_RE, "").alias("cleaned"),
    ).orderBy("doc_id")


def url_scan_sql() -> str:
    return f"""
WITH src AS ({WITH_URLS_SQL})
SELECT doc_id,
       len(regexp_extract_all(text, '{URL_RE}')) AS n_urls,
       regexp_replace(text, '{URL_RE}', '', 'g') AS cleaned
FROM src ORDER BY doc_id
"""


# ----------------------------------------------------------------------
# End-to-end curation pipeline (composition proof)
def e2e_curation(
    docs: DataFrame,
    min_tokens: int = 16,
    max_tokens: int = 1024,
    k: int = 8,
    threshold: float = 0.8,
    capacity: int = 2048,
    n_groups: int = 64,
    train_pct: int = 90,
    val_pct: int = 5,
    profile: DataFrame | None = None,
) -> DataFrame:
    """The WHOLE curation pipeline as one composed query: token-count
    filter -> exact dedup (quality-aware survivor) -> MinHash-LSH
    near-dup clustering (keep the min-doc_id doc per component) ->
    deterministic split assignment -> FFD sequence packing WITHIN each
    split. Returns the final training manifest (doc_id, n_tokens, split,
    pack_group, pack_seq) — what a training run actually consumes.

    Split is assigned BEFORE packing and joins the packing key
    ((split, pack_group) identifies a pack), so no context window ever
    mixes train/val/test documents — packing across splits would leak
    held-out text into training windows through shared packs.

    Each stage is individually green elsewhere; this query proves the
    COMPOSITION: filters feed the dedup scan, near-dup survivors feed
    the packer, and the lazy stages fuse into one Catalyst plan up to
    the two genuinely iterative steps (pointer-jumping components, the
    applyInPandas packer), which remain the documented scale paths.
    The oracle replays every stage in DuckDB, recursion included.

    ``profile``: an optional precomputed full-corpus (doc_id, shingles,
    sig) frame (e.g. the session's shared
    :func:`~..dedup.joint_shingle_profile`, already paid for by the
    MinHash build). A MinHash signature is a pure per-doc function, so
    restricting the corpus profile to the exact-dedup survivors (inner
    join on doc_id) yields bit-identical pairs to re-profiling the
    survivors from text — the near-dup stage then skips this query's
    own shingle explode + 64-min aggregation, the most expensive stage
    of the chain. Must be built with the same ``k``."""
    nt = F.size(tokens("text"))
    filtered = docs.filter((nt >= min_tokens) & (nt <= max_tokens))
    fp = filtered.select(
        "doc_id",
        "text",
        F.md5(normalized("text")).alias("fingerprint"),
        F.length("text").alias("n_chars"),
    )
    w = Window.partitionBy("fingerprint").orderBy(
        F.desc("n_chars"), F.asc("doc_id")
    )
    exact = (
        fp.withColumn("__rnk", F.row_number().over(w))
        .filter(F.col("__rnk") == 1)
        .select("doc_id", "text")
    )
    prof = (
        None
        if profile is None
        else profile.join(exact.select("doc_id"), "doc_id")
    )
    pairs = minhash_near_dup_pairs(exact, k=k, threshold=threshold, profile=prof)
    comp = connected_components(pairs.select("da", "db"))
    dropped = comp.filter(F.col("doc_id") != F.col("component")).select("doc_id")
    survivors = exact.join(dropped, "doc_id", "left_anti")
    b = split_bucket(F.col("doc_id"))
    split = (
        F.when(b < train_pct, "train")
        .when(b < train_pct + val_pct, "val")
        .otherwise("test")
    )
    tagged = survivors.withColumn("split", split)
    packed = pack_documents(
        tagged, capacity=capacity, n_groups=n_groups, extra_keys=("split",)
    )
    return packed.select(
        "doc_id", "n_tokens", "split", "pack_group", "pack_seq"
    ).orderBy("doc_id")


def e2e_curation_sql(
    min_tokens: int = 16,
    max_tokens: int = 1024,
    k: int = 8,
    threshold: float = 0.8,
    capacity: int = 2048,
    n_groups: int = 64,
    train_pct: int = 90,
    val_pct: int = 5,
) -> str:
    """DuckDB replay of :func:`e2e_curation` — the per-stage oracles
    chained as CTEs (the two iterative stages nest their own
    WITH RECURSIVE bodies): filter -> exact-dedup rank -> the REPLAYED
    MinHash-LSH pipeline over the survivors (hash60 signatures, band
    keys and verification — not the exact-Jaccard equivalence, so LSH
    recall is checked rather than assumed) -> transitive-closure
    components -> split tag -> FFD packing per (split, pack_group).

    Every chained CTE is MATERIALIZED: DuckDB otherwise inlines them,
    re-deriving the windowed dedup inside each shingle unnest — 157 s
    vs 0.8 s measured at sf0.01 for the identical result."""
    nt = r"len(string_split_regex(trim(text), '\s+'))"
    b = split_bucket_sql("doc_id")
    return f"""
WITH
filtered AS MATERIALIZED (
  SELECT doc_id, text FROM documents
  WHERE {nt} BETWEEN {min_tokens} AND {max_tokens}
),
fp AS (
  SELECT doc_id, text, md5({NORMALIZED_SQL}) AS fingerprint,
         length(text) AS n_chars
  FROM filtered
),
exact AS MATERIALIZED (
  SELECT doc_id, text FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY fingerprint
                                 ORDER BY n_chars DESC, doc_id ASC) AS rnk
    FROM fp
  ) WHERE rnk = 1
),
jp AS MATERIALIZED ({minhash_lsh_pairs_sql(k=k, threshold=threshold, source="exact")}),
edges AS MATERIALIZED (SELECT da AS a, db AS b FROM jp UNION SELECT db AS a, da AS b FROM jp),
comp AS MATERIALIZED (
  WITH RECURSIVE reach(a, b) AS (
    SELECT a, b FROM edges
    UNION
    SELECT r.a, e.b FROM reach r JOIN edges e ON r.b = e.a
  )
  SELECT a AS doc_id, least(a, MIN(b)) AS component FROM reach GROUP BY a
),
survivors AS MATERIALIZED (
  SELECT e.doc_id, e.text,
         CASE WHEN {b} < {train_pct} THEN 'train'
              WHEN {b} < {train_pct + val_pct} THEN 'val'
              ELSE 'test' END AS split
  FROM exact e
  WHERE e.doc_id NOT IN (SELECT doc_id FROM comp WHERE component <> doc_id)
),
pk AS MATERIALIZED ({pack_documents_sql(capacity, n_groups, source="survivors",
                                        extra_keys=("split",))})
SELECT doc_id, n_tokens, split, pack_group, pack_seq
FROM pk
ORDER BY doc_id
"""


# ----------------------------------------------------------------------
# DSIR-style importance resampling

#: Hashed-bigram feature dimensionality (DSIR uses 10k hashed n-grams;
#: 4096 keeps the log-ratio table broadcast-trivial while the mechanism
#: is identical).
DSIR_FEATURES = 4096

#: Quantum for the per-feature log-ratio (1e-6 nats) — the same
#: quantize-the-transcendental discipline as qcos / weighted_sample.
DSIR_SCALE = 1_000_000

DSIR_SAMPLE_K = 100


def _dsir_feats(docs: DataFrame, d: int) -> DataFrame:
    """Per-occurrence hashed-bigram features with the weak target
    label: (doc_id, is_target, f). The label is the repetition
    heuristic the perceptron trains on (2 * distinct >= total tokens
    == "clean"), so the target distribution is the corpus' own
    high-quality slice — no external data needed, exactly DSIR's
    'target = trusted corpus' role played by an internal signal."""
    t = tokens("text")
    staged = docs.select(
        "doc_id",
        (2 * F.size(F.array_distinct(t)) >= F.size(t)).alias("is_target"),
        t.alias("__toks"),
    )
    toks = F.col("__toks")
    grams = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.concat_ws(
                " ", F.element_at(toks, i), F.element_at(toks, i + 1)
            ),
        ),
    ).otherwise(F.array().cast("array<string>"))
    f = (
        F.conv(F.substring(F.md5(F.col("gram")), 1, 8), 16, 10).cast("long")
        % d
    )
    return staged.select(
        "doc_id", "is_target", F.explode(grams).alias("gram")
    ).select("doc_id", "is_target", f.alias("f"))


def _dsir_qlr(feats: DataFrame, d: int) -> DataFrame:
    """The d-row quantized log-importance table: for every observed
    feature, floor(1e6 * ln(p_target(f) / p_source(f))) under add-one
    smoothing — integer rows both engines reproduce (the ln of a ratio
    of exactly-representable doubles, quantized at 1e-6 nats, the
    boundary-flip odds qcos documents)."""
    cnt = feats.groupBy("f").agg(
        F.count(F.lit(1)).alias("src_n"),
        F.sum(F.when(F.col("is_target"), 1).otherwise(0))
        .cast("long")
        .alias("tgt_n"),
    )
    tot = cnt.agg(
        F.sum("src_n").cast("long").alias("src_tot"),
        F.sum("tgt_n").cast("long").alias("tgt_tot"),
    )
    return cnt.crossJoin(F.broadcast(tot)).select(
        "f",
        F.expr(
            f"CAST(FLOOR({DSIR_SCALE} * ln("
            f"CAST(tgt_n + 1 AS DOUBLE) * (src_tot + {d})"
            f" / (CAST(src_n + 1 AS DOUBLE) * (tgt_tot + {d}))"
            ")) AS BIGINT)"
        ).alias("qlr"),
    )


def dsir_weights(docs: DataFrame, d: int = DSIR_FEATURES) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, NeurIPS — "Data
    Selection for Language Models via Importance Resampling", public):
    score(doc) = sum over the doc's hashed-bigram occurrences of the
    quantized log-ratio ln(p_target(f)/p_source(f)), i.e. 1e6x the
    log importance weight of the doc under bag-of-hashed-bigram models
    of the target (the weak-label clean slice) vs the source (the
    whole corpus). Returns (doc_id, n_feats, dsir_score) ordered by
    doc_id; docs with <2 tokens have no features and no row.

    Scale shape (100 TB): two corpus tokenize+explode passes — one
    aggregated to the d-row count table (the model "training"; d is
    constant), one joined against the broadcast d-row log-ratio table
    and summed per doc (one doc_id shuffle). The per-feature log is
    computed ONCE in the tiny table, never per token — the integer sum
    over occurrences is exact at any parallelism."""
    qlr = _dsir_qlr(_dsir_feats(docs, d), d)
    return (
        _dsir_feats(docs, d)
        .join(F.broadcast(qlr), "f")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_feats"),
            F.sum("qlr").cast("long").alias("dsir_score"),
        )
        .orderBy("doc_id")
    )


def dsir_sample(
    docs: DataFrame, k: int = DSIR_SAMPLE_K, d: int = DSIR_FEATURES
) -> DataFrame:
    """DSIR's resampling step: draw ``k`` docs without replacement with
    probability proportional to the importance weight, via the Gumbel
    top-k trick (key = log w + Gumbel noise, take the k largest) — the
    paper's sampler, determinized exactly like ``weighted_sample``:
    the uniform is md5-derived (salted ':dsir', independent of every
    other draw in the engine) and the Gumbel is quantized to the same
    1e-6 grid as the score, so the draw is stable across runs, engines
    and partitionings. Plans as scan + TakeOrderedAndProject on top of
    the weights frame."""
    from salesforce_prefect_etl_pipeline_spark.operators.dedup import hash60

    w = dsir_weights(docs, d)
    u = (
        hash60(F.concat(F.col("doc_id").cast("string"), F.lit(":dsir")))
        + F.lit(1)
    ).cast("double") / F.lit(float((1 << 60) + 2))
    gkey = (
        F.col("dsir_score")
        + F.floor(F.lit(float(DSIR_SCALE)) * -F.log(-F.log(u))).cast("long")
    ).alias("gkey")
    return (
        w.select("doc_id", "dsir_score", gkey)
        .orderBy(F.desc("gkey"), F.asc("doc_id"))
        .limit(k)
    )


def _dsir_ctes(d: int) -> str:
    tok = r"string_split_regex(trim(text), '\s+')"
    return f"""t AS (
  SELECT doc_id, {tok} AS toks,
         (2 * len(list_distinct({tok})) >= len({tok})) AS is_target
  FROM documents
),
feats AS (
  SELECT doc_id, is_target,
         CAST(CAST(concat('0x', substr(md5(concat(bg.w1, ' ', bg.w2)), 1, 8))
              AS UBIGINT) % {d} AS BIGINT) AS f
  FROM (
    SELECT doc_id, is_target,
           unnest(list_transform(range(1, len(toks)),
                  i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS bg
    FROM t WHERE len(toks) >= 2
  )
),
cnt AS (
  SELECT f, CAST(COUNT(*) AS BIGINT) AS src_n,
         CAST(SUM(CASE WHEN is_target THEN 1 ELSE 0 END) AS BIGINT) AS tgt_n
  FROM feats GROUP BY f
),
tot AS (
  SELECT CAST(SUM(src_n) AS BIGINT) AS src_tot,
         CAST(SUM(tgt_n) AS BIGINT) AS tgt_tot
  FROM cnt
),
qlr AS (
  SELECT f, CAST(FLOOR({DSIR_SCALE} * ln(
           CAST(tgt_n + 1 AS DOUBLE) * (src_tot + {d})
           / (CAST(src_n + 1 AS DOUBLE) * (tgt_tot + {d}))
         )) AS BIGINT) AS qlr
  FROM cnt CROSS JOIN tot
),
scores AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_feats,
         CAST(SUM(qlr) AS BIGINT) AS dsir_score
  FROM feats JOIN qlr USING (f) GROUP BY doc_id
)"""


def dsir_weights_sql(d: int = DSIR_FEATURES) -> str:
    """DuckDB replay of :func:`dsir_weights` — identical counts,
    identical double expression inside the quantized ln."""
    return f"""
WITH {_dsir_ctes(d)}
SELECT doc_id, n_feats, dsir_score FROM scores ORDER BY doc_id
"""


def dsir_sample_sql(k: int = DSIR_SAMPLE_K, d: int = DSIR_FEATURES) -> str:
    """DuckDB replay of :func:`dsir_sample` — the same md5 uniform and
    quantized Gumbel."""
    from salesforce_prefect_etl_pipeline_spark.operators.dedup import hash60_sql

    salted = "concat(CAST(doc_id AS VARCHAR), ':dsir')"
    u = (
        f"(CAST({hash60_sql(salted)} + 1 AS DOUBLE)"
        f" / {float((1 << 60) + 2)!r})"
    )
    return f"""
WITH {_dsir_ctes(d)}
SELECT doc_id, dsir_score,
       CAST(dsir_score
            + CAST(FLOOR({DSIR_SCALE} * -ln(-ln({u}))) AS BIGINT)
         AS BIGINT) AS gkey
FROM scores
ORDER BY gkey DESC, doc_id ASC
LIMIT {k}
"""
