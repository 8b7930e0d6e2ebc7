"""Text-analysis operators for LLM training-data pipelines.

All native Column expressions (JVM-side, whole-stage codegen) — no Python
UDFs — so they run at full scan speed over 100 TB of documents and every
operator has an exactly-equivalent SQL form for the DuckDB oracle.

Operators: tokenization + token stats, quality scoring
(length/punct/stopword ratios), heuristic language ID (marker n-grams),
document fingerprinting (normalized md5), corpus top-k tokens.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

#: Tiny stopword list used by the quality score (kept identical in the
#: SQL oracle; extend freely — it's a parameter, not a semantic).
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is")

#: Marker terms per language for the heuristic language ID. Real
#: deployments would use char-trigram profiles; the mechanism (score per
#: language -> argmax with deterministic tie order) is what matters here.
LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "is"),
    "de": ("der", "und", "ist"),
    "fr": ("le", "et", "est"),
    "es": ("el", "y", "es"),
}


def tokens(col: str | Column) -> Column:
    """Whitespace tokenization (empty string -> single empty token, the
    same convention as SQL string_split_regex)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.split(F.trim(c), r"\s+")


def analyzed_tokens(col: str | Column) -> Column:
    """The ``simple`` analyzer chain for lexical search (r13 verdict
    task 5): lowercase, fold runs of ASCII non-alphanumerics to a
    space, then the same whitespace split as :func:`tokens` — so
    "Spark," and "spark" produce the same term. ASCII-only by design
    (the keep-class is ``[a-z0-9]``): non-ASCII letters fold to
    separators identically on both engines, which keeps the chain
    exactly SQL-replayable (``lower`` + ``regexp_replace`` + split in
    DuckDB) without depending on any engine's Unicode case tables.
    Every pre-r14 oracle stays pinned to the raw tokenizer; the
    analyzer is an explicit opt-in threaded through BM25 / phrase /
    index builds."""
    c = F.col(col) if isinstance(col, str) else col
    folded = F.regexp_replace(F.lower(c), r"[^a-z0-9\s]+", " ")
    return F.split(F.trim(folded), r"\s+")


def tokens_py(text: str) -> list[str]:
    """Driver-side twin of :func:`tokens` (r14 advice): trim ASCII
    spaces (Spark ``trim`` strips 0x20 only), then split on runs of the
    Java-regex ``\\s`` class ``[ \\t\\n\\x0B\\f\\r]`` — NOT Python's
    Unicode-aware ``\\s`` and NOT ``str.split()``, both of which
    diverge from the engine on Unicode whitespace, leading whitespace
    (engine yields a leading empty token) and the empty string (engine
    yields ``['']``, ``str.split()`` yields ``[]``). Every probe that
    tokenizes caller-supplied query text driver-side must use this so
    probe == direct holds for arbitrary inputs."""
    import re

    return re.split(r"[ \t\n\x0b\f\r]+", text.strip(" "))


def analyzed_tokens_py(text: str) -> list[str]:
    """Driver-side twin of :func:`analyzed_tokens` — lowercase, fold
    ASCII non-alphanumerics to spaces, split like :func:`tokens_py`.
    The keep-class is ASCII, so the twin agrees with both engines on
    any input whose case-folding is ASCII (the documented analyzer
    contract)."""
    import re

    folded = re.sub(r"[^a-z0-9 \t\n\x0b\f\r]+", " ", text.lower())
    return re.split(r"[ \t\n\x0b\f\r]+", folded.strip(" "))


def unicode_tokens(col: str | Column) -> Column:
    """The ``unicode`` analyzer chain (r14 verdict task 5 — the
    ``simple`` chain stops at ASCII, which multilingual corpora hit
    immediately): lowercase, fold runs of anything OUTSIDE Unicode
    letters/numbers/whitespace (``[^\\p{L}\\p{N}\\s]+``) to a space,
    then the same whitespace split as :func:`tokens`. "Café," and
    "café" produce the same term; CJK text survives (Han characters
    are ``\\p{L}``); em-dashes, curly quotes and NBSP (category Zs,
    outside the keep class) fold to separators.

    Cross-engine contract, pinned in pytest and documented honestly:
    Java regex and DuckDB's RE2 agree on ``\\p{L}\\p{N}`` membership
    (both track Unicode general categories), and lowercase agrees on
    the overwhelming common subset — but NOT everywhere. Known
    divergences: U+0130 İ (Java/Python full-lowercase to ``i`` + a
    combining dot, which then folds to a separator; DuckDB's utf8proc
    uses the simple mapping to plain ``i``); Greek capital sigma WAS
    one too — Java/Python contextual lowercase maps word-final Σ to ς
    (U+03C2) while utf8proc's simple mapping gives σ (U+03C3) — and is
    CLOSED (r15 advice) by normalizing ς→σ after the lowercase in all
    three twins, the standard Greek search normalization. There is no
    FULL case folding anywhere ("Straße" != "STRASSE" in every
    engine — ß is already lowercase, SS folds to ss). Deployments
    needing exact multilingual case folding bring an ICU tokenizer via
    mapInPandas and trade away the SQL value-hash — the same tradeoff
    ``unigram_familiarity`` documents."""
    c = F.col(col) if isinstance(col, str) else col
    lowered = F.translate(F.lower(c), "ς", "σ")
    folded = F.regexp_replace(lowered, r"[^\p{L}\p{N}\s]+", " ")
    return F.split(F.trim(folded), r"\s+")


def unicode_tokens_py(text: str) -> list[str]:
    """Driver-side twin of :func:`unicode_tokens`: Python ``str.lower``
    (the same full Unicode lowercase mapping Java uses), then a
    character-class fold via ``unicodedata.category`` — category L*/N*
    and the Java ``\\s`` set survive, everything else becomes a
    space — then the :func:`tokens_py` split. Agrees with both engines
    on the common subset the chain contract pins (see
    :func:`unicode_tokens` for the documented İ divergence)."""
    import re
    import unicodedata

    ws = " \t\n\x0b\f\r"
    folded = "".join(
        ch
        if ch in ws or unicodedata.category(ch)[0] in ("L", "N")
        else " "
        for ch in text.lower().replace("ς", "σ")
    )
    return re.split(r"[ \t\n\x0b\f\r]+", folded.strip(" "))


#: The "english_light" stemmer's rewrite rules, applied per token IN
#: ORDER after the ``unicode`` fold — a deterministic Porter subset
#: restricted to what Java regex, RE2 (DuckDB) and Python ``re``
#: execute identically (r15 verdict task 6): no backreferences in
#: patterns (RE2 has none), every pattern ``$``-anchored so the
#: replace-first vs replace-all default difference between engines
#: cannot matter. Rules: Porter step 1a plurals (sses→ss, ies→i,
#: trailing s dropped unless the word ends ss/us), then the step-1b-ish
#: -ed/-ing strip gated on a vowel in the remaining stem. Deliberately
#: LIGHT — no measure(m) conditions, no double-consonant cleanup
#: (running→runn, not run), no y→i — those need stateful logic the
#: triple-twin regex discipline can't express; the recall lever is the
#: inflection fold (joins/joined/joining → join), which these give.
STEM_RULES: tuple[tuple[str, str, str], ...] = (
    # (pattern, java_replacement, re2/python_replacement)
    (r"sses$", "ss", "ss"),
    (r"ies$", "i", "i"),
    (r"([^su])s$", "$1", r"\1"),
    (r"([a-z]*[aeiou][a-z]*)(ed|ing)$", "$1", r"\1"),
)


def _stem_column(t: Column) -> Column:
    for pat, java_rep, _ in STEM_RULES:
        t = F.regexp_replace(t, pat, java_rep)
    return t


def english_light_tokens(col: str | Column) -> Column:
    """The ``english_light`` analyzer chain (r15 verdict task 6): the
    ``unicode`` fold (lowercase + ς→σ + ``\\p{L}\\p{N}`` keep-class),
    then the :data:`STEM_RULES` suffix stripper per token — so
    "joins", "joined", "joining" and "join" all index and query as the
    same term, the classic IR recall lever. Same triple-twin
    discipline as the unicode chain (engine / DuckDB / Python produce
    identical arrays, pytest-pinned on planted inflection pairs)."""
    return F.transform(unicode_tokens(col), _stem_column)


def _stem_py(t: str) -> str:
    import re

    for pat, _, py_rep in STEM_RULES:
        t = re.sub(pat, py_rep, t)
    return t


def english_light_tokens_py(text: str) -> list[str]:
    """Driver-side twin of :func:`english_light_tokens`."""
    return [_stem_py(t) for t in unicode_tokens_py(text)]


def token_stats(docs: DataFrame) -> DataFrame:
    """Per-document token statistics: count, distinct count, avg length."""
    t = tokens("text")
    n_tokens = F.size(t)
    n_nonspace = F.length(F.regexp_replace("text", r"\s+", ""))
    return docs.select(
        "doc_id",
        F.length("text").alias("n_chars"),
        n_tokens.alias("n_tokens"),
        F.size(F.array_distinct(t)).alias("n_distinct_tokens"),
        (n_nonspace.cast("double") / n_tokens).alias("avg_token_len"),
    )


TOKEN_STATS_SQL = """
SELECT doc_id,
       length(text) AS n_chars,
       len(string_split_regex(trim(text), '\\s+')) AS n_tokens,
       len(list_distinct(string_split_regex(trim(text), '\\s+'))) AS n_distinct_tokens,
       CAST(length(regexp_replace(text, '\\s+', '', 'g')) AS DOUBLE)
         / len(string_split_regex(trim(text), '\\s+')) AS avg_token_len
FROM documents
"""


#: GPT-2-style pre-tokenizer approximation, restricted to the regex
#: subset Java and RE2/DuckDB execute identically: contraction suffixes,
#: space-glued letter runs, space-glued digit runs, space-glued
#: punctuation runs, then residual whitespace. (The real GPT-2 pattern's
#: ``\s+(?!\S)`` lookahead is not RE2-expressible; pure-whitespace
#: matches are filtered out of the count instead, which yields the same
#: token count on any input.)
BPE_PIECE_RE = r"'(?:s|t|re|ve|m|ll|d)| ?[A-Za-z]+| ?[0-9]+| ?[^A-Za-z0-9\s]+|\s+"


def bpe_token_estimate(docs: DataFrame) -> DataFrame:
    """Subword token-count estimate: how many pieces a BPE-family
    tokenizer's PRE-tokenizer would split each document into — the
    standard cheap stand-in for exact tokenizer counts when budgeting
    context windows / pricing corpora (pre-token count >= merged-BPE
    count, same order of magnitude, no vocab shipped to executors).

    Native path: one ``regexp_extract_all`` + a lambda filter dropping
    pure-whitespace pieces, all inside codegen. chars_per_token is the
    single IEEE division both engines compute identically. Built with
    the Column API, NOT ``F.expr`` — a SQL-string literal would eat the
    pattern's backslashes (``\\s`` -> ``s``), silently corrupting the
    character classes (caught by the hypothesis differential test)."""
    pieces = F.filter(
        F.regexp_extract_all("text", F.lit(BPE_PIECE_RE), F.lit(0)),
        lambda x: x.rlike(r"\S"),
    )
    n_bpe = F.size(pieces)
    return docs.select(
        "doc_id",
        n_bpe.alias("n_bpe_tokens"),
        F.size(tokens("text")).alias("n_ws_tokens"),
        F.when(
            n_bpe > 0, F.length("text").cast("double") / n_bpe.cast("double")
        ).alias("chars_per_bpe_token"),
    )


BPE_TOKEN_ESTIMATE_SQL = rf"""
WITH pieces AS (
  SELECT doc_id, text,
         len(list_filter(regexp_extract_all(text, '{BPE_PIECE_RE.replace("'", "''")}'),
             x -> regexp_matches(x, '\S'))) AS n_bpe_tokens
  FROM documents
)
SELECT doc_id, n_bpe_tokens,
       len(string_split_regex(trim(text), '\s+')) AS n_ws_tokens,
       CASE WHEN n_bpe_tokens > 0
            THEN CAST(length(text) AS DOUBLE) / n_bpe_tokens END
         AS chars_per_bpe_token
FROM pieces
"""


def quality_score(docs: DataFrame) -> DataFrame:
    """Heuristic quality score from length / punctuation / stopword
    ratios (the standard cheap pre-filter in LLM data pipelines).

    score = 0.4*min(n_tokens/100, 1) + 0.3*(1 - punct_ratio)
          + 0.3*min(stopword_ratio*5, 1)  — one fixed IEEE expression.
    """
    t = tokens("text")
    n_tokens = F.size(t)
    # Empty text: define punct_ratio = 0 (ANSI mode raises on x/0, and
    # an empty doc crashing the quality pass is unacceptable at corpus
    # scale — found by the differential hypothesis test).
    punct_ratio = F.when(
        F.length("text") > 0,
        F.length(F.regexp_replace("text", r"[a-zA-Z0-9\s]", "")).cast("double")
        / F.length("text"),
    ).otherwise(F.lit(0.0))
    sw = F.size(F.filter(t, lambda x: x.isin(*STOPWORDS)))
    stop_ratio = sw.cast("double") / n_tokens
    score = (
        F.least(n_tokens.cast("double") / F.lit(100.0), F.lit(1.0)) * 0.4
        + (F.lit(1.0) - punct_ratio) * 0.3
        + F.least(stop_ratio * 5.0, F.lit(1.0)) * 0.3
    )
    return docs.select(
        "doc_id",
        n_tokens.alias("n_tokens"),
        punct_ratio.alias("punct_ratio"),
        stop_ratio.alias("stopword_ratio"),
        score.alias("quality_score"),
    )


_SW_LIST = ", ".join(f"'{w}'" for w in STOPWORDS)
QUALITY_SCORE_SQL = f"""
WITH t AS (
  SELECT doc_id,
         string_split_regex(trim(text), '\\s+') AS toks,
         CASE WHEN length(text) > 0
              THEN CAST(length(regexp_replace(text, '[a-zA-Z0-9\\s]', '', 'g'))
                        AS DOUBLE) / length(text)
              ELSE 0.0 END AS punct_ratio
  FROM documents
)
SELECT doc_id,
       len(toks) AS n_tokens,
       punct_ratio,
       CAST(len(list_filter(toks, x -> x IN ({_SW_LIST}))) AS DOUBLE) / len(toks)
         AS stopword_ratio,
       least(CAST(len(toks) AS DOUBLE) / 100.0, 1.0) * 0.4
         + (1.0 - punct_ratio) * 0.3
         + least(CAST(len(list_filter(toks, x -> x IN ({_SW_LIST}))) AS DOUBLE)
                 / len(toks) * 5.0, 1.0) * 0.3 AS quality_score
FROM t
"""


def lang_id(docs: DataFrame) -> DataFrame:
    """Heuristic language ID: count marker-word hits per language over
    the token set; argmax with deterministic tie order (score desc, then
    language code asc); no hits at all -> 'unknown'."""
    t = tokens("text")

    def _hits(markers: tuple[str, ...]):
        return lambda x: x.isin(*markers)

    scores = [
        (lang, F.size(F.filter(t, _hits(markers))))
        for lang, markers in sorted(LANG_MARKERS.items())
    ]
    best = F.greatest(*[s for _, s in scores])
    guess = F.lit("unknown")
    # Reverse order so earlier languages win ties via later when() layers.
    for lang, s in reversed(scores):
        guess = F.when((s == best) & (best > 0), F.lit(lang)).otherwise(guess)
    return docs.select("doc_id", "lang", guess.alias("lang_guess"))


def _lang_score_sql(markers: tuple[str, ...]) -> str:
    lst = ", ".join(f"'{w}'" for w in markers)
    return f"len(list_filter(toks, x -> x IN ({lst})))"


_LANG_CASE = " ".join(
    f"WHEN {_lang_score_sql(m)} = best AND best > 0 THEN '{lang}'"
    for lang, m in sorted(LANG_MARKERS.items())
)
_LANG_GREATEST = ", ".join(_lang_score_sql(m) for _, m in sorted(LANG_MARKERS.items()))
LANG_ID_SQL = f"""
WITH t AS (
  SELECT doc_id, lang, string_split_regex(trim(text), '\\s+') AS toks
  FROM documents
), s AS (
  SELECT doc_id, lang, toks, greatest({_LANG_GREATEST}) AS best FROM t
)
SELECT doc_id, lang, CASE {_LANG_CASE} ELSE 'unknown' END AS lang_guess
FROM s
"""


def normalized(col: str | Column) -> Column:
    """Dedup normalization: lowercase, collapse whitespace, trim."""
    c = F.col(col) if isinstance(col, str) else col
    return F.trim(F.regexp_replace(F.lower(c), r"\s+", " "))


NORMALIZED_SQL = "trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))"


def fingerprints(docs: DataFrame) -> DataFrame:
    """Content fingerprint: md5 of the normalized text (md5 is identical
    across engines, unlike xxhash seeds)."""
    return docs.select("doc_id", F.md5(normalized("text")).alias("fingerprint"))


FINGERPRINT_SQL = f"SELECT doc_id, md5({NORMALIZED_SQL}) AS fingerprint FROM documents"


#: Rabin-Karp base/modulus. M = 2^31-1 keeps acc*B + code < 2^40, far
#: inside bigint — no overflow in either engine's (ANSI) arithmetic.
ROLL_B = 257
ROLL_M = 2_147_483_647


def rolling_fingerprint(docs: DataFrame) -> DataFrame:
    """Polynomial rolling-hash document fingerprint (Rabin-Karp):
    ``h = fold(chars, 0, (acc, c) -> (acc*B + code(c)) % M)`` — the
    order-sensitive cousin of the md5 fingerprint (``fingerprints``):
    two docs with the same multiset of characters in different order
    get different hashes, and the same fold extends to substring/chunk
    dedup schemes (content-defined chunking) where md5-of-whole cannot.

    The fold runs over the printable-ASCII projection of the text so the
    per-character code is engine-independent (unicode segmentation of
    ``split('')`` differs across engines; codepoints of 0x20-0x7E do
    not). Native higher-order ``aggregate`` — no Python, no shuffle."""
    ascii_only = F.regexp_replace("text", r"[^\x20-\x7E]", "")
    chars = F.split(ascii_only, "")
    fold = F.aggregate(
        chars,
        F.lit(0).cast("long"),
        lambda acc, c: (acc * F.lit(ROLL_B) + F.ascii(c)) % F.lit(ROLL_M),
    )
    n = F.length(ascii_only)
    return docs.select(
        "doc_id",
        n.cast("long").alias("ascii_len"),
        F.when(n > 0, fold).otherwise(F.lit(0).cast("long")).alias("roll_hash"),
    )


ROLLING_FINGERPRINT_SQL = rf"""
WITH a AS (
  SELECT doc_id, regexp_replace(text, '[^\x20-\x7E]', '', 'g') AS t
  FROM documents
)
SELECT doc_id,
       CAST(length(t) AS BIGINT) AS ascii_len,
       CASE WHEN length(t) = 0 THEN CAST(0 AS BIGINT)
            ELSE list_reduce(
                   list_prepend(CAST(0 AS BIGINT),
                                list_transform(string_split(t, ''), c -> ord(c))),
                   (acc, c) -> (acc * {ROLL_B} + c) % {ROLL_M})
       END AS roll_hash
FROM a
"""


#: Content-defined chunking: window width and boundary modulus. A
#: position ends a chunk when the rolling hash of the last CDC_W chars
#: is divisible by CDC_MOD -> average chunk ~CDC_MOD chars.
CDC_W = 8
CDC_MOD = 64

#: Window-polynomial coefficients, shared verbatim by the Spark engine
#: (``win_hash``) and the DuckDB oracle (``CHUNK_FINGERPRINTS_SQL``) so
#: editing ROLL_B/ROLL_M/CDC_W can never desynchronize the two.
CDC_POWS = [pow(ROLL_B, j, ROLL_M) for j in range(CDC_W)]


def chunk_fingerprints(docs: DataFrame) -> DataFrame:
    """Content-defined chunking + per-chunk fingerprints — the primitive
    behind chunk-level dedup: two near-identical documents that differ
    by an insertion still share every chunk outside the edited region,
    because boundaries depend on local CONTENT (a rolling hash over the
    trailing ``CDC_W`` chars), not on absolute offsets. Grouping the
    output by ``chunk_md5`` finds shared chunks across the corpus.

    Gear-less CDC without min/max bounds: every boundary is decided
    independently (hash % CDC_MOD == 0), so the whole computation is
    position-parallel — no Python, no sequential state, and exactly
    replayable in SQL. The window hash is evaluated as a fixed
    ``CDC_W``-term polynomial over a precomputed char-code array
    (``sum(code[p-j] * B^j) % M`` with O(1) element access), NOT a
    per-position string fold — ``substr`` inside a per-position lambda
    is O(len) per access and turns the scan O(n^2 * W). Runs over the
    printable-ASCII projection for cross-engine char-code parity (like
    ``rolling_fingerprint``).

    Output: (doc_id, chunk_idx, chunk_start, chunk_len, chunk_md5),
    1-based chunk_start, one row per non-empty chunk.
    """
    # Each intermediate is MATERIALIZED as a projection column before
    # the next stage references it: Catalyst does not share lambda
    # subexpressions, so an inline ``codes`` would be rebuilt on every
    # element_at probe (O(n^2) again, measured, not theoretical).
    pows = CDC_POWS
    staged = docs.select(
        "doc_id", F.regexp_replace("text", r"[^\x20-\x7E]", "").alias("__t")
    ).select(
        "doc_id",
        "__t",
        F.length("__t").alias("__n"),
        F.transform(
            F.split("__t", ""), lambda ch: F.ascii(ch).cast("long")
        ).alias("__codes"),
    )
    codes = F.col("__codes")
    n = F.col("__n")

    def win_hash(p):
        acc = F.element_at(codes, p) * F.lit(pows[0])
        for j in range(1, CDC_W):
            acc = acc + F.element_at(codes, p - F.lit(j)) * F.lit(pows[j])
        return acc % F.lit(ROLL_M)

    cuts = F.when(
        n >= CDC_W,
        F.filter(
            F.sequence(F.lit(CDC_W), n),
            lambda p: win_hash(p) % F.lit(CDC_MOD) == 0,
        ),
    ).otherwise(F.array().cast("array<int>"))
    with_bounds = staged.select(
        "doc_id",
        "__t",
        F.array_sort(
            F.array_distinct(
                F.concat(F.array(F.lit(0)), cuts, F.array(n))
            )
        ).alias("__bounds"),
    )
    bounds = F.col("__bounds")
    pair_idx = F.when(
        F.size(bounds) >= 2, F.sequence(F.lit(2), F.size(bounds))
    ).otherwise(F.array().cast("array<int>"))
    chunks = F.filter(
        F.transform(
            pair_idx,
            lambda j: F.struct(
                (F.element_at(bounds, j - 1) + 1).alias("start"),
                (F.element_at(bounds, j) - F.element_at(bounds, j - 1)).alias(
                    "len"
                ),
            ),
        ),
        lambda c: c["len"] > 0,
    )
    out = with_bounds.select(
        "doc_id", "__t", F.posexplode(chunks).alias("i", "c")
    )
    return out.select(
        "doc_id",
        (F.col("i") + 1).alias("chunk_idx"),
        F.col("c.start").alias("chunk_start"),
        F.col("c.len").cast("long").alias("chunk_len"),
        F.md5(F.col("__t").substr(F.col("c.start"), F.col("c.len"))).alias(
            "chunk_md5"
        ),
    ).orderBy("doc_id", "chunk_idx")


#: The same fixed-window polynomial ``sum(code[p-j] * B^j)`` the engine
#: evaluates, rendered for DuckDB from CDC_POWS (never hand-written).
_CDC_POLY_SQL = " + ".join(
    f"codes[p{f' - {j}' if j else ''}] * {w}" for j, w in enumerate(CDC_POWS)
)

CHUNK_FINGERPRINTS_SQL = rf"""
WITH a AS (
  SELECT doc_id, regexp_replace(text, '[^\x20-\x7E]', '', 'g') AS t
  FROM documents
), a2 AS (
  SELECT doc_id, t,
         list_transform(string_split(t, ''), c -> CAST(ord(c) AS BIGINT)) AS codes
  FROM a
), b AS (
  SELECT doc_id, t,
         list_sort(list_distinct(
           [0] ||
           CASE WHEN length(t) >= {CDC_W} THEN
             list_filter(range({CDC_W}, length(t) + 1),
               p -> (({_CDC_POLY_SQL}) % {ROLL_M}) % {CDC_MOD} = 0)
           ELSE [] END ||
           [length(t)])) AS bounds
  FROM a2
), c AS (
  SELECT doc_id, t, bounds,
         unnest(range(2, len(bounds) + 1)) AS j
  FROM b
)
SELECT doc_id,
       CAST(ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY j) AS INT)
         AS chunk_idx,
       CAST(bounds[j - 1] + 1 AS INT) AS chunk_start,
       CAST(bounds[j] - bounds[j - 1] AS BIGINT) AS chunk_len,
       md5(substr(t, bounds[j - 1] + 1, bounds[j] - bounds[j - 1]))
         AS chunk_md5
FROM c
WHERE bounds[j] - bounds[j - 1] > 0
ORDER BY doc_id, chunk_idx
"""


def bigram_counts(docs: DataFrame, k: int = 50) -> DataFrame:
    """Corpus-wide bigram frequencies (top-k with deterministic
    tiebreak) — the first statistic an n-gram LM or a contamination
    n-gram index needs. Pairs are formed WITHIN each document over the
    normalized tokenization (no cross-document bigrams).

    Shape: token array materialized as a column (lambda subexpressions
    are not shared — see ``chunk_fingerprints``), pair construction is a
    position-parallel transform, then one explode + one count shuffle;
    top-k plans as TakeOrderedAndProject."""
    staged = docs.select(tokens(normalized("text")).alias("__toks"))
    toks = F.col("__toks")
    pairs = F.when(
        F.size(toks) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.size(toks) - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("w1"),
                F.element_at(toks, i + 1).alias("w2"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<w1:string,w2:string>>"))
    return (
        staged.select(F.explode(pairs).alias("bg"))
        .groupBy(F.col("bg.w1").alias("w1"), F.col("bg.w2").alias("w2"))
        .agg(F.count(F.lit(1)).alias("n"))
        .orderBy(F.desc("n"), "w1", "w2")
        .limit(k)
    )


def bigram_counts_sql(k: int = 50) -> str:
    return rf"""
WITH t AS (
  SELECT string_split_regex({NORMALIZED_SQL}, '\s+') AS toks FROM documents
), p AS (
  SELECT unnest(list_transform(range(1, len(toks)),
                i -> struct_pack(w1 := toks[i], w2 := toks[i + 1]))) AS bg
  FROM t WHERE len(toks) >= 2
)
SELECT bg.w1 AS w1, bg.w2 AS w2, COUNT(*) AS n
FROM p GROUP BY 1, 2 ORDER BY n DESC, w1, w2 LIMIT {k}
"""


def repetition_stats(docs: DataFrame) -> DataFrame:
    """Gopher-style repetition signals per document — the standard
    "is this doc degenerate boilerplate/spam" filters in LLM data
    pipelines (Rae et al. 2021 §A1.1 use duplicate-line and repeated
    n-gram fractions; this is the token-level analogue for testdata
    without line structure):

    - ``dup_token_frac``: fraction of token occurrences that repeat an
      earlier token (1 - distinct/total).
    - ``top_token_frac``: share of the single most frequent token.
    - ``dup_2gram_frac``: fraction of adjacent-2-gram occurrences that
      are repeats.

    All ratios are exact integer/int divisions (IEEE-identical in the
    oracle). Shape: the distinct/2-gram columns are pure array
    expressions (scan speed); the top-token share needs per-(doc, token)
    counts — one explode + two doc_id-partitioned aggregations, which
    AQE coalesces; at 100 TB this is the one repetition signal worth a
    shuffle, and it shares the doc_id partitioning end-to-end."""
    t = tokens("text")
    base = docs.select("doc_id", t.alias("toks"))
    n = F.size("toks")
    nd = F.size(F.array_distinct("toks"))
    grams = F.when(
        n >= 2,
        F.zip_with(
            F.slice("toks", 1, n - 1),
            F.slice("toks", 2, n - 1),
            lambda a, b: F.concat(a, F.lit(" "), b),
        ),
    ).otherwise(F.array().cast("array<string>"))
    ng = F.size(grams)
    ngd = F.size(F.array_distinct(grams))
    arr_stats = base.select(
        "doc_id",
        n.alias("n_tokens"),
        ((n - nd).cast("double") / n).alias("dup_token_frac"),
        F.when(ng > 0, (ng - ngd).cast("double") / ng)
        .otherwise(F.lit(0.0))
        .alias("dup_2gram_frac"),
    )
    top = (
        base.select("doc_id", F.explode("toks").alias("token"))
        .groupBy("doc_id", "token")
        .agg(F.count(F.lit(1)).alias("c"))
        .groupBy("doc_id")
        .agg(F.max("c").alias("top_cnt"))
    )
    return (
        arr_stats.join(top, "doc_id")
        .select(
            "doc_id",
            "n_tokens",
            "dup_token_frac",
            (F.col("top_cnt").cast("double") / F.col("n_tokens")).alias(
                "top_token_frac"
            ),
            "dup_2gram_frac",
        )
        .orderBy("doc_id")
    )


REPETITION_STATS_SQL = """
WITH t AS (
  SELECT doc_id, string_split_regex(trim(text), '\\s+') AS toks FROM documents
), g AS (
  SELECT doc_id, toks,
         CASE WHEN len(toks) >= 2
              THEN list_transform(generate_series(1, len(toks) - 1),
                                  i -> toks[i] || ' ' || toks[i + 1])
              ELSE [] END AS grams
  FROM t
), cnt AS (
  SELECT doc_id, token, COUNT(*) AS c
  FROM (SELECT doc_id, unnest(toks) AS token FROM t) GROUP BY doc_id, token
), top AS (
  SELECT doc_id, MAX(c) AS top_cnt FROM cnt GROUP BY doc_id
)
SELECT g.doc_id,
       len(toks) AS n_tokens,
       CAST(len(toks) - len(list_distinct(toks)) AS DOUBLE) / len(toks)
         AS dup_token_frac,
       CAST(top.top_cnt AS DOUBLE) / len(toks) AS top_token_frac,
       CASE WHEN len(grams) > 0
            THEN CAST(len(grams) - len(list_distinct(grams)) AS DOUBLE) / len(grams)
            ELSE 0.0 END AS dup_2gram_frac
FROM g JOIN top ON g.doc_id = top.doc_id
ORDER BY g.doc_id
"""


def unigram_freq_score(docs: DataFrame) -> DataFrame:
    """Unigram "familiarity" score per document: the mean corpus-wide
    frequency of the doc's tokens — the exact-arithmetic stand-in for
    unigram-LM log-probability scoring (rare-token-heavy docs score low;
    boilerplate scores high). Log-prob itself is deliberately avoided:
    ``log`` differs in last-ulp between engines, while SUM(freq)/COUNT
    is integer math + one IEEE division, so the oracle matches exactly.

    Shape: one explode, one token-keyed count (the vocabulary), one join
    back, one doc_id aggregation. At 100 TB the vocabulary table after
    the count is typically small enough to broadcast — Spark's AQE makes
    that call at runtime; the explode side never shuffles twice."""
    tok = docs.select("doc_id", F.explode(tokens("text")).alias("token"))
    vocab = tok.groupBy("token").agg(F.count(F.lit(1)).alias("freq"))
    return (
        tok.join(vocab, "token")
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).alias("n_tokens"),
            F.sum("freq").alias("sum_freq"),
        )
        .select(
            "doc_id",
            "n_tokens",
            "sum_freq",
            (F.col("sum_freq").cast("double") / F.col("n_tokens")).alias(
                "familiarity"
            ),
        )
        .orderBy("doc_id")
    )


UNIGRAM_FREQ_SCORE_SQL = """
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS token
  FROM documents
), vocab AS (
  SELECT token, COUNT(*) AS freq FROM tok GROUP BY token
)
SELECT doc_id, COUNT(*) AS n_tokens,
       CAST(SUM(freq) AS BIGINT) AS sum_freq,
       CAST(SUM(freq) AS DOUBLE) / COUNT(*) AS familiarity
FROM tok JOIN vocab USING (token)
GROUP BY doc_id ORDER BY doc_id
"""


def top_tokens(docs: DataFrame, k: int = 20) -> DataFrame:
    """Corpus-wide top-k tokens by frequency (tiebreak: token asc).
    explode -> count is one shuffle; at 100 TB add a partial
    topk-per-partition pre-filter or a count-min sketch."""
    return (
        docs.select(F.explode(tokens("text")).alias("token"))
        .groupBy("token")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("token"))
        .limit(k)
    )


def top_tokens_sql(k: int = 20) -> str:
    return f"""
SELECT token, COUNT(*) AS freq FROM (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS token FROM documents
) GROUP BY token ORDER BY freq DESC, token ASC LIMIT {k}
"""


def tfidf_top_terms(docs: DataFrame, k: int = 5) -> DataFrame:
    """Top-``k`` characteristic terms per document by a TF-IDF-family
    score — the classic "what is this document about" primitive behind
    keyword extraction and topical corpus slicing.

    Scoring uses the RATIONAL idf ``1/df`` instead of ``log(N/df)``:
    within a document the two rank identically for fixed tf ordering up
    to the monotone transform, and ``score_scaled = 1e6 * tf DIV df``
    is exact integer arithmetic both engines replay bit-for-bit — the
    same log-avoidance contract as ``unigram_freq_score`` (log differs
    in last-ulp between engines; integer division does not). Ties break
    on term text ascending, so the output value-hashes.

    Shape: ONE explode -> (doc, term) count -> df as COUNT over a
    term-partitioned window on the tf frame (no second scan: a separate
    df aggregate + join re-derives the explode — Spark only reuses
    identical exchanges, and the df branch's extra aggregation breaks
    that, measured as a doubled scan in the executed plan) -> per-doc
    top-k window. Three shuffles, each on a different key ((doc, term)
    agg, term window, doc window), all on post-aggregate vocabulary- or
    doc-sized frames — the corpus is scanned and exploded exactly
    once."""
    from pyspark.sql.window import Window as _W

    tok = docs.select("doc_id", F.explode(tokens("text")).alias("term"))
    tf = tok.groupBy("doc_id", "term").agg(F.count(F.lit(1)).alias("tf"))
    scored = tf.withColumn(
        "df", F.count(F.lit(1)).over(_W.partitionBy("term"))
    ).select(
        "doc_id",
        "term",
        "tf",
        "df",
        F.expr("1000000 * tf DIV df").cast("long").alias("score_scaled"),
    )
    w = _W.partitionBy("doc_id").orderBy(
        F.desc("score_scaled"), F.asc("term")
    )
    return (
        scored.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= k)
        .select("doc_id", "rnk", "term", "tf", "df", "score_scaled")
        .orderBy("doc_id", "rnk")
    )


def tfidf_top_terms_sql(k: int = 5) -> str:
    return f"""
WITH tok AS (
  SELECT doc_id, unnest(string_split_regex(trim(text), '\\s+')) AS term
  FROM documents
),
tf AS (SELECT doc_id, term, CAST(COUNT(*) AS BIGINT) AS tf FROM tok GROUP BY 1, 2),
scored AS (
  SELECT doc_id, term, tf,
         CAST(COUNT(*) OVER (PARTITION BY term) AS BIGINT) AS df
  FROM tf
)
SELECT doc_id, rnk, term, tf, df, score_scaled FROM (
  SELECT doc_id, term, tf, df,
         CAST(1000000 * tf // df AS BIGINT) AS score_scaled,
         CAST(ROW_NUMBER() OVER (
           PARTITION BY doc_id
           ORDER BY 1000000 * tf // df DESC, term ASC) AS INT) AS rnk
  FROM scored
) WHERE rnk <= {k} ORDER BY doc_id, rnk
"""


#: Count-min sketch geometry: depth (independent hash rows) x width.
CMS_D = 4
CMS_W = 1024


def _cms_bucket(term: Column, row: int, width: int = CMS_W) -> Column:
    """Row-``row``'s bucket for ``term``: first 8 md5 hex digits of
    "row:term" mod width — the same engine-portable md5 hashing the
    corpus split uses, so the sketch is deterministic and replayable."""
    return (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{row}:"), term)), 1, 8), 16, 10
        ).cast("long")
        % width
    )


def cms_top_token_estimates(docs: DataFrame, k: int = 20) -> DataFrame:
    """Count-min-sketch frequency estimates for the corpus top-``k``
    tokens, next to their true counts — the bounded-state path the
    exact ``top_tokens`` docstring promises at 100 TB, demonstrated and
    verified: the sketch is CMS_D x CMS_W counters TOTAL (a fixed-size,
    map-side-mergeable aggregation state) regardless of corpus size,
    where the exact count's keyspace grows with the vocabulary.

    Every estimate satisfies ``est_freq >= freq`` (CMS never
    underestimates), with overestimates bounded by row collisions.
    Unlike HLL/KLL sketches whose binary state defies SQL replay, a CMS
    with md5-derived hash rows is pure integer arithmetic — the oracle
    rebuilds the identical sketch and the output value-hashes.

    Shape: one explode feeds both the exact count (vocabulary-keyed)
    and the sketch (posexplode to CMS_D (row, bucket) pairs ->
    4096-cell groupBy); estimates join the k candidate tokens to the
    tiny sketch table. At scale only the exact-count branch's shuffle
    grows; the sketch shuffle is constant-size by construction."""
    tok = docs.select(F.explode(tokens("text")).alias("term"))
    buckets = F.array(*[_cms_bucket(F.col("term"), j) for j in range(CMS_D)])
    cms = (
        tok.select(F.posexplode(buckets).alias("row", "bucket"))
        .groupBy("row", "bucket")
        .agg(F.count(F.lit(1)).alias("cnt"))
    )
    cand = (
        tok.groupBy("term")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("term"))
        .limit(k)
    )
    cand_rows = cand.select(
        "term", "freq", F.posexplode(buckets).alias("row", "bucket")
    )
    return (
        cand_rows.join(cms, ["row", "bucket"])
        .groupBy("term", "freq")
        .agg(F.min("cnt").alias("est_freq"))
        .orderBy(F.desc("freq"), F.asc("term"))
    )


def cms_top_token_estimates_sql(k: int = 20) -> str:
    def bucket(row: int) -> str:
        return (
            f"CAST(concat('0x', substr(md5(concat('{row}:', term)), 1, 8)) "
            f"AS UBIGINT) % {CMS_W}"
        )

    rows_sql = " UNION ALL ".join(
        f"SELECT term, {j} AS row, CAST({bucket(j)} AS BIGINT) AS bucket FROM tok"
        for j in range(CMS_D)
    )
    return f"""
WITH tok AS MATERIALIZED (
  SELECT unnest(string_split_regex(trim(text), '\\s+')) AS term
  FROM documents
),
hashed AS MATERIALIZED ({rows_sql}),
cms AS MATERIALIZED (
  SELECT row, bucket, CAST(COUNT(*) AS BIGINT) AS cnt
  FROM hashed GROUP BY 1, 2
),
cand AS MATERIALIZED (
  SELECT term, CAST(COUNT(*) AS BIGINT) AS freq
  FROM tok GROUP BY term ORDER BY freq DESC, term ASC LIMIT {k}
),
cand_rows AS (
  SELECT c.term, c.freq, h.row, h.bucket
  FROM cand c JOIN (SELECT DISTINCT term, row, bucket FROM hashed) h
    ON h.term = c.term
)
SELECT term, freq, MIN(cnt) AS est_freq
FROM cand_rows JOIN cms USING (row, bucket)
GROUP BY term, freq
ORDER BY freq DESC, term ASC
"""


# ----------------------------------------------------------------------
# Cross-document boilerplate n-grams
def common_ngrams(
    docs: DataFrame, n: int = 5, min_docs: int = 2, k: int = 50
) -> DataFrame:
    """Word ``n``-grams shared by at least ``min_docs`` DISTINCT
    documents, top-``k`` by document frequency — the cross-document
    boilerplate detector (the C4/Dolma-style pass that finds repeated
    navigation text, license banners, templated paragraphs; what
    paragraph-dedup does for corpora whose documents have no line
    structure). Counts document frequency, not occurrences: a phrase
    repeated 100x inside ONE page is repetition (text_repetition_stats'
    job), not boilerplate.

    Shape: the per-document ``array_distinct`` makes a plain COUNT(*)
    after the explode a distinct-document count — no count_distinct
    shuffle state. One explode + one count shuffle keyed by the gram;
    top-k plans as TakeOrderedAndProject. At 100 TB hash the gram to a
    64-bit key for the shuffle and keep one example string per hash."""
    staged = docs.select("doc_id", tokens(normalized("text")).alias("__toks"))
    toks = F.col("__toks")
    grams = F.when(
        F.size(toks) >= n,
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(1), F.size(toks) - n + 1),
                lambda i: F.concat_ws(
                    " ", *[F.element_at(toks, i + j) for j in range(n)]
                ),
            )
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        staged.select(F.explode(grams).alias("gram"))
        .groupBy("gram")
        .agg(F.count(F.lit(1)).alias("n_docs"))
        .filter(F.col("n_docs") >= min_docs)
        .orderBy(F.desc("n_docs"), "gram")
        .limit(k)
    )


def common_ngrams_sql(n: int = 5, min_docs: int = 2, k: int = 50) -> str:
    cols = ", ".join(f"toks[i + {j}]" for j in range(n))
    return rf"""
WITH t AS (
  SELECT doc_id, string_split_regex({NORMALIZED_SQL}, '\s+') AS toks
  FROM documents
), g AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(toks) - {n} + 2),
                               i -> concat_ws(' ', {cols}))) AS gram
  FROM t WHERE len(toks) >= {n}
)
SELECT gram, COUNT(*) AS n_docs
FROM g GROUP BY gram HAVING COUNT(*) >= {min_docs}
ORDER BY n_docs DESC, gram LIMIT {k}
"""


# ----------------------------------------------------------------------
# BPE vocabulary induction: merge-pair candidates
def bpe_merge_candidates(docs: DataFrame, k: int = 30) -> DataFrame:
    """Top-``k`` adjacent character pairs by corpus frequency — the
    statistic the FIRST iteration of BPE training maximizes (merge the
    most frequent adjacent symbol pair; Sennrich et al. 2016). Pairs
    are counted WITHIN tokens of the normalized text (BPE never merges
    across a pre-tokenizer boundary), weighted by occurrence.

    Shape: one explode of per-token pair arrays (built inline — see the
    named-array pitfall in SCALE.md) + one pair-keyed count shuffle;
    top-k as TakeOrderedAndProject. Later BPE iterations re-count over
    re-segmented text; each iteration is this same one-shuffle job."""
    staged = docs.select(
        F.explode(tokens(normalized("text"))).alias("tok")
    )
    tok = F.col("tok")
    pairs = F.when(
        F.length(tok) >= 2,
        F.transform(
            F.sequence(F.lit(1), F.length(tok) - 1),
            lambda i: tok.substr(i, F.lit(2)),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return (
        staged.select(F.explode(pairs).alias("pair"))
        .groupBy("pair")
        .agg(F.count(F.lit(1)).alias("freq"))
        .orderBy(F.desc("freq"), F.asc("pair"))
        .limit(k)
    )


def bpe_merge_candidates_sql(k: int = 30) -> str:
    return rf"""
WITH t AS (
  SELECT unnest(string_split_regex({NORMALIZED_SQL}, '\s+')) AS tok
  FROM documents
), p AS (
  SELECT unnest(list_transform(range(1, length(tok)),
                               i -> substr(tok, i, 2))) AS pair
  FROM t WHERE length(tok) >= 2
)
SELECT pair, COUNT(*) AS freq
FROM p GROUP BY pair ORDER BY freq DESC, pair ASC LIMIT {k}
"""
