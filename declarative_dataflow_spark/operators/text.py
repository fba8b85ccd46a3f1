"""Text-analysis operators for large-scale training-data pipelines.

Beyond-reference extensions (BASELINE.json north star): language ID,
quality scoring, token counting, document fingerprinting — all
expressed with built-in JVM-side SQL functions (no Python UDFs in the
hot path), so they stay inside whole-stage codegen and scale linearly
with input splits at 100 TB. Each has an exact DuckDB-SQL twin used by
the correctness gate.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, functions as F

# Deliberately small, deterministic marker sets: the point is the
# dataflow shape (tokenize -> filter -> argmax), not linguistics.
STOPWORDS = ("the", "a", "and", "of", "to", "in", "is", "on", "for")

LANG_MARKERS: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "is"),
    "es": ("el", "la", "los", "y", "de"),
    "de": ("der", "die", "und", "ist"),
    "fr": ("le", "les", "et", "est"),
}

PUNCT_CLASS = "[.,!?;:]"


def _count_in_set(col: str, words: tuple[str, ...]) -> Column:
    lst = ", ".join(f"'{w}'" for w in words)
    return F.expr(f"size(filter(split(lower({col}), ' '), w -> w IN ({lst})))")


def token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Whitespace token count per document."""

    return docs.select(
        "doc_id",
        F.when(F.length(F.trim(F.col(text_col))) == 0, F.lit(0))
        .otherwise(F.size(F.split(F.trim(F.col(text_col)), r"\s+")))
        .alias("n_tokens"),
    )


# BPE-ish pre-tokenizer: alphabetic runs are one token, digits and
# punctuation symbols tokenize individually (the shape of GPT-2's
# pre-tokenization, simplified to a regex that means the same thing in
# Spark's and DuckDB's dialects).
SUBWORD_PATTERN = "[a-z]+|[0-9]|[^a-z0-9 ]"


def subword_token_count(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """BPE-ish subword token count: alpha runs + individual digits +
    individual symbols. An upper-bound proxy for real BPE vocab counts
    (a trained tokenizer merges, never splits, these pieces)."""

    return docs.select(
        "doc_id",
        F.size(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(SUBWORD_PATTERN), 0
            )
        ).cast("long").alias("n_subwords"),
    )


def quality_columns(text_col: str = "text") -> dict[str, Column]:
    """The quality signals as raw Column expressions — composable into
    any projection (streaming stages use these to stay map-only)."""

    length = F.length(F.col(text_col))
    punct = length - F.length(F.regexp_replace(F.col(text_col), PUNCT_CLASS, ""))
    n_tokens = F.size(F.split(F.lower(F.col(text_col)), " "))
    n_stop = _count_in_set(text_col, STOPWORDS)
    punct_ratio = punct / F.greatest(length, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_tokens, F.lit(1))
    len_score = F.least(length / F.lit(500.0), F.lit(1.0))
    score = stop_ratio * 0.5 + len_score * 0.3 + (1.0 - punct_ratio) * 0.2
    return {
        "n_chars": length,
        "punct_ratio": F.round(punct_ratio, 4),
        "stopword_ratio": F.round(stop_ratio, 4),
        "quality": F.round(score, 4),
    }


def quality_score(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Heuristic document quality: length, punctuation and stopword
    ratios combined into one score (all integer counts + one rounded
    division — deterministic across engines)."""

    cols = quality_columns(text_col)
    return docs.select(
        "doc_id", *[c.alias(name) for name, c in cols.items()]
    )


def lang_id_column(text_col: str = "text") -> Column:
    """Marker-word language ID as a raw Column: argmax of per-language
    marker counts, ties broken by fixed language order, zero hits ->
    'und'."""

    counts = {lang: _count_in_set(text_col, ws) for lang, ws in LANG_MARKERS.items()}
    best = F.lit("und")
    best_n = F.lit(0)
    # Iterate in reverse priority so earlier languages win ties.
    for lang in reversed(list(LANG_MARKERS)):
        c = counts[lang]
        best = F.when(c >= best_n, F.lit(lang)).otherwise(best)
        best_n = F.when(c >= best_n, c).otherwise(best_n)
    return F.when(best_n > 0, best).otherwise(F.lit("und"))


def lang_id(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Marker-word language ID (see :func:`lang_id_column`)."""

    return docs.select("doc_id", lang_id_column(text_col).alias("lang_pred"))


def fingerprint(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Deterministic document fingerprint: md5 of the
    lowercased/punctuation-stripped/whitespace-collapsed text."""

    norm = F.trim(
        F.regexp_replace(
            F.regexp_replace(F.lower(F.col(text_col)), "[^a-z0-9 ]", ""),
            " +",
            " ",
        )
    )
    return docs.select("doc_id", F.md5(norm).alias("fp"))


# PII patterns chosen to mean the same thing in Java regex (Spark) and
# RE2 (DuckDB): no backrefs, no lookaround.
EMAIL_PATTERN = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\\.[A-Za-z]{2,}"
PHONE_PATTERN = "[0-9]{3}-[0-9]{3}-[0-9]{4}"


def redact_column(text_col: str = "text") -> Column:
    """Email+phone scrubbing as a raw Column expression."""

    return F.regexp_replace(
        F.regexp_replace(F.col(text_col), EMAIL_PATTERN, "<EMAIL>"),
        PHONE_PATTERN,
        "<PHONE>",
    )


def pii_redact(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Scrub emails and phone numbers: (doc_id, redacted, n_emails,
    n_phones). Map-only column expressions (regexp_replace /
    regexp_extract_all stay in whole-stage codegen) — at 100 TB this
    fuses into the scan like every other text operator."""

    text = F.col(text_col)
    return docs.select(
        "doc_id",
        redact_column(text_col).alias("redacted"),
        F.size(F.regexp_extract_all(text, F.lit(EMAIL_PATTERN), 0))
        .cast("long")
        .alias("n_emails"),
        F.size(F.regexp_extract_all(text, F.lit(PHONE_PATTERN), 0))
        .cast("long")
        .alias("n_phones"),
    )


def repetition_ratio_column(text_col: str = "text") -> Column:
    """Within-document duplicate-token share as a raw Column."""

    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size(words)
    d = F.size(F.array_distinct(words))
    return F.round(F.lit(1.0) - d / F.greatest(n, F.lit(1)), 6)


def repetition_stats(docs: DataFrame, text_col: str = "text") -> DataFrame:
    """Repetition-based quality signal: share of duplicate tokens per
    document — near-1.0 marks boilerplate/spam that dedup misses
    because the repetition is WITHIN the document. (doc_id, n_tokens,
    n_distinct, rep_ratio). Pure array expressions, map-only."""

    words = F.split(F.lower(F.trim(F.col(text_col))), r"\s+")
    n = F.size(words)
    d = F.size(F.array_distinct(words))
    return docs.select(
        "doc_id",
        n.cast("long").alias("n_tokens"),
        d.cast("long").alias("n_distinct"),
        repetition_ratio_column(text_col).alias("rep_ratio"),
    )


def vocab_topk(
    docs: DataFrame, k: int = 100, text_col: str = "text"
) -> DataFrame:
    """Tokenizer-vocabulary induction, step one: the corpus-wide top-k
    subword pieces by frequency — (token, n, rk). Ties break
    lexicographically so the ranking is total and engine-portable.

    Shape: explode the per-document subword pieces (the same BPE-ish
    pre-tokenization as :func:`subword_token_count`), one uniform-key
    count aggregation with map-side partials, then top-k via
    orderBy+limit — Catalyst lowers that to TakeOrderedAndProject
    (per-partition k-row heaps + a k-row merge), so even a 100M-piece
    vocabulary never single-partitions; the rank window runs over the
    k surviving rows only.
    """

    from pyspark.sql import Window

    pieces = docs.select(
        F.explode(
            F.regexp_extract_all(
                F.lower(F.col(text_col)), F.lit(SUBWORD_PATTERN), 0
            )
        ).alias("token")
    )
    counts = pieces.groupBy("token").agg(
        F.count(F.lit(1)).alias("n")
    )
    top = counts.orderBy(F.col("n").desc(), F.col("token")).limit(k)
    w = Window.orderBy(F.col("n").desc(), F.col("token"))
    return (
        top.withColumn("rk", F.row_number().over(w).cast("long"))
        .filter(F.col("rk") <= k)
    )
