"""Text-analysis operators for training-data curation.

cognee analogs: token estimation (chunk_by_sentence.py:7-29, estimator.py),
BM25 tokenization (bm25_retriever.py:9-57). All pure column expressions
(codegen, no Python) and DuckDB-oracle-expressible.

- token_counts: whitespace tokens + a BPE-ish subword estimate
- quality_scores: length / punctuation / stopword ratios → quality score
- language_id: n-gram heuristic over a fixed marker table
- fingerprints: prefix content fingerprint for cheap grouping
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

STOPWORDS = [
    "the", "a", "an", "and", "or", "of", "to", "in", "is", "it",
    "on", "for", "with", "as", "at", "by", "from", "that", "this",
]

# crude language markers: (lang, regex) — an n-gram presence heuristic;
# deterministic and SQL-expressible (regexp on both engines)
LANG_MARKERS = [
    ("zh", "[一-鿿]"),
    ("ja", "[぀-ヿ]"),
    ("ru", "[Ѐ-ӿ]"),
    ("es", r"(?:\b(?:el|la|los|las|que|de)\b)"),
    ("fr", r"(?:\b(?:le|la|les|des|une|est)\b)"),
    ("de", r"(?:\b(?:der|die|das|und|ist)\b)"),
]


def token_counts(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Deterministic token accounting per document.

    n_words: whitespace tokens (the reference's no-tokenizer fallback rule);
    n_subwords: BPE-ish estimate — word-chunks of <=4 chars via a regex that
    both Spark and DuckDB evaluate identically."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.size(words).alias("n_words"),
        F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[A-Za-z0-9]{1,4}"), 0)).alias(
            "n_subwords"
        ),
        F.length(F.col(text_col)).alias("n_chars"),
    )


def quality_scores(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Heuristic quality: word stats + punctuation + stopword ratios.

    score = clamp(mean_word_len/8) * (1 - punct_ratio) * stopword presence —
    the standard cheap pre-filter a curation pipeline applies before
    expensive scoring."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    n_words = F.size(words)
    n_chars = F.length(F.col(text_col))
    n_punct = F.size(F.regexp_extract_all(F.col(text_col), F.lit(r"[^\w\s]"), 0))
    stop_array = F.array(*[F.lit(s) for s in STOPWORDS])
    n_stop = F.size(F.filter(words, lambda w: F.array_contains(stop_array, F.lower(w))))
    mean_word_len = (n_chars - (n_words - 1)) / n_words
    punct_ratio = n_punct / F.greatest(n_chars, F.lit(1))
    stop_ratio = n_stop / F.greatest(n_words, F.lit(1))
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_words.alias("n_words"),
        F.round(mean_word_len, 4).alias("mean_word_len"),
        F.round(punct_ratio, 4).alias("punct_ratio"),
        F.round(stop_ratio, 4).alias("stopword_ratio"),
        F.round(
            F.least(mean_word_len / 8.0, F.lit(1.0)) * (1.0 - punct_ratio), 4
        ).alias("quality_score"),
    )


def language_id(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """First-matching-marker language guess; 'en' fallback."""
    expr = F.lit("en")
    for lang, pattern in reversed(LANG_MARKERS):
        expr = F.when(F.col(text_col).rlike(pattern), F.lit(lang)).otherwise(expr)
    return docs.select(F.col(id_col).alias("doc_id"), expr.alias("lang_guess"))


def fingerprints(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", prefix: int = 64
) -> DataFrame:
    """Cheap content fingerprint: md5(first-N chars) + length bucket."""
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.concat_ws(
            ":",
            F.md5(F.substring(F.col(text_col), 1, prefix)),
            F.floor(F.length(F.col(text_col)) / 64).cast("int").cast("string"),
        ).alias("fingerprint"),
    )
