"""Deduplication operators over document corpora.

The reference dedups by content hash at ingest (ingest_data.py:28-86 MERGE by
content hash; TextData.get_identifier md5 — data_types/TextData.py:18-34) and
near-dups via vector similarity (create_chunk_associations). A 100 TB
training-data pipeline needs the full ladder; each operator here is a
DataFrame-in/DataFrame-out function with a DuckDB-oracle-compatible
formulation where the semantics are SQL-expressible:

- exact_duplicates: sha256 groupBy (hash-shuffle, combiner does the heavy
  lifting map-side)
- minhash_duplicates: char-shingle min-hash band join (the scalable path —
  candidates only, verify with jaccard)
- simhash: 64-bit simhash per doc from token hashes (Arrow-vectorized)
- ngram_jaccard_pairs: exact verify of candidate pairs
- embedding_duplicates: cosine >= threshold over an embeddings table via an
  LSH-free blocked self-join (brute force at small scale; IVF blocking at
  large scale lives in similarity_search.py)
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Groups of byte-identical documents: (content_sha, dup_count, doc_ids)."""
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.sha2(F.col(text_col), 256).alias("content_sha"))
        .groupBy("content_sha")
        .agg(F.count(F.lit(1)).alias("dup_count"), F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
        .where(F.col("dup_count") > 1)
    )


def shingle_min_signatures(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_len: int = 8,
    prefix_chars: int = 256,
) -> DataFrame:
    """Per-doc min-shingle signature: min(md5(shingle)) over the text prefix.

    md5 (not xxhash) so a DuckDB oracle can recompute it byte-for-byte. The
    prefix bound keeps the explode linear in docs, not corpus bytes.
    """
    prefix = F.substring(F.col(text_col), 1, prefix_chars)
    idx = F.sequence(F.lit(1), F.greatest(F.length("prefix") - (shingle_len - 1), F.lit(1)))
    return (
        docs.select(F.col(id_col).alias("doc_id"), prefix.alias("prefix"))
        .select("doc_id", F.explode(idx).alias("i"), "prefix")
        .select("doc_id", F.md5(F.col("prefix").substr(F.col("i"), F.lit(shingle_len))).alias("h"))
        .groupBy("doc_id")
        .agg(F.min("h").alias("min_shingle"))
    )


def minhash_duplicate_candidates(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Docs sharing a min-shingle bucket: (min_shingle, bucket_size, doc_ids).

    The band-join form of MinHash-LSH with one permutation — the SQL-checkable
    core; production uses cognee_spark.functions.similarity (24 bands).
    """
    sigs = shingle_min_signatures(docs, text_col, id_col)
    return (
        sigs.groupBy("min_shingle")
        .agg(F.count(F.lit(1)).alias("bucket_size"), F.sort_array(F.collect_list("doc_id")).alias("doc_ids"))
        .where(F.col("bucket_size") > 1)
    )


@F.pandas_udf(T.LongType())
def simhash64(texts: pd.Series) -> pd.Series:
    """64-bit SimHash over whitespace tokens (Arrow-vectorized)."""
    import hashlib

    def one(text: str) -> int:
        weights = [0] * 64
        for token in (text or "").split():
            h = int.from_bytes(hashlib.blake2b(token.encode(), digest_size=8).digest(), "big")
            for bit in range(64):
                weights[bit] += 1 if (h >> bit) & 1 else -1
        value = 0
        for bit in range(64):
            if weights[bit] > 0:
                value |= 1 << bit
        return value - (1 << 64) if value >= 1 << 63 else value  # signed long

    return texts.map(one)


def simhash_duplicates(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Near-dup pairs by SimHash: block on 4 x 16-bit chunks (any match ⇒
    hamming <= 3 is guaranteed caught), verify with popcount."""
    sigs = docs.select(F.col(id_col).alias("doc_id"), simhash64(F.col(text_col)).alias("sig"))
    chunks = sigs.select(
        "doc_id", "sig",
        F.explode(
            F.array(*[
                F.concat_ws(":", F.lit(i), F.shiftrightunsigned("sig", 16 * i) % F.lit(1 << 16))
                for i in range(4)
            ])
        ).alias("block"),
    )
    left = chunks.select(F.col("doc_id").alias("a"), F.col("sig").alias("sig_a"), "block")
    right = chunks.select(F.col("doc_id").alias("b"), F.col("sig").alias("sig_b"), "block")
    pairs = (
        left.join(right, "block")
        .where(F.col("a") < F.col("b"))
        .select("a", "b", F.bit_count(F.expr("sig_a").bitwiseXOR(F.expr("sig_b"))).alias("hamming"))
        .distinct()
        .where(F.col("hamming") <= max_hamming)
    )
    return pairs


def ngram_jaccard_pairs(
    docs: DataFrame,
    candidate_pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n: int = 3,
    threshold: float = 0.8,
) -> DataFrame:
    """Exact word-n-gram Jaccard verification of candidate (a, b) pairs."""
    grams = docs.select(
        F.col(id_col).alias("doc_id"),
        F.array_distinct(
            F.transform(
                F.sequence(F.lit(0), F.greatest(F.size(F.split(F.col(text_col), r"\s+")) - n, F.lit(0))),
                lambda i: F.concat_ws(" ", F.slice(F.split(F.col(text_col), r"\s+"), i + 1, n)),
            )
        ).alias("grams"),
    )
    a = grams.select(F.col("doc_id").alias("a"), F.col("grams").alias("ga"))
    b = grams.select(F.col("doc_id").alias("b"), F.col("grams").alias("gb"))
    joined = candidate_pairs.join(a, "a").join(b, "b")
    inter = F.size(F.array_intersect("ga", "gb"))
    union = F.size(F.array_union("ga", "gb"))
    return (
        joined.select("a", "b", (inter / union).alias("jaccard"))
        .where(F.col("jaccard") >= threshold)
    )


def embedding_duplicates(
    embeddings: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
) -> DataFrame:
    """Near-dup pairs by cosine >= threshold (brute-force blocked self-join;
    for billion-row tables use similarity_search.ivf_assign blocking first)."""
    norm = F.sqrt(F.aggregate(vec_col, F.lit(0.0), lambda acc, x: acc + x * x))
    base = embeddings.select(F.col(id_col).alias("id"), F.col(vec_col).alias("v"), norm.alias("n"))
    a = base.select(F.col("id").alias("a"), F.col("v").alias("va"), F.col("n").alias("na"))
    b = base.select(F.col("id").alias("b"), F.col("v").alias("vb"), F.col("n").alias("nb"))
    dot = F.aggregate(F.zip_with("va", "vb", lambda x, y: x * y), F.lit(0.0), lambda acc, x: acc + x)
    return (
        a.crossJoin(b)
        .where(F.col("a") < F.col("b"))
        .select("a", "b", (dot / (F.col("na") * F.col("nb"))).alias("cosine"))
        .where(F.col("cosine") >= threshold)
    )
