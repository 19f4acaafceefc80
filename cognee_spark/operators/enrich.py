"""Enrichment operators — E4 summarization, L10/L12 cleanup, A4 weights.

- summarize_chunks: per-chunk TextSummary rows with deterministic ids
  (uuid5(f"{chunk_id}-TextSummary"), cognee/tasks/summarization/
  summarize_text.py:18-87 / models.py:23-38). The summary itself is a
  deterministic extractive stand-in (first sentence + top terms) for the LLM
  call — same batch seam, swap is config.
- synthesize_titles: first-7-words + top-3 frequent words title
  (resolve_edges_to_text.py:12-45)
- consolidate_descriptions: per-canonical-entity merge of mention
  descriptions (memify consolidate_entity_descriptions.py:202-224) as
  groupBy + sorted concat — the LLM-merge seam is the same aggregation.
- remove_disconnected_chunks: drop chunks that produced no mentions and
  entities with no edges (remove_disconnected_chunks.py:5-38)
- apply_frequency_weights: usage-count → feedback_weight update
  (memify/apply_frequency_weights.py)
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cognee_spark.functions.ids import uuid5_col


def summarize_chunks(chunks: DataFrame, max_len: int = 160) -> DataFrame:
    """chunks(chunk_id, text, ...) → (summary_id, chunk_id, summary)."""
    first_sentence = F.regexp_extract("text", r"^(.*?[.;!?…。！？])", 1)
    summary = F.when(first_sentence != "", first_sentence).otherwise(
        F.substring("text", 1, max_len)
    )
    return chunks.select(
        uuid5_col(F.concat_ws("-", "chunk_id", F.lit("TextSummary"))).alias("summary_id"),
        "chunk_id",
        F.substring(summary, 1, max_len).alias("summary"),
        *(c for c in ("content_sha", "document_id") if c in chunks.columns),
    )


def synthesize_titles(docs: DataFrame, text_col: str = "text", id_col: str = "document_id") -> DataFrame:
    """Title = first 7 words + ' | ' + top-3 frequent words (len>3)."""
    words = F.split(F.trim(F.col(text_col)), r"\s+")
    first7 = F.concat_ws(" ", F.slice(words, 1, 7))
    exploded = docs.select(F.col(id_col).alias("document_id"), F.explode(words).alias("w"))
    top3 = (
        exploded.where(F.length("w") > 3)
        .groupBy("document_id", F.lower("w").alias("w"))
        .agg(F.count(F.lit(1)).alias("n"))
        .withColumn(
            "rnk",
            F.row_number().over(
                __import__("pyspark").sql.window.Window.partitionBy("document_id").orderBy(
                    F.desc("n"), F.asc("w")
                )
            ),
        )
        .where(F.col("rnk") <= 3)
        .groupBy("document_id")
        .agg(F.concat_ws(" ", F.sort_array(F.collect_list(F.struct("rnk", "w"))).getField("w")).alias("top_words"))
    )
    base = docs.select(F.col(id_col).alias("document_id"), first7.alias("first_words"))
    return base.join(top3, "document_id", "left").select(
        "document_id",
        F.concat_ws(" | ", "first_words", "top_words").alias("title"),
    )


def consolidate_descriptions(
    mentions: DataFrame,
    name_col: str = "canonical_name",
    desc_col: str = "name",
) -> DataFrame:
    """Per canonical entity: merged, order-independent description."""
    return (
        mentions.groupBy(F.col(name_col).alias("canonical_name"))
        .agg(
            F.concat_ws("; ", F.array_sort(F.collect_set(F.col(desc_col)))).alias(
                "consolidated_description"
            ),
            F.count(F.lit(1)).alias("mention_count"),
        )
    )


def remove_disconnected_chunks(chunks: DataFrame, mentions: DataFrame) -> DataFrame:
    """Keep only chunks that yielded at least one mention (NL mode)."""
    live = mentions.where(F.col("chunk_id").isNotNull()).select("chunk_id").distinct()
    return chunks.join(live, "chunk_id", "left_semi")


def disconnected_entities(nodes: DataFrame, triples: DataFrame) -> DataFrame:
    """Entities with zero degree in the content graph (candidates to sweep)."""
    endpoints = (
        triples.select(F.col("subj").alias("name"))
        .union(triples.select(F.col("obj").alias("name")))
        .distinct()
    )
    return nodes.join(endpoints, "name", "left_anti")


def apply_frequency_weights(edges: DataFrame, usage: DataFrame) -> DataFrame:
    """Blend usage counts into feedback_weight:
    w' = least(0.5 + ln(1+uses)/10, 1.0). usage: (edge_object_id, uses).

    The usage rollup grows with total traffic, not with a dictionary, so the
    broadcast is probe-guarded; past the bound the join shuffles on the same
    edge_object_id the edges table already keys."""
    from cognee_spark.functions.broadcast import bounded_broadcast

    return (
        edges.join(bounded_broadcast(usage), "edge_object_id", "left")
        .withColumn(
            "feedback_weight",
            F.round(
                F.least(
                    F.col("feedback_weight")
                    + F.log1p(F.coalesce(F.col("uses"), F.lit(0))) / 10.0,
                    F.lit(1.0),
                ),
                6,
            ),
        )
        .drop("uses")
    )
