"""Vector-index construction over the materialized graph — the reference's
``index_data_points`` / ``index_graph_edges`` stage.

The reference walks every added DataPoint, groups indexable fields into
per-(type, field) collections, embeds the field text, and upserts
(id, text, vector) rows into the vector store (cognee/tasks/storage/
index_data_points.py:10-68); edge relationship names get the same treatment
as EdgeType points (cognee/tasks/storage/index_graph_edges.py:39-52).

Spark re-expression: one tall ``embeddings`` table
(collection, item_id, text, embedding) built with select/union over the
already-committed nodes / entity_types / triples / summaries tables; the
embedding itself is a deterministic hash embedding computed in codegen
(functions/embeddings.py — the pluggable encoder seam). Dedup is a
dropDuplicates on (collection, item_id) — deterministic ids make the upsert
a merge by construction. Retrieval (R1/R6) then runs
similarity_search.brute_force_topk / ivf_topk over a collection slice, which
is a partition-pruned scan because the table is written partitioned by
collection.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cognee_spark.functions.embeddings import DEFAULT_DIM, hash_embedding_col
from cognee_spark.functions.ids import id_for_col


def build_index(
    nodes: DataFrame,
    entity_types: DataFrame,
    triples: DataFrame,
    summaries: DataFrame | None = None,
    dim: int = DEFAULT_DIM,
) -> DataFrame:
    """(collection, item_id, text, embedding) rows for every indexable field.

    Collections mirror index_data_points.py naming: ``{Type}_{field}``.
    """
    entity_name = nodes.select(
        F.lit("Entity_name").alias("collection"),
        F.col("entity_id").alias("item_id"),
        F.col("name").alias("text"),
    )
    type_name = entity_types.select(
        F.lit("EntityType_name").alias("collection"),
        F.col("type_id").alias("item_id"),
        F.col("name").alias("text"),
    )
    edge_types = (
        triples.select(F.col("pred").alias("text"))
        .distinct()
        .select(
            F.lit("EdgeType_relationship_name").alias("collection"),
            id_for_col("EdgeType", F.col("text")).alias("item_id"),
            "text",
        )
    )
    out = entity_name.unionByName(type_name).unionByName(edge_types)
    if summaries is not None:
        out = out.unionByName(
            summaries.select(
                F.lit("TextSummary_text").alias("collection"),
                F.col("summary_id").alias("item_id"),
                F.col("summary").alias("text"),
            )
        )
    return out.dropDuplicates(["collection", "item_id"]).withColumn(
        "embedding", hash_embedding_col(F.col("text"), dim=dim)
    )
