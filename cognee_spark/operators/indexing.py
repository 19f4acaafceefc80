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


def build_triplet_index(triples: DataFrame, dim: int = DEFAULT_DIM) -> DataFrame:
    """Triplet-embedding collection — the memify create_triplet_embeddings
    pipeline (cognee/memify_pipelines/create_triplet_embeddings.py +
    cognee/tasks/memify/get_triplet_datapoints.py:100-167): each graph edge
    becomes a Triplet datapoint whose embeddable text is
    ``{start_text}-›{rel_text}-›{end_text}`` (node texts from their
    index_fields — Entity.name here — relationship text from the edge) and
    whose id is generate_node_id(start_id + relationship_name + end_id);
    Triplet.metadata.index_fields = ["text"], so the collection is
    ``Triplet_text``. The reference pages the graph through the driver in
    batches of 100 (get_triplets_batch offset/limit) — here the whole build
    is one narrow projection over the triples table; dedup by item_id is the
    same upsert-by-deterministic-id the other collections use."""
    from cognee_spark.functions.ids import node_id_col

    start_id = id_for_col("Entity", F.col("subj"))
    end_id = id_for_col("Entity", F.col("obj"))
    return (
        triples.select(
            F.lit("Triplet_text").alias("collection"),
            node_id_col(F.concat(start_id, F.col("pred"), end_id)).alias("item_id"),
            F.concat_ws("-›", "subj", "pred", "obj").alias("text"),
        )
        .dropDuplicates(["collection", "item_id"])
        .withColumn("embedding", hash_embedding_col(F.col("text"), dim=dim))
    )
