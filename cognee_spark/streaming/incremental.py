"""Incremental / streaming ingestion — SURVEY §2.8.

The reference is batch-with-checkpoints: skip data items whose pipeline_status
is COMPLETED (run_tasks_data_item.py:86-103), detect changed content by hash
(ingest_data.py:173-186). Structured Streaming gives the same semantics with
exactly-once file-source tracking:

- `stream_repos`: readStream over a repos parquet directory — new files are
  discovered incrementally; the stream checkpoint IS the pipeline_status
  ledger.
- `incremental_cognify`: foreachBatch micro-batch → the SAME batch operators
  (chunk/extract/resolve) → anti-join against already-persisted triples by
  deterministic key → append only new rows. Deterministic ids make re-delivery
  idempotent (at-least-once + idempotent write = exactly-once table).
- `windowed_event_counts`: watermarked sliding-window aggregation — the
  streaming-analytics operator shape (late data handled by the watermark).

Production sink is an Iceberg MERGE per micro-batch; parquet append +
anti-join reproduces it here.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cognee_spark.operators.extraction import (
    extract_from_files,
    mentions_of,
    raw_edges_of,
)
from cognee_spark.operators.linking import code_triples, resolve_code_edges
from cognee_spark.sources.corpus import REPOS_SCHEMA


def stream_repos(spark: SparkSession, input_dir: str, max_files_per_trigger: int = 64) -> DataFrame:
    return (
        spark.readStream.schema(REPOS_SCHEMA)
        .option("maxFilesPerTrigger", max_files_per_trigger)
        .parquet(input_dir)
    )


def incremental_cognify(
    spark: SparkSession,
    input_dir: str,
    output_dir: str,
    checkpoint_dir: str,
) -> None:
    """Process newly arrived repo files into the triples table, exactly once.

    Code-mode only per micro-batch (NL linking needs a global alias dictionary;
    it runs as the periodic batch job). Runs with availableNow and returns
    when the backlog is drained.
    """
    triples_path = os.path.join(output_dir, "triples")

    def process(batch_df: DataFrame, batch_id: int) -> None:
        docs = batch_df.withColumn("content_sha", F.sha2("content", 256))
        extractions = extract_from_files(docs)
        mentions = mentions_of(extractions)
        raw_edges = raw_edges_of(extractions)
        fresh = code_triples(resolve_code_edges(mentions, raw_edges))
        spark_l = batch_df.sparkSession
        has_existing = os.path.isdir(triples_path) and any(
            name.endswith(".parquet") for name in os.listdir(triples_path)
        )
        if has_existing:
            existing = spark_l.read.parquet(triples_path).select("subj", "pred", "obj")
            fresh = fresh.join(existing, ["subj", "pred", "obj"], "left_anti")
        fresh.write.mode("append").parquet(triples_path)

    query = (
        stream_repos(spark, input_dir)
        .writeStream.foreachBatch(process)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
        .start()
    )
    query.awaitTermination()


def windowed_event_counts(
    events_stream: DataFrame,
    window: str = "10 minutes",
    slide: str = "5 minutes",
    watermark: str = "15 minutes",
) -> DataFrame:
    """Watermarked sliding-window counts per event type."""
    return (
        events_stream.withColumn("ts", F.col("ts").cast("timestamp"))
        .withWatermark("ts", watermark)
        .groupBy(F.window("ts", window, slide).alias("w"), "event_type")
        .agg(F.count(F.lit(1)).alias("n_events"), F.sum("value").alias("total_value"))
        .select(
            F.col("w.start").alias("window_start"),
            F.col("w.end").alias("window_end"),
            "event_type",
            "n_events",
            "total_value",
        )
    )
