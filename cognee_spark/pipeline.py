"""The cognify pipeline — chunk → extract → link → canonicalize → materialize.

Spark re-expression of cognee's 5-task default pipeline
(cognee/api/v1/cognify/cognify.py:350-376: classify_documents →
extract_chunks_from_documents → extract_graph_and_summarize →
add_data_points → extract_dlt_fk_edges): every task boundary is a
checkpointed table commit, every row carries lineage columns
(source_pipeline / source_task / content_sha — run_tasks_base.py:33-117
provenance stamping), and a killed run resumes from the last committed stage.

Stage order and write ordering (nodes before edges) follow SURVEY §7.1/O9.

Run via spark-submit:
    spark-submit --py-files cognee_spark.zip -m cognee_spark.pipeline ...
or python -m cognee_spark.pipeline --n-files 5000 --out /tmp/kg
"""

from __future__ import annotations

import argparse
import json
import time

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cognee_spark.functions.ids import normalize_identity_col
from cognee_spark.operators.chunking import chunk_documents
from cognee_spark.operators.extraction import (
    CODE_LANGS,
    extract_from_chunks,
    extract_from_files,
    mentions_of,
    raw_edges_of,
)
from cognee_spark.operators.linking import (
    alias_map,
    code_triples,
    nl_triples,
    resolve_code_edges,
)
from cognee_spark.operators.materialize import (
    build_contains_edges,
    build_edges,
    build_entity_types,
    build_nodes,
    edge_type_histogram,
    graph_metrics,
)
from cognee_spark.store import TableStore, run_stage

PIPELINE_NAME = "cognify_spark"


def _stamp(df: DataFrame, task: str) -> DataFrame:
    """Provenance stamping (run_tasks_base.py:150-229 analog)."""
    return df.withColumn("source_pipeline", F.lit(PIPELINE_NAME)).withColumn(
        "source_task", F.lit(task)
    )


def run_pipeline(
    spark: SparkSession,
    repos: DataFrame,
    store_root: str,
    signature: str,
    max_chunk_size: int = 512,
    compute_metrics: bool = True,
    force: bool = False,
    dedupe_documents: bool = False,
) -> dict:
    """Execute all stages over a repos(repo,path,commit,lang,content) frame.

    Returns {"tables": {name: DataFrame}, "metrics": {...}}. Stages committed
    under a matching signature are skipped (resume semantics).
    """
    store = TableStore(store_root)
    t0 = time.time()

    # S1-S4 ingest/identify/classify: content identity via sha256 (the per-row
    # invariant of input_hint), deterministic document id, document type.
    def build_documents() -> DataFrame:
        base = repos.select(
            "repo", "path", "commit", "lang", "content",
            F.sha2("content", 256).alias("content_sha"),
            F.concat_ws(":", "repo", "path").alias("document_id"),
            F.when(F.col("lang").isin(*CODE_LANGS), F.lit("code"))
            .otherwise(F.lit("text"))
            .alias("document_type"),
        )
        if dedupe_documents:
            # dedup without shuffling content: find duplicate ids on a thin
            # projection (tiny set), resolve only those rows by window rank
            dup_ids = (
                base.groupBy("document_id")
                .count()
                .where(F.col("count") > 1)
                .select("document_id")
            )
            from pyspark.sql.window import Window

            dups = (
                base.join(F.broadcast(dup_ids), "document_id")
                .withColumn(
                    "_r",
                    F.row_number().over(
                        Window.partitionBy("document_id").orderBy("content_sha")
                    ),
                )
                .where(F.col("_r") == 1)
                .drop("_r")
            )
            base = base.join(F.broadcast(dup_ids), "document_id", "left_anti").unionByName(dups)
        return _stamp(base, "ingest")

    documents = run_stage(
        store, spark, "documents", signature, build_documents, partition_by=["lang"]
    )

    # C1-C6 chunking. Only text-mode documents are chunked: code facts are
    # extracted from whole files (enola semantics), so chunking them would
    # burn 90% of the chunker budget producing rows nothing reads. The filter
    # hits the documents table's lang partitioning → partition-pruned scan.
    def build_chunks() -> DataFrame:
        text_docs = documents.where(~F.col("lang").isin(*CODE_LANGS))
        return _stamp(chunk_documents(text_docs, max_chunk_size=max_chunk_size), "chunk")

    chunks = run_stage(store, spark, "chunks", signature, build_chunks, partition_by=["lang"])

    # E1/E6/E8 extraction — one tall table, parsed once
    def build_extractions() -> DataFrame:
        code = extract_from_files(documents)
        nl = extract_from_chunks(chunks.where(~F.col("lang").isin(*CODE_LANGS)))
        return _stamp(code.unionByName(nl), "extract")

    extractions = run_stage(
        store, spark, "extractions", signature, build_extractions, partition_by=["mode"]
    )
    mentions = mentions_of(extractions)
    raw_edges = raw_edges_of(extractions)

    # L1-L9 linking + canonicalization
    def build_aliases() -> DataFrame:
        return _stamp(alias_map(mentions.where(F.col("mode") == "nl")), "link")

    aliases = run_stage(store, spark, "entity_aliases", signature, build_aliases).select(
        "name", "canonical"
    )

    def build_triples() -> DataFrame:
        resolved = resolve_code_edges(mentions, raw_edges)
        ct = code_triples(resolved)
        nt = nl_triples(raw_edges, aliases)
        return _stamp(ct.unionByName(nt), "materialize_triples")

    triples = run_stage(
        store, spark, "triples", signature, build_triples, partition_by=["pred"]
    )

    # canonical mention names (for contains edges + node kinds)
    def build_canonical_mentions() -> DataFrame:
        code_m = mentions.where(F.col("mode") == "code").withColumn(
            "canonical_name",
            F.when(
                F.col("kind").isin("dependency", "route"),
                normalize_identity_col(F.col("name")),
            ).otherwise(normalize_identity_col(F.concat_ws(":", "repo", "name"))),
        )
        nl_m = (
            mentions.where(F.col("mode") == "nl")
            .join(F.broadcast(aliases), "name", "left")
            .withColumn(
                "canonical_name",
                F.coalesce("canonical", normalize_identity_col(F.col("name"))),
            )
            .drop("canonical")
        )
        return _stamp(code_m.unionByName(nl_m), "canonicalize")

    canonical_mentions = run_stage(
        store, spark, "mentions", signature, build_canonical_mentions, partition_by=["mode"]
    )

    # K1-K4 materialize: nodes BEFORE edges (O9 write ordering)
    mention_kinds = (
        canonical_mentions.groupBy(F.col("canonical_name").alias("name"))
        .agg(F.min("kind").alias("kind"))
    )

    def build_nodes_stage() -> DataFrame:
        return _stamp(build_nodes(triples, mention_kinds), "nodes")

    nodes = run_stage(store, spark, "nodes", signature, build_nodes_stage)

    def build_types_stage() -> DataFrame:
        return _stamp(build_entity_types(nodes), "entity_types")

    entity_types = run_stage(
        store, spark, "entity_types", signature, build_types_stage, count_rows=False
    )

    def build_edges_stage() -> DataFrame:
        return _stamp(build_edges(triples, nodes), "edges")

    edges = run_stage(store, spark, "edges", signature, build_edges_stage, count_rows=False)

    def build_contains_stage() -> DataFrame:
        return _stamp(build_contains_edges(canonical_mentions), "contains")

    contains = run_stage(
        store, spark, "contains_edges", signature, build_contains_stage, count_rows=False
    )

    def build_histogram_stage() -> DataFrame:
        return _stamp(edge_type_histogram(triples), "edge_types")

    histogram = run_stage(
        store, spark, "edge_type_histogram", signature, build_histogram_stage, count_rows=False
    )

    metrics: dict = {"wall_sec": round(time.time() - t0, 3), "stages": store.checkpoints()}
    if compute_metrics:
        metrics["graph"] = graph_metrics(triples)

    return {
        "tables": {
            "documents": documents,
            "chunks": chunks,
            "extractions": extractions,
            "entity_aliases": aliases,
            "triples": triples,
            "mentions": canonical_mentions,
            "nodes": nodes,
            "entity_types": entity_types,
            "edges": edges,
            "contains_edges": contains,
            "edge_type_histogram": histogram,
        },
        "metrics": metrics,
    }


def main() -> None:
    parser = argparse.ArgumentParser(description="cognee_spark cognify pipeline")
    parser.add_argument("--n-files", type=int, default=1000, help="synthetic corpus size")
    parser.add_argument("--input", help="parquet path of an existing repos table")
    parser.add_argument("--out", required=True, help="output table store root")
    parser.add_argument("--max-chunk-size", type=int, default=512)
    parser.add_argument("--master", default=None)
    parser.add_argument("--no-metrics", action="store_true")
    parser.add_argument("--force", action="store_true", help="ignore checkpoints")
    args = parser.parse_args()

    from cognee_spark.session import get_spark
    from cognee_spark.sources.corpus import build_repos_df

    spark = get_spark(app_name="cognify", master=args.master)
    if args.input:
        repos = spark.read.parquet(args.input)
        signature = f"input:{args.input}"
    else:
        repos = build_repos_df(spark, args.n_files)
        signature = f"synthetic:{args.n_files}"
    result = run_pipeline(
        spark,
        repos,
        args.out,
        signature,
        max_chunk_size=args.max_chunk_size,
        compute_metrics=not args.no_metrics,
        force=args.force,
    )
    print(json.dumps(result["metrics"], indent=2, default=str))
    spark.stop()


if __name__ == "__main__":
    main()
