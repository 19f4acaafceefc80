"""Cleanup/retention GC (cleanup_unused_data.py:27-172 semantics): cutoff
selection, hard-delete orphan cascade, dry-run report, and delete-as-commit
store integration."""

from __future__ import annotations

from pyspark.sql import functions as F

from cognee_spark.operators.cleanup import (
    cleanup_report,
    cleanup_unused_data,
    gc_graph,
    unused_documents,
)


def test_unused_documents_cutoff_and_null(spark):
    data = spark.createDataFrame(
        [("d1", "2024-01-05 00:00:00"), ("d2", "2024-01-20 00:00:00"), ("d3", None)],
        "document_id string, last_accessed string",
    ).withColumn("last_accessed", F.to_timestamp("last_accessed"))
    got = {r.document_id for r in unused_documents(data, "2024-01-10 00:00:00").collect()}
    assert got == {"d1", "d3"}  # stale AND never-accessed (reference or_ clause)


def _pipeline_tables(spark, tmp_path):
    from cognee_spark.pipeline import run_pipeline

    repos = spark.createDataFrame(
        [
            ("org0/a", "docs/a.md", "c0", "md",
             "ZephyrService uses QuokkaRegistry.\nZephyrService extends QuokkaRegistry.\n"),
            ("org0/b", "docs/b.md", "c0", "md",
             "ZephyrService uses MapleHub.\nMapleHub extends OrchidStore.\n"),
        ],
        ["repo", "path", "commit", "lang", "content"],
    )
    out = run_pipeline(
        spark, repos, str(tmp_path / "store"), "gc-fixture",
        compute_metrics=False, with_summaries=True, with_index=True,
    )
    return out["tables"]


def test_hard_delete_cascade_removes_orphans_and_only_orphans(spark, tmp_path):
    """Doc B goes stale: entities mentioned ONLY by B (maplehub, orchidstore)
    and their triples/embeddings are swept; the shared entity (zephyrservice)
    and everything reachable from doc A survive untouched."""
    tables = _pipeline_tables(spark, tmp_path)
    live_docs = tables["documents"].where(F.col("path") == "docs/a.md")

    kept = gc_graph(
        live_docs,
        tables["chunks"],
        tables["mentions"],
        tables["nodes"],
        tables["triples"],
        embeddings=tables["embeddings"],
        summaries=tables["summaries"],
        doc_col="content_sha",
    )
    names = {r.name for r in kept["nodes"].collect()}
    assert "zephyrservice" in names and "quokkaregistry" in names
    assert "maplehub" not in names and "orchidstore" not in names

    trips = {(r.subj, r.pred, r.obj) for r in kept["triples"].collect()}
    assert ("zephyrservice", "uses", "quokkaregistry") in trips
    assert not any("maplehub" in t for t in trips)

    # only-orphans: doc A's rows are ALL still there, bit-for-bit
    a_sha = live_docs.select("content_sha").first().content_sha
    before = {
        tuple(r) for r in tables["chunks"].where(F.col("content_sha") == a_sha).collect()
    }
    after = {tuple(r) for r in kept["chunks"].collect()}
    assert before == after

    # embeddings: swept entity vectors gone, survivor + type/edge-type/summary kept
    kept_items = {
        (r.collection, r.text)
        for r in kept["embeddings"].select("collection", "text").collect()
    }
    assert ("Entity_name", "zephyrservice") in kept_items
    assert ("Entity_name", "maplehub") not in kept_items
    assert any(c == "EdgeType_relationship_name" for c, _ in kept_items)
    assert any(c == "TextSummary_text" for c, _ in kept_items)


def test_report_counts_totals_kept_orphaned(spark, tmp_path):
    tables = _pipeline_tables(spark, tmp_path)
    live_docs = tables["documents"].where(F.col("path") == "docs/a.md")
    kept = gc_graph(
        live_docs, tables["chunks"], tables["mentions"], tables["nodes"],
        tables["triples"], doc_col="content_sha",
    )
    rep = {
        r.table_name: (r.n_total, r.n_kept, r.n_orphaned)
        for r in cleanup_report({k: tables[k] for k in kept}, kept).collect()
    }
    for total, kept_n, orphaned in rep.values():
        assert total == kept_n + orphaned
    assert rep["nodes"][2] >= 2  # maplehub + orchidstore swept
    assert rep["triples"][2] >= 2


def test_store_integration_deletes_are_new_commits_and_roll_back(spark, tmp_path):
    from cognee_spark.store import TableStore

    tables = _pipeline_tables(spark, tmp_path)
    store = TableStore(str(tmp_path / "store"))
    b_sha = (
        tables["documents"].where(F.col("path") == "docs/b.md")
        .select("content_sha").first().content_sha
    )
    data = tables["documents"].select(
        "content_sha",
        F.to_timestamp(
            F.when(F.col("content_sha") == b_sha, F.lit("2024-01-01 00:00:00"))
            .otherwise(F.lit("2024-02-01 00:00:00"))
        ).alias("last_accessed"),
    )
    # dry run: report only, nothing committed
    out = cleanup_unused_data(
        store, spark, tables, data, cutoff="2024-01-15 00:00:00", dry_run=True
    )
    assert out["committed"] == []
    assert store.read_checkpoint("gc_nodes") is None

    out = cleanup_unused_data(
        store, spark, tables, data, cutoff="2024-01-15 00:00:00", dry_run=False
    )
    assert "gc_nodes" in out["committed"] and "gc_triples" in out["committed"]
    # the sweep is a NEW commit: original tables untouched, gc tables smaller
    assert store.read_checkpoint("gc_nodes") is not None
    orig_nodes = tables["nodes"].count()
    gc_nodes = spark.read.parquet(store.path("gc_nodes")).count()
    assert gc_nodes < orig_nodes
    assert tables["nodes"].count() == orig_nodes  # not mutated in place

    # and rollback_to a pre-GC stage undoes the sweep commits
    rolled = store.rollback_to("triples")
    assert any(s.startswith("gc_") for s in rolled)
    assert store.read_checkpoint("gc_nodes") is None
