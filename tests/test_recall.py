"""Normalized search results (cognee_spark/recall.py) vs the reference's
normalize_search_payload.py semantics."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from cognee_spark.recall import KIND_BY_SEARCH_TYPE, normalize_search_results

UNIFORM_COLS = [
    "kind", "search_type", "text", "score",
    "dataset_id", "dataset_name", "metadata", "raw",
]


def test_chunk_frame_normalizes_with_provenance(spark):
    chunks = spark.createDataFrame(
        [
            ("c1", "d1", 0, "alpha text", 0.25),
            ("c2", "d1", 1, "", 0.50),  # empty text falls through to JSON
        ],
        "chunk_id string, doc_id string, chunk_index int, text string, score double",
    )
    out = normalize_search_results("CHUNKS", chunks, dataset_name="main")
    assert out.columns == UNIFORM_COLS
    rows = {r.metadata["chunk_id"]: r for r in out.collect()}
    r1 = rows["c1"]
    assert (r1.kind, r1.search_type) == ("chunk", "CHUNKS")
    assert r1.text == "alpha text"
    assert r1.score == 0.25
    assert r1.dataset_name == "main"
    assert r1.metadata == {"chunk_id": "c1", "data_id": "d1", "chunk_index": "0"}
    assert json.loads(r1.raw)["chunk_id"] == "c1"
    # empty preferred key → whole-row JSON fallback (_text_from_dict)
    r2 = rows["c2"]
    assert json.loads(r2.text)["chunk_id"] == "c2"


def test_completion_string_becomes_one_row(spark):
    out = normalize_search_results(
        "GRAPH_COMPLETION", "the answer", spark=spark
    )
    [row] = out.collect()
    assert row.kind == "graph_completion"
    assert row.text == "the answer"
    assert row.score is None
    assert json.loads(row.raw) == {"value": "the answer"}


def test_dict_payload_prefers_text_keys_and_keeps_raw(spark):
    payload = {"completion": "done", "context": "ctx", "extra": 1}
    out = normalize_search_results("RAG_COMPLETION", payload, spark=spark)
    [row] = out.collect()
    assert row.kind == "rag_completion"
    assert row.text == "done"
    assert json.loads(row.raw)["extra"] == 1


def test_unknown_search_type_maps_to_unknown_kind(spark):
    out = normalize_search_results("FEELING_LUCKY", ["x"], spark=spark)
    assert out.first().kind == "unknown"
    assert "FEELING_LUCKY" not in KIND_BY_SEARCH_TYPE


def test_no_text_columns_falls_back_to_row_json(spark):
    frame = spark.createDataFrame([(1, "a")], "x int, y string")
    out = normalize_search_results("CYPHER", frame)
    [row] = out.collect()
    assert row.kind == "cypher"
    assert json.loads(row.text) == {"x": 1, "y": "a"}
    assert row.metadata == {}


def test_normalization_is_pure_projection(spark):
    """No shuffle: the normalized plan over a parquet-free in-memory frame
    contains no Exchange."""
    chunks = spark.createDataFrame(
        [("c1", "t", 0.1)], "chunk_id string, text string, score double"
    )
    out = normalize_search_results("CHUNKS", chunks)
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan


def test_recall_routes_and_normalizes(spark):
    """recall() over a tiny pipeline-shaped tables dict returns the uniform
    frame for a DataFrame-shaped search type."""
    from cognee_spark.recall import recall

    tables = {
        "chunks": spark.createDataFrame(
            [("c1", "d1", "alpha beta", 0)],
            "chunk_id string, doc_id string, text string, chunk_index int",
        ),
        "summaries": spark.createDataFrame(
            [("s1", "short summary")], "summary_id string, summary string"
        ),
        "triples": spark.createDataFrame(
            [("a", "rel", "b", "sha")], "subj string, pred string, obj string, content_sha string"
        ),
    }
    out = recall(spark, tables, "CHUNKS", "alpha", dataset_name="ds")
    assert out.columns == UNIFORM_COLS
    assert out.count() >= 1
    assert out.first().kind == "chunk"
