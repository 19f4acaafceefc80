"""Unified SearchType dispatch (get_search_type_retriever_instance +
search.py semantics): routing, seams, FEELING_LUCKY selection, unsupported
types."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cognee_spark.search import (
    UnsupportedSearchType,
    search,
    select_search_type,
)


@pytest.fixture(scope="module")
def tables(spark):
    chunks = spark.createDataFrame(
        [("c1", "spark runs the query engine"), ("c2", "maple syrup recipe")],
        ["chunk_id", "text"],
    )
    summaries = spark.createDataFrame(
        [("sm1", "spark query engine summary."), ("sm2", "cooking summary.")],
        ["summary_id", "summary"],
    )
    nodes = spark.createDataFrame(
        [("n1", "pkg.mod.fn_query", "function"), ("n2", "zephyr", "entity")],
        ["entity_id", "name", "kind"],
    )
    triples = spark.createDataFrame(
        [("zephyr", "uses", "quokka"), ("maple", "extends", "quokka")],
        ["subj", "pred", "obj"],
    )
    events = spark.createDataFrame(
        [("e1", "launch event", "2020-02-01 00:00:00")],
        "event_id string, description string, time_from string",
    ).selectExpr("event_id", "description", "to_timestamp(time_from) AS time_from")
    return {
        "chunks": chunks, "summaries": summaries, "nodes": nodes,
        "triples": triples, "events": events,
    }


def test_rank_list_types_route_to_their_retrievers(spark, tables):
    top = search(spark, tables, "CHUNKS_LEXICAL", "spark query", top_k=5)
    assert top.first().doc_id == "c1"  # lexical overlap picks the spark chunk
    top = search(spark, tables, "SUMMARIES", "spark query engine summary.", top_k=1)
    assert top.first().item_id == "sm1"  # exact text → cosine 1.0
    top = search(spark, tables, "CHUNKS", "spark runs the query engine", top_k=1)
    assert top.first().item_id == "c1"
    top = search(spark, tables, "TRIPLET_COMPLETION", "zephyr-›uses-›quokka", top_k=1)
    assert top.first().text == "zephyr-›uses-›quokka"
    hybrid = search(spark, tables, "HYBRID_COMPLETION", "spark query", top_k=2)
    assert "fuse_rank" in hybrid.columns and hybrid.count() >= 1
    code = search(spark, tables, "CODE", "q", needle="fn_query")
    assert [r.name for r in code.collect()] == ["pkg.mod.fn_query"]


def test_completion_types_return_prompts_and_use_seams(spark, tables):
    prompt = search(spark, tables, "GRAPH_COMPLETION", "what uses quokka?", top_k=2)
    assert "what uses quokka?" in prompt and "--[" in prompt
    prompt = search(spark, tables, "RAG_COMPLETION", "spark?", top_k=1)
    assert "spark?" in prompt  # no llm → the assembled prompt comes back
    out = search(
        spark, tables, "RAG_COMPLETION", "spark?", top_k=1,
        llm=lambda kind, p: f"[{kind}]",
    )
    assert out == "[completion]"
    out = search(spark, tables, "NATURAL_LANGUAGE", "how many function nodes")
    assert out.first().n == 1  # template generator answers over kg_nodes


def test_temporal_routes_through_window_and_falls_back(spark, tables):
    out = search(spark, tables, "TEMPORAL", "what happened in 2020?", top_k=3)
    assert not out["used_fallback"]
    assert out["context"] == "launch event"
    # no window in the question → the GRAPH_COMPLETION fallback string
    out = search(spark, tables, "TEMPORAL", "who uses quokka?", top_k=2)
    assert out["used_fallback"] and "who uses quokka?" in out["context"]


def test_feeling_lucky_selection_and_unsupported(spark, tables):
    assert select_search_type("what changed since 2023?") == "TEMPORAL"
    assert select_search_type("how many nodes are there?") == "NATURAL_LANGUAGE"
    assert select_search_type("tell me about zephyr") == "GRAPH_COMPLETION"
    # llm seam wins when it names a valid type; garbage falls back
    assert select_search_type("x", llm=lambda k, p: "CHUNKS") == "CHUNKS"
    assert select_search_type("x", llm=lambda k, p: "NOT_A_TYPE") == "GRAPH_COMPLETION"
    with pytest.raises(UnsupportedSearchType):
        search(spark, tables, "AGENTIC_COMPLETION", "q")
    with pytest.raises(UnsupportedSearchType):
        search(spark, {"triples": tables["triples"]}, "TEMPORAL", "in 2020?")
