"""E7 temporal extraction: event/timestamp parsing, datapoint shaping,
entity attachment, interval queries (reference: cognee/tasks/temporal_graph)."""

from __future__ import annotations

import pytest

from cognee_spark.functions.ids import id_for_py
from cognee_spark.operators.temporal import (
    event_entity_edges,
    events_in_interval,
    events_to_datapoints,
    extract_events,
    extract_events_py,
)

TEXT = (
    "ZephyrService launched on 2021-03-04. "
    "QuokkaRegistry ran from 2019 to 2022! "
    "MapleHub was adopted in 1999. "
    "Migration happened between 2020-01-15 and 2020-06-30. "
    "This sentence has no dates at all."
)


def test_kernel_extraction_and_defaults():
    events = extract_events_py(TEXT)
    by_name = {e["name"]: e for e in events}
    assert len(events) == 4  # the dateless sentence is dropped
    assert by_name["ZephyrService launched on 2021-03-04"]["time_from"] == "2021-03-04 00:00:00"
    assert by_name["ZephyrService launched on 2021-03-04"]["time_to"] is None
    # year-only range: month/day default to 1 (models.py:5-17)
    r = by_name["QuokkaRegistry ran from 2019 to 2022"]
    assert r["time_from"] == "2019-01-01 00:00:00" and r["time_to"] == "2022-01-01 00:00:00"
    assert by_name["MapleHub was adopted in 1999"]["time_from"] == "1999-01-01 00:00:00"
    # two ISO dates → during interval
    m = by_name["Migration happened between 2020-01-15 and 2020-06-30"]
    assert m["time_from"] == "2020-01-15 00:00:00" and m["time_to"] == "2020-06-30 00:00:00"


def test_datapoints_and_enrichment(spark):
    chunks = spark.createDataFrame([("c1", TEXT, "sha1")], ["chunk_id", "text", "content_sha"])
    dp = events_to_datapoints(extract_events(chunks)).collect()
    assert len(dp) == 4
    by_name = {r.name: r for r in dp}
    at = by_name["ZephyrService launched on 2021-03-04"]
    assert at.temporal_kind == "at"
    assert at.description.endswith("\n---\nTime data: 2021-03-04 00:00:00")
    during = by_name["QuokkaRegistry ran from 2019 to 2022"]
    assert during.temporal_kind == "during"
    assert "Time data: 2019-01-01 00:00:00 to 2022-01-01 00:00:00" in during.description
    # deterministic reference-style ids
    assert at.event_id == id_for_py("Event", at.name)
    assert all(r.content_sha == "sha1" and r.chunk_id == "c1" for r in dp)


def test_entity_attachment(spark):
    chunks = spark.createDataFrame([("c1", TEXT, "s")], ["chunk_id", "text", "content_sha"])
    events = extract_events(chunks)
    edges = event_entity_edges(events).collect()
    pairs = {(r.event_id, r.entity_name) for r in edges}
    zid = id_for_py("Event", "ZephyrService launched on 2021-03-04")
    assert (zid, "ZephyrService") in pairs
    assert all(r.relationship == "involves" for r in edges)
    assert all(r.entity_id == id_for_py("Entity", r.entity_name) for r in edges)


def test_interval_query(spark):
    chunks = spark.createDataFrame([("c1", TEXT, "s")], ["chunk_id", "text", "content_sha"])
    dp = events_to_datapoints(extract_events(chunks))
    hits = events_in_interval(dp, "2020-01-01 00:00:00", "2021-12-31 00:00:00").collect()
    names = {r.name for r in hits}
    assert names == {
        "ZephyrService launched on 2021-03-04",
        "Migration happened between 2020-01-15 and 2020-06-30",
    }
    # open-ended bounds
    assert len(events_in_interval(dp, starts_at="2021-01-01 00:00:00").collect()) == 1
    assert len(events_in_interval(dp, ends_at="2000-01-01 00:00:00").collect()) == 1
    assert len(events_in_interval(dp).collect()) == 4


# --- temporal retriever (SearchType TEMPORAL, temporal_retriever.py:89-173) ------


def test_query_interval_parser_edge_cases():
    from cognee_spark.operators.temporal import extract_query_interval as qi

    # two-sided range at year granularity: end bound covers ALL of the end year
    assert qi("what happened from 2019 to 2021?") == (
        "2019-01-01 00:00:00", "2022-01-01 00:00:00",
    )
    assert qi("between 2020-01-15 and 2020-06-30") == (
        "2020-01-15 00:00:00", "2020-07-01 00:00:00",
    )
    # open-ended "since X" — no end bound
    assert qi("changes since 2023?") == ("2023-01-01 00:00:00", None)
    assert qi("deploys after 2024-02") == ("2024-02-01 00:00:00", None)
    # open-ended "until/before X" — no start bound
    assert qi("incidents before 2022") == (None, "2022-01-01 00:00:00")
    # point-in-time at each granularity → that unit's whole half-open window
    assert qi("launches in 2020") == ("2020-01-01 00:00:00", "2021-01-01 00:00:00")
    assert qi("launches in 2020-12") == ("2020-12-01 00:00:00", "2021-01-01 00:00:00")
    assert qi("outage on 2021-03-04") == ("2021-03-04 00:00:00", "2021-03-05 00:00:00")
    # day rollover across month/year ends
    assert qi("on 2021-12-31") == ("2021-12-31 00:00:00", "2022-01-01 00:00:00")
    # no date → (None, None): the triplet-search fallback trigger
    assert qi("who maintains ZephyrService?") == (None, None)


def test_query_interval_llm_seam_and_fallback():
    from cognee_spark.operators.temporal import extract_query_interval as qi

    good = lambda prompt: '{"starts_at": "2020-05-01 00:00:00", "ends_at": null}'
    assert qi("whenever", llm=good) == ("2020-05-01 00:00:00", None)
    # malformed LLM output falls back to the deterministic parser
    bad = lambda prompt: "not json at all"
    assert qi("changes since 2023", llm=bad) == ("2023-01-01 00:00:00", None)
    # LLM saying "no interval" ({null, null}) also defers to the parser
    empty = lambda prompt: '{"starts_at": null, "ends_at": null}'
    assert qi("changes since 2023", llm=empty) == ("2023-01-01 00:00:00", None)


def test_temporal_topk_window_overlap_and_score_order(spark):
    from cognee_spark.operators.temporal import temporal_topk_events

    rows = [
        # (event_id, description, time_from, time_to)
        ("e_at_in", "at inside", "2020-06-01 00:00:00", None),
        ("e_at_out", "at outside", "2023-01-01 00:00:00", None),
        ("e_during_overlap", "during overlapping", "2019-06-01 00:00:00", "2020-02-01 00:00:00"),
        ("e_during_before", "during before", "2018-01-01 00:00:00", "2019-12-31 00:00:00"),
        ("e_unscored", "no score", "2020-07-01 00:00:00", None),
    ]
    events = spark.createDataFrame(
        rows, "event_id string, description string, time_from string, time_to string"
    ).selectExpr(
        "event_id", "description",
        "to_timestamp(time_from) AS time_from", "to_timestamp(time_to) AS time_to",
    )
    scores = spark.createDataFrame(
        [("e_at_in", 0.3), ("e_during_overlap", 0.1), ("e_at_out", 0.0)],
        ["event_id", "score"],
    )
    top = temporal_topk_events(
        events, scores, "2020-01-01 00:00:00", "2021-01-01 00:00:00", k=5
    ).collect()
    got = [(r.rank, r.event_id) for r in sorted(top, key=lambda r: r.rank)]
    # during-event overlapping the window start is IN (span overlap, not
    # containment); pre-window during is OUT; post-window at is OUT even
    # though it has the best score; unscored event ranks last at +inf
    assert got == [(1, "e_during_overlap"), (2, "e_at_in"), (3, "e_unscored")]


def test_temporal_completion_context_and_fallbacks(spark):
    from cognee_spark.operators.temporal import (
        TEMPORAL_CONTEXT_SEPARATOR,
        temporal_completion,
    )

    events = spark.createDataFrame(
        [("e1", "first thing", "2020-02-01 00:00:00"),
         ("e2", "second thing", "2020-03-01 00:00:00")],
        "event_id string, description string, time_from string",
    ).selectExpr("event_id", "description", "to_timestamp(time_from) AS time_from")
    scores = spark.createDataFrame([("e1", 0.1), ("e2", 0.2)], ["event_id", "score"])

    out = temporal_completion(events, scores, "what happened in 2020?", k=5)
    assert not out["used_fallback"]
    assert out["context"] == "first thing" + TEMPORAL_CONTEXT_SEPARATOR + "second thing"

    # no time window in the question → triplet fallback
    out = temporal_completion(
        events, scores, "who did what?", triplet_fallback=lambda: "TRIPLETS"
    )
    assert out["used_fallback"] and out["context"] == "TRIPLETS" and out["events"] is None

    # window matches nothing → triplet fallback too (reference branch)
    out = temporal_completion(
        events, scores, "what happened in 1980?", triplet_fallback=lambda: "TRIPLETS"
    )
    assert out["used_fallback"] and out["context"] == "TRIPLETS"
