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
