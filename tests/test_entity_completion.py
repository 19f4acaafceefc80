"""Config-driven regex entity extraction (operators/entity_completion.py)
vs the reference's RegexEntityExtractor semantics (finditer per configured
pattern, Entity-per-match with templated description)."""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F

from cognee_spark.operators.entity_completion import (
    DEFAULT_REGEX_ENTITY_CONFIG,
    extract_regex_entities,
)


def _chunks(spark, rows):
    return spark.createDataFrame(rows, "chunk_id string, text string")


SAMPLE = (
    "Mail a@b.com or c.d+x@e.org, visit https://www.site.io/x?q=1 "
    "on 2024-01-31 or 12/02/2023 at 9:45 AM. Call +1 555-123-4567."
)


def test_matches_python_finditer_per_type(spark):
    out = extract_regex_entities(_chunks(spark, [("c1", SAMPLE)])).collect()
    got = {}
    for r in out:
        got.setdefault(r.entity_type, []).append((r.match_pos, r.name))
    for entry in DEFAULT_REGEX_ENTITY_CONFIG:
        expected = [
            m.group(0) for m in re.finditer(entry["regex"], SAMPLE)
        ]
        names = [n for _, n in sorted(got.get(entry["entity_name"], []))]
        assert names == expected, entry["entity_name"]
    assert [n for _, n in sorted(got["EMAIL"])] == ["a@b.com", "c.d+x@e.org"]


def test_description_template_and_deterministic_ids(spark):
    out = extract_regex_entities(_chunks(spark, [("c1", "ping a@b.com")]))
    row = out.where(F.col("entity_type") == "EMAIL").first()
    assert row.description == "Email address: a@b.com"
    again = extract_regex_entities(_chunks(spark, [("c2", "a@b.com twice")]))
    assert row.entity_id == again.first().entity_id  # same name → same Entity id


def test_null_and_empty_text_yield_no_entities(spark):
    rows = [("c1", None), ("c2", ""), ("c3", "no entities here")]
    assert extract_regex_entities(_chunks(spark, rows)).count() == 0


def test_custom_config_and_validation(spark):
    custom = [{
        "entity_name": "TICKET",
        "entity_description": "Entity type for ticket ids",
        "regex": r"[A-Z]{2,5}-\d+",
        "description_template": "Ticket: {}",
    }]
    out = extract_regex_entities(
        _chunks(spark, [("c1", "see JIRA-123 and AB-9")]), config=custom
    )
    assert [r.name for r in out.orderBy("match_pos").collect()] == [
        "JIRA-123", "AB-9"
    ]
    with pytest.raises(ValueError, match="Missing required fields"):
        extract_regex_entities(
            _chunks(spark, [("c1", "x")]), config=[{"entity_name": "X"}]
        )
    with pytest.raises(ValueError, match="Invalid regex pattern"):
        extract_regex_entities(
            _chunks(spark, [("c1", "x")]),
            config=[{
                "entity_name": "X", "entity_description": "d",
                "regex": "(", "description_template": "{}",
            }],
        )


def test_plan_is_pure_codegen(spark):
    plan = extract_regex_entities(
        _chunks(spark, [("c1", SAMPLE)])
    )._jdf.queryExecution().executedPlan().toString()
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
