"""SKILL.md ingestion (operators/skills.py) vs the reference semantics of
cognee/modules/tools/{skill_parser,ingest_skills,resolve_skills}.py."""

from __future__ import annotations

import hashlib
import uuid

import pytest

from cognee_spark.operators import skills as SK


def _write_skill(tmp_path, slug, text):
    d = tmp_path / slug
    d.mkdir(parents=True)
    (d / "SKILL.md").write_text(text, encoding="utf-8")
    return d


FULL = """---
description: Deploys the app to staging
allowed-tools: [bash, "git", edit]
author: Acme Corp
homepage: https://acme.example
version: 1.2.0
tags: deploy, ops
license: MIT
---
# Deploy

Run the deploy script.
"""

BARE = """---
ver: "0.1"
---
# Title heading

The first *real* paragraph becomes `the` description.

More text.
"""


def test_parse_skill_files_full_frontmatter(spark, tmp_path):
    d = _write_skill(tmp_path, "deployer", FULL)
    _write_skill(tmp_path, "empty", "")  # empty files drop
    out = SK.parse_skill_files(spark, str(tmp_path), source_repo="repo-url")
    [row] = out.collect()
    assert row.name == "deployer"
    assert row.description == "Deploys the app to staging"
    assert row.declared_tools == ["bash", "git", "edit"]
    assert row.maintainer == "Acme Corp"
    assert row.maintainer_url == "https://acme.example"
    assert row.skill_version == "1.2.0"
    assert row.tags == ["deploy", "ops"]
    assert row.license == "MIT"
    assert row.source_repo_url == "repo-url"
    assert row.procedure.startswith("# Deploy")
    # reference id parity: uuid5(SKILL_NAMESPACE, f"skill:{source_dir}:{name}")
    expect = str(uuid.uuid5(SK.SKILL_NAMESPACE, f"skill:{d}:deployer"))
    assert row.id == expect
    # content_hash parity: sha256 first 16 hex (skill_parser._content_hash)
    assert row.content_hash == hashlib.sha256(FULL.encode()).hexdigest()[:16]
    assert row.skill_text == "\n\n".join(
        ["deployer", "Deploys the app to staging", row.procedure]
    )


def test_description_falls_back_to_first_paragraph(spark, tmp_path):
    _write_skill(tmp_path, "bare", BARE)
    [row] = SK.parse_skill_files(spark, str(tmp_path)).collect()
    assert row.skill_version == "0.1"  # 'ver' alias, quotes stripped
    # heading skipped; markdown markers stripped (skill_parser:88-92)
    assert row.description == "The first real paragraph becomes the description."


def test_scope_and_resolve_skills(spark, tmp_path):
    _write_skill(tmp_path, "alpha", FULL)
    _write_skill(tmp_path, "beta", FULL)
    parsed = SK.parse_skill_files(spark, str(tmp_path))
    ds = "11111111-2222-4333-8444-555555555555"
    scoped = SK.scope_skills(parsed, ds)
    rows = {r.name: r for r in scoped.collect()}
    a = rows["alpha"]
    # _scoped_skill_id parity (ingest_skills.py:98-103)
    assert a.id == str(
        uuid.uuid5(uuid.NAMESPACE_URL, f"cognee:skill:{ds}:{a.source_dir}:alpha")
    )
    assert a.dataset_scope == [ds]
    assert a.node_set == "skills"

    got = SK.resolve_skills(scoped, ["beta", "alpha", "ghost", "beta"], ds)
    assert [r.name for r in got.collect()] == ["beta", "alpha"]  # order, dedup, skip
    with pytest.raises(ValueError):
        SK.resolve_skills(scoped, ["alpha"], "")
    # out-of-scope dataset resolves nothing
    assert SK.resolve_skills(scoped, ["alpha"], "other-ds").count() == 0


def test_parse_is_single_codegen_projection(spark, tmp_path):
    _write_skill(tmp_path, "alpha", FULL)
    out = SK.parse_skill_files(spark, str(tmp_path))
    plan = out._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan
    assert "BatchEvalPython" not in plan and "MapInPandas" not in plan
