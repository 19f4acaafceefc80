"""E3 cascade extraction: node discovery rounds, relationship conditioning,
constrained triplets (reference: extract_graph_from_data_v2.py + cascade_extract/)."""

from __future__ import annotations

from cognee_spark.operators.cascade import (
    cascade_extract,
    cascade_extract_from_chunks,
    extract_candidate_nodes,
    extract_edge_triplets,
    extract_relationship_names,
)

TEXT = (
    "ZephyrService uses QuokkaRegistry. "
    "Maple Hub depends on Onyx Daemon. "
    "legacy-system extends ZephyrService. "
    "alpha worker calls into beta queue. "
    "Nothing relational in this sentence."
)


def test_phase1_rounds_widen_recall():
    r1 = extract_candidate_nodes(TEXT, n_rounds=1)
    r2 = extract_candidate_nodes(TEXT, n_rounds=2)
    assert "ZephyrService" in r1 and "QuokkaRegistry" in r1
    assert "Maple Hub" in r1 and "Onyx Daemon" in r1
    # round-2 relaxations: hyphenated + lowercase pairs near a relation phrase
    assert "legacy-system" not in r1 and "legacy-system" in r2
    assert "alpha worker" in r2 and "beta queue" in r2
    assert set(r1) <= set(r2)


def test_phase2_conditioned_on_nodes():
    nodes = extract_candidate_nodes(TEXT, n_rounds=2)
    rels = extract_relationship_names(TEXT, nodes, n_rounds=2)
    assert set(rels) == {"uses", "depends_on", "extends", "calls_into"}
    # with an impoverished node set, relations between unknown nodes vanish
    assert extract_relationship_names(TEXT, ["ZephyrService", "QuokkaRegistry"], 2) == ["uses"]


def test_phase3_constrained_triplets():
    nodes = extract_candidate_nodes(TEXT, n_rounds=2)
    rels = extract_relationship_names(TEXT, nodes, n_rounds=2)
    triplets = set(extract_edge_triplets(TEXT, nodes, rels))
    assert ("ZephyrService", "uses", "QuokkaRegistry") in triplets
    assert ("Maple Hub", "depends_on", "Onyx Daemon") in triplets
    assert ("legacy-system", "extends", "ZephyrService") in triplets
    # constraining to a narrower relationship list drops those edges
    narrowed = set(extract_edge_triplets(TEXT, nodes, ["uses"]))
    assert narrowed == {("ZephyrService", "uses", "QuokkaRegistry")}


def test_cascade_rows_match_v1_on_corpus_statements():
    """On the synthetic corpus's statement grammar, cascade output must agree
    with the v1 single-pass extractor (same downstream linking)."""
    from cognee_spark.operators.extraction import extract_nl
    from cognee_spark.sources.corpus import file_spec, render

    for idx in range(0, 400):
        spec = file_spec(idx, 400)
        if spec.lang != "md":
            continue
        text = render(spec)
        v1 = {(r["name"], r["rel"], r["dst"]) for r in extract_nl(text) if r["row_kind"] == "edge"}
        v2 = {(r["name"], r["rel"], r["dst"]) for r in cascade_extract(text) if r["row_kind"] == "edge"}
        assert v1 == v2, (idx, v1 ^ v2)


def test_cascade_dataframe_stage(spark):
    chunks = spark.createDataFrame(
        [("c1", TEXT, "sha", "r", "p", "md")],
        ["chunk_id", "text", "content_sha", "repo", "path", "lang"],
    )
    rows = cascade_extract_from_chunks(chunks).collect()
    edges = {(r.name, r.rel, r.dst) for r in rows if r.row_kind == "edge"}
    assert ("ZephyrService", "uses", "QuokkaRegistry") in edges
    mentions = {r.name for r in rows if r.row_kind == "mention"}
    assert {"ZephyrService", "QuokkaRegistry", "Maple Hub"} <= mentions
    assert all(r.mode == "nl" and r.content_sha == "sha" for r in rows)


def test_pipeline_with_cascade_extractor(spark, tmp_path):
    """§2.9 registry: run_pipeline(nl_extractor='cascade') swaps the NL
    kernel; on the corpus statement grammar the graph must be identical to
    the default extractor's."""
    from cognee_spark.pipeline import run_pipeline
    from cognee_spark.sources.corpus import build_repos_df

    repos = build_repos_df(spark, 120)
    a = run_pipeline(spark, repos, str(tmp_path / "a"), "reg:120",
                     compute_metrics=False, with_summaries=False, with_index=False)
    b = run_pipeline(spark, repos, str(tmp_path / "b"), "reg:120",
                     compute_metrics=False, with_summaries=False, with_index=False,
                     nl_extractor="cascade")
    ta = {(r.subj, r.pred, r.obj) for r in a["tables"]["triples"].collect()}
    tb = {(r.subj, r.pred, r.obj) for r in b["tables"]["triples"].collect()}
    assert ta == tb


def test_registry_rejects_unknown_kernel():
    import pytest as _pytest

    from cognee_spark.registry import NL_EXTRACTORS, resolve

    with _pytest.raises(ValueError):
        resolve(NL_EXTRACTORS, "nope")
    assert resolve(NL_EXTRACTORS, NL_EXTRACTORS["default"]) is NL_EXTRACTORS["default"]
