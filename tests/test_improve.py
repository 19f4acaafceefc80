"""Unified improve() verb (cognee_spark/improve.py) vs the reference's
staged improvement flow (api/v1/improve/improve.py:35-170)."""

from __future__ import annotations

from pyspark.sql import functions as F

from cognee_spark.improve import improve


def _tables(spark):
    edges = spark.createDataFrame(
        [("e1", 0.5), ("e2", 0.5)], "edge_object_id string, feedback_weight double"
    )
    triples = spark.createDataFrame(
        [("spark", "uses", "catalyst", "s1"), ("spark", "uses", "tungsten", "s2")],
        "subj string, pred string, obj string, content_sha string",
    )
    nodes = spark.createDataFrame(
        [("n1", "spark"), ("n2", "catalyst")], "entity_id string, name string"
    )
    summaries = spark.createDataFrame(
        [("su1", "spark summary"), ("su2", "catalyst summary")],
        "summary_id string, summary string",
    )
    return {"edges": edges, "triples": triples, "nodes": nodes, "summaries": summaries}


def _sessions(spark):
    return spark.createDataFrame(
        [
            ("u1", "s1", 0, "how to join?", "use broadcast."),
            ("u1", "s2", 0, "other?", "other answer."),
        ],
        "user_id string, session_id string, seq long, question string, answer string",
    )


def _entries(spark):
    return spark.createDataFrame(
        [
            ("s1", "e1", "2024-01-01", "spark", "joins",
             "Prefer broadcast joins for dimension tables.", 0, 0.9),
            ("s2", "e2", "2024-01-01", "spark", "joins",
             "Low-confidence note.", 0, 0.1),  # gated out
        ],
        "session_id string, entry_id string, created_at string, "
        "context_profile string, section string, content string, "
        "harmful_count int, confidence double",
    )


def test_feedback_derived_from_session_used_elements(spark, tmp_path):
    sessions = spark.createDataFrame(
        [
            ("u1", "s1", 0, "q?", "a.", 5, ["n1"], ["e1"], False),
            ("u1", "s1", 1, "q2?", "a2.", None, None, None, False),
        ],
        "user_id string, session_id string, seq long, question string, "
        "answer string, feedback_score int, used_node_ids array<string>, "
        "used_edge_ids array<string>, weights_applied boolean",
    )
    # session_ids scoping composes with the derived-events path
    out = improve(
        spark, str(tmp_path), _tables(spark),
        sessions=sessions, session_ids=["s1"],
    )
    assert out["feedback"]["status"] == "completed"
    w = {r.edge_object_id: r.feedback_weight
         for r in out["feedback"]["edges"].collect()}
    assert w["e1"] == 0.55 and w["e2"] == 0.5  # score 5: 0.5 + 0.1*(1-0.5)
    flags = {r.seq: r.weights_applied
             for r in out["feedback"]["applied_sessions"].collect()}
    assert flags == {0: True, 1: False}


def test_without_sessions_only_stage3_runs(spark, tmp_path):
    out = improve(spark, str(tmp_path), _tables(spark))
    assert out["feedback"]["status"] == "skipped"
    assert out["sessions"]["status"] == "skipped"
    assert out["distillation"]["status"] == "skipped"
    assert out["context_index"]["status"] == "skipped"
    assert out["truth"]["status"] == "skipped"
    emb = out["triplet_index"]["embeddings"]
    assert out["triplet_index"]["status"] == "completed"
    assert emb.count() == 2
    assert {r.text for r in emb.collect()} == {
        "spark-›uses-›catalyst", "spark-›uses-›tungsten"
    }


def test_node_name_scopes_stage3(spark, tmp_path):
    out = improve(
        spark, str(tmp_path), _tables(spark), node_name=["tungsten"]
    )
    assert [r.text for r in out["triplet_index"]["embeddings"].collect()] == [
        "spark-›uses-›tungsten"
    ]


def test_full_session_bridge(spark, tmp_path):
    feedback = spark.createDataFrame(
        [("e1", "s1", 0, 5)],
        "element_id string, session_id string, seq long, feedback_score int",
    )
    out = improve(
        spark, str(tmp_path), _tables(spark),
        sessions=_sessions(spark), entries=_entries(spark), feedback=feedback,
        session_ids=["s1"],
        build_global_context_index=True, build_truth_subspace=True,
    )
    # stage 1: rated edge moved up, unrated unchanged
    w = {r.edge_object_id: r.feedback_weight for r in out["feedback"]["edges"].collect()}
    assert w["e1"] > 0.5 and w["e2"] == 0.5
    # stage 2: only s1 persisted (session_ids scope)
    assert out["sessions"]["status"] == "completed"
    assert out["sessions"]["windows"] == 1
    # stage 2c: the gated s1 entry distilled into a lesson document
    assert out["distillation"]["status"] == "completed"
    assert out["distillation"]["lessons"] >= 1
    # stage 3 + 4 + truth all ran
    assert out["triplet_index"]["status"] == "completed"
    assert out["context_index"]["status"] == "completed"
    assert out["truth"]["status"] == "completed"
    coords = out["truth"]["coords"]
    assert coords.count() == 2 and "truth_alignment" in coords.columns


def test_feedback_gate_matches_edge_only_extraction_columns(spark, tmp_path):
    # an edge-only sessions frame (no used_node_ids column at all) must be
    # extracted, not silently skipped — the gate checks the columns the
    # kinds=("edge",) extraction actually reads
    edge_only = spark.createDataFrame(
        [
            ("u1", "s1", 0, "q?", "a.", 5, ["e1"], False),
        ],
        "user_id string, session_id string, seq long, question string, "
        "answer string, feedback_score int, used_edge_ids array<string>, "
        "weights_applied boolean",
    )
    out = improve(spark, str(tmp_path / "a"), _tables(spark), sessions=edge_only)
    assert out["feedback"]["status"] == "completed"
    w = {r.edge_object_id: r.feedback_weight
         for r in out["feedback"]["edges"].collect()}
    assert w["e1"] == 0.55 and w["e2"] == 0.5

    # a node-only frame lacks the edge columns: stage 1 skips cleanly
    # (no unresolved-column crash), leaving the entry unmarked for a pass
    # that can apply node weights
    node_only = spark.createDataFrame(
        [("u1", "s1", 0, "q?", "a.", 5, ["n1"])],
        "user_id string, session_id string, seq long, question string, "
        "answer string, feedback_score int, used_node_ids array<string>",
    )
    out2 = improve(spark, str(tmp_path / "b"), _tables(spark), sessions=node_only)
    assert out2["feedback"]["status"] == "skipped"


def test_distillation_time_is_zero_padded_chronological(spark, tmp_path, monkeypatch):
    # curator_batches orders blocks by the STRING time; the seq-derived key
    # must sort numerically for sessions with >= 10 turns ("02" < "10")
    from cognee_spark.operators import distillation as dist

    captured = {}

    def spy(spark_, root, qa, entries, **kw):
        captured["qa"] = qa
        return {"status": "no_gated_entries", "lessons": 0,
                "documents": None, "tables": None}

    monkeypatch.setattr(dist, "distill_sessions", spy)
    sessions = spark.createDataFrame(
        [("u1", "s1", s, f"q{s}?", f"a{s}.") for s in (0, 2, 10)],
        "user_id string, session_id string, seq long, question string, "
        "answer string",
    )
    improve(
        spark, str(tmp_path), _tables(spark),
        sessions=sessions, entries=_entries(spark),
    )
    rows = captured["qa"].orderBy("time").collect()
    assert [r.question for r in rows] == ["q0?", "q2?", "q10?"]
    assert all(len(r.time) == 12 for r in rows)
