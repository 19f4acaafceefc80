"""Session distillation (session_distillation/distill.py semantics): gate,
timeline batching, curator/writer seams with deterministic doubles, novelty
rejection, rendered documents landing in the graph under the truth-session
node set."""

from __future__ import annotations

from pyspark.sql import functions as F

from cognee_spark.operators.distillation import (
    DISTILLATE_NODE_SET,
    accept_lessons,
    curator_batches,
    distill_sessions,
    gated_entries,
    propose_lessons,
    reference_distillation_llm,
)


def _entries(spark, rows=None):
    rows = rows if rows is not None else [
        ("s1", "e1", "2024-01-01 10:01:00", "default", "notes",
         "ZephyrService uses QuokkaRegistry.", 0, 0.9),
        ("s1", "e2", "2024-01-01 10:02:00", "default", "notes",
         "low confidence thing", 0, 0.5),            # gated out: confidence
        ("s1", "e3", "2024-01-01 10:03:00", "default", "notes",
         "harmful thing", 2, 0.95),                  # gated out: harmful
    ]
    return spark.createDataFrame(
        rows,
        "session_id string, entry_id string, created_at string, "
        "context_profile string, section string, content string, "
        "harmful_count int, confidence double",
    )


def _qa(spark):
    return spark.createDataFrame(
        [("s1", "2024-01-01 10:00:00", "What is  Zephyr?", "A   service.")],
        "session_id string, time string, question string, answer string",
    )


def test_gate_confidence_and_harmful(spark):
    got = {r.entry_id for r in gated_entries(_entries(spark)).collect()}
    assert got == {"e1"}


def test_batches_render_timeline_in_order_with_caps(spark):
    entries = gated_entries(_entries(spark))
    b = curator_batches(_qa(spark), entries).collect()
    assert len(b) == 1 and b[0].batch_id == 0
    # QA block first (earlier time), whitespace collapsed; candidate after
    assert b[0].batch_text == (
        "User: What is Zephyr?\nAssistant: A service.\n\n"
        "Candidate e1 [default/notes]: ZephyrService uses QuokkaRegistry."
    )
    # 6 blocks per batch (CURATOR_BLOCKS_PER_BATCH)
    many = _entries(spark, [
        ("s1", f"e{i}", f"2024-01-01 10:{i:02d}:00", "p", "s", f"content {i}", 0, 0.9)
        for i in range(8)
    ])
    bb = curator_batches(_qa(spark), many).collect()
    assert {r.batch_id for r in bb} == {0, 1}  # 9 blocks → batches of 6 + 3


def test_curator_double_proposes_per_candidate(spark):
    batches = curator_batches(_qa(spark), gated_entries(_entries(spark)))
    lessons = propose_lessons(batches, reference_distillation_llm).collect()
    assert len(lessons) == 1
    assert lessons[0].working_statement == "ZephyrService uses QuokkaRegistry."
    assert lessons[0].member_entry_ids == ["e1"]


def test_writer_rejects_already_known_via_novelty(spark):
    lessons = spark.createDataFrame(
        [("s1", "ZephyrService uses QuokkaRegistry.", ["e1"]),
         ("s1", "MapleHub extends OrchidStore.", ["e2"])],
        "session_id string, working_statement string, member_entry_ids array<string>",
    )
    prior = spark.createDataFrame(
        [("zephyrservice uses quokkaregistry.",)], ["text"]
    )
    accepted = accept_lessons(
        lessons, reference_distillation_llm, prior_lessons=prior
    ).collect()
    # the lesson matching a previously-persisted one is rejected already_known
    assert {r.statement for r in accepted} == {"MapleHub extends OrchidStore."}


def test_writer_anchors_glossary_entities(spark):
    lessons = spark.createDataFrame(
        [("s1", "ZephyrService uses QuokkaRegistry.", ["e1"])],
        "session_id string, working_statement string, member_entry_ids array<string>",
    )
    glossary = spark.createDataFrame(
        [("ZephyrService",), ("UnrelatedThing",)], ["text"]
    )
    row = accept_lessons(
        lessons, reference_distillation_llm, glossary_entities=glossary
    ).first()
    assert row.entities == ["ZephyrService"]


def test_distill_lands_lessons_under_truth_session_node_set(spark, tmp_path):
    out = distill_sessions(
        spark, str(tmp_path / "store"), _qa(spark), _entries(spark),
        distilled_on="2024-02-01",
    )
    assert out["status"] == "completed" and out["lessons"] == 1
    docs = out["documents"].collect()
    assert docs[0].repo == f"{DISTILLATE_NODE_SET}/s1"  # truth-session set
    assert docs[0].content == (
        "# Session learning — 2024-02-01 (session s1)\n\n"
        "ZephyrService uses QuokkaRegistry.\n"
    )
    # the lesson is cognified: its entities/triple are graph nodes now
    names = {r.name for r in out["tables"]["nodes"].collect()}
    assert "zephyrservice" in names and "quokkaregistry" in names
    trips = {(r.subj, r.pred, r.obj) for r in out["tables"]["triples"].collect()}
    assert ("zephyrservice", "uses", "quokkaregistry") in trips


def test_render_includes_why_suffix_when_present(spark):
    from cognee_spark.operators.distillation import render_lesson_documents

    accepted = spark.createDataFrame(
        [("s1", "X uses Y.", ["X"], "it kept failing."),
         ("s1", "A extends B.", [], "")],
        "session_id string, statement string, entities array<string>, why_learned string",
    )
    got = {r.content for r in render_lesson_documents(accepted, "2024-02-01").collect()}
    # reference template: "{statement} ({why}.)" with trailing dots trimmed,
    # bare statement when why is empty (render_lesson_document)
    assert got == {
        "# Session learning — 2024-02-01 (session s1)\n\nX uses Y. (it kept failing.)\n",
        "# Session learning — 2024-02-01 (session s1)\n\nA extends B.\n",
    }


def test_distill_status_vocabulary(spark, tmp_path):
    none_gated = _entries(spark).where(F.col("entry_id") == "e2")
    out = distill_sessions(spark, str(tmp_path / "s1"), _qa(spark), none_gated)
    assert out["status"] == "no_gated_entries"
    # all proposals rejected as already_known → no_accepted_lessons
    prior = spark.createDataFrame([("zephyrservice uses quokkaregistry.",)], ["text"])
    out = distill_sessions(
        spark, str(tmp_path / "s2"), _qa(spark), _entries(spark),
        prior_lessons=prior,
    )
    assert out["status"] == "no_accepted_lessons"
