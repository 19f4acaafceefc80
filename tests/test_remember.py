"""remember() typed-entry routing (operators/remember.py) vs the reference's
api/v1/remember dispatch + memory/entries.py validators."""

from __future__ import annotations

import json

from pyspark.sql import functions as F

from cognee_spark.operators import remember as R


def _entries(spark, rows):
    return spark.createDataFrame(
        rows, "entry_type string, user_id string, session_id string, seq long, payload string"
    )


def test_qa_and_untyped_routing_with_placeholder_skip(spark):
    rows = [
        ("qa", "u1", "s1", 0, json.dumps({"question": "q?", "answer": "a.", "context": "ctx"})),
        (None, "u1", "s1", 1, "plain note"),
        (None, "u1", "s1", 2, "  "),            # empty → skipped
        (None, "u1", "s1", 3, "[file: x.pdf]"),  # placeholder → skipped
        (None, "u1", "s1", 4, "[UploadFile]"),   # placeholder → skipped
    ]
    out = R.route_memory_entries(_entries(spark, rows))
    qa = {r.seq: (r.question, r.answer, r.context) for r in out["qa"].collect()}
    assert qa == {0: ("q?", "a.", "ctx"), 1: ("", "plain note", "")}
    # deterministic entry ids: same (user, session, seq) → same id
    again = R.route_memory_entries(_entries(spark, rows))
    assert (
        out["qa"].where(F.col("seq") == 0).first().entry_id
        == again["qa"].where(F.col("seq") == 0).first().entry_id
    )


def test_trace_rows_match_agent_trace_window_shape(spark):
    payload = json.dumps({
        "origin_function": "search_codebase", "status": "error",
        "method_return_value": "42", "error_message": "boom",
    })
    out = R.route_memory_entries(_entries(spark, [("trace", "u1", "s1", 5, payload)]))
    t = out["traces"].first()
    assert (t.origin_function, t.status, t.method_return_value, t.error_message) == (
        "search_codebase", "error", "42", "boom"
    )
    assert t.session_feedback is None
    # the frame is consumable by the existing agent-trace fold (a fresh
    # remember() has only raw content — session_feedback arrives via memify)
    from cognee_spark.operators.sessions import agent_trace_windows

    rendered = agent_trace_windows(out["traces"], raw_trace_content=True).first()
    assert rendered.n_steps == 1 and "42" in rendered.text


def test_feedback_applies_last_update_per_qa(spark):
    rows = [
        ("qa", "u1", "s1", 0, json.dumps({"question": "q?", "answer": "a."})),
        ("qa", "u1", "s1", 1, json.dumps({"question": "q2?", "answer": "a2."})),
    ]
    out = R.route_memory_entries(_entries(spark, rows))
    qa_id = out["qa"].where(F.col("seq") == 0).first().entry_id
    fb_rows = [
        ("feedback", "u1", "s1", 2, json.dumps({"qa_id": qa_id, "feedback_text": "meh", "feedback_score": 2})),
        ("feedback", "u1", "s1", 3, json.dumps({"qa_id": qa_id, "feedback_text": "good", "feedback_score": 5})),
    ]
    fb = R.route_memory_entries(_entries(spark, fb_rows))["feedback"]
    folded = {r.seq: (r.feedback_text, r.feedback_score)
              for r in R.apply_feedback(out["qa"], fb).collect()}
    assert folded[0] == ("good", 5)      # last update wins
    assert folded[1] == (None, None)     # untouched QA passes through


def test_skill_run_validation_rejects_like_the_reference(spark):
    def run(seq, **kw):
        body = {"run_id": f"r{seq}", "selected_skill_id": "sk1", **kw}
        return ("skill_run", "u1", "s1", seq, json.dumps(body))

    rows = [
        run(0),                                   # valid, unscored
        run(1, success_score=0.9, feedback=-0.5,
            tool_trace=[{"t": 1}, {"t": 2}], candidate_skill_ids=["a", "b", "c"]),
        run(2, success_score=1.5),                # invalid score
        run(3, feedback=2.0),                     # invalid feedback
        run(4, latency_ms=-1),                    # invalid ms
        ("skill_run", "u1", "s1", 5, json.dumps({"run_id": "r5"})),  # no skill id
    ]
    out = R.route_memory_entries(_entries(spark, rows))
    runs = {r.run_id: r for r in out["skill_runs"].collect()}
    assert set(runs) == {"r0", "r1"}
    assert runs["r0"].success_score == R.UNSCORED_SKILL_RUN_SCORE
    assert runs["r1"].n_tool_calls == 2 and runs["r1"].n_candidates == 3
    reasons = {r.seq: r.reason for r in out["rejected"].collect()}
    assert "success_score" in reasons[2]
    assert "feedback" in reasons[3]
    assert "non-negative" in reasons[4]
    assert "selected_skill_id" in reasons[5]
    # deterministic node id from run_id
    assert runs["r0"].skill_run_id == runs["r0"].skill_run_id
