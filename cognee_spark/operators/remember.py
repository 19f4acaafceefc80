"""Unified memory-write routing — the reference's ``cognee.remember()``
typed-entry path (api/v1/remember/remember.py:43-260, memory/entries.py:
23-125) re-expressed as one dataflow split.

The reference dispatches each MemoryEntry object at call time: QAEntry →
``SessionManager.add_qa``, TraceEntry → ``add_agent_trace_step``,
FeedbackEntry → ``add_feedback`` (an update to an earlier QA), SkillRunEntry
→ graph-backed SkillRun datapoints (tools/skill_runs.py:70-170); untyped
payloads become a question-less QA turn unless they are file-upload
placeholders (remember.py:137-176 ``_add_to_session``). One entry = one
asyncio call there; here a frame of entries splits into the four
destination tables with type filters + ``from_json`` projections — zero
Python rows, one pass over the input.

Validation parity: the reference's pydantic validators REJECT out-of-range
scores per entry; a distributed batch must not die on one bad row, so
invalid rows land in a ``rejected`` frame with a reason column (the same
fail-open-per-batch rule operators/distillation.py uses for its curator
batches).

Entry frames carry (entry_type, user_id, session_id, seq, payload) where
payload is the entry's JSON body — the polymorphic-fields-as-raw-JSON
pattern sources/memory_stores.py established. ``seq`` replaces arrival
order (meaningless under partitioning) exactly as it does there.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from cognee_spark.functions.ids import id_for_col

# file-upload payloads coerce to these placeholder strings; useless in the
# session cache (remember.py:137 _SESSION_PLACEHOLDER_PREFIXES)
PLACEHOLDER_PREFIXES = ("[UploadFile]", "[file:", "[BinaryIO", "[SpooledTemporaryFile")

UNSCORED_SKILL_RUN_SCORE = 0.5  # engine/models/SkillRun.py:7

_QA_SCHEMA = (
    "question string, answer string, context string, "
    "feedback_text string, feedback_score int"
)
_TRACE_SCHEMA = (
    "origin_function string, status string, method_return_value string, "
    "memory_query string, memory_context string, error_message string"
)
_FEEDBACK_SCHEMA = "qa_id string, feedback_text string, feedback_score int"
_SKILL_RUN_SCHEMA = (
    "run_id string, selected_skill_id string, task_text string, "
    "result_summary string, success_score double, feedback double, "
    "error_type string, error_message string, started_at_ms long, "
    "latency_ms long, candidate_skill_ids array<string>, "
    "task_pattern_id string, router_version string, "
    "tool_trace array<string>, node_set string"
)


def qa_entry_id(user_id, session_id, seq):
    """The entry id a later FeedbackEntry chains to via ``qa_id``
    (entries.py:70-77) — deterministic, so replayed remembers upsert."""
    return id_for_col(
        "QAEntry", user_id, session_id, seq.cast("string")
    )


def route_memory_entries(entries: DataFrame) -> dict[str, DataFrame]:
    """Split a typed-entry frame into its destination tables.

    Returns ``{"qa", "traces", "feedback", "skill_runs", "rejected"}``:

    - ``qa``          → (user_id, session_id, seq, question, answer,
      context, entry_id) rows in the shape
      :func:`~cognee_spark.operators.sessions.session_windows` folds;
      untyped rows (NULL entry_type) become question-less turns, with
      empty and placeholder payloads skipped;
    - ``traces``      → agent-trace step rows in the
      :func:`~cognee_spark.operators.sessions.agent_trace_windows` shape;
    - ``feedback``    → (qa_id, feedback_text, feedback_score) updates;
    - ``skill_runs``  → graph-backed run records with the reference's
      unscored default and deterministic node ids;
    - ``rejected``    → rows the reference's validators would refuse,
      with a ``reason``.
    """
    t = F.coalesce(F.col("entry_type"), F.lit("untyped"))

    qa_typed = entries.where(t == "qa").select(
        "user_id", "session_id", "seq",
        F.from_json("payload", _QA_SCHEMA).alias("_e"),
    ).select(
        "user_id", "session_id", "seq",
        F.coalesce(F.col("_e.question"), F.lit("")).alias("question"),
        F.coalesce(F.col("_e.answer"), F.lit("")).alias("answer"),
        F.coalesce(F.col("_e.context"), F.lit("")).alias("context"),
    )
    raw_text = F.coalesce(F.col("payload"), F.lit(""))
    untyped = entries.where(t == "untyped").select(
        "user_id", "session_id", "seq",
        F.lit("").alias("question"),
        F.trim(raw_text).alias("answer"),
        F.lit("").alias("context"),
    )
    skip = F.col("answer") == ""
    for p in PLACEHOLDER_PREFIXES:
        skip = skip | F.col("answer").startswith(p)
    untyped = untyped.where(~skip)
    qa = qa_typed.unionByName(untyped).withColumn(
        "entry_id",
        qa_entry_id(F.col("user_id"), F.col("session_id"), F.col("seq")),
    )

    traces = entries.where(t == "trace").select(
        "user_id", "session_id",
        F.col("seq").cast("long").alias("seq"),
        F.from_json("payload", _TRACE_SCHEMA).alias("_e"),
    ).select(
        "user_id", "session_id", "seq",
        F.lit(None).cast("string").alias("session_feedback"),
        F.col("_e.method_return_value").alias("method_return_value"),
        F.coalesce(F.col("_e.origin_function"), F.lit("")).alias("origin_function"),
        F.coalesce(F.col("_e.status"), F.lit("success")).alias("status"),
        F.coalesce(F.col("_e.error_message"), F.lit("")).alias("error_message"),
    )

    feedback = entries.where(t == "feedback").select(
        "user_id", "session_id", "seq",
        F.from_json("payload", _FEEDBACK_SCHEMA).alias("_e"),
    ).select(
        "user_id", "session_id", "seq",
        F.col("_e.qa_id").alias("qa_id"),
        F.col("_e.feedback_text").alias("feedback_text"),
        F.col("_e.feedback_score").alias("feedback_score"),
    )

    runs_raw = entries.where(t == "skill_run").select(
        "user_id", "session_id", "seq",
        F.from_json("payload", _SKILL_RUN_SCHEMA).alias("_e"),
    ).select("user_id", "session_id", "seq", F.col("_e.*"))
    score_bad = F.col("success_score").isNotNull() & (
        (F.col("success_score") < 0.0) | (F.col("success_score") > 1.0)
    )
    fb = F.coalesce(F.col("feedback"), F.lit(0.0))
    feedback_bad = (fb < -1.0) | (fb > 1.0)
    ms_bad = (F.coalesce(F.col("started_at_ms"), F.lit(0)) < 0) | (
        F.coalesce(F.col("latency_ms"), F.lit(0)) < 0
    )
    missing_skill = F.coalesce(F.col("selected_skill_id"), F.lit("")) == ""
    bad = score_bad | feedback_bad | ms_bad | missing_skill
    rejected = runs_raw.where(bad).select(
        "user_id", "session_id", "seq",
        F.when(score_bad, "success_score must be in range [0.0, 1.0]")
        .when(feedback_bad, "feedback must be in range [-1.0, 1.0]")
        .when(ms_bad, "timestamp and latency fields must be non-negative")
        .otherwise("selected_skill_id is required").alias("reason"),
    )
    skill_runs = runs_raw.where(~bad).select(
        id_for_col("SkillRun", F.col("run_id")).alias("skill_run_id"),
        "run_id", "user_id", "session_id",
        "selected_skill_id", "task_text", "result_summary",
        F.coalesce(F.col("success_score"), F.lit(UNSCORED_SKILL_RUN_SCORE))
        .alias("success_score"),
        fb.alias("feedback"),
        F.coalesce(F.col("error_type"), F.lit("")).alias("error_type"),
        F.coalesce(F.col("error_message"), F.lit("")).alias("error_message"),
        F.coalesce(F.col("started_at_ms"), F.lit(0)).alias("started_at_ms"),
        F.coalesce(F.col("latency_ms"), F.lit(0)).alias("latency_ms"),
        F.size(F.coalesce(F.col("candidate_skill_ids"), F.array()))
        .alias("n_candidates"),
        F.size(F.coalesce(F.col("tool_trace"), F.array())).alias("n_tool_calls"),
        F.coalesce(F.col("node_set"), F.lit("skills")).alias("node_set"),
    )
    return {
        "qa": qa,
        "traces": traces,
        "feedback": feedback,
        "skill_runs": skill_runs,
        "rejected": rejected,
    }


def apply_feedback(qa: DataFrame, feedback: DataFrame) -> DataFrame:
    """Fold feedback updates onto their QA rows — ``add_feedback``'s
    update-not-insert semantics (entries.py:63-69): last update per qa_id
    (by the feedback row's seq) wins; QA rows without feedback pass through
    with NULL feedback columns."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("qa_id").orderBy(F.desc("seq"))
    latest = (
        feedback.where(F.col("qa_id").isNotNull())
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select("qa_id", "feedback_text", "feedback_score")
    )
    return qa.join(
        latest.withColumnRenamed("qa_id", "entry_id"), "entry_id", "left"
    ).select(*qa.columns, "feedback_text", "feedback_score")
