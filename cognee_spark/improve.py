"""The unified ``improve()`` verb — the reference's graph self-improvement
entry point (cognee/api/v1/improve/improve.py:35-170), which bridges
finished sessions into the permanent graph in four stages:

1. apply feedback weights — rated answers update the ``feedback_weight``
   of the graph elements that produced them;
2. persist session Q&A — cognified under ``user_sessions_from_cache``;
2c. distill sessions — gated guidance curated into lessons and cognified
   under ``session_learnings``;
3. default enrichment — triplet embeddings extracted and indexed (the
   only stage that runs without ``session_ids``);
4. global context index — optional, over the graph's text summaries;
plus an optional truth-subspace build over the distilled lessons.

Spark re-expression: each stage is an existing tested dataflow
(operators/feedback, sessions, distillation, indexing, context_index,
truth) — improve() is their composition over one store root, with the
reference's stage gating (no sessions → stage 3 only) and per-stage
status reporting. The reference processes one dataset per asyncio call;
here every frame is dataset-partitionable, so a backlog of datasets is a
caller-side loop over partition filters, not a new mechanism.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def improve(
    spark: SparkSession,
    store_root: str,
    tables: dict[str, DataFrame],
    *,
    sessions: DataFrame | None = None,
    entries: DataFrame | None = None,
    feedback: DataFrame | None = None,
    session_ids: list[str] | None = None,
    watermarks: DataFrame | None = None,
    node_name: list[str] | None = None,
    build_global_context_index: bool = False,
    build_truth_subspace: bool = False,
    dataset_id: str = "main_dataset",
    llm=None,
    feedback_alpha: float | None = None,
) -> dict:
    """Run the improvement stages over an existing graph's tables.

    ``tables`` is a pipeline-output dict; stages use what is present:
    ``edges`` (stage 1 write-back), ``triples`` (stage 3), ``summaries``
    (stage 4). ``sessions``/``entries``/``feedback`` are the session-cache
    frames in the shapes operators/sessions + distillation + feedback
    document; ``session_ids`` scopes them (improve.py:39 ``session_ids=``).
    ``node_name`` filters stage 3 to triples touching the named entities
    (improve.py:38 ``node_name=``).

    Returns per-stage results: {"feedback", "sessions", "distillation",
    "triplet_index", "context_index", "truth"} — each either a result
    payload or {"status": "skipped", "reason": ...}.
    """
    from cognee_spark.operators.distillation import distill_sessions
    from cognee_spark.operators.feedback import (
        apply_feedback_to_edges,
        feedback_weight_updates,
    )
    from cognee_spark.operators.indexing import build_triplet_index
    from cognee_spark.operators.sessions import persist_sessions

    out: dict = {}

    def _scope(df: DataFrame | None) -> DataFrame | None:
        if df is None or session_ids is None:
            return df
        return df.where(F.col("session_id").isin(*session_ids))

    # --- stage 1: feedback weights (improve.py stage 1) ---------------------
    # the reference derives events from the sessions themselves
    # (extract_feedback_qas over session_ids); when the sessions frame
    # carries used-element ids, do the same — an explicit feedback frame
    # overrides
    applied_sessions = None
    # edge-only extraction reads exactly these columns (only edge weights
    # exist in the tables dict) — gating on them, not on used_node_ids,
    # so a node-only sessions frame is skipped instead of crashing and an
    # edge-only frame is extracted instead of silently dropped
    _edge_feedback_cols = {"used_edge_ids", "weights_applied", "feedback_score"}
    if feedback is not None:
        feedback = _scope(feedback)  # explicit frames carry session_id
    elif sessions is not None and _edge_feedback_cols <= set(sessions.columns):
        from cognee_spark.operators.feedback import extract_feedback_events

        # derived events are session-scoped BEFORE extraction (the events
        # frame itself has no session_id column); only edge weights exist
        # in the tables dict, so extraction runs in edge-only mode — an
        # entry naming only node elements stays UNMARKED and eligible for
        # a pass that can apply node weights, instead of being consumed
        # with no weight ever changing
        extracted = extract_feedback_events(_scope(sessions), kinds=("edge",))
        feedback = extracted["events"]
        applied_sessions = extracted["applied"]
    if feedback is not None and "edges" in tables:
        kwargs = {} if feedback_alpha is None else {"alpha": feedback_alpha}
        updates = feedback_weight_updates(
            feedback,
            current=tables["edges"].select(
                F.col("edge_object_id").alias("element_id"), "feedback_weight"
            ),
            **kwargs,
        )
        out["feedback"] = {
            "status": "completed",
            "edges": apply_feedback_to_edges(tables["edges"], updates),
        }
        if applied_sessions is not None:
            # the caller commits this back — the reference's mark-on-success
            out["feedback"]["applied_sessions"] = applied_sessions
    else:
        out["feedback"] = {"status": "skipped", "reason": "no feedback frame"}

    # --- stage 2: persist session Q&A (improve.py stage 2) ------------------
    if sessions is not None:
        out["sessions"] = {
            "status": "completed",
            **persist_sessions(
                spark, f"{store_root}/sessions", _scope(sessions), watermarks
            ),
        }
    else:
        out["sessions"] = {"status": "skipped", "reason": "no sessions frame"}

    # --- stage 2c: distillation (improve.py stage 2c) ------------------------
    if sessions is not None and entries is not None:
        # curator_batches orders blocks by the string `time`; zero-pad the
        # numeric seq so sessions with >=10 turns keep chronological order
        # ("02" < "10", unlike lexicographic "10" < "2")
        qa = _scope(sessions).select(
            "session_id",
            F.lpad(F.col("seq").cast("string"), 12, "0").alias("time"),
            "question", "answer",
        )
        out["distillation"] = distill_sessions(
            spark, f"{store_root}/distill", qa, _scope(entries), llm=llm
        )
    else:
        out["distillation"] = {"status": "skipped", "reason": "no entries frame"}

    # --- stage 3: default enrichment — triplet embeddings (always) ----------
    if "triples" in tables:
        triples = tables["triples"]
        if node_name:
            triples = triples.where(
                F.col("subj").isin(*node_name) | F.col("obj").isin(*node_name)
            )
        out["triplet_index"] = {
            "status": "completed",
            "embeddings": build_triplet_index(triples),
        }
    else:
        out["triplet_index"] = {"status": "skipped", "reason": "no triples table"}

    # --- stage 4: global context index (opt-in) ------------------------------
    if build_global_context_index and "summaries" in tables:
        from cognee_spark.operators.context_index import build_context_index

        out["context_index"] = {
            "status": "completed",
            **build_context_index(
                spark, tables["summaries"], dataset_id=dataset_id, llm=llm
            ),
        }
    else:
        out["context_index"] = {
            "status": "skipped",
            "reason": "not requested" if not build_global_context_index
            else "no summaries table",
        }

    # --- truth subspace over the distilled lessons (opt-in) ------------------
    if build_truth_subspace:
        docs = (out["distillation"] or {}).get("documents")
        nodes = tables.get("nodes")
        if docs is not None and nodes is not None:
            from cognee_spark.operators.truth import (
                build_truth_subspace as _build_truth,
            )

            learnings = docs.select(F.col("content").alias("statement"))
            out["truth"] = {
                "status": "completed",
                **_build_truth(
                    spark,
                    learnings,
                    nodes.select(
                        F.col("entity_id").alias("node_id"),
                        F.col("name").alias("text"),
                    ),
                    dataset_id=dataset_id,
                ),
            }
        else:
            out["truth"] = {
                "status": "skipped",
                "reason": "no distilled lessons" if nodes is not None
                else "no nodes table",
            }
    else:
        out["truth"] = {"status": "skipped", "reason": "not requested"}
    return out
