"""Conversation-session persistence — the reference's memify pipeline
persist_sessions_in_knowledge_graph (cognee/memify_pipelines/
persist_sessions_in_knowledge_graph.py:19-69 + cognee/tasks/memify/
extract_user_sessions.py:16-120): for each session, read the persist
WATERMARK (persisted_qa_count), render only the Q&A entries above it as

    Session ID: {id}\n\nQuestion: {q}\n\nAnswer: {a}\n\n...

cognify that window into the graph, and advance the watermark ONLY after the
window is successfully persisted — so re-running on an unchanged session
does zero ingestion work, and a session that SHRANK below its watermark
(cleared and rebuilt) re-persists from the start (stale-watermark rule,
extract_user_sessions.py:69-80).

Spark re-expression: the per-session loop becomes one groupBy — the window
text is a seq-ordered fold (array_sort(collect_list(struct)) + concat), the
watermark comparison a broadcast join against the committed watermark table,
and exactly-once comes from the store's commit ordering (windows table →
pipeline ingest → watermark table), the same nodes-before-edges discipline
the main pipeline uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SESSION_NODE_SET = "user_sessions_from_cache"


def session_windows(
    sessions: DataFrame,
    watermarks: DataFrame | None = None,
) -> DataFrame:
    """Unpersisted Q&A windows per (user_id, session_id).

    ``sessions``: (user_id, session_id, seq, question, answer) — seq is the
    entry's 0-based position in the session. ``watermarks``: (user_id,
    session_id, persisted_qa_count) from the previous successful persist
    (None/absent row = nothing persisted yet). Output: (user_id, session_id,
    text, persisted_qa_count) where text renders ONLY entries with
    seq >= effective watermark and persisted_qa_count is the NEW watermark
    (the session's current total). Sessions with no new entries yield no row.
    A watermark above the session's current size is stale → effective 0."""
    per_session = sessions.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("_total"),
        F.array_sort(
            F.collect_list(F.struct("seq", "question", "answer"))
        ).alias("_entries"),
    )
    if watermarks is not None:
        wm = watermarks.select(
            "user_id", "session_id", F.col("persisted_qa_count").alias("_wm")
        )
        per_session = per_session.join(wm, ["user_id", "session_id"], "left")
    else:
        per_session = per_session.withColumn("_wm", F.lit(None).cast("long"))
    effective = F.when(
        F.col("_wm").isNull() | (F.col("_wm") > F.col("_total")), F.lit(0)
    ).otherwise(F.col("_wm"))
    fresh = F.filter("_entries", lambda e: e["seq"] >= effective)
    rendered = F.concat(
        F.concat(F.lit("Session ID: "), F.col("session_id"), F.lit("\n\n")),
        F.array_join(
            F.transform(
                fresh,
                lambda e: F.concat(
                    F.lit("Question: "), e["question"],
                    F.lit("\n\nAnswer: "), e["answer"], F.lit("\n\n"),
                ),
            ),
            "",
        ),
    )
    return (
        per_session.withColumn("_fresh_n", F.size(fresh))
        .where(F.col("_fresh_n") > 0)
        .select(
            "user_id",
            "session_id",
            rendered.alias("text"),
            F.col("_total").alias("persisted_qa_count"),
        )
    )


def windows_as_documents(windows: DataFrame) -> DataFrame:
    """Session windows → the pipeline's repos(repo, path, commit, lang,
    content) input shape, tagged with the reference's node_set
    ("user_sessions_from_cache" — persist_sessions_in_knowledge_graph.py:30)
    as the repo namespace so session knowledge is queryable/sweepable as its
    own partition of the graph."""
    return windows.select(
        F.concat(F.lit(f"{SESSION_NODE_SET}/"), F.col("user_id")).alias("repo"),
        F.col("session_id").alias("path"),
        F.col("persisted_qa_count").cast("string").alias("commit"),
        F.lit("md").alias("lang"),
        F.col("text").alias("content"),
    )


def persist_sessions(
    spark,
    store_root: str,
    sessions: DataFrame,
    watermarks: DataFrame | None = None,
    **pipeline_kwargs,
) -> dict:
    """Full persist flow: windows → cognify (the REAL pipeline) → advance
    watermarks. Returns {"windows": n, "tables": ..., "watermarks": frame}.
    The returned watermark frame is the caller's to commit; committing it
    only after this function returns preserves the reference's
    advance-after-successful-cognify ordering (cognify_session semantics)."""
    from cognee_spark.pipeline import run_pipeline

    windows = session_windows(sessions, watermarks)
    # content-derived signature (window set + watermarks), so re-running with
    # DIFFERENT windows against the same store recomputes instead of reusing
    # stale stage tables; windows are active-session-scale, one tiny aggregate
    agg = (
        windows.select(
            F.xxhash64("user_id", "session_id", "persisted_qa_count").alias("h")
        )
        .agg(F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h)").alias("s"))
        .first()
    )
    # plain xor is safe here (rows are unique per (user_id, session_id) after
    # the groupBy — no multiplicity to cancel) and avoids ANSI sum overflow
    wrows = agg.n
    if wrows == 0:
        return {"windows": 0, "tables": None, "watermarks": watermarks}
    docs = windows_as_documents(windows)
    sig = f"sessions:{agg.n}:{agg.s}"
    out = run_pipeline(
        spark, docs, store_root, sig,
        compute_metrics=False, with_summaries=False, with_index=False,
        **pipeline_kwargs,
    )
    new_wm = windows.select("user_id", "session_id", "persisted_qa_count")
    if watermarks is not None:
        keep = watermarks.join(
            new_wm.select("user_id", "session_id"), ["user_id", "session_id"], "left_anti"
        )
        new_wm = keep.unionByName(new_wm)
    return {"windows": wrows, "tables": out["tables"], "watermarks": new_wm}
