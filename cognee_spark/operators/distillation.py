"""Session distillation — the reference's finished-session → lesson pipeline
(cognee/modules/session_distillation/distill.py:1-405 + models.py).

Flow being matched (same stages, same gates, same fail-open discipline):

1. GATE    context entries are distillable only when never rated harmful and
           confidence ≥ 0.75 (models.MIN_GATE_CONFIDENCE) — deterministic,
           no search/LLM (load_distillable_session_inputs).
2. BATCH   the session timeline (QA turns as "User: …\\nAssistant: …" blocks
           capped at 1200 chars per side, candidates as
           "Candidate {id} [{profile}/{section}]: {content}" capped at 280)
           is sorted by time and packed 6 blocks per curator batch
           (build_curator_batches).
3. CURATE  one curator LLM call per batch proposes lessons
           {working_statement, member_entry_ids}; a failed batch drops only
           its own work (curate_batch fail-open → []).
4. ACCEPT  per lesson, the writer/rejecter LLM sees the proposal, its member
           entries, the top-5 similar previously-persisted lessons
           (novelty → already_known) and a top-20 entity glossary, and
           returns {accept, reason, statement, entities, why_learned}
           (evaluate_proposed_lesson / write_or_reject).
5. PERSIST accepted lessons render as one standalone markdown document each
           — "# Session learning — {date} (session {id})\\n\\n{statement}
           ({why}.)" (render_lesson_document) — added + cognified under the
           session_learnings node set AND the per-session truth node set
           (publish_distilled_lessons), which is exactly what
           truth.build_truth_subspace later reads.

Spark re-expression: the reference distills ONE session per asyncio call;
here every stage is a frame over (session_id, …) so a backlog of thousands
of finished sessions distills in one run — batching is a row_number fold,
both LLM stages are batched mapInPandas transports (the llm.py shape) with
deterministic doubles, and the novelty/glossary lookups are one
brute-force top-k each with the lessons as the broadcast query side."""

from __future__ import annotations

import json
import re

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.window import Window

MIN_GATE_CONFIDENCE = 0.75
CURATOR_BLOCKS_PER_BATCH = 6
MAX_QA_QUESTION_CHARS = 1_200
MAX_QA_ANSWER_CHARS = 1_200
MAX_CANDIDATE_CHARS = 280
NOVELTY_LESSONS_PER_LESSON = 5
GLOSSARY_ENTITIES_PER_LESSON = 20

DISTILLATE_NODE_SET = "session_learnings"


def gated_entries(entries: DataFrame) -> DataFrame:
    """The deterministic distillability gate (models.MIN_GATE_CONFIDENCE):
    never rated harmful AND confident enough."""
    return entries.where(
        (F.col("harmful_count") == 0)
        & (F.col("confidence") >= MIN_GATE_CONFIDENCE)
    )


def _collapse(col, cap: int):
    return F.substring(F.trim(F.regexp_replace(col, r"\s+", " ")), 1, cap)


def curator_batches(qa: DataFrame, entries: DataFrame) -> DataFrame:
    """(session_id, batch_id, batch_text) — build_curator_batches as one
    union + per-session row_number fold. ``qa``: (session_id, time,
    question, answer); ``entries``: (session_id, entry_id, created_at,
    context_profile, section, content, harmful_count, confidence) — pass
    PRE-GATED entries. Sort is (time, kind, block): the reference's stable
    time sort keeps QA before candidates at equal timestamps."""
    qa_blocks = qa.select(
        "session_id",
        F.coalesce(F.col("time").cast("string"), F.lit("")).alias("t"),
        F.lit(0).alias("kind"),
        F.concat(
            F.lit("User: "), _collapse(F.coalesce("question", F.lit("")), MAX_QA_QUESTION_CHARS),
            F.lit("\nAssistant: "), _collapse(F.coalesce("answer", F.lit("")), MAX_QA_ANSWER_CHARS),
        ).alias("block"),
    ).where(
        (F.coalesce(F.trim("question"), F.lit("")) != "")
        | (F.coalesce(F.trim("answer"), F.lit("")) != "")
    )
    cand_blocks = entries.select(
        "session_id",
        F.coalesce(F.col("created_at").cast("string"), F.lit("")).alias("t"),
        F.lit(1).alias("kind"),
        F.concat(
            F.lit("Candidate "), F.col("entry_id"),
            F.lit(" ["), F.col("context_profile"), F.lit("/"), F.col("section"),
            F.lit("]: "), _collapse(F.col("content"), MAX_CANDIDATE_CHARS),
        ).alias("block"),
    )
    timeline = qa_blocks.unionByName(cand_blocks)
    w = Window.partitionBy("session_id").orderBy("t", "kind", "block")
    seq = F.row_number().over(w) - 1
    numbered = timeline.withColumn(
        "batch_id", F.floor(seq / CURATOR_BLOCKS_PER_BATCH)
    ).withColumn("_seq", seq)
    return numbered.groupBy("session_id", "batch_id").agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("_seq", "block"))),
                lambda s: s["block"],
            ),
            "\n\n",
        ).alias("batch_text")
    )


def propose_lessons(batches: DataFrame, llm) -> DataFrame:
    """One curator call per batch through a batched executor transport →
    (session_id, working_statement, member_entry_ids). llm("curate_lessons",
    batch_text) must return a JSON array of {working_statement,
    member_entry_ids}; a failing/malformed batch drops only itself."""
    import pandas as pd

    def run(pdfs):
        for pdf in pdfs:
            rows = {"session_id": [], "working_statement": [], "member_entry_ids": []}
            for sid, text in zip(pdf["session_id"], pdf["batch_text"]):
                try:
                    lessons = json.loads(llm("curate_lessons", text))
                except Exception:
                    continue  # fail-open per batch (curate_batch)
                for lesson in lessons if isinstance(lessons, list) else []:
                    stmt = str(lesson.get("working_statement", "")).strip()
                    if not stmt:
                        continue
                    rows["session_id"].append(sid)
                    rows["working_statement"].append(stmt)
                    rows["member_entry_ids"].append(
                        [str(m) for m in lesson.get("member_entry_ids") or []]
                    )
            # object dtype: an all-empty batch must still carry list-typed
            # columns Arrow can cast to array<string> (float64 default fails)
            yield pd.DataFrame(rows, dtype=object)

    return batches.select("session_id", "batch_text").mapInPandas(
        run,
        "session_id string, working_statement string, member_entry_ids array<string>",
    )


def _topk_texts(lessons: DataFrame, corpus: DataFrame | None, k: int, out_col: str):
    """Per-lesson top-k similar corpus texts (the novelty / glossary vector
    searches) as one brute-force cosine pass: the lessons are the broadcast
    query side, the corpus streams. None/empty corpus → empty arrays."""
    if corpus is None:
        return lessons.withColumn(out_col, F.array().cast("array<string>"))
    from cognee_spark.functions.embeddings import hash_embedding_col
    from cognee_spark.operators.similarity_search import brute_force_topk

    queries = lessons.select(
        F.col("_lesson_id").alias("query_id"),
        hash_embedding_col(F.col("working_statement")).alias("query_vec"),
    )
    emb = corpus.select(
        F.col("text").alias("item_id"),
        hash_embedding_col(F.col("text")).alias("embedding"),
    ).dropDuplicates(["item_id"])
    top = brute_force_topk(emb, queries, k=k, id_col="item_id")
    per_lesson = top.groupBy("query_id").agg(
        F.transform(
            F.array_sort(F.collect_list(F.struct("rank", F.col("vec_id").alias("t")))),
            lambda s: s["t"],
        ).alias(out_col)
    )
    joined = lessons.join(
        per_lesson.withColumnRenamed("query_id", "_lesson_id"), "_lesson_id", "left"
    )
    return joined.withColumn(out_col, F.coalesce(out_col, F.array().cast("array<string>")))


def accept_lessons(
    lessons: DataFrame,
    llm,
    prior_lessons: DataFrame | None = None,
    glossary_entities: DataFrame | None = None,
) -> DataFrame:
    """Writer/rejecter stage → accepted (session_id, statement, entities,
    why_learned). The writer input renders the reference's sections
    (build_writer_input); llm("write_lesson", input) returns the
    WrittenLesson JSON; fail-open per lesson. ``prior_lessons``/(text) and
    ``glossary_entities``/(text) feed the novelty and glossary sections."""
    import pandas as pd

    numbered = lessons.withColumn(
        "_lesson_id", F.concat_ws(":", "session_id", "working_statement")
    ).dropDuplicates(["_lesson_id"])
    with_prior = _topk_texts(numbered, prior_lessons, NOVELTY_LESSONS_PER_LESSON, "_prior")
    with_gloss = _topk_texts(with_prior, glossary_entities, GLOSSARY_ENTITIES_PER_LESSON, "_gloss")

    def run(pdfs):
        for pdf in pdfs:
            rows = {"session_id": [], "statement": [], "entities": [], "why_learned": []}
            for rec in pdf.itertuples(index=False):
                sections = [f"PROPOSED LESSON:\n{rec.working_statement}"]
                if list(rec.prior if rec.prior is not None else []):
                    sections.append(
                        "SIMILAR EXISTING LESSONS:\n"
                        + "\n".join(f"- {p}" for p in rec.prior)
                    )
                if list(rec.gloss if rec.gloss is not None else []):
                    sections.append(
                        "ENTITY GLOSSARY:\n" + "\n".join(f"- {g}" for g in rec.gloss)
                    )
                try:
                    decision = json.loads(llm("write_lesson", "\n\n".join(sections)))
                except Exception:
                    continue  # fail-open per lesson (write_or_reject)
                if not (
                    isinstance(decision, dict)
                    and decision.get("accept")
                    and str(decision.get("statement", "")).strip()
                ):
                    continue
                rows["session_id"].append(rec.session_id)
                rows["statement"].append(str(decision["statement"]).strip())
                rows["entities"].append([str(e) for e in decision.get("entities") or []])
                rows["why_learned"].append(str(decision.get("why_learned", "")).strip())
            yield pd.DataFrame(rows, dtype=object)

    return with_gloss.select(
        "session_id", "working_statement",
        F.col("_prior").alias("prior"), F.col("_gloss").alias("gloss"),
    ).mapInPandas(
        run,
        "session_id string, statement string, entities array<string>, "
        "why_learned string",
    )


def render_lesson_documents(accepted: DataFrame, distilled_on: str) -> DataFrame:
    """One markdown document per accepted lesson (render_lesson_document:
    the TEMPLATE controls the format, not the LLM), shaped for the pipeline
    with repo = "session_learnings/{session_id}" so each lesson lands under
    both the distillate node set and its per-session truth node set."""
    why = F.regexp_replace(F.trim("why_learned"), r"\.+$", "")
    body = F.when(
        why != "", F.concat(F.trim("statement"), F.lit(" ("), why, F.lit(".)"))
    ).otherwise(F.trim("statement"))
    text = F.concat(
        F.lit(f"# Session learning — {distilled_on} (session "),
        F.col("session_id"), F.lit(")\n\n"), body, F.lit("\n"),
    )
    w = Window.partitionBy("session_id").orderBy("statement")
    return accepted.select(
        F.concat(F.lit(f"{DISTILLATE_NODE_SET}/"), "session_id").alias("repo"),
        F.concat(
            F.lit("lesson-"), F.row_number().over(w).cast("string")
        ).alias("path"),
        F.lit("1").alias("commit"),
        F.lit("md").alias("lang"),
        text.alias("content"),
    )


def distill_sessions(
    spark,
    store_root: str,
    qa: DataFrame,
    entries: DataFrame,
    llm=None,
    prior_lessons: DataFrame | None = None,
    glossary_entities: DataFrame | None = None,
    distilled_on: str = "1970-01-01",
    **pipeline_kwargs,
) -> dict:
    """Full distill flow over any number of finished sessions. Returns
    {"status", "lessons": n, "documents": frame|None, "tables": ...} with
    the reference's status vocabulary. ``llm`` defaults to the
    deterministic curator/writer doubles."""
    from cognee_spark.pipeline import run_pipeline

    llm = llm or reference_distillation_llm
    gated = gated_entries(entries)
    if not gated.take(1):
        return {"status": "no_gated_entries", "lessons": 0, "documents": None, "tables": None}
    batches = curator_batches(qa, gated)
    proposed = propose_lessons(batches, llm)
    accepted = accept_lessons(
        proposed, llm, prior_lessons=prior_lessons, glossary_entities=glossary_entities
    ).localCheckpoint(eager=True)
    n = accepted.count()
    if n == 0:
        status = "no_proposed_lessons" if not proposed.take(1) else "no_accepted_lessons"
        return {"status": status, "lessons": 0, "documents": None, "tables": None}
    docs = render_lesson_documents(accepted, distilled_on)
    agg = (
        docs.select(F.xxhash64("repo", "path", "content").alias("h"))
        .agg(F.count(F.lit(1)).alias("n"), F.expr("bit_xor(h)").alias("s"))
        .first()
    )
    out = run_pipeline(
        spark, docs, store_root, f"distill:{agg.n}:{agg.s}",
        compute_metrics=False, with_summaries=False, with_index=False,
        **pipeline_kwargs,
    )
    return {"status": "completed", "lessons": n, "documents": docs, "tables": out["tables"]}


# --- deterministic serving doubles -------------------------------------------


_CANDIDATE_RE = re.compile(r"^Candidate (\S+) \[[^\]]*\]: (.+)$", re.M)


def reference_distillation_llm(kind: str, prompt: str) -> str:
    """Curator/writer doubles: the curator proposes one lesson per candidate
    block (statement = the candidate content, members = its id); the writer
    rejects already_known when the statement appears among the similar
    existing lessons (casefolded) and otherwise accepts verbatim with the
    glossary names it can anchor. Pure functions of the prompt — a
    distillation through the full batching/novelty path is replayable."""
    if kind == "curate_lessons":
        return json.dumps(
            [
                {"working_statement": content.strip(), "member_entry_ids": [cid]}
                for cid, content in _CANDIDATE_RE.findall(prompt)
            ]
        )
    if kind == "write_lesson":
        stmt = prompt.split("PROPOSED LESSON:\n", 1)[-1].split("\n\n", 1)[0].strip()
        similar = []
        if "SIMILAR EXISTING LESSONS:\n" in prompt:
            block = prompt.split("SIMILAR EXISTING LESSONS:\n", 1)[-1].split("\n\n", 1)[0]
            similar = [line[2:].strip().casefold() for line in block.splitlines()]
        if stmt.casefold() in similar:
            return json.dumps({"accept": False, "reason": "already_known"})
        glossary = []
        if "ENTITY GLOSSARY:\n" in prompt:
            block = prompt.split("ENTITY GLOSSARY:\n", 1)[-1].split("\n\n", 1)[0]
            glossary = [line[2:].strip() for line in block.splitlines()]
        entities = [g for g in glossary if g and g.casefold() in stmt.casefold()]
        # the double leaves why_learned at the model default "" so the
        # rendered body is the bare statement — which the engine's
        # deterministic line-grammar extractor can cognify; a real writer
        # LLM fills why and the (reference-faithful) "(why.)" suffix renders
        return json.dumps(
            {"accept": True, "statement": stmt, "entities": entities, "why_learned": ""}
        )
    raise ValueError(f"unknown distillation llm kind {kind!r}")
