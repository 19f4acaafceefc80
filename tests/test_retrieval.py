"""Retrieval operators: k-hop projection, triplet scoring, context text, BM25."""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from cognee_spark.operators.retrieval import (
    bm25_score,
    k_hop_subgraph,
    resolve_edges_to_text,
    score_triplets,
    top_k_triplets,
)

TRIPLES = [
    ("a", "knows", "b"),
    ("b", "knows", "c"),
    ("c", "knows", "d"),
    ("d", "knows", "e"),
    ("x", "knows", "y"),
]


def _triples_df(spark):
    return spark.createDataFrame(TRIPLES, ["subj", "pred", "obj"])


def test_k_hop(spark):
    edges = _triples_df(spark)
    seeds = spark.createDataFrame([("a",)], ["name"])
    one = {(r.subj, r.obj) for r in k_hop_subgraph(edges, seeds, k=1).collect()}
    assert one == {("a", "b")}
    two = {(r.subj, r.obj) for r in k_hop_subgraph(edges, seeds, k=2).collect()}
    assert two == {("a", "b"), ("b", "c")}
    all_hops = {(r.subj, r.obj) for r in k_hop_subgraph(edges, seeds, k=4).collect()}
    assert all_hops == {("a", "b"), ("b", "c"), ("c", "d"), ("d", "e")}  # x-y unreachable


def test_triplet_scoring_and_topk(spark):
    triples = _triples_df(spark)
    distances = spark.createDataFrame(
        [("a", 0.1), ("b", 0.2), ("c", 0.9), ("d", 0.4), ("e", 0.5), ("x", 0.0), ("y", 0.0)],
        ["name", "distance"],
    )
    scored = score_triplets(triples, distances)
    by_edge = {(r.subj, r.obj): r.score for r in scored.collect()}
    assert math.isclose(by_edge[("a", "b")], (2 - 1.0) * (0.1 + 0.2), rel_tol=1e-9)
    top = top_k_triplets(scored, k=2).collect()
    assert [(r.subj, r.obj) for r in top] == [("x", "y"), ("a", "b")]  # lowest score first


def test_resolve_edges_to_text(spark):
    lines = {r.context_line for r in resolve_edges_to_text(_triples_df(spark)).collect()}
    assert "a --[knows]--> b" in lines


def test_bm25(spark):
    docs = spark.createDataFrame(
        [
            (1, "spark spark spark engine"),
            (2, "spark engine engine engine"),
            (3, "completely unrelated words here"),
            (4, "spark"),
        ],
        ["doc_id", "text"],
    )
    top = bm25_score(docs, ["spark"], k=3).collect()
    ids = [r.doc_id for r in top]
    assert set(ids) <= {1, 2, 4} and 3 not in ids
    # short doc with the term ranks above long doc with one occurrence
    scores = {r.doc_id: r.bm25 for r in top}
    assert scores[4] > scores[2]
    assert scores[1] > scores[2]


def test_rrf_fusion(spark):
    """Hybrid ranking core (hybrid/ranking.py): Σ 1/(rrf_k + rank) over the
    lists that ranked a doc, optional importance factor 0.75 + 0.5·w."""
    from cognee_spark.operators.retrieval import rrf_fuse

    a = spark.createDataFrame([(1, 1), (2, 2), (3, 3)], ["doc_id", "rank"])
    b = spark.createDataFrame([(2, 1), (4, 2)], ["doc_id", "rank"])
    out = {r.doc_id: r for r in rrf_fuse([a, b], top_k=10).collect()}
    k = 40  # max(30, min(60, 20 + 2*10))
    assert out[2].rrf_score == round(1 / (k + 2) + 1 / (k + 1), 9)  # both lists
    assert out[1].rrf_score == round(1 / (k + 1), 9)
    assert out[2].fuse_rank == 1  # two lists beat any single-list doc
    # importance factor reorders equal-rrf docs: docs 1 and 4 tie on rrf
    # (rank 1 in a vs rank 2 in b differ — use docs with identical terms)
    imp = spark.createDataFrame([(1, 1.0), (2, 0.0), (3, 0.5), (4, 0.5)],
                                ["doc_id", "importance_weight"])
    out_i = {r.doc_id: r for r in rrf_fuse([a, b], top_k=10, importance=imp).collect()}
    assert out_i[1].final_score == round((1 / (k + 1)) * 1.25, 9)
    assert out_i[2].final_score == round((1 / (k + 2) + 1 / (k + 1)) * 0.75, 9)


def test_completion_prompt_assembly(spark):
    """R7 context construction (graph_context_for_question.txt rendering)."""
    from cognee_spark.operators.retrieval import graph_completion_context

    triples = spark.createDataFrame(
        [("a", "uses", "b"), ("b", "calls", "c"), ("c", "uses", "d")],
        ["subj", "pred", "obj"],
    )
    dists = spark.createDataFrame(
        [("a", 0.1), ("b", 0.2), ("c", 0.9), ("d", 0.9)], ["name", "distance"]
    )
    prompt = graph_completion_context(triples, dists, "who uses b?", k=2)
    assert "The question is: `who uses b?`" in prompt
    assert "a --[uses]--> b" in prompt
    assert "b --[calls]--> c" in prompt
    assert "c --[uses]--> d" not in prompt  # outside top-k
    assert "\n---\n" in prompt
    # deterministic across invocations
    assert prompt == graph_completion_context(triples, dists, "who uses b?", k=2)


def test_completion_prompt_preserves_retrieval_order(spark):
    """Context lines follow the top-k rank, not lexicographic order (the
    reference presents triplets in retrieval order)."""
    from cognee_spark.operators.retrieval import graph_completion_context

    triples = spark.createDataFrame(
        [("zeta", "uses", "omega"), ("alpha", "calls", "beta")],
        ["subj", "pred", "obj"],
    )
    # zeta/omega are the CLOSEST nodes → rank 1 despite sorting after alpha
    dists = spark.createDataFrame(
        [("zeta", 0.1), ("omega", 0.1), ("alpha", 0.9), ("beta", 0.9)],
        ["name", "distance"],
    )
    prompt = graph_completion_context(triples, dists, "q?", k=2)
    z = prompt.index("zeta --[uses]--> omega")
    a = prompt.index("alpha --[calls]--> beta")
    assert z < a


# --- R7 variants: CoT + decomposition (reference template flow) -------------


def _question_distances(spark, triples):
    """Deterministic query-embedding stand-in: distance 0 for nodes named in
    the question, 1 otherwise (the seam the reference fills with embeddings)."""
    names = [
        r.name
        for r in triples.select(F.col("subj").alias("name"))
        .union(triples.select("obj"))
        .distinct()
        .collect()
    ]

    def distances_of(question):
        toks = set(question.lower().replace("?", "").split())
        return spark.createDataFrame(
            [(n, 0.0 if n in toks else 1.0) for n in names], ["name", "distance"]
        )

    return distances_of


def test_cot_rounds_follow_reference_template_flow(spark):
    """One CoT round = completion → validation → follow-up → merged re-fetch
    → completion, with each prompt carrying the reference template fields
    (cot_validation_user_prompt.txt / cot_followup_user_prompt.txt)."""
    from cognee_spark.operators.retrieval import cot_completion_rounds

    triples = spark.createDataFrame(
        [("a", "uses", "b"), ("c", "uses", "d"), ("x", "uses", "y")],
        ["subj", "pred", "obj"],
    )
    distances_of = _question_distances(spark, triples)

    def llm(kind, prompt):
        if kind == "completion":
            return "partial answer"
        if kind == "validation":
            return "the context lacks c's dependency"
        return "what does c use?"  # follow-up steers retrieval to node c

    out = cot_completion_rounds(
        triples, distances_of, "what does a use?", llm, k=1, max_iter=1
    )
    kinds = [k for k, _ in out["transcript"]]
    assert kinds == ["completion", "validation", "followup", "completion"]
    validation = dict(out["transcript"])["validation"]
    assert "<QUESTION>" in validation and "<ANSWER>" in validation and "<CONTEXT>" in validation
    followup = dict(out["transcript"])["followup"]
    assert "<REASONING>" in followup and "the context lacks" in followup
    # round 1 retrieved a--b; the follow-up fetch merged c--d without dupes
    rows = {(r.subj, r.obj) for r in out["triplets"].collect()}
    assert rows == {("a", "b"), ("c", "d")}
    assert "c --[uses]--> d" in "\n".join(out["context_lines"])
    # deterministic across invocations
    again = cot_completion_rounds(
        triples, distances_of, "what does a use?", llm, k=1, max_iter=1
    )
    assert again["context_lines"] == out["context_lines"]


def test_context_extension_grows_then_converges(spark):
    """Each round retrieves with the COMPLETION text as the query; rounds
    stop early once nothing new arrives (reference convergence check)."""
    from cognee_spark.operators.retrieval import context_extension_completion

    triples = spark.createDataFrame(
        [("a", "uses", "b"), ("b", "uses", "c"), ("c", "uses", "d"), ("x", "uses", "y")],
        ["subj", "pred", "obj"],
    )
    distances_of = _question_distances(spark, triples)

    def llm(kind, prompt):
        # the completion mentions only c, steering the next retrieval there
        return "the chain passes c"

    out = context_extension_completion(
        triples, distances_of, "what does a use?", llm, k=1, max_rounds=4
    )
    rows = {(r.subj, r.obj) for r in out["triplets"].collect()}
    # round 1: a--b; round 2 fetches c's best edge (b--c) and merges; round 3
    # adds nothing → early convergence
    assert rows == {("a", "b"), ("b", "c")}
    assert out["rounds"] == 2


def test_decomposition_merges_subquery_edges(spark):
    from cognee_spark.operators.retrieval import decomposition_completion

    triples = spark.createDataFrame(
        [("a", "uses", "b"), ("c", "uses", "d"), ("x", "uses", "y")],
        ["subj", "pred", "obj"],
    )
    distances_of = _question_distances(spark, triples)

    def llm(kind, prompt):
        if kind == "decompose":
            return "what does a use?\nwhat does c use?"
        return f"answer({prompt[:20]})"

    out = decomposition_completion(
        triples, distances_of, "what do a and c use?", llm, k=1
    )
    assert out["subqueries"] == ["what does a use?", "what does c use?"]
    assert set(out["answers"]) == set(out["subqueries"])
    rows = {(r.subj, r.obj) for r in out["triplets"].collect()}
    assert rows == {("a", "b"), ("c", "d")}  # merged, deduplicated
    assert len(out["context_lines"]) == 2


def test_lexical_topk_jaccard_and_overlap(spark):
    from cognee_spark.operators.retrieval import lexical_topk

    docs = spark.createDataFrame(
        [
            ("d1", "Spark runs the query fast"),       # {spark,runs,the,query,fast}
            ("d2", "the query planner"),               # {the,query,planner}
            ("d3", "unrelated words entirely"),
            ("d4", "spark query"),                     # exact token set match
        ],
        ["doc_id", "text"],
    )
    top = lexical_topk(docs, "Spark QUERY", top_k=10).collect()
    got = [(r.rank, r.doc_id) for r in sorted(top, key=lambda r: r.rank)]
    # d4: 2/2 → 1.0; d1: 2/5; d2: 1/4; d3: 0 → dropped
    assert got == [(1, "d4"), (2, "d1"), (3, "d2")]
    scores = {r.doc_id: r.score for r in top}
    assert scores["d4"] == 1.0 and scores["d1"] == 0.4 and scores["d2"] == 0.25

    # overlap scorer: d1 and d4 tie on |D∩Q|=2 → doc_id breaks the tie
    ov = lexical_topk(docs, "Spark QUERY", top_k=10, scorer="overlap").collect()
    assert [(r.rank, r.doc_id) for r in sorted(ov, key=lambda r: r.rank)] == [
        (1, "d1"), (2, "d4"), (3, "d2"),
    ]

    # stop words drop from BOTH sides (tokenize_words contract)
    sw = lexical_topk(docs, "the spark query", top_k=10, stop_words={"the"}).collect()
    assert {r.doc_id: r.score for r in sw}["d4"] == 1.0


def test_graph_summary_completion_summarizes_context(spark):
    from cognee_spark.operators.retrieval import (
        graph_summary_completion_context,
        summarize_text_py,
    )

    triples = spark.createDataFrame(
        [("a", "uses", "b"), ("c", "calls", "d")], ["subj", "pred", "obj"]
    )
    dists = spark.createDataFrame(
        [("a", 0.1), ("b", 0.1), ("c", 0.9), ("d", 0.9)], ["name", "distance"]
    )
    # deterministic summarize double: first 'sentence' of the joined context
    prompt = graph_summary_completion_context(triples, dists, "how do they relate?", k=2)
    assert "how do they relate?" in prompt
    # the context is the SUMMARY of the direct text (here: no sentence break
    # and < 160 chars, so the summary is the whole thing)
    direct = "a --[uses]--> b\n---\nc --[calls]--> d"
    assert summarize_text_py(direct) in prompt
    # the summary rule itself: first sentence, else 160-char truncation
    assert summarize_text_py("First sentence. Second one.") == "First sentence."
    assert summarize_text_py("x" * 500) == "x" * 160

    # LLM seam: kind-tagged summarize call receives the direct text
    calls = []
    def llm(kind, text):
        calls.append((kind, text))
        return "SUMMARY<>"
    prompt = graph_summary_completion_context(
        triples, dists, "q?", k=2, llm=llm
    )
    assert calls[0][0] == "summarize" and "a --[uses]--> b" in calls[0][1]
    assert "SUMMARY<>" in prompt


def test_triplet_index_ids_and_texts(spark):
    from cognee_spark.functions.ids import id_for_py, node_id_py
    from cognee_spark.operators.indexing import build_triplet_index

    triples = spark.createDataFrame(
        [("a", "uses", "b"), ("a", "uses", "b"), ("x", "calls", "y")],
        ["subj", "pred", "obj"],
    )
    idx = build_triplet_index(triples)
    rows = idx.collect()
    assert len(rows) == 2  # duplicate edge upserts to one datapoint
    by_text = {r.text: r for r in rows}
    r = by_text["a-›uses-›b"]
    assert r.collection == "Triplet_text"
    assert r.item_id == node_id_py(
        id_for_py("Entity", "a") + "uses" + id_for_py("Entity", "b")
    )
    assert len(r.embedding) > 0
