"""QA-shaped eval smoke — the reference's corpus-builder eval loop
(cognee/eval_framework/corpus_builder/corpus_builder_executor.py:13-60 →
answer via retriever → EM/F1 at evaluation/metrics/) over the deterministic
fixture corpus: build the KG with the real pipeline, answer templated
questions via R1→R4 retrieval, score EM/F1 against golden answers derived
from the corpus spec. Any regression in retrieval plumbing (scoring, top-k,
context resolution) trips EM < 1.0.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from cognee_spark.operators.retrieval import (
    resolve_edges_to_text,
    score_triplets,
    top_k_triplets,
)
from cognee_spark.sources.corpus import build_repos_df
from cognee_spark.sources.golden import golden_triples

N_FILES = 210
NL_PREDS = ("uses", "depends_on", "calls_into", "extends")
K = 50


@pytest.fixture(scope="module")
def kg_triples(spark, tmp_path_factory):
    from cognee_spark.pipeline import run_pipeline

    root = str(tmp_path_factory.mktemp("qa_eval_kg"))
    tables = run_pipeline(
        spark, build_repos_df(spark, N_FILES), root, f"qa:{N_FILES}",
        compute_metrics=False, with_summaries=False, with_index=False,
    )["tables"]
    return tables["triples"].select("subj", "pred", "obj").cache()


def _questions():
    """10 templated questions + golden answer sets from the corpus spec
    (independent of the Spark pipeline: golden_triples is the pure-Python
    reference-semantics oracle)."""
    nl = [t for t in golden_triples(N_FILES) if t[1] in NL_PREDS]
    golden: dict[tuple[str, str], set[str]] = {}
    for s, p, o in nl:
        golden.setdefault((s, p), set()).add(o)
    picked = sorted(golden)[:10]
    return [
        (f"what does {s} {p.replace('_', ' ')}?", s, p, golden[(s, p)])
        for s, p in picked
    ]


@pytest.mark.evals
def test_qa_em_f1_on_fixture_corpus(spark, kg_triples):
    names = [
        r.name
        for r in kg_triples.select(F.col("subj").alias("name"))
        .union(kg_triples.select("obj"))
        .distinct()
        .collect()
    ]
    em_total, f1_total, n = 0.0, 0.0, 0
    for question, subj, pred, golden_objs in _questions():
        toks = set(question.replace("?", "").split())
        dist = spark.createDataFrame(
            [(name, 0.0 if name in toks else 1.0) for name in names],
            ["name", "distance"],
        )
        top = top_k_triplets(score_triplets(kg_triples, dist), k=K)
        lines = [
            r.context_line
            for r in resolve_edges_to_text(top, keep=("rank",)).orderBy("rank").collect()
        ]
        prefix = f"{subj} --[{pred}]--> "
        predicted = {ln[len(prefix):] for ln in lines if ln.startswith(prefix)}
        em = 1.0 if predicted == golden_objs else 0.0
        inter = len(predicted & golden_objs)
        f1 = (
            2 * inter / (len(predicted) + len(golden_objs))
            if predicted or golden_objs
            else 1.0
        )
        em_total += em
        f1_total += f1
        n += 1
    assert n == 10
    assert em_total / n == 1.0, f"EM {em_total / n}, F1 {f1_total / n}"
    assert f1_total / n == 1.0
