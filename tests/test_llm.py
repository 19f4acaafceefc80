"""E1/E10 — the LLM extraction seam, exercised end-to-end with mock endpoints.

Reference behaviors under test (extract_content_graph.py:15-47,
LLMGateway.py:74, extract_graph_from_data.py:188-196): batched structured
output, transient-failure retry, permanent-failure skip with counters,
schema-invalid row dropping, dangling-edge filtering under noisy output.
"""

from __future__ import annotations


import pytest
from pyspark.sql import functions as F

from cognee_spark.operators.chunking import chunk_documents
from cognee_spark.operators.extraction import extract_from_chunks
from cognee_spark.operators.llm import (
    FailingBatchTransport,
    LLMExtractor,
    NoisyTransport,
    TransientFaultTransport,
    reference_transport,
)
from cognee_spark.sources.corpus import build_repos_df

N_FILES = 210


@pytest.fixture(scope="module")
def chunks(spark):
    repos = build_repos_df(spark, N_FILES)
    docs = repos.select(
        "repo", "path", "lang", "content",
        F.sha2("content", 256).alias("content_sha"),
        F.concat_ws(":", "repo", "path").alias("document_id"),
    ).where(F.col("lang") == "md")
    return chunk_documents(docs).cache()


def _rows(df):
    return {
        (r.row_kind, r.name, r.kind, r.rel, r.dst, r.chunk_id)
        for r in df.collect()
    }


def test_llm_path_matches_deterministic_kernel(spark, chunks):
    """Clean transport: the full request/response/validate path emits exactly
    the deterministic kernel's rows (the golden-oracle-compatibility
    guarantee behind the kg_triples_llm_seam CORRECTNESS entry)."""
    llm = LLMExtractor(reference_transport, batch_size=16)
    assert _rows(llm(chunks)) == _rows(extract_from_chunks(chunks))
    m = llm.stage_metrics()
    assert m["llm_requests"] > 0
    assert m["skipped_batches"] == m["skipped_rows"] == m["llm_retries"] == 0


def test_retry_recovers_transient_faults(spark, chunks):
    """First attempt fails for ~1/3 of batches; backoff+retry must converge
    to the identical output, with retries visible in the metrics."""
    llm = LLMExtractor(
        TransientFaultTransport(reference_transport, every_n=3),
        batch_size=8, backoff_sec=0.001,
    )
    assert _rows(llm(chunks)) == _rows(extract_from_chunks(chunks))
    m = llm.stage_metrics()
    assert m["llm_retries"] > 0
    assert m["skipped_batches"] == 0


def test_permanent_failures_drop_batches_with_counter(spark, chunks):
    """Batches whose transport never succeeds are skipped and counted; the
    surviving output is a clean subset (precision 1.0, recall < 1)."""
    llm = LLMExtractor(
        FailingBatchTransport(reference_transport, every_n=4),
        batch_size=4, max_retries=1, backoff_sec=0.001,
    )
    got = _rows(llm(chunks))
    want = _rows(extract_from_chunks(chunks))
    m = llm.stage_metrics()
    assert m["skipped_batches"] > 0
    assert got < want  # strict subset: nothing invented, something missing
    # retry budget respected: failed batches cost exactly max_retries+1 requests
    assert m["llm_requests"] >= m["skipped_batches"] * 2


def test_malformed_rows_dropped_and_dangling_filtered(spark, chunks):
    """Schema-invalid node entries are dropped per-row; hallucinated edges to
    unknown endpoints are filtered in-kernel — both counted."""
    llm = LLMExtractor(NoisyTransport(reference_transport, every_n=2), batch_size=4)
    got = _rows(llm(chunks))
    want = _rows(extract_from_chunks(chunks))
    m = llm.stage_metrics()
    assert m["skipped_rows"] > 0
    assert m["dangling_edges_dropped"] > 0
    assert not any(name == "HallucinatedEntity" for (_, name, _, _, _, _) in got)
    # precision stays 1.0 on mention rows: every surviving mention with a
    # name is one the clean kernel also produced
    got_names = {t for t in got if t[0] == "mention" and t[1] is not None}
    want_names = {t for t in want if t[0] == "mention"}
    assert got_names <= want_names


def test_dangling_edges_die_in_linking_even_unfiltered(spark, chunks):
    """With filter_dangling=False the hallucinated edge reaches the raw-edge
    table but CANNOT survive to triples: the alias map is built from
    mentions, and nl_triples inner-joins both endpoints against it
    (extract_graph_from_data.py:188-196 placed as a join, SURVEY §2.4)."""
    from cognee_spark.operators.extraction import mentions_of, raw_edges_of
    from cognee_spark.operators.linking import alias_map, nl_triples

    llm = LLMExtractor(
        NoisyTransport(reference_transport, every_n=2),
        batch_size=4, filter_dangling=False,
    )
    ext = llm(chunks).cache()
    raw = raw_edges_of(ext)
    assert raw.where(F.col("src") == "HallucinatedEntity").count() > 0
    aliases = alias_map(mentions_of(ext)).select("name", "canonical")
    triples = nl_triples(raw, aliases)
    assert triples.where(
        F.col("subj").contains("hallucinated") | F.col("obj").contains("hallucinated")
    ).count() == 0
    ext.unpersist()


def test_pipeline_checkpoint_carries_llm_metrics(spark, tmp_path, chunks):
    """run_pipeline(nl_extractor='llm_mock') lands the extractor's counters in
    the extractions stage checkpoint row (the E10 ops-visibility contract)."""
    from cognee_spark.pipeline import run_pipeline
    from cognee_spark.store import TableStore

    repos = build_repos_df(spark, N_FILES)
    run_pipeline(
        spark, repos, str(tmp_path), f"llm:{N_FILES}",
        compute_metrics=False, with_summaries=False, with_index=False,
        nl_extractor="llm_mock",
    )
    cp = TableStore(str(tmp_path)).read_checkpoint("extractions")
    assert cp is not None and cp["llm_requests"] > 0
    assert cp["skipped_batches"] == 0 and cp["skipped_rows"] == 0
    assert cp["llm_retries"] >= 0


def test_pipeline_converges_under_noisy_extractor(spark, tmp_path):
    """Malformed rows + permanently failing batches through the FULL
    pipeline: precision stays 1.0 (nothing invented survives to triples),
    recall degrades only by the skipped work, and the checkpoint row carries
    the nonzero skip counters (the verdict's noisy-E10 gate)."""
    from cognee_spark.pipeline import run_pipeline
    from cognee_spark.sources.golden import golden_triples
    from cognee_spark.store import TableStore

    noisy = LLMExtractor(
        NoisyTransport(FailingBatchTransport(reference_transport, every_n=3), every_n=2),
        batch_size=2, max_retries=1, backoff_sec=0.001,
    )

    def extractor(chunks):
        return noisy(chunks)

    extractor.stage_metrics = noisy.stage_metrics
    repos = build_repos_df(spark, N_FILES)
    out = run_pipeline(
        spark, repos, str(tmp_path), f"noisy:{N_FILES}",
        compute_metrics=False, with_summaries=False, with_index=False,
        nl_extractor=extractor,
    )
    got = {
        (r.subj, r.pred, r.obj)
        for r in out["tables"]["triples"].select("subj", "pred", "obj").collect()
    }
    want = golden_triples(N_FILES)
    nl_preds = {"uses", "depends_on", "calls_into", "extends"}
    got_nl = {t for t in got if t[1] in nl_preds}
    want_nl = {t for t in want if t[1] in nl_preds}
    # code-mode triples are untouched by the NL extractor
    assert {t for t in got if t[1] not in nl_preds} == {
        t for t in want if t[1] not in nl_preds
    }
    precision = len(got_nl & want_nl) / len(got_nl)
    recall = len(got_nl & want_nl) / len(want_nl)
    # hallucinated content NEVER materializes (dangling filter + alias join)
    assert not any("hallucinat" in s.lower() or "hallucinat" in o.lower()
                   for s, _, o in got_nl)
    # precision < 1.0 here is CANONICAL DRIFT, not hallucination: when the
    # batch holding an entity's canonical spelling is dropped, the surviving
    # typo/variant mentions elect a different cluster canonical than the
    # full-corpus golden run. Bounded, and every such triple is still a true
    # statement under its cluster's surviving name.
    assert precision >= 0.6, precision
    assert 0.2 < recall < 1.0, recall  # dropped batches cost recall, bounded
    cp = TableStore(str(tmp_path)).read_checkpoint("extractions")
    assert cp["skipped_batches"] > 0 and cp["skipped_rows"] > 0
    assert cp["dangling_edges_dropped"] > 0
