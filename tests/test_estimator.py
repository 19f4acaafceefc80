"""A5 dry-run cost estimation (reference: cognee/modules/cognify/estimator.py)."""

from __future__ import annotations

from cognee_spark.operators.estimator import (
    MIN_GRAPH_OUTPUT_TOKENS_PER_CHUNK,
    SUMMARY_OUTPUT_TOKENS_PER_CHUNK,
    estimate_dry_run,
)
from cognee_spark.sources.corpus import build_repos_df


def test_dry_run_estimate(spark):
    repos = build_repos_df(spark, 210)
    est = estimate_dry_run(repos, max_chunk_size=512)
    assert est["n_documents"] == 210
    assert 0 < est["n_text_documents"] < 210
    assert est["n_chunks"] > 0
    assert est["n_llm_calls"] == 2 * est["n_chunks"]
    # output heuristics bound the totals
    assert est["output_tokens"] >= est["n_chunks"] * (
        MIN_GRAPH_OUTPUT_TOKENS_PER_CHUNK + SUMMARY_OUTPUT_TOKENS_PER_CHUNK
    )
    assert est["estimated_cost_usd"] > 0
    # deterministic across invocations
    assert estimate_dry_run(build_repos_df(spark, 210), max_chunk_size=512) == est


def test_dry_run_scales_with_corpus(spark):
    small = estimate_dry_run(build_repos_df(spark, 100))
    large = estimate_dry_run(build_repos_df(spark, 400))
    assert large["n_chunks"] > small["n_chunks"]
    assert large["estimated_cost_usd"] > small["estimated_cost_usd"]
