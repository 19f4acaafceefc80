"""Global context index (memify global_context_index semantics):
capacity-bounded similarity buckets, uuid5-of-children identity, hierarchy
to a root summary, summarize seam."""

from __future__ import annotations

import uuid

from pyspark.sql import functions as F

from cognee_spark.functions.ids import NAMESPACE_OID
from cognee_spark.operators.context_index import build_context_index


def _summaries(spark, n):
    rows = [(f"s{i:03d}", f"Topic {i % 7} summary number {i}.") for i in range(n)]
    return spark.createDataFrame(rows, "summary_id string, summary string")


def test_capacity_bound_and_total_coverage(spark):
    out = build_context_index(
        spark, _summaries(spark, 53), dataset_id="ds1", max_bucket_size=10
    )
    a = out["assignments"]
    lvl0 = a.where(F.col("level") == 0)
    sizes = [r.n for r in lvl0.groupBy("bucket_id").agg(F.count("*").alias("n")).collect()]
    assert all(s <= 10 for s in sizes)
    # every level-0 item assigned exactly once
    assert lvl0.count() == 53
    assert lvl0.select("child_id").distinct().count() == 53


def test_hierarchy_reaches_root_with_reference_ids(spark):
    out = build_context_index(
        spark, _summaries(spark, 53), dataset_id="ds1", max_bucket_size=10
    )
    buckets = out["buckets"].collect()
    roots = [b for b in buckets if b.is_root]
    assert len(roots) == 1
    assert roots[0].bucket_id == str(
        uuid.uuid5(NAMESPACE_OID, "GlobalContextSummary:ds1:root")
    )
    # bucket identity = uuid5 over the SORTED child ids (ids.py:6-9)
    lvl0 = out["assignments"].where(F.col("level") == 0).collect()
    by_bucket: dict[str, list[str]] = {}
    for r in lvl0:
        by_bucket.setdefault(r.bucket_id, []).append(r.child_id)
    for bid, children in by_bucket.items():
        expected = str(
            uuid.uuid5(
                NAMESPACE_OID,
                "GlobalContextSummary:ds1:0:" + ",".join(sorted(children)),
            )
        )
        assert bid == expected
    # the root's children are the level-below bucket ids
    max_level = max(b.level for b in buckets)
    root_children = {
        r.child_id
        for r in out["assignments"].where(F.col("level") == max_level).collect()
    }
    below = {b.bucket_id for b in buckets if b.level == max_level - 1 and not b.is_root}
    assert root_children == below
    # GlobalContextSummary_text collection covers every bucket incl. root
    emb = out["embeddings"]
    assert emb.count() == len(buckets)
    assert emb.select("collection").distinct().first().collection == (
        "GlobalContextSummary_text"
    )


def test_identical_inputs_rebuild_identically(spark):
    a = build_context_index(spark, _summaries(spark, 37), dataset_id="d", max_bucket_size=8)
    b = build_context_index(spark, _summaries(spark, 37), dataset_id="d", max_bucket_size=8)
    ids_a = sorted(r.bucket_id for r in a["buckets"].collect())
    ids_b = sorted(r.bucket_id for r in b["buckets"].collect())
    assert ids_a == ids_b  # deterministic placement → identical identities


def test_small_input_goes_straight_to_root(spark):
    out = build_context_index(
        spark, _summaries(spark, 5), dataset_id="d", max_bucket_size=10
    )
    assert out["levels"] == 1
    buckets = out["buckets"].collect()
    assert len(buckets) == 1 and buckets[0].is_root
    assert out["assignments"].count() == 5  # all items direct children of root


def _make_marker_llm():
    """Executor-side double: bucket summarization now runs inside Python
    workers (mapInPandas), so the seam is verified through the RETURNED text
    — the rendering contract is asserted in-worker (a violation fails the
    job), the kind comes back as a marker. Built as a closure so cloudpickle
    ships it by value (a module-level test function isn't importable on the
    workers)."""

    def marker_llm(kind, rendered):
        assert rendered.startswith("Input 1:\n"), rendered
        return f"[{kind}]"

    return marker_llm


def test_llm_summarize_seam_receives_reference_rendering(spark):
    out = build_context_index(
        spark, _summaries(spark, 12), dataset_id="d", max_bucket_size=10,
        llm=_make_marker_llm(),
    )
    texts = {b.text for b in out["buckets"].collect()}
    # 12 items / bucket 10 → one bucketized level + the root
    assert texts == {"[bucket_summary]", "[root_summary]"}


def test_llm_mode_is_batched_and_preserves_bucket_sets(spark):
    """The LLM path must (a) run through a batched executor-side transport —
    MapInPandas in the plan, never a driver collect loop — and (b) produce
    the exact bucket membership/identity of the deterministic mode (the llm
    only rewrites the summary text, never the placement)."""
    from cognee_spark.functions.embeddings import hash_embedding_col
    from cognee_spark.operators.context_index import bucketize_level

    items = (
        _summaries(spark, 53)
        .selectExpr("summary_id AS item_id", "summary AS text")
        .withColumn("embedding", hash_embedding_col(F.col("text")))
    )
    _, buckets_llm = bucketize_level(
        spark, items, 0, "ds1", 10, 53, llm=_make_marker_llm()
    )
    plan = buckets_llm._jdf.queryExecution().executedPlan().toString()
    assert "MapInPandas" in plan, plan

    out_det = build_context_index(
        spark, _summaries(spark, 53), dataset_id="ds1", max_bucket_size=10
    )
    out_llm = build_context_index(
        spark, _summaries(spark, 53), dataset_id="ds1", max_bucket_size=10,
        llm=_make_marker_llm(),
    )
    det = {(r.level, r.bucket_id, r.child_id) for r in out_det["assignments"].collect()}
    # level-0 placement must be identical; higher levels re-embed the llm's
    # rewritten texts, so only the first level is comparable bit-for-bit
    llm_l0 = {
        (r.level, r.bucket_id, r.child_id)
        for r in out_llm["assignments"].where(F.col("level") == 0).collect()
    }
    det_l0 = {t for t in det if t[0] == 0}
    assert llm_l0 == det_l0
