"""Truth-subspace ranking (truth_subspace/align.py + centroids.py +
hybrid/ranking.py:43 semantics): neutrality contract, greedy slot build,
epoch gating, codegen/python parity, and the blended RRF factor."""

from __future__ import annotations

import math
import uuid

import pytest
from pyspark.sql import functions as F

from cognee_spark.functions.ids import NAMESPACE_OID
from cognee_spark.operators.truth import (
    build_truth_subspace,
    centroid_id,
    cosine_py,
    extend_slots,
    learning_id,
    node_coords_py,
    query_coords,
    slots_changed,
    stable_signature,
    truth_factor_py,
    truth_score_py,
)


# --- pure math (reference align.py contracts) --------------------------------


def test_neutral_contracts():
    # empty inputs are NEUTRAL: score 0.5, factor 1.0 (align.py docstring)
    assert truth_score_py([], [0.5]) == 0.5
    assert truth_score_py([0.5], []) == 0.5
    assert truth_factor_py([], []) == 1.0
    # a query aligned with NO direction (all weights clamp to 0) is neutral
    assert truth_score_py([0.9, 0.9], [-0.2, 0.0]) == 0.5
    assert cosine_py([], [1.0]) == 0.0
    assert cosine_py([0.0, 0.0], [1.0, 0.0]) == 0.0


def test_truth_score_is_weighted_average_clamped():
    # weights = clamped query coords; negative node alignments clamp at 0
    coords, q = [1.0, 0.0], [0.5, 0.5]
    assert truth_score_py(coords, q) == pytest.approx(0.5)
    assert truth_score_py([1.0, 1.0], [0.3, 0.7]) == pytest.approx(1.0)
    assert truth_score_py([-1.0, -1.0], [0.5, 0.5]) == 0.0  # clamped low
    assert truth_factor_py([1.0, 1.0], [1.0]) == pytest.approx(1.25)
    assert truth_factor_py([-1.0], [1.0]) == pytest.approx(0.75)


def test_ids_and_signature():
    # normalization: casefold + whitespace collapse (centroids.learning_id)
    assert learning_id(" Spark  IS fast \n") == learning_id("spark is fast")
    assert learning_id("a") != learning_id("b")
    assert learning_id("x") == str(
        uuid.uuid5(NAMESPACE_OID, "TruthLearning:x")
    )
    assert stable_signature(["a", "b"]) != stable_signature(["b", "a"])
    assert centroid_id("ds", 0) == str(
        uuid.uuid5(NAMESPACE_OID, "TruthCentroid:ds:0")
    )


# --- greedy slot build (centroids.extend_centroids_with_learning_vectors) ----


def test_slots_under_k_each_learning_opens_normalized_slot():
    lv = [("id1", [3.0, 0.0]), ("id2", [0.0, 2.0])]
    slots = extend_slots([], lv, k=8)
    assert [s["slot"] for s in slots] == [0, 1]
    assert slots[0]["centroid"] == [1.0, 0.0]  # normalized
    assert slots[1]["centroid"] == [0.0, 1.0]
    assert slots[0]["learning_ids"] == ["id1"] and slots[0]["count"] == 1


def test_slots_over_k_merge_into_nearest_weighted_mean():
    lv = [
        ("a", [1.0, 0.0]),
        ("b", [0.0, 1.0]),
        ("c", [0.9, 0.1]),  # nearest slot 0 → weighted mean, renormalized
    ]
    slots = extend_slots([], lv, k=2)
    assert len(slots) == 2
    s0 = slots[0]
    assert s0["count"] == 2 and s0["learning_ids"] == ["a", "c"]
    nv = [0.9, 0.1]
    n = math.sqrt(0.9**2 + 0.1**2)
    merged = [(1 * 1.0 + 0.9 / n) / 2, (1 * 0.0 + 0.1 / n) / 2]
    mn = math.sqrt(sum(x * x for x in merged))
    assert s0["centroid"] == pytest.approx([x / mn for x in merged])
    # already-seen learning ids are skipped (idempotent replay)
    again = extend_slots(slots, [("a", [1.0, 0.0])], k=2)
    assert not slots_changed(slots, again)


def test_slots_changed_detects_membership_and_value_moves():
    a = extend_slots([], [("x", [1.0, 0.0])], k=4)
    assert slots_changed([], a)
    assert not slots_changed(a, extend_slots([], [("x", [2.0, 0.0])], k=4))  # same normalized
    assert slots_changed(a, extend_slots([], [("y", [1.0, 0.0])], k=4))  # different id


# --- distributed build + projection ------------------------------------------


def _learnings(spark):
    return spark.createDataFrame(
        [("Always batch LLM calls.",), ("Never collect the corpus.",),
         ("ALWAYS   batch llm calls.",)],  # dup after normalization
        ["statement"],
    )


def _nodes(spark):
    return spark.createDataFrame(
        [("n1", "batch the llm calls"), ("n2", "collect everything eagerly")],
        ["node_id", "text"],
    )


def test_build_projects_nodes_and_matches_python(spark):
    out = build_truth_subspace(spark, _learnings(spark), _nodes(spark), dataset_id="d")
    assert out["anchors"] == 2  # the normalized duplicate folded away
    assert out["truth_epoch"] == 1  # first build bumps epoch from 0
    basis = [s["centroid"] for s in out["slots"]]
    rows = {r.node_id: list(r.truth_alignment) for r in out["coords"].collect()}
    from cognee_spark.functions.embeddings import hash_embedding_py

    for nid, text in [("n1", "batch the llm calls"), ("n2", "collect everything eagerly")]:
        expected = node_coords_py(hash_embedding_py(text), basis)
        assert rows[nid] == pytest.approx(expected, abs=1e-9)
    # rebuilding from the SAME learnings does not bump the epoch
    again = build_truth_subspace(
        spark, _learnings(spark), _nodes(spark), dataset_id="d",
        existing_slots=out["slots"], previous_epoch=out["truth_epoch"],
    )
    assert again["truth_epoch"] == 1 and again["signature"] == out["signature"]
    # centroid rows carry the reference collection + slot identity
    cr = {r.item_id for r in out["centroid_rows"].collect()}
    assert cr == {centroid_id("d", 0), centroid_id("d", 1)}


def test_build_with_no_learnings_is_neutral(spark):
    empty = spark.createDataFrame([("   ",)], ["statement"])
    out = build_truth_subspace(spark, empty, _nodes(spark))
    assert out["slots"] == [] and out["coords"] is None and out["truth_epoch"] == 0


# --- blended RRF (ranking.py:43-46) ------------------------------------------


def _rankings(spark):
    a = spark.createDataFrame([("d1", 1), ("d2", 2)], ["doc_id", "rank"])
    b = spark.createDataFrame([("d2", 1), ("d3", 2)], ["doc_id", "rank"])
    return [a, b]


def test_rrf_truth_factor_applies_only_on_epoch_match(spark):
    from cognee_spark.operators.retrieval import rrf_fuse

    truth = spark.createDataFrame(
        [("d1", [1.0, 1.0], 3), ("d2", [1.0, 1.0], 2)],  # d2 epoch is STALE
        "doc_id string, truth_alignment array<double>, truth_epoch int",
    )
    base = {
        r.doc_id: r.final_score
        for r in rrf_fuse(_rankings(spark), top_k=3).collect()
    }
    out = {
        r.doc_id: r.final_score
        for r in rrf_fuse(
            _rankings(spark), top_k=3, truth=truth,
            q_coords=[1.0, 0.0], truth_epoch=3,
        ).collect()
    }
    assert out["d1"] == pytest.approx(round(base["d1"] * 1.25, 9))  # aligned, current
    assert out["d2"] == pytest.approx(base["d2"])  # stale epoch → neutral
    assert out["d3"] == pytest.approx(base["d3"])  # no truth state → neutral


def test_rrf_truth_neutrality_no_coords_scores_unchanged(spark):
    """The reference's explicit contract: passing nothing leaves baseline
    scoring untouched."""
    from cognee_spark.operators.retrieval import rrf_fuse

    truth = spark.createDataFrame(
        [("d1", [1.0, 1.0], 1)],
        "doc_id string, truth_alignment array<double>, truth_epoch int",
    )
    base = [tuple(r) for r in rrf_fuse(_rankings(spark), top_k=3).collect()]
    no_q = [
        tuple(r)
        for r in rrf_fuse(
            _rankings(spark), top_k=3, truth=truth, q_coords=[], truth_epoch=1
        ).collect()
    ]
    no_epoch = [
        tuple(r)
        for r in rrf_fuse(
            _rankings(spark), top_k=3, truth=truth, q_coords=[1.0], truth_epoch=None
        ).collect()
    ]
    assert no_q == base and no_epoch == base
    # an all-zero-weight query is neutral THROUGH the factor (0.5 → 1.0)
    base_scores = {
        r.doc_id: r.final_score
        for r in rrf_fuse(_rankings(spark), top_k=3).collect()
    }
    zero_q = {
        r.doc_id: r.final_score
        for r in rrf_fuse(
            _rankings(spark), top_k=3, truth=truth,
            q_coords=[0.0, -1.0], truth_epoch=1,
        ).collect()
    }
    for doc, score in base_scores.items():
        assert zero_q[doc] == pytest.approx(score)


def test_query_coords_projects_like_nodes():
    slots = extend_slots([], [("a", [1.0, 0.0]), ("b", [0.0, 1.0])], k=8)
    assert query_coords([2.0, 0.0], slots) == pytest.approx([1.0, 0.0])


def test_normalize_statement_matches_spark_path_on_non_ascii(spark):
    # cross-path id contract: python twin and the codegen normalization
    # must agree on non-ASCII input — 'ß' (lower keeps it, casefold would
    # not) and NBSP (Java \s does not match it)
    from pyspark.sql import functions as F

    from cognee_spark.operators.truth import learning_id, normalize_statement

    from cognee_spark.functions.ids import uuid5_col

    stmts = ["Straße  ist\tbreit", "no break here", "  MiXeD   Case  "]
    df = spark.createDataFrame([(s,) for s in stmts], "statement string")
    spark_side = df.select(
        "statement",
        F.trim(F.regexp_replace(F.lower(F.col("statement")), r"\s+", " ")).alias("norm"),
    ).withColumn(
        "lid", uuid5_col(F.concat(F.lit("TruthLearning:"), F.col("norm")))
    )
    for row in spark_side.collect():
        assert normalize_statement(row.statement) == row.norm, row.statement
        assert learning_id(row.statement) == row.lid, row.statement
