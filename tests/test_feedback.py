"""Memify feedback loop (apply_feedback_weights.py semantics): EMA fold,
validation, write-back, and re-ranking through score_triplets."""

from __future__ import annotations

from pyspark.sql import functions as F

from cognee_spark.operators.feedback import (
    apply_feedback_to_edges,
    feedback_weight_updates,
)
from cognee_spark.operators.retrieval import score_triplets, top_k_triplets


def _ref_fold(scores, alpha=0.1, w=0.5):
    """Reference stream_update_weight applied in order (pure Python twin;
    same explicit half-up rounding as the operator)."""
    import math

    for s in scores:
        r = (s - 1) / 4
        w = math.floor(max(0.0, min(1.0, w + alpha * (r - w))) * 10000 + 0.5) / 10000
    return w


def test_ema_fold_matches_reference(spark):
    log = spark.createDataFrame(
        [("a", i, s) for i, s in enumerate([5, 5, 1, 3])]
        + [("b", i, s) for i, s in enumerate([1, 1])],
        ["element_id", "seq", "feedback_score"],
    )
    got = {r.element_id: r.feedback_weight for r in feedback_weight_updates(log).collect()}
    assert got == {"a": _ref_fold([5, 5, 1, 3]), "b": _ref_fold([1, 1])}


def test_fold_is_order_sensitive_by_seq(spark):
    """Events fold in seq order, not input order (streaming semantics)."""
    shuffled = spark.createDataFrame(
        [("a", 2, 1), ("a", 0, 5), ("a", 1, 5)], ["element_id", "seq", "feedback_score"]
    )
    got = feedback_weight_updates(shuffled).first().feedback_weight
    assert got == _ref_fold([5, 5, 1])
    assert got != _ref_fold([1, 5, 5])


def test_invalid_scores_ignored(spark):
    log = spark.createDataFrame(
        [("a", 0, 5), ("a", 1, 0), ("a", 2, 6), ("a", 3, 3)],
        ["element_id", "seq", "feedback_score"],
    )
    got = feedback_weight_updates(log).first().feedback_weight
    assert got == _ref_fold([5, 3])


def test_incremental_fold_seeds_from_current_weights(spark):
    """Folding a log in two seeded batches must equal one unseeded fold of
    the full log — the reference reads each element's CURRENT weight from the
    graph, so a second batch must not restart from the initial constant."""
    full = [5, 5, 1, 3, 2, 4]
    batch1 = spark.createDataFrame(
        [("a", i, s) for i, s in enumerate(full[:3])],
        ["element_id", "seq", "feedback_score"],
    )
    batch2 = spark.createDataFrame(
        [("a", i + 3, s) for i, s in enumerate(full[3:])] + [("b", 0, 5)],
        ["element_id", "seq", "feedback_score"],
    )
    w1 = feedback_weight_updates(batch1)
    w2 = {
        r.element_id: r.feedback_weight
        for r in feedback_weight_updates(batch2, current=w1).collect()
    }
    assert w2["a"] == _ref_fold(full)
    assert w2["b"] == _ref_fold([5])  # unseen element seeds from the initial
    # and WITHOUT seeding, batch 2 alone diverges (restarts from 0.5)
    unseeded = {
        r.element_id: r.feedback_weight
        for r in feedback_weight_updates(batch2).collect()
    }
    assert unseeded["a"] != _ref_fold(full)


def test_incremental_write_back_roundtrip(spark):
    """Edge table → fold batch 1 → write back → fold batch 2 seeded from the
    edge table's stored weights → write back == one full-log fold."""
    edges = spark.createDataFrame(
        [("e1", 0.5), ("e2", 0.5)], ["edge_object_id", "feedback_weight"]
    )
    logs = [[("e1", 0, 5), ("e1", 1, 5)], [("e1", 2, 1), ("e1", 3, 1)]]
    for batch in logs:
        log = spark.createDataFrame(batch, ["element_id", "seq", "feedback_score"])
        current = edges.select(
            F.col("edge_object_id").alias("element_id"), "feedback_weight"
        )
        edges = apply_feedback_to_edges(
            edges, feedback_weight_updates(log, current=current)
        )
    out = {r.edge_object_id: r.feedback_weight for r in edges.collect()}
    assert out["e1"] == _ref_fold([5, 5, 1, 1])
    assert out["e2"] == 0.5


def test_write_back_and_reranking(spark):
    """Negative feedback on one edge must demote it in top-k retrieval; edges
    without feedback keep the default weight."""
    edges = spark.createDataFrame(
        [("e1", 0.5), ("e2", 0.5)], ["edge_object_id", "feedback_weight"]
    )
    log = spark.createDataFrame(
        [("e1", 0, 1)] * 1 + [("e1", i, 1) for i in range(1, 30)],
        ["element_id", "seq", "feedback_score"],
    )
    updates = feedback_weight_updates(log)
    out = {r.edge_object_id: r.feedback_weight for r in apply_feedback_to_edges(edges, updates).collect()}
    assert out["e2"] == 0.5
    assert out["e1"] < 0.05  # 30 rounds of score-1 feedback → weight → ~0

    # re-ranking: equal distances, feedback decides the order
    triples = spark.createDataFrame(
        [("x", "uses", "y"), ("x", "uses", "z")], ["subj", "pred", "obj"]
    )
    dists = spark.createDataFrame(
        [("x", 0.1), ("y", 0.1), ("z", 0.1)], ["name", "distance"]
    )
    fw = spark.createDataFrame(
        [("x", "uses", "y", 0.0), ("x", "uses", "z", 1.0)],
        ["subj", "pred", "obj", "feedback_weight"],
    )
    top = top_k_triplets(
        score_triplets(triples, dists, feedback_blend=0.5, feedback_weights=fw), k=2
    ).collect()
    # z has weight 1.0 (positive) → lower score → rank 1; y demoted
    assert [(r.obj, r.rank) for r in sorted(top, key=lambda r: r.rank)] == [("z", 1), ("y", 2)]


def test_extract_feedback_events_eligibility_and_fanout(spark):
    from cognee_spark.operators.feedback import (
        apply_feedback_to_edges,
        extract_feedback_events,
        feedback_weight_updates,
    )

    qa = spark.createDataFrame(
        [
            # eligible: nodes + edges fan out
            ("u1", "s1", 0, 5, ["n1", "n2"], ["e1"], False),
            # already applied → skipped (exactly-once flag)
            ("u1", "s1", 1, 5, ["n1"], [], True),
            # score out of range → skipped
            ("u1", "s1", 2, 9, ["n1"], [], False),
            # no elements → skipped
            ("u1", "s1", 3, 4, [], [], False),
            # eligible, edge only
            ("u1", "s2", 4, 1, None, ["e1"], False),
        ],
        "user_id string, session_id string, seq long, feedback_score int, "
        "used_node_ids array<string>, used_edge_ids array<string>, "
        "weights_applied boolean",
    )
    out = extract_feedback_events(qa)
    events = {(r.element_id, r.element_kind, r.seq, r.feedback_score)
              for r in out["events"].collect()}
    assert events == {
        ("n1", "node", 0, 5), ("n2", "node", 0, 5),
        ("e1", "edge", 0, 5), ("e1", "edge", 4, 1),
    }
    flags = {r.seq: r.weights_applied for r in out["applied"].collect()}
    assert flags == {0: True, 1: True, 2: False, 3: False, 4: True}
    # replay over the marked frame yields zero events (exactly-once)
    assert extract_feedback_events(out["applied"])["events"].count() == 0

    # the events feed the existing fold + merge unchanged (the full loop)
    edges = spark.createDataFrame(
        [("e1", 0.5), ("e2", 0.5)], "edge_object_id string, feedback_weight double"
    )
    updates = feedback_weight_updates(
        out["events"].where(F.col("element_kind") == "edge")
    )
    w = {r.edge_object_id: r.feedback_weight
         for r in apply_feedback_to_edges(edges, updates).collect()}
    # seq 0 score 5 then seq 4 score 1: 0.5→0.55→0.495
    assert w["e1"] == 0.495 and w["e2"] == 0.5


def test_extract_feedback_events_edge_only_mode_leaves_node_rows_eligible(spark):
    from cognee_spark.operators.feedback import extract_feedback_events

    qa = spark.createDataFrame(
        [
            ("u1", "s1", 0, 5, ["n1"], None, False),   # node-only
            ("u1", "s1", 1, 5, ["n1"], ["e1"], False),  # both
        ],
        "user_id string, session_id string, seq long, feedback_score int, "
        "used_node_ids array<string>, used_edge_ids array<string>, "
        "weights_applied boolean",
    )
    out = extract_feedback_events(qa, kinds=("edge",))
    assert {(r.element_id, r.seq) for r in out["events"].collect()} == {("e1", 1)}
    flags = {r.seq: r.weights_applied for r in out["applied"].collect()}
    # the node-only row stays UNMARKED — its feedback was never applied
    assert flags == {0: False, 1: True}
