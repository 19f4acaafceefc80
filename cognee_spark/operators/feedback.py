"""Feedback write-back loop — the reference's memify `apply_feedback_weights`
(cognee/tasks/memify/apply_feedback_weights.py:43-60): user feedback scores
(1..5) on answered questions flow back onto the graph elements the answer
used, as a streaming EMA weight update

    rating  = (score - 1) / 4                       # normalize to [0, 1]
    weight' = clip01(weight + alpha * (rating - weight)), rounded to 4 dp

applied PER FEEDBACK EVENT IN ORDER. Retrieval then blends the updated
weights into triplet scoring (score_triplets feedback_blend,
CogneeGraph.py:470-540), closing the query-log → weight → re-ranking loop.

Spark re-expression: the per-element sequential fold is a codegen
``F.aggregate`` over the element's seq-ordered rating list — the per-group
state is one list of ratings (bounded by feedback volume per element, which
is human-generated and tiny relative to the corpus), the fold itself runs
JVM-side, and the whole update is one groupBy + one join. No driver loops,
no Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

FEEDBACK_ALPHA = 0.1
FEEDBACK_INITIAL_WEIGHT = 0.5  # build_edges default (reference default weight)
FEEDBACK_WEIGHT_DECIMALS = 4


def feedback_weight_updates(
    feedback: DataFrame,
    alpha: float = FEEDBACK_ALPHA,
    initial: float = FEEDBACK_INITIAL_WEIGHT,
    id_col: str = "element_id",
    seq_col: str = "seq",
    score_col: str = "feedback_score",
    current: DataFrame | None = None,
) -> DataFrame:
    """Fold a feedback log into per-element weights: (element_id, feedback_weight).

    Input rows: (element_id, seq, feedback_score). Scores outside the integer
    range 1..5 are invalid and ignored (the reference raises per item and its
    runner skips it). Events fold in ``seq`` order per element — the
    streaming semantics of stream_update_weight (apply_feedback_weights.py:
    54-60), including the per-step clip to [0, 1] and 4-decimal rounding.

    SEEDING CONTRACT — this matches the reference, which reads each element's
    CURRENT weight from the graph before folding new events onto it:

    - ``current=None`` (default): every element's fold starts from the
      constant ``initial``. The input MUST therefore be the COMPLETE feedback
      log for the elements it covers — re-folding a partial log would
      silently discard previously learned weights.
    - ``current`` given — a (element_id, feedback_weight) frame of already
      learned weights (e.g. the edge table's current state): each element's
      fold seeds from its current weight (``initial`` for unseen elements),
      so the input may be just the NEW batch of events. Folding a log in two
      seeded batches is exactly equivalent to one unseeded fold of the full
      log (pinned by tests/test_feedback.py).
    """
    rated = feedback.where(
        F.col(score_col).cast("int").between(1, 5)
        & (F.col(score_col).cast("double") == F.col(score_col).cast("int").cast("double"))
    ).select(
        F.col(id_col).alias("element_id"),
        F.struct(
            F.col(seq_col).alias("seq"),
            ((F.col(score_col).cast("double") - 1) / 4.0).alias("rating"),
        ).alias("ev"),
    )
    per_element = rated.groupBy("element_id").agg(
        F.array_sort(F.collect_list("ev")).alias("events")
    )
    if current is not None:
        # no broadcast hint: ``current`` may be the full (corpus-sized) edge
        # table; per_element is feedback-volume-sized, so AQE broadcasts THAT
        # side of the join on its own
        cur = current.select("element_id", F.col("feedback_weight").alias("_seed"))
        per_element = per_element.join(cur, "element_id", "left")
        seed = F.coalesce(F.col("_seed"), F.lit(float(initial)))
    else:
        seed = F.lit(float(initial))
    # explicit half-up rounding (floor(x·10⁴ + 0.5)/10⁴) instead of round():
    # engines disagree on double round() exactly at .xxxx5 midpoints, which
    # the decimal EMA hits constantly; this formula computes the identical
    # double in Spark, DuckDB, and the pure-Python test twin
    scale = float(10**FEEDBACK_WEIGHT_DECIMALS)
    step = lambda acc, ev: (
        F.floor(
            F.least(
                F.greatest(acc + F.lit(alpha) * (ev["rating"] - acc), F.lit(0.0)),
                F.lit(1.0),
            )
            * scale
            + F.lit(0.5)
        )
        / scale
    )
    return per_element.select(
        "element_id",
        F.aggregate("events", seed.cast("double"), step).alias("feedback_weight"),
    )


def apply_feedback_to_edges(
    edges: DataFrame,
    updates: DataFrame,
    edge_id_col: str = "edge_object_id",
) -> DataFrame:
    """Write the folded weights back onto the edge table (elements without
    feedback keep their current weight) — the MERGE half of the loop.

    For INCREMENTAL application (a new feedback batch against an
    already-updated edge table) build ``updates`` with
    ``feedback_weight_updates(batch, current=edges.select(
    F.col(edge_id_col).alias("element_id"), "feedback_weight"))`` so the fold
    seeds from the stored weights instead of restarting at the initial
    constant — see the seeding contract on feedback_weight_updates."""
    u = updates.select(
        F.col("element_id").alias(edge_id_col),
        F.col("feedback_weight").alias("_new_weight"),
    )
    return (
        edges.join(u, edge_id_col, "left")
        .withColumn("feedback_weight", F.coalesce("_new_weight", "feedback_weight"))
        .drop("_new_weight")
    )


def extract_feedback_events(
    qa: DataFrame,
    node_col: str = "used_node_ids",
    edge_col: str = "used_edge_ids",
    applied_col: str = "weights_applied",
    kinds: tuple[str, ...] = ("node", "edge"),
) -> dict[str, DataFrame]:
    """Session QA entries → per-element feedback events — the extraction
    half of the reference's feedback pipeline (tasks/memify/
    extract_feedback_qas.py:16-45 ``_is_eligible`` + per-entry fan-out):
    an entry is eligible when its score is an integer 1..5, the weights
    were NOT already applied (the memify_metadata exactly-once flag), and
    it names at least one used graph element; each eligible entry fans out
    into one event per used node/edge id.

    ``qa``: (user_id, session_id, seq, feedback_score, <node_col>,
    <edge_col>, <applied_col>) where the id columns are array<string> and
    ``seq`` is the caller's global event order (the fold in
    :func:`feedback_weight_updates` orders per element by it).

    ``kinds`` restricts which element families the caller will actually
    APPLY ("edge",) when only an edge-weight table exists): excluded
    families neither fan out NOR count toward eligibility, so an entry
    naming only excluded elements stays UNMARKED and remains eligible for
    a later pass that can apply it — marking it now would consume the
    feedback forever without any weight changing.

    Returns {"events": (element_id, element_kind, seq, feedback_score),
    "applied": the input with <applied_col> set true on processed rows} —
    committing ``applied`` back is the reference's mark-on-full-success
    step, making a replayed extraction yield zero events (exactly-once).
    """
    score = F.col("feedback_score")
    empty = F.array().cast("array<string>")
    nodes = F.coalesce(F.col(node_col), empty) if "node" in kinds else empty
    edges = F.coalesce(F.col(edge_col), empty) if "edge" in kinds else empty
    has_elements = (F.size(nodes) > 0) | (F.size(edges) > 0)
    eligible = (
        score.isNotNull()
        & (score >= 1)
        & (score <= 5)
        & ~F.coalesce(F.col(applied_col), F.lit(False))
        & has_elements
    )
    src = qa.where(eligible)
    tagged = F.concat(
        F.transform(nodes, lambda i: F.struct(i.alias("element_id"),
                                              F.lit("node").alias("element_kind"))),
        F.transform(edges, lambda i: F.struct(i.alias("element_id"),
                                              F.lit("edge").alias("element_kind"))),
    )
    events = src.select(
        F.col("seq").cast("long").alias("seq"),
        score.cast("int").alias("feedback_score"),
        F.explode(tagged).alias("_e"),
    ).select(
        F.col("_e.element_id").alias("element_id"),
        F.col("_e.element_kind").alias("element_kind"),
        "seq", "feedback_score",
    ).where(F.col("element_id").isNotNull() & (F.col("element_id") != ""))
    applied = qa.withColumn(
        applied_col, F.coalesce(F.col(applied_col), F.lit(False)) | eligible
    )
    return {"events": events, "applied": applied}
