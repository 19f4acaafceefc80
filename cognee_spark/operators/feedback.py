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
