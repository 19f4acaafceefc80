"""Distributed connected components — large-star / small-star (SURVEY L9).

The canonicalization core: alias pairs form a graph over match keys; each
connected component is one canonical entity. The reference gets this "for
free" because ontology rewrite + deterministic ids collapse aliases object-
at-a-time (expand_with_nodes_and_edges.py name_mapping); at 10^12 rows the
only scalable equivalent is the alternating-star iteration of
Kiveris et al., "Connected Components in MapReduce and Beyond" (SOCC'14) —
O(log n) rounds, each a groupBy + join, skew-safe because large-star breaks
high-degree stars.

Driver-side loop over DataFrames with localCheckpoint every round to truncate
lineage (SURVEY §7.3); convergence = edge multiset fixpoint, checked with a
cheap count+xor-hash aggregate rather than a full subtract.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _large_star(edges: DataFrame) -> DataFrame:
    sym = edges.union(edges.select(F.col("v").alias("u"), F.col("u").alias("v")))
    mins = sym.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    return (
        sym.join(mins, "u")
        .where(F.col("v") > F.col("u"))
        .select(F.col("v").alias("u"), F.col("m").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
    )


def _small_star(edges: DataFrame) -> DataFrame:
    directed = edges.select(
        F.greatest("u", "v").alias("u"), F.least("u", "v").alias("v")
    ).distinct()
    mins = directed.groupBy("u").agg(F.least(F.min("v"), F.col("u")).alias("m"))
    joined = directed.join(mins, "u")
    out = joined.select(F.col("v").alias("u"), F.col("m").alias("v")).union(
        mins.select(F.col("u"), F.col("m").alias("v"))
    )
    return out.where(F.col("u") != F.col("v")).distinct()


def _fingerprint(edges: DataFrame) -> tuple[int, int]:
    row = edges.agg(
        F.count(F.lit(1)).alias("n"),
        F.coalesce(F.expr("bit_xor(xxhash64(u, v))"), F.lit(0)).alias("h"),
    ).first()
    return int(row.n), int(row.h)


def connected_components(
    pairs: DataFrame, src: str = "u", dst: str = "v", max_iterations: int = 25
) -> DataFrame:
    """(u, v) undirected pairs → (node, component) with component = min id.

    Nodes appearing only as isolated vertices are the caller's concern (left
    join the result and coalesce to self).
    """
    edges = (
        pairs.select(F.col(src).cast("string").alias("u"), F.col(dst).cast("string").alias("v"))
        .where(F.col("u") != F.col("v"))
        .distinct()
        .localCheckpoint(eager=True)
    )
    previous = _fingerprint(edges)
    for _ in range(max_iterations):
        edges = _small_star(_large_star(edges)).localCheckpoint(eager=True)
        current = _fingerprint(edges)
        if current == previous:
            break
        previous = current
    # fixpoint: every edge points node → component min
    membership = edges.select(F.col("u").alias("node"), F.col("v").alias("component"))
    roots = edges.select(F.col("v").alias("node"), F.col("v").alias("component")).distinct()
    return membership.union(roots).groupBy("node").agg(F.min("component").alias("component"))
