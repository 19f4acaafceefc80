"""Semantic 2-D layout — the reference's pinned-position projection
(cognee/modules/visualization/layouts/semantic_layout.py:1-200)
re-expressed Spark-first.

The reference loads every embedding into one numpy matrix, runs SVD on the
driver, and iterates Python dicts for neighbor placement — bounded there by
a node cap. Here each stage keeps its natural scale:

- PCA            → ``pyspark.ml.feature.PCA`` (distributed covariance /
                   SVD); only the k×d component matrix and the d-vector of
                   column means come to the driver. The reference's
                   deterministic sign convention (largest-|loading| forced
                   positive, ``_pca_2d``) is applied to that small matrix,
                   and the centered projection ``(v - mean) @ C.T`` runs as
                   a codegen dot product over every row.
- axis normalize → one min/max aggregate + a codegen rescale into
                   [-spread, spread] (``_normalize``).
- missing nodes  → the reference's iterated neighbor-centroid pass
                   (``_place_missing``) becomes join rounds: unpositioned
                   nodes average their positioned neighbors' coordinates,
                   repeated until no node moves; still-disconnected nodes
                   land on the deterministic ring via
                   :func:`~cognee_spark.functions.indexing.dense_index`.
- de-overlap     → the reference's O(n²) seeded relaxation
                   (``_deoverlap``) stays O(n²) by nature; it exists to
                   legibly spread a BOUNDED visualization (callers cap at
                   ``max_nodes``), so it runs on collected rows behind an
                   explicit bound guard — not silently on an unbounded
                   frame.

Determinism deviation, documented: the reference jitters with one
sequential ``np.random.Generator`` whose draws depend on iteration order —
meaningless under partitioning. Jitter here derives from ``xxhash64`` of
the node id (same seeded-jitter purpose, deterministic under any
partitioning, different exact values).
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

SPREAD = 1.0  # semantic_layout.py:31
MIN_SEPARATION = 0.02  # semantic_layout.py:33
LAYOUT_SEED = 42  # semantic_layout.py:34
DEOVERLAP_CAP = 2000  # the bound the reference's node cap implies


def _dot_with(vec_col, weights: list[float]):
    """Codegen dot product of an array column with a small literal vector."""
    lit = F.array(*[F.lit(float(w)) for w in weights])
    return F.aggregate(
        F.zip_with(vec_col, lit, lambda a, b: a * b),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def pca_positions(
    embeddings: DataFrame,
    id_col: str = "node_id",
    vec_col: str = "vector",
    spread: float = SPREAD,
) -> DataFrame:
    """(node_id, x, y): centered PCA projection normalized per axis into
    [-spread, spread] (_pca_2d + _normalize, semantic_layout.py:37-81).

    Driver state is the 2×d component matrix and the d-vector mean; the
    per-row projection and the rescale are whole-stage codegen. One
    embedded node sits at the origin; zero embedded nodes yield an empty
    frame (the reference's degenerate branches)."""
    import numpy as np
    from pyspark.ml.feature import PCA as MLPCA
    from pyspark.ml.functions import array_to_vector

    n = embeddings.count()
    if n == 0:
        return embeddings.sparkSession.createDataFrame(
            [], f"{id_col} string, x double, y double"
        )
    if n == 1:
        return embeddings.select(
            F.col(id_col), F.lit(0.0).alias("x"), F.lit(0.0).alias("y")
        )

    vecs = embeddings.select(
        F.col(id_col), F.col(vec_col).cast("array<double>").alias("_v")
    ).localCheckpoint(eager=True)
    dim = len(vecs.first()["_v"])
    k = min(2, dim)
    model = MLPCA(k=k, inputCol="_mlvec", outputCol="_pca").fit(
        vecs.select(array_to_vector(F.col("_v")).alias("_mlvec"))
    )
    components = model.pc.toArray().T.copy()  # (k, d)
    if components.shape[0] < 2:  # degenerate: pad the second axis with zeros
        pad = np.zeros((2 - components.shape[0], components.shape[1]))
        components = np.vstack([components, pad])
    # deterministic sign convention (_pca_2d): largest-|loading| positive
    for i in range(2):
        j = int(np.argmax(np.abs(components[i])))
        if components[i][j] < 0:
            components[i] = -components[i]

    mean = (
        vecs.select(
            F.array(
                *[F.avg(F.col("_v")[i]).alias(f"m{i}") for i in range(dim)]
            ).alias("m")
        ).first()["m"]
    )
    centered = F.zip_with(
        F.col("_v"), F.array(*[F.lit(float(m)) for m in mean]), lambda a, b: a - b
    )
    raw = vecs.select(
        F.col(id_col),
        _dot_with(centered, list(components[0])).alias("x"),
        _dot_with(centered, list(components[1])).alias("y"),
    )

    # min-max normalize each axis into [-spread, spread]; constant axis → 0
    bounds = raw.agg(
        F.min("x").alias("xlo"), F.max("x").alias("xhi"),
        F.min("y").alias("ylo"), F.max("y").alias("yhi"),
    ).first()

    def scale(col, lo, hi):
        if hi > lo:
            return (2.0 * (col - F.lit(lo)) / F.lit(hi - lo) - 1.0) * spread
        return F.lit(0.0)

    return raw.select(
        F.col(id_col),
        scale(F.col("x"), bounds["xlo"], bounds["xhi"]).alias("x"),
        scale(F.col("y"), bounds["ylo"], bounds["yhi"]).alias("y"),
    )


def _hash_jitter(col, salt: str, scale: float):
    """Deterministic per-node jitter in [-scale, scale] from xxhash64."""
    h = F.xxhash64(col, F.lit(salt))
    # Spark's % keeps the dividend's sign; fold to [0, 100000) first
    positive = ((h % 100_000) + 100_000) % 100_000
    unit = positive.cast("double") / 50_000.0 - 1.0
    return unit * scale


def place_missing(
    node_ids: DataFrame,
    positions: DataFrame,
    links: DataFrame,
    spread: float = SPREAD,
    max_rounds: int = 20,
    id_col: str = "node_id",
    src: str = "source",
    dst: str = "target",
) -> DataFrame:
    """Coordinates for every node (_place_missing, semantic_layout.py:84-119):
    vectorless nodes take their positioned neighbors' centroid (+ a small
    deterministic jitter), iterated so chains resolve; nodes disconnected
    from every positioned node land on the 1.15-spread ring, indexed by
    :func:`dense_index` over their ids (the reference enumerates its sorted
    list)."""
    from cognee_spark.functions.indexing import dense_index

    sym = links.select(F.col(src).alias("a"), F.col(dst).alias("b")).unionByName(
        links.select(F.col(dst).alias("a"), F.col(src).alias("b"))
    )
    positioned = positions.select(id_col, "x", "y").localCheckpoint(eager=True)
    for _ in range(max_rounds):
        missing = node_ids.select(id_col).join(
            positioned.select(id_col), id_col, "left_anti"
        )
        if missing.limit(1).count() == 0:
            break
        placed = (
            missing.join(sym, missing[id_col] == sym["a"])
            .join(
                positioned.withColumnRenamed(id_col, "_nbr"),
                sym["b"] == F.col("_nbr"),
            )
            .groupBy(missing[id_col].alias(id_col))
            .agg(F.avg("x").alias("cx"), F.avg("y").alias("cy"))
            .select(
                id_col,
                (F.col("cx") + _hash_jitter(F.col(id_col), "jx", 0.03 * spread)).alias("x"),
                (F.col("cy") + _hash_jitter(F.col(id_col), "jy", 0.03 * spread)).alias("y"),
            )
        )
        if placed.limit(1).count() == 0:
            break
        positioned = positioned.unionByName(placed).localCheckpoint(eager=True)

    still = node_ids.select(id_col).join(
        positioned.select(id_col), id_col, "left_anti"
    )
    m = still.count()
    if m > 0:
        ringed = dense_index(still, [id_col], "_k").select(
            id_col,
            (1.15 * spread * F.cos(2.0 * math.pi * F.col("_k") / m)).alias("x"),
            (1.15 * spread * F.sin(2.0 * math.pi * F.col("_k") / m)).alias("y"),
        )
        positioned = positioned.unionByName(ringed)
    return positioned


def deoverlap(
    positions: DataFrame,
    min_dist: float = MIN_SEPARATION * SPREAD,
    iterations: int = 40,
    cap: int = DEOVERLAP_CAP,
    id_col: str = "node_id",
) -> DataFrame:
    """Seeded O(n²) relaxation spreading coincident points (_deoverlap,
    semantic_layout.py:124-156) — numpy over a BOUNDED frame.

    Visualization callers cap their graphs (``bounded_subgraph`` max_nodes);
    this guard refuses unbounded input instead of silently collecting it."""
    import numpy as np

    rows = positions.limit(cap + 1).collect()
    if len(rows) > cap:
        raise ValueError(
            f"deoverlap is O(n²) and bounded at {cap} nodes; cap the input "
            "(bounded_subgraph max_nodes) or raise cap explicitly."
        )
    if len(rows) < 2:
        return positions
    rows = sorted(rows, key=lambda r: r[id_col])
    pts = np.array([[r["x"], r["y"]] for r in rows], dtype=float)
    rng = np.random.default_rng(LAYOUT_SEED)
    pts = pts + rng.uniform(-min_dist / 4, min_dist / 4, size=pts.shape)
    for _ in range(iterations):
        diff = pts[:, None, :] - pts[None, :, :]
        dist = np.sqrt((diff**2).sum(axis=2))
        np.fill_diagonal(dist, min_dist)
        too_close = dist < min_dist
        if not too_close.any():
            break
        safe = np.where(dist == 0, 1.0, dist)
        push = np.where(too_close, (min_dist - dist) / safe, 0.0)
        pts = pts + (diff * push[:, :, None]).sum(axis=1) * 0.5
    spark = positions.sparkSession
    return spark.createDataFrame(
        [(r[id_col], float(p[0]), float(p[1])) for r, p in zip(rows, pts)],
        f"{id_col} string, x double, y double",
    )


def compute_positions(
    node_ids: DataFrame,
    links: DataFrame,
    embeddings: DataFrame,
    spread: float = SPREAD,
    min_separation: float = MIN_SEPARATION,
    id_col: str = "node_id",
) -> DataFrame:
    """One coordinate per node (compute_positions, semantic_layout.py:159-200):
    PCA over the embedded nodes, neighbor-centroid/ring placement for the
    rest, then the bounded de-overlap pass."""
    pos = pca_positions(embeddings, id_col=id_col, spread=spread)
    pos = place_missing(node_ids, pos, links, spread=spread, id_col=id_col)
    return deoverlap(pos, min_dist=min_separation * spread, id_col=id_col)
