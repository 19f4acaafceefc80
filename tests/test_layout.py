"""Semantic 2-D layout (operators/layout.py) vs the reference's
semantic_layout.py, including numpy parity for the PCA stage."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql.functions import col as F_col

from cognee_spark.operators import layout as L


def _ref_pca_2d(matrix):
    """The reference's _pca_2d (semantic_layout.py:37-57), verbatim math."""
    centered = matrix - matrix.mean(axis=0, keepdims=True)
    _, _, vt = np.linalg.svd(centered, full_matrices=False)
    components = vt[:2]
    if components.shape[0] < 2:
        pad = np.zeros((2 - components.shape[0], components.shape[1]))
        components = np.vstack([components, pad])
    for i in range(2):
        loading = components[i]
        j = int(np.argmax(np.abs(loading)))
        if loading[j] < 0:
            components[i] = -loading
    return centered @ components.T


def _ref_normalize(coords, spread=1.0):
    out = np.zeros_like(coords, dtype=float)
    for axis in range(coords.shape[1]):
        col = coords[:, axis]
        lo, hi = float(col.min()), float(col.max())
        if hi > lo:
            out[:, axis] = (2.0 * (col - lo) / (hi - lo) - 1.0) * spread
    return out


def test_pca_positions_match_reference_numpy(spark):
    rng = np.random.default_rng(7)
    mat = rng.normal(size=(40, 8))
    ids = [f"n{i:02d}" for i in range(40)]
    emb = spark.createDataFrame(
        [(i, [float(x) for x in row]) for i, row in zip(ids, mat)],
        "node_id string, vector array<double>",
    )
    got = {r.node_id: (r.x, r.y) for r in L.pca_positions(emb).collect()}
    want = _ref_normalize(_ref_pca_2d(mat))
    for i, nid in enumerate(ids):
        assert got[nid][0] == pytest.approx(want[i][0], abs=1e-6)
        assert got[nid][1] == pytest.approx(want[i][1], abs=1e-6)


def test_pca_degenerate_sizes(spark):
    one = spark.createDataFrame(
        [("a", [1.0, 2.0])], "node_id string, vector array<double>"
    )
    assert L.pca_positions(one).collect()[0][1:] == (0.0, 0.0)
    empty = spark.createDataFrame([], "node_id string, vector array<double>")
    assert L.pca_positions(empty).count() == 0
    # 1-D embeddings: second axis pads to the constant-axis zero
    flat = spark.createDataFrame(
        [("a", [1.0]), ("b", [2.0]), ("c", [3.0])],
        "node_id string, vector array<double>",
    )
    rows = {r.node_id: (r.x, r.y) for r in L.pca_positions(flat).collect()}
    assert rows["a"] == (-1.0, 0.0) and rows["c"] == (1.0, 0.0)


def test_place_missing_centroid_chain_and_ring(spark):
    node_ids = spark.createDataFrame(
        [("p1",), ("p2",), ("m1",), ("m2",), ("iso",)], "node_id string"
    )
    positions = spark.createDataFrame(
        [("p1", -1.0, 0.0), ("p2", 1.0, 0.0)], "node_id string, x double, y double"
    )
    links = spark.createDataFrame(
        # m1 neighbors both positioned nodes; m2 only reaches m1 (round 2)
        [("p1", "m1"), ("m1", "p2"), ("m2", "m1")],
        "source string, target string",
    )
    out = {r.node_id: (r.x, r.y) for r in
           L.place_missing(node_ids, positions, links).collect()}
    assert set(out) == {"p1", "p2", "m1", "m2", "iso"}
    # m1 ≈ centroid of (±1, 0) = origin, within the 3% jitter band
    assert abs(out["m1"][0]) <= 0.031 and abs(out["m1"][1]) <= 0.031
    # m2 ≈ m1 (its only positioned neighbor), within jitter of m1
    assert abs(out["m2"][0] - out["m1"][0]) <= 0.031
    # iso is disconnected → the 1.15-spread ring
    r = math.hypot(out["iso"][0], out["iso"][1])
    assert r == pytest.approx(1.15, abs=1e-9)


def test_deoverlap_separates_coincident_points_deterministically(spark):
    pts = spark.createDataFrame(
        [("a", 0.0, 0.0), ("b", 0.0, 0.0), ("c", 0.5, 0.5)],
        "node_id string, x double, y double",
    )
    out1 = {r.node_id: (r.x, r.y) for r in L.deoverlap(pts).collect()}
    out2 = {r.node_id: (r.x, r.y) for r in L.deoverlap(pts).collect()}
    assert out1 == out2  # seeded determinism
    d = math.hypot(out1["a"][0] - out1["b"][0], out1["a"][1] - out1["b"][1])
    assert d >= L.MIN_SEPARATION * 0.9
    # far point barely moves
    assert math.hypot(out1["c"][0] - 0.5, out1["c"][1] - 0.5) < 0.02


def test_deoverlap_refuses_unbounded_input(spark):
    big = spark.range(0, L.DEOVERLAP_CAP + 10).select(
        F_col("id").cast("string").alias("node_id"),
        (F_col("id") * 0.0).alias("x"),
        (F_col("id") * 0.0).alias("y"),
    )
    with pytest.raises(ValueError):
        L.deoverlap(big)


def test_compute_positions_end_to_end(spark):
    node_ids = spark.createDataFrame(
        [("a",), ("b",), ("c",), ("d",)], "node_id string"
    )
    emb = spark.createDataFrame(
        [("a", [0.0, 0.0]), ("b", [1.0, 0.0]), ("c", [0.0, 1.0])],
        "node_id string, vector array<double>",
    )
    links = spark.createDataFrame([("c", "d")], "source string, target string")
    out = L.compute_positions(node_ids, links, emb)
    rows = {r.node_id: (r.x, r.y) for r in out.collect()}
    assert set(rows) == {"a", "b", "c", "d"}
    assert all(abs(x) <= 1.3 and abs(y) <= 1.3 for x, y in rows.values())
