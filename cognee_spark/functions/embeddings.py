"""Deterministic hash-embeddings — the pipeline's embedding seam.

The reference embeds every indexable field of every DataPoint into a
per-(type, field) vector collection (cognee/tasks/storage/
index_data_points.py:10-68, index_graph_edges.py:39-52) through an embedding
engine; all retrieval starts from those collections. The engine itself is a
network call — here the seam is filled with a deterministic hash embedding so
the whole index/retrieve path is testable and oracle-replayable:

    component_j(text) = int(md5(f"{j}|{text}")[:8], 16) / 0xFFFFFFFF * 2 - 1

computed JVM-side (md5 + conv inside whole-stage codegen — no Python in the
hot path), with a pure-Python twin for the golden oracle. Swapping in a real
encoder is a one-function change (batch seam identical to the extractor's).

Hash embeddings have no semantic geometry, but they exercise the exact same
distributed plumbing: per-collection tables, cosine top-k, IVF blocking.
"""

from __future__ import annotations

import hashlib

from pyspark.sql import Column
from pyspark.sql import functions as F

DEFAULT_DIM = 16
_SCALE = float(0xFFFFFFFF)


def hash_embedding_col(text: Column, dim: int = DEFAULT_DIM) -> Column:
    """array<double> hash embedding of ``text`` (unit-free, in [-1, 1])."""
    return F.array(
        *[
            (
                F.conv(
                    F.substring(F.md5(F.concat(F.lit(f"{j}|"), text)), 1, 8), 16, 10
                ).cast("double")
                / F.lit(_SCALE)
            )
            * 2.0
            - 1.0
            for j in range(dim)
        ]
    )


def hash_embedding_py(text: str, dim: int = DEFAULT_DIM) -> list[float]:
    """Pure-Python twin of :func:`hash_embedding_col` (oracle side)."""
    return [
        int(hashlib.md5(f"{j}|{text}".encode()).hexdigest()[:8], 16) / _SCALE * 2.0
        - 1.0
        for j in range(dim)
    ]


def cosine_py(a: list[float], b: list[float]) -> float:
    dot = sum(x * y for x, y in zip(a, b))
    na = sum(x * x for x in a) ** 0.5
    nb = sum(x * x for x in b) ** 0.5
    return dot / (na * nb) if na and nb else 0.0
