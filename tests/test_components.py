"""Connected components (large-star/small-star) vs a pure union-find oracle."""

from __future__ import annotations

import random

from cognee_spark.operators.components import connected_components


def _oracle(pairs: list[tuple[str, str]]) -> dict[str, str]:
    parent: dict[str, str] = {}

    def find(x: str) -> str:
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in pairs:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # path-compress to component min
    return {n: find(n) for n in list(parent)}


def _check(spark, pairs):
    df = spark.createDataFrame(pairs, ["u", "v"])
    got = {r.node: r.component for r in connected_components(df).collect()}
    assert got == _oracle(pairs)


def test_simple_chain(spark):
    _check(spark, [("b", "a"), ("c", "b"), ("e", "d")])


def test_star_and_cycle(spark):
    pairs = [("hub", f"leaf{i}") for i in range(20)]
    pairs += [("x1", "x2"), ("x2", "x3"), ("x3", "x1")]
    _check(spark, pairs)


def test_random_graphs(spark):
    rng = random.Random(7)
    nodes = [f"n{i:03d}" for i in range(120)]
    pairs = [(rng.choice(nodes), rng.choice(nodes)) for _ in range(150)]
    pairs = [(a, b) for a, b in pairs if a != b]
    _check(spark, pairs)


def test_pathological_long_path(spark):
    """A 64-node path needs O(log n) star rounds, not 64."""
    pairs = [(f"p{i:02d}", f"p{i + 1:02d}") for i in range(63)]
    _check(spark, pairs)
