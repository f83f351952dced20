"""connected_components (large-star/small-star) unit tests.

The O(log n) round bound is the point of the algorithm (VERDICT r3
item 6): a path graph — the adversarial case for min-label
propagation, which needs O(n) rounds — must converge in ~2*log2(n)
rounds, and partially-converged labels must never be returned
silently.
"""

from __future__ import annotations

import math
import random

import pytest

from graphd_spark.inventory_pipeline import connected_components


def _labels_dict(labels_df):
    return {r["id"]: r["label"] for r in labels_df.collect()}


def test_path_graph_logarithmic_rounds(spark):
    """1000-node path: min-label propagation would need ~1000 rounds;
    large-star/small-star must finish in <= 2*log2(n) + 2."""
    n = 1000
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(n - 1)], "src long, dst long"
    )
    labels, rounds = connected_components(edges)
    bound = 2 * math.ceil(math.log2(n)) + 2
    assert rounds <= bound, f"{rounds} rounds > {bound}"
    got = _labels_dict(labels)
    assert len(got) == n
    assert set(got.values()) == {0}


def test_random_graph_matches_union_find(spark):
    """Seeded random graph cross-checked against a driver-side
    union-find."""
    rng = random.Random(42)
    n, m = 300, 220
    edge_list = [
        (rng.randrange(n), rng.randrange(n)) for _ in range(m)
    ]
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    touched = set()
    for a, b in edge_list:
        if a != b:
            touched.add(a)
            touched.add(b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    want = {
        x: min(y for y in touched if find(y) == find(x))
        for x in touched
    }

    edges = spark.createDataFrame(edge_list, "src long, dst long")
    labels, _ = connected_components(edges)
    assert _labels_dict(labels) == want


def test_empty_and_self_loop_edges(spark):
    edges = spark.createDataFrame(
        [(5, 5), (7, 7)], "src long, dst long"
    )
    labels, rounds = connected_components(edges)
    assert labels.collect() == []
    assert rounds == 1


def test_nonconvergence_raises(spark):
    """Exhausting max_rounds must raise, not silently return partial
    labels (ADVICE r3)."""
    edges = spark.createDataFrame(
        [(i, i + 1) for i in range(63)], "src long, dst long"
    )
    with pytest.raises(RuntimeError, match="did not converge"):
        connected_components(edges, max_rounds=1)
