"""Connected components: label propagation vs large-star/small-star.

The star variant must produce bit-identical (doc_id, component) output on
every graph shape — including the adversarial long chains where
propagation needs O(diameter) rounds and the star algorithm O(log n).
"""

from __future__ import annotations

import random

import pytest

from tidb2dw_spark.functions.dedup import (
    connected_components,
    connected_components_star,
)


def _pairs_df(spark, edges):
    return spark.createDataFrame(
        [(int(a), int(b)) for a, b in edges], "id_a long, id_b long"
    )


def _run(fn, spark, edges, **kw):
    out = fn(_pairs_df(spark, edges), **kw).collect()
    return sorted((r["doc_id"], r["component"]) for r in out)


def _expected(edges):
    """Driver-side union-find reference.  Self-pairs register the node
    (its own component) without uniting — matching the SQL oracle's
    reflexive closure and both distributed implementations."""
    parent = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        parent.setdefault(a, a), parent.setdefault(b, b)
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    comp = {}
    for n in parent:
        comp.setdefault(find(n), []).append(n)
    return sorted((n, root) for root, ns in comp.items() for n in ns)


@pytest.mark.parametrize(
    "edges",
    [
        [(1, 2), (2, 3), (10, 11)],                       # two small comps
        [(5, 5), (1, 2)],                                  # self loop dropped
        [(2, 1), (1, 2), (3, 2)],                          # duplicates/reversed
        [(i, i + 1) for i in range(30)],                   # chain
        [(0, i) for i in range(1, 20)],                    # star centred on min
        [(19, i) for i in range(19)],                      # star centred on MAX
    ],
)
def test_star_matches_unionfind_and_propagation(spark, edges):
    exp = _expected(edges)
    assert _run(connected_components_star, spark, edges) == exp
    assert _run(connected_components, spark, edges) == exp


def test_star_long_chain_few_rounds(spark):
    """A 150-node shuffled-id chain: diameter 149.  Propagation would need
    ~149 rounds; the star algorithm must finish well within 12."""
    rng = random.Random(4)
    ids = list(range(1000, 1150))
    rng.shuffle(ids)
    edges = list(zip(ids, ids[1:]))
    got = _run(connected_components_star, spark, edges, max_iter=12)
    root = min(ids)
    assert got == sorted((n, root) for n in ids)


def test_star_random_graph_matches(spark):
    rng = random.Random(99)
    nodes = list(range(200))
    edges = [
        (rng.choice(nodes), rng.choice(nodes)) for _ in range(120)
    ]
    edges = [(a, b) for a, b in edges if a != b]
    exp = _expected(edges)
    assert _run(connected_components_star, spark, edges) == exp
    assert _run(connected_components, spark, edges) == exp


def test_star_empty_pairs(spark):
    assert _run(connected_components_star, spark, []) == []
