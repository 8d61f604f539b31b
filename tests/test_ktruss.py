"""k-truss peeling (linkgraph/algorithms/ktruss.py) on hand-built
graphs with known truss structure."""

from __future__ import annotations

import itertools

import pytest

from conftest import edges_df

from linkgraph.algorithms.ktruss import k_truss, truss_peel_rounds
from linkgraph.graph import Graph


def _graph(spark, edges):
    return Graph.from_edges(edges_df(spark, edges), num_partitions=4)


def test_triangle_with_pendant(spark):
    # 3-truss of triangle {0,1,2} + pendant 2-3 = the triangle only
    g = _graph(spark, [(0, 1), (1, 2), (2, 0), (2, 3)])
    got = {(r.a, r.b): r.support for r in k_truss(g, 3).collect()}
    assert got == {(0, 1): 1, (1, 2): 1, (0, 2): 1}


def test_k4_is_4truss(spark):
    # K4: every edge lies on 2 triangles → the whole graph is a 4-truss
    edges = list(itertools.combinations(range(4), 2))
    g = _graph(spark, edges)
    got = {(r.a, r.b): r.support for r in k_truss(g, 4).collect()}
    assert got == {(a, b): 2 for a, b in edges}
    # but the 5-truss is empty
    assert k_truss(g, 5).count() == 0


def test_cascading_peel(spark):
    # two triangles sharing edge (1,2), plus triangle {4,5,6} glued by
    # edge (2,4): the 4-truss is empty — dropping the outer edges
    # cascades (edge (1,2) alone has support 2 but loses it once its
    # neighbors go)
    edges = [
        (0, 1), (0, 2), (1, 2),
        (1, 3), (2, 3),
        (4, 5), (4, 6), (5, 6), (2, 4),
    ]
    g = _graph(spark, edges)
    assert k_truss(g, 4).count() == 0
    # the 3-truss keeps both triangle clusters but drops the glue edge
    got = {(r.a, r.b) for r in k_truss(g, 3).collect()}
    assert (2, 4) not in got
    assert {(0, 1), (0, 2), (1, 2), (1, 3), (2, 3)} <= got
    assert {(4, 5), (4, 6), (5, 6)} <= got


def test_k_below_3_raises(spark):
    g = _graph(spark, [(0, 1)])
    with pytest.raises(ValueError):
        k_truss(g, 2)


def test_peel_rounds_prefix_of_fixpoint(spark):
    # enough rounds → the partial peel equals the fixpoint
    edges = [
        (0, 1), (0, 2), (1, 2),
        (1, 3), (2, 3), (3, 7),
        (4, 5), (4, 6), (5, 6), (2, 4),
    ]
    g = _graph(spark, edges)
    full = {(r.a, r.b): r.support for r in k_truss(g, 3).collect()}
    part = {
        (r.a, r.b): r.support
        for r in truss_peel_rounds(g, 3, rounds=8).collect()
    }
    assert part == full
    # zero rounds = support over the raw canonical edges
    raw = {
        (r.a, r.b): r.support
        for r in truss_peel_rounds(g, 3, rounds=0).collect()
    }
    assert raw[(3, 7)] == 0 and raw[(2, 4)] == 0


def _trussness_oracle(edges):
    """Sequential peeling truss decomposition over the simple undirected
    graph: t(e) = k-1 when e is dropped while peeling toward the
    k-truss; triangle-free edges get 2."""
    canon = {(min(a, b), max(a, b)) for a, b in edges if a != b}
    t = {}
    k = 3
    while canon:
        while True:
            sup = {e: 0 for e in canon}
            for x, y in canon:
                for z in {v for e in canon for v in e}:
                    if z == x or z == y:
                        continue
                    if (min(x, z), max(x, z)) in canon and (
                        min(y, z), max(y, z)
                    ) in canon:
                        sup[(x, y)] += 1
                sup[(x, y)] //= 1
            drop = {e for e, s_ in sup.items() if s_ < k - 2}
            if not drop:
                break
            for e in drop:
                t[e] = k - 1
            canon -= drop
        k += 1
        if k > 64:
            for e in canon:
                t[e] = k - 1
            break
    return t


def test_trussness_hand_graphs(spark):
    from linkgraph.algorithms.ktruss import trussness

    # K4 (trussness 4) + pendant triangle sharing vertex 3 (trussness 3)
    # + a chain edge (trussness 2)
    k4 = [(a, b) for a in range(4) for b in range(a + 1, 4)]
    extra = [(3, 4), (3, 5), (4, 5), (5, 6)]
    g = _graph(spark, k4 + extra)
    got = {(r.a, r.b): r.trussness for r in trussness(g).collect()}
    want = _trussness_oracle(k4 + extra)
    assert got == want, (got, want)
    assert got[(0, 1)] == 4 and got[(3, 4)] == 3 and got[(5, 6)] == 2


def test_trussness_matches_ktruss_slices(spark):
    """trussness(e) >= k  <=>  e in k_truss(k), for every k present."""
    import random

    from linkgraph.algorithms.ktruss import k_truss, trussness

    rng = random.Random(5)
    edges = list({(rng.randrange(12), rng.randrange(12)) for _ in range(46)})
    edges = [(a, b) for a, b in edges if a != b]
    g = _graph(spark, edges)
    tn = {(r.a, r.b): r.trussness for r in trussness(g).collect()}
    assert tn == _trussness_oracle(edges)
    for k in sorted({v for v in tn.values() if v >= 3}):
        in_truss = {(r.a, r.b) for r in k_truss(g, k).collect()}
        assert in_truss == {e for e, v in tn.items() if v >= k}, k
