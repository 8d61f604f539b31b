"""SALSA + scalar graph statistics (salsa.py, graphstats.py) on
hand-computable fixtures with NumPy differential checks."""

from __future__ import annotations

import numpy as np
import pytest

from conftest import edges_df

from linkgraph.algorithms.graphstats import (
    clustering_coefficients,
    degree_assortativity,
    global_clustering,
    reciprocity,
)
from linkgraph.algorithms.salsa import salsa
from linkgraph.graph import Graph


def _graph(spark, edges):
    return Graph.from_edges(edges_df(spark, edges), num_partitions=4)


def test_reciprocity_hand(spark):
    # 0↔1 reciprocal pair (2 reciprocal edges), 1→2 and 2→3 one-way
    g = _graph(spark, [(0, 1), (1, 0), (1, 2), (2, 3)])
    row = reciprocity(g).collect()[0]
    assert row.n_edges == 4
    assert row.n_reciprocal == 2
    assert row.reciprocity == 0.5


def test_reciprocity_none_and_all(spark):
    r0 = reciprocity(_graph(spark, [(0, 1), (1, 2)])).collect()[0]
    assert r0.reciprocity == 0.0
    r1 = reciprocity(_graph(spark, [(0, 1), (1, 0)])).collect()[0]
    assert r1.reciprocity == 1.0


def test_assortativity_numpy_differential(spark):
    import random

    rng = random.Random(3)
    edges = sorted({(rng.randrange(25), rng.randrange(25)) for _ in range(80)})
    edges = [(s, d) for s, d in edges if s != d]
    g = _graph(spark, edges)
    row = degree_assortativity(g).collect()[0]

    out_d, in_d = {}, {}
    for s, d in edges:
        out_d[s] = out_d.get(s, 0) + 1
        in_d[d] = in_d.get(d, 0) + 1
    x = np.array([out_d[s] for s, d in edges], dtype=float)
    y = np.array([in_d[d] for s, d in edges], dtype=float)
    expect = np.corrcoef(x, y)[0, 1]
    assert row.n_edges == len(edges)
    assert row.assortativity == pytest.approx(expect, abs=1e-6)


def test_clustering_triangle_plus_tail(spark):
    # triangle {0,1,2} plus a tail 2-3: deg(2)=3 → lcc(2)=1/3
    g = _graph(spark, [(0, 1), (1, 2), (2, 0), (2, 3)])
    got = {r.vid: r for r in clustering_coefficients(g).collect()}
    assert got[0].lcc == 1.0 and got[1].lcc == 1.0
    assert got[2].deg == 3 and got[2].triangles == 1
    assert got[2].lcc == round(1 / 3, 6)
    assert got[3].lcc == 0.0


def test_global_clustering_hand(spark):
    # one triangle, wedges = C(2,2)*2 + C(3,2) = 1+1+3 = 5 → 3/5
    g = _graph(spark, [(0, 1), (1, 2), (2, 0), (2, 3)])
    row = global_clustering(g).collect()[0]
    assert row.triangles == 1
    assert row.wedges == 1 + 1 + 3 + 0
    assert row.transitivity == 0.6


def test_salsa_stationary_semantics(spark):
    # star: hub 0 points at 1,2,3 — authorities split evenly, hub 0
    # takes all hub mass
    g = _graph(spark, [(0, 1), (0, 2), (0, 3)])
    res = salsa(g, tol=1e-12, max_iters=30)
    got = {r.vid: r for r in res.state.collect()}
    assert got[1].auth == pytest.approx(1 / 3, abs=1e-9)
    assert got[2].auth == pytest.approx(1 / 3, abs=1e-9)
    assert got[0].hub == pytest.approx(1.0, abs=1e-9)
    assert got[0].auth == pytest.approx(0.0, abs=1e-12)


def test_salsa_numpy_differential(spark):
    import random

    rng = random.Random(5)
    edges = sorted({(rng.randrange(12), rng.randrange(12)) for _ in range(30)})
    edges = [(s, d) for s, d in edges if s != d]
    g = _graph(spark, edges)
    res = salsa(g, tol=0.0, max_iters=6)
    got = {r.vid: (r.hub, r.auth) for r in res.state.collect()}

    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    out_d = np.zeros(n)
    in_d = np.zeros(n)
    for s, d in edges:
        out_d[idx[s]] += 1
        in_d[idx[d]] += 1
    h = np.full(n, 1.0 / n)
    for _ in range(6):
        a = np.zeros(n)
        for s, d in edges:
            a[idx[d]] += h[idx[s]] / out_d[idx[s]]
        if a.sum() > 0:
            a = a / a.sum()
        h2 = np.zeros(n)
        for s, d in edges:
            h2[idx[s]] += a[idx[d]] / in_d[idx[d]]
        if h2.sum() > 0:
            h2 = h2 / h2.sum()
        h = h2
    for v in verts:
        assert got[v][0] == pytest.approx(h[idx[v]], abs=1e-9)
        assert got[v][1] == pytest.approx(a[idx[v]], abs=1e-9)


def test_eigen_numpy_differential(spark):
    import random

    from linkgraph.algorithms.eigen import eigenvector_centrality

    rng = random.Random(9)
    edges = sorted({(rng.randrange(15), rng.randrange(15)) for _ in range(45)})
    edges = [(s, d) for s, d in edges if s != d]
    g = _graph(spark, edges)
    res = eigenvector_centrality(g, tol=0.0, max_iters=8)
    got = {r.vid: r.score for r in res.state.collect()}

    verts = sorted({v for e in edges for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    x = np.ones(len(verts))
    for _ in range(8):
        nx = np.zeros(len(verts))
        for s, d in edges:
            nx[idx[d]] += x[idx[s]]
        n = np.sqrt((nx * nx).sum())
        x = nx / n if n > 0 else nx
    for v in verts:
        assert got[v] == pytest.approx(x[idx[v]], abs=1e-9)


def test_salsa_simplex(spark):
    # scores are distributions: each vector sums to 1
    g = _graph(spark, [(0, 1), (1, 2), (2, 0), (0, 2)])
    res = salsa(g, tol=0.0, max_iters=4)
    rows = res.state.collect()
    assert sum(r.hub for r in rows) == pytest.approx(1.0, abs=1e-9)
    assert sum(r.auth for r in rows) == pytest.approx(1.0, abs=1e-9)


def test_double_sweep_exact_on_tree(spark):
    from linkgraph.algorithms.graphstats import double_sweep_diameter

    # Y-tree: path 0-1-2-3-4 plus branch 2-5-6-7.  Distances from 0:
    # d(4)=4, d(7)=2+3=5 → ecc(0)=5, pivot=7; ecc(7)=dist(7,4)=3+2=5 =
    # the true diameter (double sweep is exact on trees).
    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (2, 5), (5, 6), (6, 7)]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=2)
    row = double_sweep_diameter(g, source=0).collect()[0]
    assert row.start_vid == 0
    assert row.ecc_start == 5
    assert row.far_vid == 7
    assert row.diameter_lb == 5


def test_double_sweep_cycle_lower_bound(spark):
    from linkgraph.algorithms.graphstats import double_sweep_diameter

    # C6: every eccentricity is 3; double sweep reports 3 (= diameter).
    edges = [(i, (i + 1) % 6) for i in range(6)]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=2)
    row = double_sweep_diameter(g, source=0).collect()[0]
    assert row.ecc_start == 3 and row.diameter_lb == 3


def test_powerlaw_alpha_hand_computed(spark):
    from linkgraph.algorithms.graphstats import powerlaw_alpha

    # in-degrees: v1←{0,2,3}, v2←{0,3}, v3←{0} → indegs 3,2,1
    g = _graph(spark, [(0, 1), (2, 1), (3, 1), (0, 2), (3, 2), (0, 3)])
    row = powerlaw_alpha(g, xmin=2).collect()[0]
    tail = [3, 2]
    want = 1.0 + len(tail) / sum(np.log(d / 1.5) for d in tail)
    assert row.xmin == 2 and row.n_tail == 2
    assert abs(row.alpha - round(want, 6)) < 1e-9


def test_powerlaw_alpha_zipf_recovers_exponent(spark):
    """On a synthetic graph whose in-degree tail is Pareto-ish with
    exponent ~2.5, the MLE should land in the right neighborhood."""
    import random as _r

    from linkgraph.algorithms.graphstats import powerlaw_alpha

    rng = _r.Random(11)
    edges = []
    vid = 0
    # discrete power-law in-degree sample via inverse transform
    for t in range(400):
        d = int((1.0 - rng.random()) ** (-1.0 / 1.5))  # alpha = 2.5
        d = min(d, 200)
        for j in range(d):
            edges.append((vid + 1 + j, vid))
        vid += d + 1
    g = _graph(spark, edges)
    row = powerlaw_alpha(g, xmin=2).collect()[0]
    assert 2.0 < row.alpha < 3.2, row.alpha


def test_powerlaw_alpha_rejects_bad_xmin(spark):
    import pytest as _pytest

    from linkgraph.algorithms.graphstats import powerlaw_alpha

    g = _graph(spark, [(0, 1)])
    with _pytest.raises(ValueError):
        powerlaw_alpha(g, xmin=0)


def test_bipartite_components_hand(spark):
    from linkgraph.algorithms.graphstats import bipartite_components

    # comp 0: even cycle 0-1-2-3 (bipartite); comp 4: triangle 4-5-6
    # (odd cycle, 1 conflict); comp 7: path 7-8 (bipartite)
    g = _graph(
        spark,
        [(0, 1), (1, 2), (2, 3), (3, 0), (4, 5), (5, 6), (6, 4), (7, 8)],
    )
    got = {
        r.comp: (r.n_vertices, r.n_conflict_edges, r.is_bipartite)
        for r in bipartite_components(g).collect()
    }
    assert got == {0: (4, 0, 1), 4: (3, 1, 0), 7: (2, 0, 1)}


def test_bipartite_components_star_and_odd_even(spark):
    from linkgraph.algorithms.graphstats import bipartite_components

    # star is bipartite; 5-cycle is not (directed edges, sym inside)
    g = _graph(spark, [(0, i) for i in range(1, 5)] + [
        (10, 11), (11, 12), (12, 13), (13, 14), (14, 10)
    ])
    got = {r.comp: r.is_bipartite for r in bipartite_components(g).collect()}
    assert got == {0: 1, 10: 0}


def test_bipartite_random_differential(spark):
    import random

    from linkgraph.algorithms.graphstats import bipartite_components

    rng = random.Random(19)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(45)})
    edges = [(s, d) for s, d in edges if s != d]
    # python oracle: BFS 2-color per component over the sym graph
    adj = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    verts = sorted(adj)
    seen, want = {}, {}
    for v in verts:
        if v in seen:
            continue
        # component via BFS from v's min-reachable? use min label: walk
        stack, members = [v], {v}
        while stack:
            u = stack.pop()
            for w in adj[u]:
                if w not in members:
                    members.add(w)
                    stack.append(w)
        root = min(members)
        # BFS depths from root
        depth = {root: 0}
        frontier = [root]
        while frontier:
            nxt = []
            for u in frontier:
                for w in adj[u]:
                    if w not in depth:
                        depth[w] = depth[u] + 1
                        nxt.append(w)
            frontier = nxt
        conflicts = sum(
            1
            for s, d in {(min(a, b), max(a, b)) for a in members for b in adj[a]}
            if (depth[s] + depth[d]) % 2 == 0
        )
        want[root] = (len(members), conflicts, int(conflicts == 0))
        seen.update({m: root for m in members})
    g = _graph(spark, edges)
    got = {
        r.comp: (r.n_vertices, r.n_conflict_edges, r.is_bipartite)
        for r in bipartite_components(g).collect()
    }
    assert got == want
