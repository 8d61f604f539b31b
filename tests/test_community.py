"""Community-quality metrics (community.py), link prediction
(linkpred.py), and HyperBall closeness (anf.closeness_centrality) on
hand-computable fixtures with NumPy differential checks."""

from __future__ import annotations

import math

import numpy as np
import pytest
from pyspark.sql import functions as F

from conftest import edges_df

from linkgraph.algorithms.community import community_conductance, modularity
from linkgraph.algorithms.linkpred import link_prediction
from linkgraph.graph import Graph


def _graph(spark, edges):
    return Graph.from_edges(edges_df(spark, edges), num_partitions=4)


def _labels(spark, pairs):
    return spark.createDataFrame(pairs, "vid long, label long")


# two triangles joined by one bridge edge — the canonical two-community
# fixture: communities {0,1,2} and {3,4,5}, bridge 2-3
TWO_TRI = [(0, 1), (1, 2), (0, 2), (3, 4), (4, 5), (3, 5), (2, 3)]
TWO_TRI_LABELS = [(0, 0), (1, 0), (2, 0), (3, 1), (4, 1), (5, 1)]


def test_modularity_two_triangles(spark):
    g = _graph(spark, TWO_TRI)
    labels = _labels(spark, TWO_TRI_LABELS)
    row = modularity(g, labels).collect()[0]
    # m=7; e_c=3 per community; d_c = 2+2+3 = 7 per community
    # Q = 2 * (3/7 - (7/14)^2) = 6/7 - 1/2 = 5/14
    assert row.m == 7
    assert row.n_communities == 2
    assert row.modularity == pytest.approx(5.0 / 14.0, abs=1e-6)


def test_modularity_single_community_is_zero(spark):
    # all vertices in one community: Q = m/m - (2m/2m)^2 = 0 exactly
    g = _graph(spark, TWO_TRI)
    labels = _labels(spark, [(v, 7) for v in range(6)])
    row = modularity(g, labels).collect()[0]
    assert row.modularity == pytest.approx(0.0, abs=1e-9)


def test_conductance_two_triangles(spark):
    g = _graph(spark, TWO_TRI)
    labels = _labels(spark, TWO_TRI_LABELS)
    rows = {r.label: r for r in community_conductance(g, labels).collect()}
    # each side: vol = 7 (2+2+3 sym degrees), cut = 1 (the bridge, seen
    # from its own side), 2m = 14 → φ = 1/min(7,7) = 1/7
    assert rows[0].members == 3 and rows[1].members == 3
    for r in rows.values():
        assert r.vol == 7
        assert r.cut == 1
        assert r.conductance == pytest.approx(1.0 / 7.0, abs=1e-6)


def test_conductance_orders_and_limits(spark):
    g = _graph(spark, TWO_TRI)
    labels = _labels(spark, [(v, v) for v in range(6)])  # singletons
    out = community_conductance(g, labels, top_k=3).collect()
    assert len(out) == 3
    # all size 1 → tie broken by label ASC
    assert [r.label for r in out] == [0, 1, 2]


def test_link_prediction_path_graph(spark):
    # path 0-1-2-3-4 (undirected): non-adjacent 2-hop pairs are
    # (0,2),(1,3),(2,4) with cn=1 each; aa = 1/ln(deg(center)=2)
    g = _graph(spark, [(0, 1), (1, 2), (2, 3), (3, 4)])
    out = link_prediction(g, top_k=10, max_degree=64).collect()
    pairs = {(r.a, r.b): r for r in out}
    assert set(pairs) == {(0, 2), (1, 3), (2, 4)}
    w = 1.0 / math.log(2.0)
    for r in out:
        assert r.cn == 1
        assert r.aa6 == pytest.approx(w, abs=1e-6)
    # jaccard: (0,2): deg0=1, deg2=2 → 1/(1+2-1)=0.5; (1,3): 2,2 → 1/3
    assert pairs[(0, 2)].jaccard6 == pytest.approx(0.5, abs=1e-6)
    assert pairs[(1, 3)].jaccard6 == pytest.approx(1.0 / 3.0, abs=1e-6)


def test_link_prediction_excludes_existing_edges_and_caps_hubs(spark):
    # star: hub 0 connected to 1..9, plus edge 1-2.  With the hub capped
    # out (max_degree=3 < 9), no wedges remain through 0; centers 1,2
    # have deg 2 — wedges (0,2) via 1 and (0,1) via 2 are EDGES, so the
    # anti-join leaves nothing.
    edges = [(0, i) for i in range(1, 10)] + [(1, 2)]
    g = _graph(spark, edges)
    out = link_prediction(g, top_k=10, max_degree=3).collect()
    assert out == []
    # with the cap open, hub wedges produce the 1..9 pairs minus (1,2)
    out2 = link_prediction(g, top_k=100, max_degree=64).collect()
    got = {(r.a, r.b) for r in out2}
    expect = {
        (a, b) for a in range(1, 10) for b in range(a + 1, 10)
    } - {(1, 2)}
    assert got == expect


def test_closeness_directed_chain(spark):
    """On a directed chain 0→1→2→3, in-closeness of vertex v is
    reach(v)/Σd = v / (1+2+..+v) — check the ESTIMATOR tracks the exact
    values' ordering and the k→large limit tightens toward them."""
    from linkgraph.algorithms.anf import closeness_centrality

    g = _graph(spark, [(0, 1), (1, 2), (2, 3)])
    out = {
        r.vid: r.closeness
        for r in closeness_centrality(g, k=64, max_iters=8).collect()
    }
    # vertex 0 reaches nothing upstream → closeness 0 exactly
    assert out[0] == 0.0
    exact = {1: 1.0, 2: 2.0 / 3.0, 3: 3.0 / 6.0}
    for v, c in exact.items():
        assert out[v] == pytest.approx(c, rel=0.35)  # FM variance at k=64
    # ordering must match the exact ordering (1 > 2 > 3 > 0)
    assert out[1] > out[2] > out[3] > out[0]


def test_closeness_rides_harmonic_run(spark):
    """hc and sd come from the same trajectory: both are zero exactly on
    a vertex with no in-ball growth, and sd > 0 wherever hc > 0."""
    from linkgraph.algorithms.anf import anf

    g = _graph(spark, [(0, 1), (1, 2), (2, 3), (3, 0), (4, 0)])
    st = anf(g, k=8, max_iters=8, harmonic=True).state
    rows = st.select("vid", "hc", "sd").collect()
    for r in rows:
        assert (r.hc > 0) == (r.sd > 0)
    # vertex 4 has no in-edges → nothing ever reaches it
    by_vid = {r.vid: r for r in rows}
    assert by_vid[4].hc == 0.0 and by_vid[4].sd == 0.0


def test_modularity_lp_finds_two_triangles(spark):
    """The Louvain move phase must find the two triangle communities —
    the partition with maximum modularity on this fixture."""
    from linkgraph.algorithms.community import modularity_lp

    g = _graph(spark, TWO_TRI)
    res = modularity_lp(g, max_iters=8)
    labs = {r.vid: r.label for r in res.state.collect()}
    assert labs[0] == labs[1] == labs[2]
    assert labs[3] == labs[4] == labs[5]
    assert labs[0] != labs[3]
    # and that partition scores the known optimum Q = 5/14
    labels = _labels(spark, sorted(labs.items()))
    row = modularity(g, labels).collect()[0]
    assert row.modularity == pytest.approx(5.0 / 14.0, abs=1e-6)


def test_modularity_lp_beats_plain_lp_on_dense_overlap(spark):
    """On a denser two-cluster graph with bridges, the modularity-gain
    objective must produce a partition scoring at least as well as
    plain label propagation (which tends to flood one giant label)."""
    import random

    from linkgraph.algorithms.community import modularity_lp
    from linkgraph.algorithms.labelprop import label_propagation

    rng = random.Random(5)
    edges = set()
    for block in (0, 1):
        vs = list(range(block * 12, block * 12 + 12))
        for _ in range(40):
            a, b = rng.sample(vs, 2)
            edges.add((a, b))
    edges |= {(0, 12), (5, 17), (9, 20)}  # bridges
    g = _graph(spark, sorted(edges))
    lv = modularity_lp(g, max_iters=8).state.select("vid", "label")
    lp = label_propagation(g, max_iters=8).state.select("vid", "label")
    q_lv = modularity(g, lv).collect()[0].modularity
    q_lp = modularity(g, lp).collect()[0].modularity
    assert q_lv >= q_lp - 1e-9
    assert q_lv > 0.2  # found real block structure


def test_modularity_numpy_differential(spark):
    """Random graph + random labels vs a direct NumPy computation."""
    import random

    rng = random.Random(11)
    edges = sorted({(rng.randrange(30), rng.randrange(30)) for _ in range(120)})
    edges = [(s, d) for s, d in edges if s != d]
    g = _graph(spark, edges)
    verts = sorted({v for e in edges for v in e})
    lab = {v: rng.randrange(4) for v in verts}
    labels = _labels(spark, [(v, lab[v]) for v in verts])

    # NumPy twin over the undirected simple graph
    und = sorted({(min(s, d), max(s, d)) for s, d in edges})
    m = len(und)
    deg: dict[int, int] = {}
    for a, b in und:
        deg[a] = deg.get(a, 0) + 1
        deg[b] = deg.get(b, 0) + 1
    e_c: dict[int, int] = {}
    for a, b in und:
        if lab[a] == lab[b]:
            e_c[lab[a]] = e_c.get(lab[a], 0) + 1
    d_c: dict[int, int] = {}
    for v in verts:
        d_c[lab[v]] = d_c.get(lab[v], 0) + deg.get(v, 0)
    q = sum(
        e_c.get(c, 0) / m - (d_c[c] / (2.0 * m)) ** 2 for c in set(lab.values())
    )
    row = modularity(g, labels).collect()[0]
    assert row.m == m
    assert row.modularity == pytest.approx(q, abs=1e-6)


def test_related_pages_cocitation(spark):
    """Pages 1 and 2 are both cited by 10 and 11 → cocite 2; page 3
    shares only citer 10 with them."""
    from linkgraph.algorithms.linkpred import related_pages

    edges = [(10, 1), (10, 2), (10, 3), (11, 1), (11, 2), (12, 9)]
    g = _graph(spark, edges)
    queries = spark.createDataFrame([(1,)], "qid long")
    out = related_pages(g, queries, k=5).collect()
    got = [(r.q, r.c, r.cocite) for r in out]
    assert got == [(1, 2, 2), (1, 3, 1)]


def test_related_pages_caps_directory_hubs(spark):
    """A citer with outdeg > cap contributes no wedges."""
    from linkgraph.algorithms.linkpred import related_pages

    hub_edges = [(100, i) for i in range(1, 10)]  # outdeg 9 > cap 3
    g = _graph(spark, hub_edges + [(11, 1), (11, 2)])
    queries = spark.createDataFrame([(1,)], "qid long")
    out = related_pages(g, queries, k=5, max_out_degree=3).collect()
    assert [(r.q, r.c, r.cocite) for r in out] == [(1, 2, 1)]


def test_edge_sample_deterministic_and_proportional(spark):
    from linkgraph.algorithms.sampling import edge_sample

    import random

    rng = random.Random(7)
    edges = sorted({(rng.randrange(200), rng.randrange(200)) for _ in range(900)})
    edges = [(s, d) for s, d in edges if s != d]
    g = _graph(spark, edges)
    s1 = sorted((r.src, r.dst) for r in edge_sample(g, 10, salt=0).collect())
    s2 = sorted((r.src, r.dst) for r in edge_sample(g, 10, salt=0).collect())
    assert s1 == s2  # replay-stable
    assert set(s1) <= set(edges)
    n = len(edges)
    assert 0.04 * n < len(s1) < 0.18 * n  # ~10%
    s_all = edge_sample(g, 100, salt=0).count()
    assert s_all == len(set(edges))
    assert edge_sample(g, 0, salt=0).count() == 0
    # different salt → different coin
    s3 = sorted((r.src, r.dst) for r in edge_sample(g, 10, salt=1).collect())
    assert s3 != s1
