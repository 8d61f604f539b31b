"""Triangle counting vs set-intersection oracle — exact (BASELINE.json:6)."""

from __future__ import annotations

from conftest import edges_df
from linkgraph.algorithms.triangles import (
    triangle_count,
    triangle_counts_per_vertex,
)
from linkgraph.fixtures import MICRO_GRAPHS, chesapeake_edges, synthetic_crawl
from linkgraph.graph import Graph
from oracles import triangle_oracle


def _graph(spark, edges):
    return Graph.from_edges(edges_df(spark, edges), num_partitions=4)


def _check(spark, edges, graph=None):
    g = graph or Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    want_total, want_per = triangle_oracle(edges)
    assert triangle_count(g) == want_total
    got_per = {r.vid: r.triangles for r in triangle_counts_per_vertex(g).collect()}
    assert got_per == want_per


def test_two_cliques(spark):
    _check(spark, MICRO_GRAPHS["two_cliques"])  # 10 + 4 = 14 triangles


def test_chain_has_none(spark):
    _check(spark, MICRO_GRAPHS["chain"])


def test_star_hub_has_none(spark):
    _check(spark, MICRO_GRAPHS["star_hub"])


def test_directed_cycle_triangle(spark):
    # (0→1→2→0) is one undirected triangle
    _check(spark, [(0, 1), (1, 2), (2, 0)])


def test_chesapeake(spark, chesapeake_graph):
    _check(spark, chesapeake_edges(), graph=chesapeake_graph)


def test_crawl(spark, crawl_graph):
    _check(spark, synthetic_crawl(500), graph=crawl_graph)


def test_triad_census_pure_cycle_and_transitive(spark):
    from linkgraph.algorithms.triangles import triad_census

    # triangle A {0,1,2}: pure 3-cycle; triangle B {3,4,5}: transitive
    g = _graph(spark, [(0, 1), (1, 2), (2, 0), (3, 4), (4, 5), (3, 5)])
    row = triad_census(g).collect()[0]
    assert (row.n_triangles, row.n_cyclic, row.n_transitive) == (2, 1, 1)


def test_triad_census_fully_mutual(spark):
    from linkgraph.algorithms.triangles import triad_census

    edges = [(a, b) for a in range(3) for b in range(3) if a != b]
    row = triad_census(_graph(spark, edges)).collect()[0]
    # one undirected triangle; both cycle orientations; all 6 transitive
    # patterns (each vertex is the middle of 2)
    assert (row.n_triangles, row.n_cyclic, row.n_transitive) == (1, 2, 6)


def test_triad_census_random_differential(spark):
    import itertools
    import random

    from linkgraph.algorithms.triangles import triad_census

    rng = random.Random(3)
    edges = list({(rng.randrange(14), rng.randrange(14)) for _ in range(70)})
    edges = [(s, d) for s, d in edges if s != d]
    es = set(edges)
    verts = sorted({v for e in edges for v in e})
    nt = nc = ntr = 0
    for x, y, z in itertools.combinations(verts, 3):
        und = lambda a, b: (a, b) in es or (b, a) in es
        if und(x, y) and und(y, z) and und(x, z):
            nt += 1
            for s, m, t in itertools.permutations((x, y, z)):
                if (s, m) in es and (m, t) in es and (s, t) in es:
                    ntr += 1
            nc += int((x, y) in es and (y, z) in es and (z, x) in es)
            nc += int((x, z) in es and (z, y) in es and (y, x) in es)
    row = triad_census(_graph(spark, edges)).collect()[0]
    assert (row.n_triangles, row.n_cyclic, row.n_transitive) == (nt, nc, ntr)


def test_butterfly_count_exact_fixture(spark):
    from conftest import edges_df
    from linkgraph.algorithms.triangles import butterfly_count
    from linkgraph.graph import Graph

    # sources 10,11 both link targets {0,1,2}: co-pairs (0,1),(0,2),(1,2)
    # each with c=2 → 3 copairs, 3 butterflies; source 12 links {0,1} →
    # (0,1) gets c=3 → C(3,2)=3 butterflies on that pair.
    edges = [(10, 0), (10, 1), (10, 2), (11, 0), (11, 1), (11, 2), (12, 0), (12, 1)]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=2)
    row = butterfly_count(g).collect()[0]
    # pairs: (0,1) c=3, (0,2) c=2, (1,2) c=2 → butterflies 3+1+1 = 5
    assert (row.n_copairs, row.n_butterflies) == (3, 5)
    g.unpersist()


def test_butterfly_cap_excludes_directory_hubs(spark):
    from conftest import edges_df
    from linkgraph.algorithms.triangles import butterfly_count
    from linkgraph.graph import Graph

    # a directory page linking 10 targets creates C(10,2) wedges but
    # must contribute nothing under a cap of 4
    edges = [(99, t) for t in range(10)]
    edges += [(1, 0), (1, 3), (2, 0), (2, 3)]  # a real butterfly pair
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=2)
    row = butterfly_count(g, max_out_degree=4).collect()[0]
    assert (row.n_copairs, row.n_butterflies) == (1, 1)
    g.unpersist()
