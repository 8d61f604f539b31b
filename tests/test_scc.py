"""SCC (coloring multistep) + bow-tie decomposition
(linkgraph/algorithms/scc.py) on hand-built directed graphs, plus a
NetworkX-free random differential check against a closure oracle.
"""

from __future__ import annotations

import random

from conftest import edges_df

from linkgraph.algorithms.scc import (
    bowtie_decomposition,
    strongly_connected_components,
)
from linkgraph.graph import Graph


def _scc_oracle(edges):
    """Closure-based SCC labels: min mutual-reachability id per vertex."""
    verts = sorted({v for e in edges for v in e})
    adj = {v: set() for v in verts}
    for s, d in edges:
        adj[s].add(d)
    reach = {}
    for v in verts:
        seen, stack = {v}, [v]
        while stack:
            u = stack.pop()
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        reach[v] = seen
    return {
        v: min(u for u in verts if u in reach[v] and v in reach[u])
        for v in verts
    }


def _run_scc(spark, edges, **kw):
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    got = {
        r.vid: r.scc
        for r in strongly_connected_components(g, **kw).collect()
    }
    assert got == _scc_oracle(edges)
    return got


def test_two_cycles_and_bridge(spark):
    # cycle {0,1,2} → bridge 3 → cycle {4,5}
    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 4), (4, 5), (5, 4)]
    got = _run_scc(spark, edges)
    assert got[0] == got[1] == got[2] == 0
    assert got[3] == 3
    assert got[4] == got[5] == 4


def test_dag_all_singletons(spark):
    edges = [(0, 1), (0, 2), (1, 3), (2, 3), (3, 4)]
    got = _run_scc(spark, edges)
    assert got == {v: v for v in range(5)}


def test_nested_cycles_no_trim(spark):
    # trimming disabled exercises the coloring/backward path on a graph
    # where trim alone would solve nothing (every vertex on a cycle)
    edges = [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2)]
    _run_scc(spark, edges, trim=False)


def test_random_differential(spark):
    rng = random.Random(7)
    verts = list(range(30))
    edges = sorted(
        {
            (rng.choice(verts), rng.choice(verts))
            for _ in range(90)
        }
    )
    edges = [(s, d) for s, d in edges if s != d]
    _run_scc(spark, edges)


def test_bowtie_textbook(spark):
    # IN: 0 → CORE {1,2,3} → OUT: 4; tendril off IN: 0→5;
    # tube: 0→6→4; disconnected pair 7→8 (its own tiny structure)
    edges = [
        (0, 1), (1, 2), (2, 3), (3, 1),  # core cycle + entry
        (3, 4),                          # core → out
        (0, 5),                          # tendril hanging off IN
        (0, 6), (6, 4),                  # tube IN → OUT bypassing core
        (7, 8),                          # disconnected from the bow-tie
    ]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    got = {r.vid: r.region for r in bowtie_decomposition(g).collect()}
    assert got[1] == got[2] == got[3] == "CORE"
    assert got[0] == "IN"
    assert got[4] == "OUT"
    assert got[5] == "TENDRIL"
    assert got[6] == "TUBE"
    assert got[7] == "DISCONNECTED" and got[8] == "DISCONNECTED"


def test_bowtie_all_core(spark):
    edges = [(i, (i + 1) % 4) for i in range(4)]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    got = {r.vid: r.region for r in bowtie_decomposition(g).collect()}
    assert set(got.values()) == {"CORE"}


def test_bowtie_regions_partition(spark):
    # every vertex gets exactly one region, and CORE is the largest SCC
    rng = random.Random(11)
    edges = sorted({(rng.randrange(20), rng.randrange(20)) for _ in range(40)})
    edges = [(s, d) for s, d in edges if s != d]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    labels = _scc_oracle(edges)
    sizes = {}
    for v, s in labels.items():
        sizes[s] = sizes.get(s, 0) + 1
    core_label = min(
        (s for s in sizes), key=lambda s: (-sizes[s], s)
    )
    got = {r.vid: r.region for r in bowtie_decomposition(g).collect()}
    verts = sorted({v for e in edges for v in e})
    assert sorted(got) == verts
    assert {v for v, r in got.items() if r == "CORE"} == {
        v for v, s in labels.items() if s == core_label
    }


def _levels_oracle(edges):
    """Longest-path-from-sources layering over the condensation DAG."""
    scc = _scc_oracle(edges)
    cedges = {(scc[s], scc[d]) for s, d in edges if scc[s] != scc[d]}
    comps = sorted(set(scc.values()))
    level = {c: 0 for c in comps}
    changed = True
    while changed:
        changed = False
        for s, d in cedges:
            if level[s] + 1 > level[d]:
                level[d] = level[s] + 1
                changed = True
    sizes = {c: sum(1 for v in scc.values() if v == c) for c in comps}
    return {c: (level[c], sizes[c]) for c in comps}


def _run_levels(spark, edges):
    from linkgraph.algorithms.scc import condensation_levels

    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    got = {
        r.scc: (r.level, r.n_vertices)
        for r in condensation_levels(g).collect()
    }
    assert got == _levels_oracle(edges)
    return got


def test_condensation_two_cycles_bridge(spark):
    # cycle {0,1} → cycle {2,3}: levels 0 and 1, two vertices each
    got = _run_levels(spark, [(0, 1), (1, 0), (1, 2), (2, 3), (3, 2)])
    assert got == {0: (0, 2), 2: (1, 2)}


def test_condensation_longest_path_not_shortest(spark):
    # diamond 0→1→3, 0→2→3 plus long arm 0→4→5→3: level(3) must be the
    # LONGEST path (3), not BFS depth (2)
    got = _run_levels(
        spark, [(0, 1), (0, 2), (1, 3), (2, 3), (0, 4), (4, 5), (5, 3)]
    )
    assert got[3] == (3, 1)
    assert got[0] == (0, 1)


def test_condensation_random_differential(spark):
    rng = random.Random(7)
    edges = list(
        {
            (rng.randrange(24), rng.randrange(24))
            for _ in range(60)
        }
    )
    edges = [(s, d) for s, d in edges if s != d]
    _run_levels(spark, edges)
