"""Borůvka minimum spanning forest vs Kruskal oracle (SURVEY.md §2.3 A12)."""

from __future__ import annotations

import numpy as np
import pytest

from linkgraph.algorithms.mst import minimum_spanning_forest
from linkgraph.fixtures import chesapeake_edges, synthetic_crawl
from oracles import mst_oracle


def _weighted(edges, seed=7):
    """Deterministic DISTINCT weights → the MSF is unique (exact compare)."""
    rng = np.random.default_rng(seed)
    uniq = sorted({(min(int(s), int(d)), max(int(s), int(d))) for s, d in edges if s != d})
    w = rng.permutation(len(uniq)) + 1.0  # distinct integers as doubles
    return [(s, d, float(w[i])) for i, (s, d) in enumerate(uniq)]

def _run(spark, wedges):
    df = spark.createDataFrame(wedges, "src long, dst long, weight double")
    out = minimum_spanning_forest(df).collect()
    got = {(r.src, r.dst): r.weight for r in out}
    total, n = mst_oracle(wedges)
    assert len(got) == n
    assert sum(got.values()) == pytest.approx(total, abs=1e-9)
    return got


def test_mst_chesapeake(spark):
    _run(spark, _weighted(chesapeake_edges()))


def test_mst_two_components(spark):
    # two disjoint triangles → forest with 2 trees (4 edges total)
    edges = [(0, 1), (1, 2), (0, 2), (10, 11), (11, 12), (10, 12)]
    wedges = _weighted(edges)
    got = _run(spark, wedges)
    assert len(got) == 4


def test_mst_path_is_whole_graph(spark):
    wedges = [(i, i + 1, float(i + 1)) for i in range(9)]
    got = _run(spark, wedges)
    assert len(got) == 9  # a tree IS its own MST


def test_mst_crawl(spark):
    edges = synthetic_crawl(300)
    _run(spark, _weighted(edges))


def test_mst_exact_edge_set(spark):
    # distinct weights → unique MSF; compare the edge SET, not just totals
    wedges = _weighted(chesapeake_edges(), seed=11)
    df = spark.createDataFrame(wedges, "src long, dst long, weight double")
    got = {(r.src, r.dst) for r in minimum_spanning_forest(df).collect()}
    # oracle edge set via Kruskal replay
    seen = {(min(s, d), max(s, d)): w for s, d, w in wedges}
    parent = {}

    def find(x):
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    want = set()
    for (s, d), w in sorted(seen.items(), key=lambda kv: (kv[1], kv[0])):
        rs, rd = find(s), find(d)
        if rs != rd:
            parent[rs] = rd
            want.add((s, d))
    assert got == want
