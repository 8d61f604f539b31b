"""PageRank vs NumPy oracle — allclose 1e-6 at convergence
(BASELINE.json:6; SURVEY.md §5.2.1)."""

from __future__ import annotations

import numpy as np
import pytest

from conftest import edges_df
from linkgraph.algorithms.pagerank import pagerank
from linkgraph.fixtures import MICRO_GRAPHS, chesapeake_edges, synthetic_crawl
from linkgraph.graph import Graph
from oracles import pagerank_oracle


def _check(spark, edges, graph=None, **kw):
    g = graph or Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    res = pagerank(g, tol=1e-6, **kw)
    got = {r.vid: r.rank for r in res.state.collect()}
    want, _ = pagerank_oracle(edges, tol=1e-6)
    assert set(got) == set(want)
    if want:
        gv = np.array([got[v] for v in sorted(want)])
        wv = np.array([want[v] for v in sorted(want)])
        np.testing.assert_allclose(gv, wv, atol=1e-6)
        assert abs(gv.sum() - 1.0) < 1e-9  # probability form, Σ=1
    return res


def test_chesapeake(spark, chesapeake_graph):
    _check(spark, chesapeake_edges(), graph=chesapeake_graph)


def test_dangling_pair(spark):
    res = _check(spark, MICRO_GRAPHS["dangling_pair"])
    assert res.converged


def test_star_hub_salted(spark):
    _check(spark, MICRO_GRAPHS["star_hub"], salted=True, salt_buckets=8)


def test_two_cliques(spark):
    _check(spark, MICRO_GRAPHS["two_cliques"])


def test_chain(spark):
    _check(spark, MICRO_GRAPHS["chain"])


def test_empty(spark):
    res = pagerank(Graph.from_edges(edges_df(spark, []), num_partitions=2))
    assert res.state.count() == 0 and res.converged


def test_crawl(spark, crawl_graph):
    edges = synthetic_crawl(500)
    _check(spark, edges, graph=crawl_graph)


def test_unsalted_matches_salted(spark, chesapeake_graph):
    a = pagerank(chesapeake_graph, tol=1e-6, salted=True).state.collect()
    b = pagerank(chesapeake_graph, tol=1e-6, salted=False).state.collect()
    da = {r.vid: r.rank for r in a}
    db = {r.vid: r.rank for r in b}
    for v in da:
        assert abs(da[v] - db[v]) < 1e-9
