"""Label propagation vs sequential synchronous oracle — deterministic exact
(SURVEY.md §2.3 A3, §5.2.1)."""

from __future__ import annotations

from conftest import edges_df
from linkgraph.algorithms.labelprop import label_propagation
from linkgraph.fixtures import MICRO_GRAPHS, chesapeake_edges, synthetic_crawl
from linkgraph.graph import Graph
from oracles import labelprop_oracle


def _check(spark, edges, graph=None, max_iters=20, **kw):
    g = graph or Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    res = label_propagation(g, max_iters=max_iters, **kw)
    got = {r.vid: r.label for r in res.state.collect()}
    want, _ = labelprop_oracle(edges, max_iters=max_iters)
    assert got == want
    return res


def test_chesapeake(spark, chesapeake_graph):
    _check(spark, chesapeake_edges(), graph=chesapeake_graph)


def test_two_cliques(spark):
    res = _check(spark, MICRO_GRAPHS["two_cliques"])
    labels = {r.vid: r.label for r in res.state.collect()}
    assert len({labels[v] for v in range(5)}) == 1
    assert len({labels[v] for v in range(5, 9)}) == 1


def test_star_hub(spark):
    _check(spark, MICRO_GRAPHS["star_hub"], max_iters=5)


def test_window_variant_matches(spark):
    edges = chesapeake_edges()
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    a = label_propagation(g, max_iters=5, use_window=False)
    b = label_propagation(g, max_iters=5, use_window=True)
    da = {r.vid: r.label for r in a.state.collect()}
    db = {r.vid: r.label for r in b.state.collect()}
    assert da == db


def test_crawl(spark, crawl_graph):
    _check(spark, synthetic_crawl(500), graph=crawl_graph, max_iters=10)
