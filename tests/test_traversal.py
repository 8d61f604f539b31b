"""BFS / SSSP vs oracles (reference A5/A6 — out-of-scope extras)."""

from __future__ import annotations

from conftest import edges_df
from linkgraph.algorithms.bfs import bfs
from linkgraph.algorithms.sssp import sssp
from linkgraph.fixtures import chesapeake_edges
from linkgraph.graph import Graph
from oracles import bfs_oracle, sssp_oracle


def test_bfs_chain(spark):
    g = Graph.from_edges(edges_df(spark, [(i, i + 1) for i in range(6)]), num_partitions=2)
    res = bfs(g, 0)
    got = {r.vid: r.depth for r in res.state.collect()}
    assert got == bfs_oracle([(i, i + 1) for i in range(6)], 0)


def test_bfs_chesapeake_undirected(spark, chesapeake_graph):
    res = bfs(chesapeake_graph, 0, directed=False)
    got = {r.vid: r.depth for r in res.state.collect()}
    assert got == bfs_oracle(chesapeake_edges(), 0, directed=False)


def test_sssp_unit_weights(spark):
    edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=2)
    res = sssp(g, 0)
    assert res.converged
    got = {r.vid: r.dist for r in res.state.collect()}
    assert got == sssp_oracle(edges, 0)


def test_max_iters_cutoff_reports_not_converged(spark):
    chain = [(i, i + 1) for i in range(6)]
    g = Graph.from_edges(edges_df(spark, chain), num_partitions=2)
    b = bfs(g, 0, max_iters=2)
    assert not b.converged
    assert {r.vid for r in b.state.collect()} == {0, 1, 2}
    s = sssp(g, 0, max_iters=2)
    assert not s.converged
    full = bfs(g, 0)
    assert full.converged
