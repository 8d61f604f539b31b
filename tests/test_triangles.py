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
