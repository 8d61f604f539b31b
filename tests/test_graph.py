"""Graph construction / normalization tests (SURVEY.md §2.2 I3/I4)."""

from __future__ import annotations

from conftest import edges_df
from linkgraph.fixtures import MICRO_GRAPHS, chesapeake_edges
from linkgraph.graph import Graph


def test_normalization_drops_self_loops_and_dups(spark):
    g = Graph.from_edges(edges_df(spark, MICRO_GRAPHS["dup_edges"] + MICRO_GRAPHS["self_loop"]), num_partitions=2)
    rows = {(r.src, r.dst) for r in g.edges.collect()}
    assert rows == {(0, 1), (1, 0)}
    assert g.num_edges == 2
    assert g.num_vertices == 2


def test_empty_graph(spark):
    g = Graph.from_edges(edges_df(spark, []), num_partitions=2)
    assert g.num_edges == 0
    assert g.num_vertices == 0


def test_chesapeake_stats(chesapeake_graph):
    g = chesapeake_graph
    assert g.num_vertices == 39
    assert g.num_edges == 170  # directed u>v pairs, already unique
    assert g.symmetrized_edges.count() == 340


def test_degrees(spark):
    g = Graph.from_edges(edges_df(spark, [(0, 1), (0, 2), (1, 2)]), num_partitions=2)
    out = {r.vid: r.outdeg for r in g.out_degrees.collect()}
    assert out == {0: 2, 1: 1}
    deg = {r.vid: r.deg for r in g.degrees.collect()}
    assert deg == {0: 2, 1: 2, 2: 2}


def test_canonical_edges(spark):
    g = Graph.from_edges(edges_df(spark, [(2, 1), (1, 2), (3, 1)]), num_partitions=2)
    rows = {(r.src, r.dst) for r in g.canonical_edges.collect()}
    assert rows == {(1, 2), (1, 3)}
