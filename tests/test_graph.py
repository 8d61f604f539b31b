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


def test_bucketed_snapshot_roundtrip_and_no_shuffle(spark, tmp_path):
    """save_bucketed → load_bucketed restores the CSR layout with zero
    re-shuffle: the bucketed scan joins the gather side exchange-free."""
    import re

    from pyspark.sql import functions as F

    from linkgraph.fixtures import chesapeake_edges
    from linkgraph.plans import formatted_plan, live_tree

    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    g = Graph.from_edges(edges_df(spark, chesapeake_edges()), num_partitions=parts)
    g.save_bucketed("snap_edges", path=str(tmp_path / "snap"))
    try:
        g2 = Graph.load_bucketed(spark, "snap_edges")
        assert g2.num_partitions == parts
        a = {(r.src, r.dst) for r in g.edges.collect()}
        b = {(r.src, r.dst) for r in g2.edges.collect()}
        assert a == b

        # gather-shaped join against a co-partitioned state: the loaded
        # edges side must not re-shuffle (same contract as from_edges)
        prev = spark.conf.get("spark.sql.adaptive.enabled")
        spark.conf.set("spark.sql.adaptive.enabled", "false")
        try:
            state = (
                g2.vertices.select("vid", F.lit(1.0).alias("rank"))
                .repartition(parts, "vid")
                .sortWithinPartitions("vid")
                .localCheckpoint(eager=True)
            )
            gathered = g2.edges.join(
                state.withColumnRenamed("vid", "src").hint("merge"), "src"
            )
            live = live_tree(formatted_plan(gathered))
            n_ex = len(re.findall(r"\bExchange\b", live))
            assert n_ex == 0, live
            # the reload must restore the sort half of the layout too:
            # a Sort over the |E| edges side would re-pay per superstep
            # what the snapshot saved (the state leaf is pre-sorted, so
            # the live merge-join plan needs NO Sort at all)
            assert not re.search(r"\bSort \(", live), live
        finally:
            spark.conf.set("spark.sql.adaptive.enabled", prev)

        # end-to-end parity through an algorithm
        from linkgraph import pagerank

        r1 = {r.vid: r.rank for r in pagerank(g, tol=1e-8).state.collect()}
        r2 = {r.vid: r.rank for r in pagerank(g2, tol=1e-8).state.collect()}
        assert set(r1) == set(r2)
        assert all(abs(r1[v] - r2[v]) < 1e-12 for v in r1)
    finally:
        spark.sql("DROP TABLE IF EXISTS snap_edges")


def test_load_bucketed_strict_escape_hatch(spark, tmp_path):
    """Width mismatch: strict=True raises (superstep contract); the
    strict=False escape hatch (ADVICE r01) warns and loads read-only at
    the TABLE's bucket count with identical edges."""
    import warnings

    import pytest

    from linkgraph.fixtures import chesapeake_edges

    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    g = Graph.from_edges(edges_df(spark, chesapeake_edges()), num_partitions=parts)
    g.save_bucketed("snap_edges_w", path=str(tmp_path / "snapw"))
    try:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts * 2))
        with pytest.raises(ValueError, match="bucket"):
            Graph.load_bucketed(spark, "snap_edges_w")
        with warnings.catch_warnings(record=True) as caught:
            warnings.simplefilter("always")
            g2 = Graph.load_bucketed(spark, "snap_edges_w", strict=False)
        assert any("bucket" in str(w.message) for w in caught)
        assert g2.num_partitions == parts  # table width, not session width
        a = {(r.src, r.dst) for r in g.edges.collect()}
        b = {(r.src, r.dst) for r in g2.edges.collect()}
        assert a == b
    finally:
        spark.conf.set("spark.sql.shuffle.partitions", str(parts))
        spark.sql("DROP TABLE IF EXISTS snap_edges_w")
