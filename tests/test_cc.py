"""Connected components vs BFS oracle — exact (BASELINE.json:6)."""

from __future__ import annotations

from conftest import edges_df
from linkgraph.algorithms.cc import connected_components
from linkgraph.fixtures import MICRO_GRAPHS, chesapeake_edges, synthetic_crawl
from linkgraph.graph import Graph
from oracles import cc_oracle


def _check(spark, edges, graph=None, **kw):
    g = graph or Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    res = connected_components(g, **kw)
    got = {r.vid: r.comp for r in res.state.collect()}
    want = cc_oracle(edges)
    assert got == want
    assert res.converged
    return res


def test_chesapeake(spark, chesapeake_graph):
    _check(spark, chesapeake_edges(), graph=chesapeake_graph)


def test_two_cliques(spark):
    res = _check(spark, MICRO_GRAPHS["two_cliques"])
    comps = {r.comp for r in res.state.collect()}
    assert comps == {0, 5}


def test_chain(spark):
    _check(spark, MICRO_GRAPHS["chain"])


def test_star_hub(spark):
    _check(spark, MICRO_GRAPHS["star_hub"])


def test_crawl(spark, crawl_graph):
    _check(spark, synthetic_crawl(500), graph=crawl_graph)


def test_pointer_jumping_same_result(spark):
    edges = MICRO_GRAPHS["chain"] + MICRO_GRAPHS["two_cliques"]
    a = _check(spark, edges, pointer_jumping=False)
    b = _check(spark, edges, pointer_jumping=True)
    assert b.iterations <= a.iterations

def test_frontier_gather_trajectory_identical_to_full(spark):
    """The delta/frontier gather must be trajectory-identical to the full
    gather (cc.py module docstring's monotonicity argument): same final
    labels, same iteration count, and the same per-round change counts —
    not merely the same fixpoint."""
    edges = (
        list(MICRO_GRAPHS["chain"])
        + list(MICRO_GRAPHS["two_cliques"])
        + [(int(s), int(d)) for s, d in synthetic_crawl(300)]
    )
    a = _check(spark, edges, frontier=False)
    b = _check(spark, edges, frontier=True)
    assert b.iterations == a.iterations
    assert [h.get("changed") for h in b.history] == [
        h.get("changed") for h in a.history
    ]


def test_incremental_cc_warm_start(spark):
    """Append-only epoch increment: warm-starting hash-min from the
    previous epoch's labels reaches the identical fixpoint in strictly
    fewer rounds (labels are monotone-valid under edge additions)."""
    from linkgraph.algorithms.cc import connected_components
    from linkgraph.graph import Graph

    # epoch 1: long chain 0..30 (cold CC pays ~diameter rounds) + an
    # island pair
    e1 = [(i, i + 1) for i in range(30)] + [(100, 101)]
    g1 = Graph.from_edges(edges_df(spark, e1), num_partitions=4)
    prev = connected_components(g1)
    assert prev.converged

    # epoch 2: the increment extends the chain and bridges the island
    e2 = e1 + [(30, 31), (31, 32), (32, 100)]
    g2 = Graph.from_edges(edges_df(spark, e2), num_partitions=4)
    cold = connected_components(g2)
    # prev_edges evidence: the guard verifies e2 ⊇ e1 before warming
    warm = connected_components(
        g2, init_labels=prev.state, prev_edges=g1.edges
    )
    assert cold.converged and warm.converged
    assert warm.iterations < cold.iterations, (
        f"warm {warm.iterations} !< cold {cold.iterations}"
    )
    lc = {r.vid: r.comp for r in cold.state.collect()}
    lw = {r.vid: r.comp for r in warm.state.collect()}
    assert lc == lw
    # the bridged island joined component 0
    assert lw[101] == 0
