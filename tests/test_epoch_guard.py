"""The warm-start append-only guard (linkgraph/epoch.py).

VERDICT r4's top item: ``link_log_compact`` is latest-wins — a
recrawled page whose links changed REMOVES edges — and warm-starting
CC/coreness/SSSP/BFS across a removal epoch silently returns wrong
results (a stale CC label bridges split components; a stale distance
undercuts a now-longer path).  These tests pin the enforced contract:
evidence (``prev_edges``) or assertion (``assume_append_only=True``)
is REQUIRED, and evidence showing removals raises before any superstep.
"""

from __future__ import annotations

import pytest
from conftest import edges_df

from linkgraph.algorithms.cc import connected_components
from linkgraph.algorithms.coreness import coreness
from linkgraph.algorithms.bfs import multi_source_bfs
from linkgraph.algorithms.sssp import sssp
from linkgraph.epoch import EpochRemovalError, check_append_only
from linkgraph.graph import Graph


def _graphs_with_removal(spark):
    """Epoch 1: two chains bridged at (4, 10).  Epoch 2: the bridge is
    REMOVED (recrawled page dropped the link) and a fresh edge added —
    exactly the latest-wins compaction shape."""
    e1 = [(i, i + 1) for i in range(4)] + [(4, 10), (10, 11), (11, 12)]
    e2 = [(i, i + 1) for i in range(4)] + [(10, 11), (11, 12), (12, 13)]
    g1 = Graph.from_edges(edges_df(spark, e1), num_partitions=4)
    g2 = Graph.from_edges(edges_df(spark, e2), num_partitions=4)
    return g1, g2


def test_cc_warm_removal_epoch_raises(spark):
    """The headline case: a removal epoch + init_labels must raise, not
    return stale-bridged components."""
    g1, g2 = _graphs_with_removal(spark)
    prev = connected_components(g1)
    with pytest.raises(EpochRemovalError, match="missing from the current"):
        connected_components(
            g2, init_labels=prev.state, prev_edges=g1.edges
        )
    # and the stale bridge REALLY would poison the result — the warm
    # labels (forced past the guard) disagree with cold on the split
    # component, which is why the guard exists
    cold = connected_components(g2)
    forced = connected_components(
        g2, init_labels=prev.state, assume_append_only=True
    )
    lc = {r.vid: r.comp for r in cold.state.collect()}
    lf = {r.vid: r.comp for r in forced.state.collect()}
    assert lc != lf, "expected the stale label to bridge the split halves"
    assert lc[10] == 10 and lf[10] == 0


def test_cc_warm_requires_evidence_or_assertion(spark):
    g1, g2 = _graphs_with_removal(spark)
    prev = connected_components(g1)
    with pytest.raises(ValueError, match="requires epoch evidence"):
        connected_components(g2, init_labels=prev.state)


def test_cc_warm_append_only_evidence_passes(spark):
    """Append-only epoch + prev_edges evidence: guard passes and the
    warm run reaches the cold fixpoint."""
    e1 = [(i, i + 1) for i in range(6)]
    e2 = e1 + [(6, 7), (3, 9)]
    g1 = Graph.from_edges(edges_df(spark, e1), num_partitions=4)
    g2 = Graph.from_edges(edges_df(spark, e2), num_partitions=4)
    prev = connected_components(g1)
    warm = connected_components(
        g2, init_labels=prev.state, prev_edges=g1.edges
    )
    cold = connected_components(g2)
    assert {r.vid: r.comp for r in warm.state.collect()} == {
        r.vid: r.comp for r in cold.state.collect()
    }


def test_sssp_warm_removal_epoch_raises(spark):
    g1, g2 = _graphs_with_removal(spark)
    prev = sssp(g1, 0)
    with pytest.raises(EpochRemovalError):
        sssp(g2, 0, init_dists=prev.state, prev_edges=g1.edges)
    with pytest.raises(ValueError, match="requires epoch evidence"):
        sssp(g2, 0, init_dists=prev.state)


def test_bfs_warm_removal_epoch_raises(spark):
    g1, g2 = _graphs_with_removal(spark)
    seeds = spark.createDataFrame([(0,)], "vid long")
    prev = multi_source_bfs(g1, seeds)
    init = prev.state.where("depth is not null")
    with pytest.raises(EpochRemovalError):
        multi_source_bfs(g2, seeds, init_depths=init, prev_edges=g1.edges)
    with pytest.raises(ValueError, match="requires epoch evidence"):
        multi_source_bfs(g2, seeds, init_depths=init)


def test_coreness_warm_removal_epoch_raises(spark):
    from pyspark.sql import functions as F

    g1, g2 = _graphs_with_removal(spark)
    prev = coreness(g1)
    bound = prev.state.select(
        "vid", (F.col("coreness") + F.lit(1)).alias("bound")
    )
    with pytest.raises(EpochRemovalError):
        coreness(g2, init_bound=bound, prev_edges=g1.edges)
    with pytest.raises(ValueError, match="requires epoch evidence"):
        coreness(g2, init_bound=bound)


def test_check_append_only_counts(spark):
    """Direct unit check: returns 0 on superset, raises with the removed
    count in the message otherwise; duplicate epoch rows are not churn."""
    old = edges_df(spark, [(0, 1), (1, 2), (0, 1)])
    new_ok = edges_df(spark, [(0, 1), (1, 2), (2, 3)])
    assert check_append_only(old, new_ok) == 0
    new_bad = edges_df(spark, [(0, 1), (2, 3)])
    with pytest.raises(EpochRemovalError, match="1 edge"):
        check_append_only(old, new_bad)


def test_cold_runs_never_touch_the_guard(spark):
    """No init_* → no evidence requirement (API-compatible cold path)."""
    _, g2 = _graphs_with_removal(spark)
    res = connected_components(g2)
    assert res.converged


def test_link_log_recrawl_removal_caught_end_to_end(spark):
    """The production scenario the guard exists for (VERDICT r4 #1):
    a recrawled page whose links CHANGED makes latest-wins compaction
    remove edges; warm-starting CC across that epoch with the previous
    epoch's edges as evidence must raise instead of returning
    stale-bridged components."""
    import datetime as dt

    from linkgraph.streaming import graph_from_link_log

    t1 = dt.datetime(2024, 1, 1)
    t2 = dt.datetime(2024, 2, 1)
    # epoch 1: page A links to B and C (bridging two chains)
    log1 = spark.createDataFrame(
        [
            ("u://a", "u://b", t1, 1),
            ("u://a", "u://c", t1, 1),
            ("u://b", "u://b2", t1, 2),
            ("u://c", "u://c2", t1, 3),
        ],
        "src_url string, dst_url string, warc_ts timestamp, capture bigint",
    )
    g1, verts = graph_from_link_log(log1, num_partitions=2)
    prev = connected_components(g1)
    assert prev.converged
    # epoch 2: A recrawled, now links ONLY to B — latest-wins compaction
    # REMOVES a->c; the two chains split
    log2 = log1.unionAll(
        spark.createDataFrame(
            [("u://a", "u://b", t2, 9)],
            "src_url string, dst_url string, warc_ts timestamp, capture bigint",
        )
    )
    g2, _ = graph_from_link_log(log2, vertices=verts, num_partitions=2)
    with pytest.raises(EpochRemovalError):
        connected_components(
            g2, init_labels=prev.state, prev_edges=g1.edges
        )
