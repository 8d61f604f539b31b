"""Warm starts for the power-iteration family (round 5: katz, eigen,
salsa, opic + the trustrank passthrough).

Two properties per algorithm, matching the established warm-start test
pattern (test_cc.py, test_traversal.py):
- continuation exactness: the step is memoryless, so warm(k cold, m
  warm) replays cold(k+m) exactly — the same property the *_warm
  catalog entries hash-check against the cold unrolled twins;
- convergence speedup: warming from a converged state verifies in
  one round / strictly fewer rounds than cold.
"""

from __future__ import annotations

from conftest import edges_df
from pyspark.sql import functions as F

from linkgraph.algorithms.eigen import eigenvector_centrality
from linkgraph.algorithms.katz import katz
from linkgraph.algorithms.opic import opic
from linkgraph.algorithms.salsa import salsa
from linkgraph.fixtures import chesapeake_edges
from linkgraph.graph import Graph


def _g(spark):
    return Graph.from_edges(
        edges_df(spark, chesapeake_edges()), num_partitions=4
    )


def _scores(res, cols=("score",), nd=9):
    return {
        r.vid: tuple(round(getattr(r, c), nd) for c in cols)
        for r in res.state.collect()
    }


def test_katz_warm_continuation_and_speedup(spark):
    g = _g(spark)
    cold = katz(g, tol=0.0, max_iters=8)
    head = katz(g, tol=0.0, max_iters=5)
    warm = katz(g, tol=0.0, max_iters=3, init_scores=head.state)
    assert _scores(cold) == _scores(warm)
    # warming from a converged state verifies in one round
    conv = katz(g, tol=1e-12, max_iters=100)
    assert conv.converged
    re = katz(g, tol=1e-12, max_iters=100, init_scores=conv.state)
    assert re.converged and re.iterations == 1


def test_eigen_warm_continuation_and_speedup(spark):
    g = _g(spark)
    cold = eigenvector_centrality(g, tol=0.0, max_iters=6)
    head = eigenvector_centrality(g, tol=0.0, max_iters=4)
    warm = eigenvector_centrality(
        g, tol=0.0, max_iters=2, init_scores=head.state
    )
    assert _scores(cold) == _scores(warm)
    conv = eigenvector_centrality(g, tol=1e-10, max_iters=200)
    assert conv.converged
    re = eigenvector_centrality(
        g, tol=1e-10, max_iters=200, init_scores=conv.state
    )
    assert re.converged and re.iterations < conv.iterations


def test_salsa_warm_continuation(spark):
    g = _g(spark)
    cold = salsa(g, tol=0.0, max_iters=5)
    head = salsa(g, tol=0.0, max_iters=3)
    warm = salsa(g, tol=0.0, max_iters=2, init_scores=head.state)
    assert _scores(cold, ("hub", "auth")) == _scores(warm, ("hub", "auth"))


def test_opic_warm_continuation_and_rescale(spark):
    g = _g(spark)
    cold = opic(g, iters=8)
    head = opic(g, iters=5)
    warm = opic(g, iters=3, init_state=head.state)
    assert _scores(cold, ("cash", "hist")) == _scores(warm, ("cash", "hist"))
    # the simplex rescale: a uniformly scaled init (Σcash = 7) is the
    # SAME valid init after normalization — identical trajectory
    scaled = head.state.select(
        "vid", (F.col("cash") * 7.0).alias("cash"), "hist"
    )
    warm2 = opic(g, iters=3, init_state=scaled)
    assert _scores(warm, ("cash", "hist")) == _scores(warm2, ("cash", "hist"))
    # cash stays on the simplex through a warm run
    tot = warm2.state.agg(F.sum("cash")).collect()[0][0]
    assert abs(tot - 1.0) < 1e-9


def test_opic_warm_new_vertices_seed_zero_cash(spark):
    """New urls absent from init_state start with 0 cash and still
    accumulate importance through in-links (the paper's adaptive
    behavior)."""
    e1 = [(0, 1), (1, 2), (2, 0)]
    g1 = Graph.from_edges(edges_df(spark, e1), num_partitions=2)
    prev = opic(g1, iters=4)
    e2 = e1 + [(2, 3), (3, 0)]
    g2 = Graph.from_edges(edges_df(spark, e2), num_partitions=2)
    warm = opic(g2, iters=4, init_state=prev.state)
    state = {r.vid: r for r in warm.state.collect()}
    assert 3 in state
    assert state[3].hist > 0  # received cash through 2 -> 3
    tot = warm.state.agg(F.sum("cash")).collect()[0][0]
    assert abs(tot - 1.0) < 1e-9


def test_trustrank_warm_passthrough(spark):
    """trustrank forwards init_ranks to personalized_pagerank (it IS
    seeded PPR — the warm argument is inherited, VERDICT r4 task 4)."""
    from linkgraph.algorithms.trustrank import trustrank

    # a directed cycle: trust mass circulates, so cold convergence to
    # 1e-10 takes ~log(tol)/log(alpha) rounds (chesapeake's derived
    # digraph converges in one round — no speedup measurable there)
    edges = [(i, i + 1) for i in range(20)] + [(20, 0)]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    seeds = [0, 1]
    conv = trustrank(g, seeds, tol=1e-10, max_iters=200)
    assert conv.converged
    re = trustrank(
        g, seeds, tol=1e-10, max_iters=200, init_ranks=conv.state
    )
    assert re.converged and re.iterations < conv.iterations
    # the warm rerun's extra step moves values by < tol = 1e-10
    assert _scores(re, ("rank",), nd=8) == _scores(conv, ("rank",), nd=8)
