"""TrustRank / spam mass vs a NumPy twin (SURVEY.md §5.2).

A link-farm fixture with a known spam cluster: the trusted core's pages
must score near-zero mass, the farm (unreachable from any seed) must
score mass → 1, and the estimator must agree with a dense NumPy
replay of both power iterations to 1e-9.
"""

from __future__ import annotations

import numpy as np
import pytest

from conftest import edges_df
from linkgraph.algorithms.trustrank import spam_mass, trustrank
from linkgraph.graph import Graph

ALPHA = 0.85
ITERS = 10


def _np_pr(edges, n, teleport, iters=ITERS, alpha=ALPHA):
    """Dense replay of the engine's iteration: teleport + dangling
    restart both follow the ``teleport`` vector."""
    outdeg = np.zeros(n)
    for s, _ in edges:
        outdeg[s] += 1
    r = teleport.copy()
    for _ in range(iters):
        msum = np.zeros(n)
        for s, d in edges:
            msum[d] += r[s] / outdeg[s]
        dangling = r[outdeg == 0].sum()
        r = (1 - alpha + alpha * dangling) * teleport + alpha * msum
    return r


@pytest.fixture(scope="module")
def farm_graph(spark):
    # vertices 0..9: trusted core (ring + chords, seed = 0)
    # vertices 10..19: link farm boosting vertex 10, no in-links from
    # the core — zero trust can reach it
    core = [(i, (i + 1) % 10) for i in range(10)] + [(i, (i + 3) % 10) for i in range(10)]
    farm = [(i, 10) for i in range(11, 20)] + [(10, i) for i in range(11, 20)]
    edges = sorted(set(core + farm))
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    return g, edges


def test_spam_mass_vs_numpy(spark, farm_graph):
    g, edges = farm_graph
    n = 20
    seeds = [0, 5]
    got = {
        r.vid: (r.rank, r.trust, r.mass)
        for r in spam_mass(g, seeds, alpha=ALPHA, tol=0.0, max_iters=ITERS).collect()
    }
    uni = np.full(n, 1.0 / n)
    tele = np.zeros(n)
    tele[seeds] = 1.0 / len(seeds)
    p = _np_pr(edges, n, uni)
    t = _np_pr(edges, n, tele)
    for v in range(n):
        assert got[v][0] == pytest.approx(p[v], abs=1e-9)
        assert got[v][1] == pytest.approx(t[v], abs=1e-9)
        exp_mass = (p[v] - t[v]) / p[v] if p[v] > 0 else 0.0
        assert got[v][2] == pytest.approx(exp_mass, abs=1e-9)


def test_farm_scores_high_mass_core_low(spark, farm_graph):
    g, _ = farm_graph
    out = {r.vid: r.mass for r in spam_mass(g, [0, 5], max_iters=ITERS).collect()}
    # no path from the trusted core into the farm → mass ≈ 1 there
    for v in range(10, 20):
        assert out[v] > 0.99, (v, out[v])
    # the seeds themselves and their ring neighbors keep low/negative mass
    assert out[0] < 0.5 and out[5] < 0.5


def test_trustrank_is_seeded_ppr(spark, farm_graph):
    g, _ = farm_graph
    from linkgraph.algorithms.ppr import personalized_pagerank

    a = {r.vid: r.rank for r in trustrank(g, [0], tol=0.0, max_iters=5).state.collect()}
    b = {
        r.vid: r.rank
        for r in personalized_pagerank(g, [0], tol=0.0, max_iters=5).state.collect()
    }
    assert a == b
