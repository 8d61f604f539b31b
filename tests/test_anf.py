"""ANF / effective diameter vs an exact Python twin (SURVEY.md §5.2).

The FM sketch pipeline is all-integer and md5-deterministic, so the
primary test is EXACT: every register of every vertex after T rounds
must equal the bit-for-bit Python replay (same hash, same init bit,
same OR propagation over in-edges).  The estimate layer is checked
against FM's accuracy envelope on a graph whose true neighborhood
function is known in closed form.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pytest

from conftest import edges_df
from linkgraph.algorithms.anf import (
    FM_PHI,
    _POW2_FLOAT,
    anf,
    ball_estimate_col,
    effective_diameter,
    frac_pow2_consts,
    harmonic_centrality,
    rank_sum_col,
)
from linkgraph.graph import Graph


def _py_h(j: int, v: int) -> int:
    return int(hashlib.md5(f"{j}:{v}".encode()).hexdigest()[:8], 16)


def _py_init(j: int, v: int) -> int:
    x = _py_h(j, v)
    return 1 << 31 if x == 0 else x & -x


def _py_anf(edges, vids, k, rounds):
    sk = {v: [_py_init(j, v) for j in range(k)] for v in vids}
    for _ in range(rounds):
        new = {v: list(sk[v]) for v in vids}
        for s, d in edges:
            for j in range(k):
                new[d][j] |= sk[s][j]
        sk = new
    return sk


def _py_lzr(s: int) -> int:
    m = 0
    while (s >> m) & 1:
        m += 1
    return m


@pytest.fixture(scope="module")
def rand_graph(spark):
    rng = np.random.default_rng(7)
    edges = sorted(
        {(int(a), int(b)) for a, b in rng.integers(0, 40, size=(120, 2)) if a != b}
    )
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    return g, edges


def test_sketches_exact_vs_python_twin(spark, rand_graph):
    g, edges = rand_graph
    k, rounds = 4, 3
    res = anf(g, k=k, max_iters=rounds)
    got = {r.vid: tuple(r[f"sk{j}"] for j in range(k)) for r in res.state.collect()}
    vids = sorted({v for e in edges for v in e})
    exp = _py_anf(edges, vids, k, rounds)
    assert got == {v: tuple(exp[v]) for v in vids}


def test_rank_sum_exact(spark, rand_graph):
    g, edges = rand_graph
    k = 4
    res = anf(g, k=k, max_iters=3)
    got = {
        r.vid: r.rsum
        for r in res.state.select("vid", rank_sum_col(k).alias("rsum")).collect()
    }
    vids = sorted({v for e in edges for v in e})
    exp = _py_anf(edges, vids, k, 3)
    assert got == {v: sum(_py_lzr(x) for x in exp[v]) for v in vids}


def test_convergence_at_stability(spark):
    # directed path 0→1→…→9: vertex v's in-ball stops growing after v
    # rounds, so the sketch fixpoint is reached in exactly 9 rounds and
    # the observed changed-count must hit 0 (one extra confirming round)
    chain = [(i, i + 1) for i in range(9)]
    g = Graph.from_edges(edges_df(spark, chain), num_partitions=2)
    res = anf(g, k=2, max_iters=32)
    assert res.converged
    assert res.iterations <= 11
    assert res.history[-1]["changed"] == 0


def test_estimate_accuracy_on_known_ball_sizes(spark):
    # complete bipartite-ish star: every vertex 1..n links to 0, so the
    # in-ball of 0 is n+1 and of everyone else is 1 — closed form NF.
    n = 200
    star = [(i, 0) for i in range(1, n + 1)]
    g = Graph.from_edges(edges_df(spark, star), num_partitions=2)
    k = 64  # stderr ≈ 0.78/√k ≈ 10% per vertex
    res = anf(g, k=k, max_iters=4)
    est = {
        r.vid: r.est
        for r in res.state.select(
            "vid", ball_estimate_col(k).alias("est")
        ).collect()
    }
    assert est[0] == pytest.approx(n + 1, rel=0.35)
    others = [est[v] for v in est if v != 0]
    # singleton balls: rank sum is tiny, estimate ≈ 2^r̄/φ with r̄ ≈ ~1
    assert max(others) < 8.0
    assert float(np.mean(others)) == pytest.approx(1.0 / FM_PHI * 2**0.5, rel=0.6)


def _py_est(rsum: int, k: int) -> float:
    # same decomposition as ball_estimate_col: exact 2^whole literal ×
    # precomputed 2^(frac/k) constant / φ — pure IEEE-double ops, so the
    # Python replay is bit-identical to the engine (and the DuckDB twin)
    return _POW2_FLOAT[(rsum - rsum % k) // k] * frac_pow2_consts(k)[rsum % k] / FM_PHI


def test_harmonic_exact_vs_python_twin(spark, rand_graph):
    g, edges = rand_graph
    k, rounds = 4, 5
    got = {
        r.vid: r.harmonic
        for r in harmonic_centrality(g, k=k, max_iters=rounds).collect()
    }
    vids = sorted({v for e in edges for v in e})
    exp = {}
    for v in vids:
        hc, prev = 0.0, None
        for t in range(rounds + 1):
            sk = _py_anf(edges, vids, k, t)
            est = _py_est(sum(_py_lzr(x) for x in sk[v]), k)
            if t > 0:
                hc = hc + (est - prev) / float(t)
            prev = est
        exp[v] = hc
    # exact float equality: the engine's trajectory is engine-portable
    # by construction (no fractional pow, left-associative accumulation)
    assert got == exp


def test_harmonic_star_center_dominates(spark):
    # directed star 1..n → 0: in-harmonic of 0 is exactly n (all at
    # distance 1); leaves receive nothing, so their hc is ~0
    n = 200
    star = [(i, 0) for i in range(1, n + 1)]
    g = Graph.from_edges(edges_df(spark, star), num_partitions=2)
    got = {r.vid: r.harmonic for r in harmonic_centrality(g, k=64, max_iters=4).collect()}
    assert got[0] == pytest.approx(n, rel=0.35)
    assert max(abs(got[v]) for v in got if v != 0) < 8.0


def test_effective_diameter_path(spark):
    # path of length 12: true in-eccentricity max is 12; the 0.9-
    # effective diameter of the exact NF curve is ~10.9
    chain = [(i, i + 1) for i in range(12)]
    g = Graph.from_edges(edges_df(spark, chain), num_partitions=2)
    out = effective_diameter(g, q=0.9, k=32, max_iters=20)
    assert out["converged"]
    assert all(b >= a for a, b in zip(out["nf"], out["nf"][1:]))
    assert 6.0 <= out["diameter"] <= 12.0
