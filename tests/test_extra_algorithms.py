"""PPR / HITS / k-core / JPL coloring / SpGEMM / BC vs CPU oracles
(SURVEY.md §2.3 A7–A14 coverage; oracle style per §5.2.1)."""

from __future__ import annotations

import numpy as np
import pytest

from conftest import edges_df
from linkgraph.algorithms.bc import betweenness_centrality
from linkgraph.algorithms.coloring import jpl_coloring
from linkgraph.algorithms.coreness import coreness, coreness_rounds
from linkgraph.algorithms.hits import hits
from linkgraph.algorithms.kcore import k_core
from linkgraph.algorithms.ppr import personalized_pagerank
from linkgraph.algorithms.spgemm import square_counts
from linkgraph.fixtures import MICRO_GRAPHS, chesapeake_edges
from linkgraph.graph import Graph
from oracles import (
    bc_oracle,
    coreness_oracle,
    hits_oracle,
    kcore_oracle,
    ppr_oracle,
    spgemm_square_oracle,
)


# ---------------------------------------------------------------- PPR ----

def _ppr_check(spark, edges, seeds, graph=None):
    g = graph or Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    res = personalized_pagerank(g, seeds, tol=1e-6)
    got = {r.vid: r.rank for r in res.state.collect()}
    want = ppr_oracle(edges, seeds, tol=1e-6)
    assert set(got) == set(want)
    gv = np.array([got[v] for v in sorted(want)])
    wv = np.array([want[v] for v in sorted(want)])
    np.testing.assert_allclose(gv, wv, atol=1e-6)
    assert abs(gv.sum() - 1.0) < 1e-9  # Σp = 1 with seed-restart dangling


def test_ppr_chesapeake(spark, chesapeake_graph):
    _ppr_check(spark, chesapeake_edges(), seeds=[0, 5], graph=chesapeake_graph)


def test_ppr_dangling(spark):
    # dangling vertex 1: its mass must restart at the seed, not uniformly
    _ppr_check(spark, MICRO_GRAPHS["dangling_pair"], seeds=[0])


def test_ppr_concentrates_near_seed(spark):
    edges = MICRO_GRAPHS["two_cliques"]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=2)
    res = personalized_pagerank(g, [0], tol=1e-8)
    got = {r.vid: r.rank for r in res.state.collect()}
    # all mass stays in the seed's clique {0..4}; other clique gets none
    assert sum(got[v] for v in range(5)) > 0.999


# --------------------------------------------------------------- HITS ----

def _hits_check(spark, edges, graph=None):
    g = graph or Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    res = hits(g, tol=1e-6, max_iters=100)
    got = {r.vid: (r.hub, r.auth) for r in res.state.collect()}
    want = hits_oracle(edges, tol=1e-6, max_iters=100)
    assert set(got) == set(want)
    for v in want:
        np.testing.assert_allclose(got[v], want[v], atol=1e-5)


def test_hits_chesapeake(spark, chesapeake_graph):
    _hits_check(spark, chesapeake_edges(), graph=chesapeake_graph)


def test_hits_star(spark):
    # star: hub mass on the spokes, authority mass on the center
    edges = [(i, 0) for i in range(1, 6)]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=2)
    got = {r.vid: (r.hub, r.auth) for r in hits(g).state.collect()}
    assert got[0][1] == pytest.approx(1.0, abs=1e-6)  # sole authority
    for v in range(1, 6):
        assert got[v][0] == pytest.approx(1 / np.sqrt(5), abs=1e-6)


# ------------------------------------------------------------- k-core ----

@pytest.mark.parametrize("k", [2, 3])
def test_kcore_chesapeake(spark, chesapeake_graph, k):
    want = kcore_oracle(chesapeake_edges(), k)
    res = k_core(chesapeake_graph, k)
    got = {r.vid: r.deg for r in res.state.collect()}
    assert got == want


def test_kcore_cliques_plus_tail(spark):
    # 4-clique + a tail: 3-core = exactly the clique
    edges = [(i, j) for i in range(4) for j in range(4) if i < j]
    edges += [(3, 4), (4, 5)]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=2)
    got = sorted(r.vid for r in k_core(g, 3).state.collect())
    assert got == [0, 1, 2, 3]


def test_kcore_chain_unravels(spark):
    # chain: 2-core is empty — peeling must fully cascade (many rounds)
    g = Graph.from_edges(edges_df(spark, MICRO_GRAPHS["chain"]), num_partitions=2)
    assert k_core(g, 2).state.count() == 0


# ---------------------------------------------------------- coreness ----

def test_coreness_chesapeake(spark, chesapeake_graph):
    want = coreness_oracle(chesapeake_edges())
    res = coreness(chesapeake_graph)
    got = {r.vid: r.coreness for r in res.state.collect()}
    assert got == want


def test_coreness_matches_kcore_slices(spark, chesapeake_graph):
    # coreness(v) >= k  ⇔  v ∈ k_core(k): the decomposition must slice
    # back to the single-k operator for every k present
    core = {r.vid: r.coreness for r in coreness(chesapeake_graph).state.collect()}
    for k in (2, 3, max(core.values())):
        want = {v for v, c in core.items() if c >= k}
        got = {r.vid for r in k_core(chesapeake_graph, k).state.collect()}
        assert got == want, k


def test_coreness_structures(spark):
    # 4-clique (coreness 3) + tail (1), chain (all 1), synthetic crawl
    edges = [(i, j) for i in range(4) for j in range(4) if i < j]
    edges += [(3, 4), (4, 5)]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=2)
    got = {r.vid: r.coreness for r in coreness(g).state.collect()}
    assert got == {0: 3, 1: 3, 2: 3, 3: 3, 4: 1, 5: 1}

    from linkgraph.fixtures import synthetic_crawl

    crawl = synthetic_crawl(300, seed=7)
    g2 = Graph.from_edges(edges_df(spark, crawl), num_partitions=4)
    got2 = {r.vid: r.coreness for r in coreness(g2).state.collect()}
    assert got2 == coreness_oracle(crawl)


def test_coreness_rounds_converges_to_fixpoint(spark, chesapeake_graph):
    # fixed-round form (the SQL-oracle twin's counting): enough rounds
    # reproduce the converged run — extra rounds are no-ops
    res = coreness(chesapeake_graph)
    want = {r.vid: r.coreness for r in res.state.collect()}
    r = res.iterations + 2
    got = {
        r_.vid: r_.coreness
        for r_ in coreness_rounds(chesapeake_graph, r).collect()
    }
    assert got == want


# ----------------------------------------------------------- coloring ----

def _assert_proper_coloring(spark, edges, graph=None):
    g = graph or Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    res = jpl_coloring(g)
    colors = {r.vid: r.color for r in res.state.collect()}
    assert all(c is not None for c in colors.values())
    for s, d in edges:
        if s != d:
            assert colors[s] != colors[d], f"edge {s}-{d} monochromatic"
    return colors


def test_coloring_chesapeake(spark, chesapeake_graph):
    _assert_proper_coloring(spark, chesapeake_edges(), graph=chesapeake_graph)


def test_coloring_clique(spark):
    # K5 needs 5 distinct colors
    edges = [(i, j) for i in range(5) for j in range(5) if i < j]
    colors = _assert_proper_coloring(spark, edges)
    assert len(set(colors.values())) == 5


def test_coloring_knuth32_priority(spark, chesapeake_graph):
    # the catalog's SQL-oracleable priority: still a proper coloring,
    # and a Python twin of the arithmetic priority predicts it exactly
    res = jpl_coloring(chesapeake_graph, priority="knuth32")
    colors = {r.vid: r.color for r in res.state.collect()}
    edges = chesapeake_edges()
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    assert all(c is not None for c in colors.values())
    for s, d in edges:
        if s != d:
            assert colors[s] != colors[d]
    pri = {v: (v * 2654435761) % (1 << 32) for v in adj}
    unc, expect, rnd = set(adj), {}, 0
    while unc:
        win = [v for v in unc if all(pri[v] > pri[u] for u in adj[v] if u in unc)]
        for v in win:
            expect[v] = rnd
        unc -= set(win)
        rnd += 1
    assert colors == expect


def test_coloring_deterministic(spark):
    edges = chesapeake_edges()
    g1 = Graph.from_edges(edges_df(spark, edges), num_partitions=2)
    g2 = Graph.from_edges(edges_df(spark, edges), num_partitions=7)
    c1 = {r.vid: r.color for r in jpl_coloring(g1).state.collect()}
    c2 = {r.vid: r.color for r in jpl_coloring(g2).state.collect()}
    assert c1 == c2  # hash priorities ⇒ partitioning-independent


# ------------------------------------------------------------- SpGEMM ----

def test_spgemm_square_chesapeake(spark, chesapeake_graph):
    want = spgemm_square_oracle(chesapeake_edges())
    got = {
        (r.row, r.col): r.paths2
        for r in square_counts(chesapeake_graph).collect()
    }
    assert got == want


def test_spgemm_chain(spark):
    g = Graph.from_edges(edges_df(spark, MICRO_GRAPHS["chain"]), num_partitions=2)
    got = {(r.row, r.col): r.paths2 for r in square_counts(g).collect()}
    assert got == {(i, i + 2): 1 for i in range(8)}


# ----------------------------------------------------------------- BC ----

def test_bc_single_source_chesapeake(spark, chesapeake_graph):
    want = bc_oracle(chesapeake_edges(), sources=[0])
    got = {
        r.vid: r.bc
        for r in betweenness_centrality(chesapeake_graph, [0]).collect()
    }
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_bc_path_graph(spark):
    # path 0-1-2-3-4, all sources: interior vertices carry the load
    edges = [(i, i + 1) for i in range(4)]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=2)
    got = {
        r.vid: r.bc
        for r in betweenness_centrality(g, range(5)).collect()
    }
    want = bc_oracle(edges, sources=range(5))
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)
    assert got[2] > got[1] > got[0]


def test_bc_batched_equals_sequential(spark, chesapeake_graph):
    """One root-keyed superstep set == the per-source loop, bit-for-bit
    semantics (float tolerance only for cross-root summation order)."""
    from linkgraph.algorithms.bc import bc_batched

    sources = [0, 3, 7, 11]
    seq = {
        r.vid: r.bc
        for r in betweenness_centrality(chesapeake_graph, sources).collect()
    }
    bat = {
        r.vid: r.bc for r in bc_batched(chesapeake_graph, sources).collect()
    }
    assert set(seq) == set(bat)
    for v in seq:
        assert bat[v] == pytest.approx(seq[v], abs=1e-9)


def test_bc_sampled_full_sample_is_exact(spark, chesapeake_graph):
    """s = n ⇒ the estimator's scale factor is 1 and the sample is every
    vertex: bc_sampled must EQUAL all-sources exact BC."""
    from linkgraph.algorithms.bc import bc_sampled

    n = chesapeake_graph.num_vertices
    got = {
        r.vid: r.bc for r in bc_sampled(chesapeake_graph, n).collect()
    }
    all_verts = sorted({v for e in chesapeake_edges() for v in e})
    want = bc_oracle(chesapeake_edges(), sources=all_verts)
    assert set(got) == set(want)
    for v in want:
        assert got[v] == pytest.approx(want[v], abs=1e-9)


def test_bc_sampled_error_bound(spark, chesapeake_graph):
    """Half the sources on chesapeake: the scaled estimate must track the
    exact values — top-3 exact vertices all land in the estimated top-6,
    and mean absolute error stays well under the exact mean BC."""
    import numpy as np

    from linkgraph.algorithms.bc import bc_sampled

    n = chesapeake_graph.num_vertices
    est = {
        r.vid: r.bc for r in bc_sampled(chesapeake_graph, n // 2).collect()
    }
    all_verts = sorted({v for e in chesapeake_edges() for v in e})
    want = bc_oracle(chesapeake_edges(), sources=all_verts)
    exact_top = sorted(want, key=lambda v: -want[v])[:3]
    est_top6 = set(sorted(est, key=lambda v: -est[v])[:6])
    assert set(exact_top) <= est_top6
    errs = np.array([abs(est[v] - want[v]) for v in want])
    mean_bc = np.mean([want[v] for v in want])
    assert errs.mean() < mean_bc


def test_bc_sample_sources_deterministic(spark, chesapeake_graph):
    from linkgraph.algorithms.bc import sample_sources

    a = sample_sources(chesapeake_graph, 5)
    b = sample_sources(chesapeake_graph, 5)
    assert a == b and len(a) == 5


def test_random_walks_match_python_twin(spark):
    """Deterministic walks: exact per-step trajectory equality against a
    pure-Python replay of the arithmetic choice, including dangling-
    vertex truncation."""
    import collections

    from linkgraph.algorithms.walks import (
        WALK_A1,
        WALK_A2,
        WALK_P,
        random_walks,
    )
    from linkgraph.graph import Graph

    edges = [(0, 1), (0, 2), (1, 2), (2, 0), (2, 3), (3, 4), (1, 0)]
    df = spark.createDataFrame(edges, "src long, dst long")
    g = Graph.from_edges(df, num_partitions=4)
    got = {
        (r.walk_id, r.step): r.vid
        for r in random_walks(g, num_steps=6, seed=7).collect()
    }

    adj = collections.defaultdict(list)
    for s, d in sorted(set(edges)):
        if s != d:
            adj[s].append(d)
    want = {}
    for w in sorted({v for e in edges for v in e}):
        cur = w
        want[(w, 0)] = cur
        for t in range(1, 7):
            outs = sorted(adj.get(cur, []))
            if not outs:
                break
            cur = outs[((w * WALK_A1 + t * WALK_A2 + 7) % WALK_P) % len(outs)]
            want[(w, t)] = cur

    assert got == want
    # vertex 4 is dangling: its walk has only the step-0 row
    assert (4, 0) in got and (4, 1) not in got


def test_random_walks_custom_starts_and_zero_steps(spark):
    from linkgraph.algorithms.walks import random_walks
    from linkgraph.graph import Graph
    from pyspark.sql import functions as F

    df = spark.createDataFrame([(0, 1), (1, 0)], "src long, dst long")
    g = Graph.from_edges(df, num_partitions=4)
    starts = g.vertices.where(F.col("vid") == 0)
    out = random_walks(g, num_steps=0, starts=starts).collect()
    assert [(r.walk_id, r.step, r.vid) for r in out] == [(0, 0, 0)]


def test_katz_matches_numpy(spark):
    import numpy as np

    from conftest import edges_df
    from linkgraph.algorithms.katz import katz
    from linkgraph.fixtures import chesapeake_edges
    from linkgraph.graph import Graph

    edges = chesapeake_edges()
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    res = katz(g, alpha=0.05, beta=1.0, tol=0.0, max_iters=8)
    got = {r.vid: r.score for r in res.state.collect()}

    verts = sorted({v for e in set(edges) for v in e})
    idx = {v: i for i, v in enumerate(verts)}
    es = {(s, d) for s, d in edges if s != d}
    x = np.ones(len(verts))
    for _ in range(8):
        nxt = np.ones(len(verts))
        for s, d in es:
            nxt[idx[d]] += 0.05 * x[idx[s]]
        x = nxt
    for v in verts:
        assert abs(got[v] - x[idx[v]]) < 1e-9, v


def test_katz_converges_with_tol(spark):
    from conftest import edges_df
    from linkgraph.algorithms.katz import katz
    from linkgraph.fixtures import chesapeake_edges
    from linkgraph.graph import Graph

    g = Graph.from_edges(edges_df(spark, chesapeake_edges()), num_partitions=4)
    res = katz(g, alpha=0.01, tol=1e-9, max_iters=100)
    assert res.converged and res.iterations < 100


# ----------------------------------------------------------- Luby MIS ----

def _assert_mis(edges, status):
    """status: vid -> (>=0 member round | -1 out).  Checks independence
    (no two adjacent members) and maximality (every non-member has a
    member neighbor)."""
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    members = {v for v, st in status.items() if st >= 0}
    assert all(st is not None for st in status.values())
    for s, d in edges:
        if s != d:
            assert not (s in members and d in members), f"edge {s}-{d} in MIS"
    for v, nbrs in adj.items():
        if v not in members:
            assert nbrs & members, f"non-member {v} has no MIS neighbor"


def test_luby_mis_chesapeake(spark, chesapeake_graph):
    from linkgraph.algorithms.mis import luby_mis

    res = luby_mis(chesapeake_graph)
    status = {r.vid: r.status for r in res.state.collect()}
    _assert_mis(chesapeake_edges(), status)
    assert res.converged


def test_luby_mis_clique_and_star(spark):
    from linkgraph.algorithms.mis import luby_mis

    # K5: exactly one member.  Star 10→19 around 9: either the hub
    # alone or all leaves.
    edges = [(i, j) for i in range(5) for j in range(5) if i < j]
    edges += [(9, k) for k in range(10, 20)]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    res = luby_mis(g)
    status = {r.vid: r.status for r in res.state.collect()}
    _assert_mis(edges, status)
    clique_members = [v for v in range(5) if status[v] >= 0]
    assert len(clique_members) == 1
    star_members = {v for v in [9, *range(10, 20)] if status[v] >= 0}
    assert star_members == {9} or star_members == set(range(10, 20))


def test_luby_mis_knuth32_matches_python_twin(spark, chesapeake_graph):
    from linkgraph.algorithms.mis import luby_mis

    res = luby_mis(chesapeake_graph, priority="knuth32")
    status = {r.vid: r.status for r in res.state.collect()}
    edges = chesapeake_edges()
    adj: dict[int, set[int]] = {}
    for s, d in edges:
        if s != d:
            adj.setdefault(s, set()).add(d)
            adj.setdefault(d, set()).add(s)
    pri = {v: (v * 2654435761) % (1 << 32) for v in adj}
    und, expect, rnd = set(adj), {}, 0
    while und:
        winners = {
            v for v in und
            if all(pri[v] > pri[u] for u in adj[v] & und)
        }
        for w in winners:
            expect[w] = rnd
        removed = set().union(*(adj[w] for w in winners)) & und
        und -= winners | removed
        for v in removed:
            expect[v] = -1
        rnd += 1
    assert status == expect


def test_opic_invariants_and_python_twin(spark):
    """Synchronous OPIC: cash conserved (Σ = 1 every step), history
    grows by exactly 1 per step, trajectory matches a sequential twin."""
    from conftest import edges_df

    from linkgraph.algorithms.opic import crawl_priorities, opic
    from linkgraph.graph import Graph

    edges = [(0, 1), (1, 2), (2, 0), (2, 3), (3, 2), (4, 0)]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    iters = 6
    res = opic(g, iters=iters)
    rows = {r.vid: (r.cash, r.hist) for r in res.state.collect()}
    assert abs(sum(c for c, _ in rows.values()) - 1.0) < 1e-9
    assert abs(sum(h for _, h in rows.values()) - iters) < 1e-9

    # sequential twin
    verts = sorted({v for e in edges for v in e})
    n = len(verts)
    out = {v: [d for s, d in edges if s == v] for v in verts}
    cash = {v: 1.0 / n for v in verts}
    hist = {v: 0.0 for v in verts}
    for _ in range(iters):
        nxt = {v: 0.0 for v in verts}
        dang = sum(cash[v] for v in verts if not out[v])
        for v in verts:
            hist[v] += cash[v]
            if out[v]:
                share = cash[v] / len(out[v])
                for d in out[v]:
                    nxt[d] += share
        for v in verts:
            nxt[v] += dang / n
        cash = nxt
    for v in verts:
        assert abs(rows[v][0] - cash[v]) < 1e-9, v
        assert abs(rows[v][1] - hist[v]) < 1e-9, v

    imp = {r.vid: r.importance for r in crawl_priorities(g, iters=iters).collect()}
    assert abs(sum(imp.values()) - 1.0) < 1e-9


def test_maximal_matching_valid_and_maximal(spark):
    import random

    from conftest import edges_df

    from linkgraph.algorithms.matching import matched_pairs, maximal_matching
    from linkgraph.graph import Graph

    rng = random.Random(13)
    edges = list({(rng.randrange(30), rng.randrange(30)) for _ in range(70)})
    edges = [(a, b) for a, b in edges if a != b]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    st = {r.vid: r.mate for r in maximal_matching(g).state.collect()}
    canon = {(min(a, b), max(a, b)) for a, b in edges}
    # validity: mates are symmetric and edge-backed
    for v, m in st.items():
        if m is not None:
            assert st[m] == v, (v, m)
            assert (min(v, m), max(v, m)) in canon
    # maximality: no edge with both endpoints unmatched
    for a, b in canon:
        assert st[a] is not None or st[b] is not None, (a, b)
    pairs = {(r.a, r.b) for r in matched_pairs(g).collect()}
    assert pairs == {
        (v, m) for v, m in st.items() if m is not None and v < m
    }


def test_maximal_matching_deterministic_and_seeded(spark):
    from conftest import edges_df

    from linkgraph.algorithms.matching import matched_pairs
    from linkgraph.graph import Graph

    edges = [(i, (i + 1) % 12) for i in range(12)] + [(0, 6), (3, 9)]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    p1 = {(r.a, r.b) for r in matched_pairs(g, seed=42).collect()}
    p2 = {(r.a, r.b) for r in matched_pairs(g, seed=42).collect()}
    assert p1 == p2 and p1
    p3 = {(r.a, r.b) for r in matched_pairs(g, seed=7).collect()}
    assert p3  # different seed still a valid (possibly different) matching


def test_ppr_push_mass_conservation(spark):
    """Σ(p + r) = 1 after every round (cash-conservation of push)."""
    from conftest import edges_df
    from linkgraph.algorithms.ppr import ppr_push
    from linkgraph.graph import Graph

    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 0), (2, 4)]  # 4 dangling
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=2)
    for rounds in (1, 3, 6):
        st = ppr_push(g, 0, alpha=0.15, eps=1e-6, rounds=rounds)
        total = st.selectExpr("sum(p + r) AS t").collect()[0].t
        assert abs(total - 1.0) < 1e-12, (rounds, total)
    g.unpersist()


def test_ppr_push_converges_to_power_iteration(spark):
    """At tiny eps the settled vector matches the power-iteration PPR
    within the paper's residual bound (dangling restart-at-source on
    both sides: push's dangling rule == teleport-to-seed with one
    seed)."""
    from conftest import edges_df
    from linkgraph.algorithms.ppr import personalized_pagerank, ppr_push
    from linkgraph.graph import Graph

    edges = [(0, 1), (0, 2), (1, 2), (2, 3), (3, 0), (2, 4), (4, 1), (1, 5)]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=2)
    exact = {
        r.vid: r.rank
        for r in personalized_pagerank(
            g, [0], alpha=0.85, tol=1e-12, max_iters=300
        ).state.collect()
    }
    push = {
        r.vid: r.p
        for r in ppr_push(g, 0, alpha=0.15, eps=1e-9, max_rounds=400).collect()
    }
    for vid, rank in exact.items():
        assert abs(push.get(vid, 0.0) - rank) < 1e-6, (vid, rank, push.get(vid))
    g.unpersist()


def test_ppr_push_state_is_sparse(spark):
    """Push from a vertex in a small component must not touch the rest
    of the graph — the locality property that motivates the operator."""
    from conftest import edges_df
    from linkgraph.algorithms.ppr import ppr_push
    from linkgraph.graph import Graph

    # two components: a triangle 0-1-2 and a big chain 10..30
    edges = [(0, 1), (1, 2), (2, 0)] + [(i, i + 1) for i in range(10, 30)]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=2)
    touched = {r.vid for r in ppr_push(g, 0, eps=1e-10, max_rounds=200).collect()}
    assert touched == {0, 1, 2}
    g.unpersist()


def test_crawl_budget_sums_exact_and_proportional(spark):
    from linkgraph.algorithms.opic import allocate_crawl_budget

    w = spark.createDataFrame(
        [("a", 5.0), ("b", 3.0), ("c", 1.0), ("d", 1.0)],
        "host string, w double",
    )
    for total in (0, 1, 7, 100, 101):
        got = {r.host: r.slots for r in
               allocate_crawl_budget(w, total).collect()}
        assert sum(got.values()) == total, (total, got)
        # largest-remainder: every host within 1 of its exact quota
        for h, wt in (("a", 5.0), ("b", 3.0), ("c", 1.0), ("d", 1.0)):
            quota = wt * total / 10.0
            assert quota - 1 < got[h] < quota + 1, (total, h, got[h], quota)


def test_crawl_budget_rejects_negative(spark):
    import pytest as _pytest

    from linkgraph.algorithms.opic import allocate_crawl_budget

    w = spark.createDataFrame([("a", 1.0)], "host string, w double")
    with _pytest.raises(ValueError):
        allocate_crawl_budget(w, -1)


def test_crawl_budget_rejects_zero_weights(spark):
    """Review regression: an all-zero weight table must raise a clear
    ValueError, not DIVIDE_BY_ZERO inside the quota projection."""
    import pytest as _pytest

    from linkgraph.algorithms.opic import allocate_crawl_budget

    w = spark.createDataFrame(
        [("a", 0.0), ("b", 0.0)], "host string, w double"
    )
    with _pytest.raises(ValueError, match="positive"):
        allocate_crawl_budget(w, 10)


def test_indexed_edges_matches_window_twin_across_arrow_batches(spark):
    """indexed_edges' Arrow cumulative-run counter must equal the dense
    row_number-within-src ranking — including when a hub's edge run spans
    multiple Arrow batches (maxRecordsPerBatch forced tiny here)."""
    from pyspark.sql import functions as F
    from pyspark.sql.window import Window as W

    from linkgraph.algorithms.walks import indexed_edges
    from linkgraph.graph import Graph

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "7")
    try:
        # hub 0 with 100 out-edges (spans many 7-row batches) + scatter
        edges = [(0, d) for d in range(1, 101)] + [
            (s, (s * 13 + 1) % 50) for s in range(1, 50)
        ]
        df = spark.createDataFrame(edges, "src long, dst long")
        g = Graph.from_edges(df, num_partitions=4)
        got = {
            (r.src, r.dst): r.idx for r in indexed_edges(g).collect()
        }
        w = W.partitionBy("src").orderBy("dst")
        want = {
            (r.src, r.dst): r.idx
            for r in g.edges.select(
                "src", (F.row_number().over(w) - 1).alias("idx"), "dst"
            ).collect()
        }
        assert got == want
        assert got[(0, 100)] == 99  # the hub's full run is densely ranked
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_indexed_edges_rejects_unsorted_layout(spark):
    """ADVICE r03: a bare Graph(...) built from edges that violate the
    from_edges layout contract (hash(src)-partitioned, (src, dst)-sorted
    within partitions) must fail loud, not emit wrong/duplicate idx."""
    import pytest as _pytest

    from linkgraph.algorithms.walks import indexed_edges
    from linkgraph.graph import Graph

    # deliberately unsorted within its single partition
    df = spark.createDataFrame(
        [(5, 1), (2, 3), (5, 0), (2, 9)], "src long, dst long"
    ).coalesce(1)
    g = Graph(df, num_partitions=1)
    with _pytest.raises(Exception, match="layout contract"):
        indexed_edges(g).collect()


def test_indexed_edges_rejects_unsorted_across_batches(spark):
    """The layout assertion must also catch a violation that is only
    visible at an Arrow batch boundary (each batch internally sorted)."""
    import pytest as _pytest

    from linkgraph.algorithms.walks import indexed_edges
    from linkgraph.graph import Graph

    prev = spark.conf.get("spark.sql.execution.arrow.maxRecordsPerBatch")
    spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", "3")
    try:
        # rows 0-2 sorted, rows 3-5 sorted, but batch 2 starts below
        # batch 1's tail (src 9 → src 1)
        df = spark.createDataFrame(
            [(1, 1), (2, 2), (9, 3), (1, 4), (2, 5), (9, 6)],
            "src long, dst long",
        ).coalesce(1)
        g = Graph(df, num_partitions=1)
        with _pytest.raises(Exception, match="layout contract"):
            indexed_edges(g).collect()
    finally:
        spark.conf.set("spark.sql.execution.arrow.maxRecordsPerBatch", prev)


def test_weighted_walks_missing_weight_fails_loud(spark):
    """ADVICE r03: a weights table that misses graph edges must raise at
    index build (coverage contract), not silently truncate walks."""
    import pytest as _pytest

    from linkgraph.algorithms.walks import weighted_walks
    from linkgraph.graph import Graph

    df = spark.createDataFrame(
        [(0, 1), (1, 2), (2, 0)], "src long, dst long"
    )
    g = Graph.from_edges(df, num_partitions=2)
    wdf = spark.createDataFrame(
        [(0, 1, 3), (1, 2, 1)], "src long, dst long, w long"
    )  # (2, 0) has no weight row
    with _pytest.raises(ValueError, match="does not cover"):
        weighted_walks(g, num_steps=2, weights=wdf)


def _n2v_python_twin(edges, num_steps, p, q, seed, attempts, starts):
    """Pure-Python replay of node2vec_walks' deterministic arithmetic."""
    import collections

    from linkgraph.algorithms.walks import (
        WALK_A1,
        WALK_A2,
        WALK_A3,
        WALK_P,
        _n2v_weights,
    )

    wp, w1, wq, wmax = _n2v_weights(p, q)
    adj = collections.defaultdict(list)
    eset = set()
    for s, d in sorted(set(edges)):
        if s != d:
            adj[s].append(d)
            eset.add((s, d))
    want = {}
    for w in starts:
        prev, cur = w, w
        want[(w, 0)] = cur
        for t in range(1, num_steps + 1):
            outs = adj.get(cur)
            if not outs:
                break
            if t == 1:
                nxt = outs[((w * WALK_A1 + t * WALK_A2 + seed) % WALK_P) % len(outs)]
            else:
                chosen = None
                first_cand = None
                for a in range(attempts):
                    h1 = (w * WALK_A1 + a * WALK_A3 + t * WALK_A2 + seed) % WALK_P
                    c = outs[h1 % len(outs)]
                    if a == 0:
                        first_cand = c
                    if c == prev:
                        wc = wp
                    elif (prev, c) in eset:
                        wc = w1
                    else:
                        wc = wq
                    r = (w * WALK_A2 + a * WALK_A3 + t * WALK_A1 + seed) % WALK_P % wmax
                    if r < wc:
                        chosen = c
                        break
                nxt = chosen if chosen is not None else first_cand
            prev, cur = cur, nxt
            want[(w, t)] = cur
    return want


def test_node2vec_walks_match_python_twin(spark):
    """Exact trajectory equality vs the pure-Python replay of the
    rejection sampler, including the all-rejected fallback and
    dangling truncation."""
    from linkgraph.algorithms.walks import node2vec_walks
    from linkgraph.graph import Graph

    edges = [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 0), (2, 0), (2, 3),
        (3, 4), (3, 1), (4, 5), (2, 4),
    ]
    df = spark.createDataFrame(edges, "src long, dst long")
    g = Graph.from_edges(df, num_partitions=4)
    got = {
        (r.walk_id, r.step): r.vid
        for r in node2vec_walks(
            g, num_steps=6, p=4.0, q=0.25, seed=11, attempts=3
        ).collect()
    }
    starts = sorted({v for e in edges for v in e})
    want = _n2v_python_twin(edges, 6, 4.0, 0.25, 11, 3, starts)
    assert got == want
    # vertex 5 is dangling: only the step-0 row
    assert (5, 0) in got and (5, 1) not in got


def test_node2vec_bias_shifts_return_rate(spark):
    """Distribution check: small p (return-loving) must produce a higher
    immediate-return rate than large p on the same graph/seed."""
    from linkgraph.algorithms.walks import node2vec_walks
    from linkgraph.fixtures import synthetic_crawl
    from linkgraph.graph import Graph

    edges = synthetic_crawl(120)
    df = spark.createDataFrame(
        [(int(s), int(d)) for s, d in edges] +
        [(int(d), int(s)) for s, d in edges],  # symmetrize: returns exist
        "src long, dst long",
    )
    g = Graph.from_edges(df, num_partitions=4)

    def return_rate(p, q):
        rows = node2vec_walks(
            g, num_steps=8, p=p, q=q, seed=5, attempts=6
        ).collect()
        pos = {(r.walk_id, r.step): r.vid for r in rows}
        ret = tot = 0
        for (w, t), v in pos.items():
            if t >= 2 and (w, t - 2) in pos:
                tot += 1
                ret += int(pos[(w, t - 2)] == v)
        return ret / max(tot, 1)

    lo_p = return_rate(0.1, 1.0)   # 1/p = 10 → returns favored
    hi_p = return_rate(10.0, 1.0)  # 1/p = 0.1 → returns suppressed
    assert lo_p > hi_p, (lo_p, hi_p)


def test_incremental_coreness_warm_start(spark):
    """Upper-bound warm start: bound = prev_coreness + m (m = increment
    edge count; valid by the one-edge core-change theorem) reaches the
    identical decomposition with strictly less CHANGED volume — the
    bound pre-collapses high-degree/low-core vertices, so the delta
    rounds shuffle fewer changed rows (round COUNT is governed by the
    cascade length, which a value bound cannot shorten)."""
    from linkgraph.graph import Graph
    from pyspark.sql import functions as F

    # epoch 1: a 12-vertex path whose internal vertices each carry 6
    # private leaves (deg 8, coreness 1) — cold init must first collapse
    # 8 -> 2, then run the 2 -> 1 path cascade
    e1 = [(i, i + 1) for i in range(11)]
    for i in range(12):
        for j in range(6):
            e1.append((i, 100 + i * 10 + j))
    g1 = Graph.from_edges(edges_df(spark, e1), num_partitions=4)
    prev = coreness(g1)
    assert prev.converged

    # epoch 2: one appended edge (m=1)
    e2 = e1 + [(11, 999)]
    g2 = Graph.from_edges(edges_df(spark, e2), num_partitions=4)
    cold = coreness(g2)
    bound = prev.state.select(
        "vid", (F.col("coreness") + F.lit(1)).alias("bound")
    )
    warm = coreness(g2, init_bound=bound, prev_edges=g1.edges)
    assert cold.converged and warm.converged
    cc_ = {r.vid: r.coreness for r in cold.state.collect()}
    cw = {r.vid: r.coreness for r in warm.state.collect()}
    assert cc_ == cw
    assert warm.iterations <= cold.iterations
    changed_cold = sum(h.get("changed") or 0 for h in cold.history)
    changed_warm = sum(h.get("changed") or 0 for h in warm.history)
    assert changed_warm < changed_cold, (
        f"warm changed {changed_warm} !< cold {changed_cold}"
    )


def test_coreness_warm_start_from_exact_bound_is_exact(spark, chesapeake_graph):
    """Degenerate warm start (bound = the true coreness itself) must be a
    fixpoint: identical values, minimal rounds."""
    from pyspark.sql import functions as F

    base = coreness(chesapeake_graph)
    bound = base.state.select("vid", F.col("coreness").alias("bound"))
    warm = coreness(
        chesapeake_graph, init_bound=bound, assume_append_only=True
    )
    got = {r.vid: r.coreness for r in warm.state.collect()}
    want = {r.vid: r.coreness for r in base.state.collect()}
    assert got == want
    assert warm.iterations <= 2


def test_weighted_walks_match_python_twin(spark):
    """Exact trajectory equality vs a pure-Python replay of the
    weight-proportional rejection sampler (integer thresholds)."""
    import collections

    from linkgraph.algorithms.walks import (
        N2V_SCALE,
        WALK_A1,
        WALK_A2,
        WALK_A3,
        WALK_P,
        weighted_walks,
    )
    from linkgraph.graph import Graph

    edges = [
        (0, 1), (0, 2), (0, 3), (1, 2), (1, 0), (2, 0), (2, 3),
        (3, 4), (3, 1), (2, 4),
    ]
    wts = {(s, d): 1 + (s * 7 + d * 13) % 5 for s, d in edges}
    df = spark.createDataFrame(edges, "src long, dst long")
    g = Graph.from_edges(df, num_partitions=4)
    wdf = spark.createDataFrame(
        [(s, d, w) for (s, d), w in wts.items()], "src long, dst long, w long"
    )
    A = 3
    got = {
        (r.walk_id, r.step): r.vid
        for r in weighted_walks(
            g, num_steps=5, weights=wdf, seed=9, attempts=A
        ).collect()
    }

    adj = collections.defaultdict(list)
    for s, d in sorted(set(edges)):
        if s != d:
            adj[s].append(d)
    wmax = {s: max(wts[(s, d)] for d in ds) for s, ds in adj.items()}
    want = {}
    for wid in sorted({v for e in edges for v in e}):
        cur = wid
        want[(wid, 0)] = cur
        for t in range(1, 6):
            outs = adj.get(cur)
            if not outs:
                break
            chosen = first = None
            for a in range(A):
                h1 = (wid * WALK_A1 + a * WALK_A3 + t * WALK_A2 + 9) % WALK_P
                c = outs[h1 % len(outs)]
                if a == 0:
                    first = c
                thr = (wts[(cur, c)] * N2V_SCALE) // wmax[cur]
                r = (wid * WALK_A2 + a * WALK_A3 + t * WALK_A1 + 9) % WALK_P % N2V_SCALE
                if r < thr:
                    chosen = c
                    break
            cur = chosen if chosen is not None else first
            want[(wid, t)] = cur
    assert got == want
    assert (4, 0) in got and (4, 1) not in got  # dangling truncation


def test_weighted_walks_follow_heavy_edges(spark):
    """Distribution check: with one dominant-weight out-edge per vertex,
    walkers must take the heavy edge far more often than 1/outdeg."""
    from pyspark.sql import functions as F

    from linkgraph.algorithms.walks import weighted_walks
    from linkgraph.graph import Graph

    # ring of 60 vertices; each vertex also has 3 light chords
    n = 60
    edges = []
    wrows = []
    for i in range(n):
        heavy = (i + 1) % n
        edges.append((i, heavy))
        wrows.append((i, heavy, 1000))
        for j in (7, 19, 31):
            d = (i + j) % n
            if d != i and d != heavy:
                edges.append((i, d))
                wrows.append((i, d, 1))
    g = Graph.from_edges(
        spark.createDataFrame(edges, "src long, dst long"), num_partitions=4
    )
    wdf = spark.createDataFrame(wrows, "src long, dst long, w long")
    out = weighted_walks(g, num_steps=6, weights=wdf, seed=1, attempts=8)
    pos = {(r.walk_id, r.step): r.vid for r in out.collect()}
    heavy = total = 0
    for (wid, t), v in pos.items():
        nt = pos.get((wid, t + 1))
        if nt is not None:
            total += 1
            heavy += int(nt == (v + 1) % n)
    rate = heavy / total
    # uniform would be ~1/4; weight 1000:1:1:1 should push well past 0.8
    assert rate > 0.8, rate


def test_incremental_ppr_warm_start(spark):
    """PPR epoch warm start: the iteration map is an alpha-contraction,
    so any init converges to the unique fixpoint — a previous epoch's
    vector converges in fewer iterations with allclose ranks."""
    from linkgraph.fixtures import synthetic_crawl

    e1 = [(int(s), int(d)) for s, d in synthetic_crawl(200)]
    g1 = Graph.from_edges(edges_df(spark, e1), num_partitions=4)
    prev = personalized_pagerank(g1, [0, 5], tol=1e-8)
    assert prev.converged

    e2 = e1 + [(500 + i, (i * 13) % 200) for i in range(8)] + [
        ((i * 17) % 200, 500 + i) for i in range(8)
    ]
    g2 = Graph.from_edges(edges_df(spark, e2), num_partitions=4)
    cold = personalized_pagerank(g2, [0, 5], tol=1e-8)
    warm = personalized_pagerank(g2, [0, 5], tol=1e-8, init_ranks=prev.state)
    assert cold.converged and warm.converged
    assert warm.iterations < cold.iterations, (
        f"warm {warm.iterations} !< cold {cold.iterations}"
    )
    rc = {r.vid: r.rank for r in cold.state.collect()}
    rw = {r.vid: r.rank for r in warm.state.collect()}
    assert set(rc) == set(rw)
    assert all(abs(rc[v] - rw[v]) < 1e-6 for v in rc)


def test_incremental_hits_warm_start(spark):
    """HITS epoch warm start: power iteration from the previous epoch's
    scores reaches the same principal vectors in fewer rounds."""
    from linkgraph.fixtures import synthetic_crawl

    e1 = [(int(s), int(d)) for s, d in synthetic_crawl(200)]
    g1 = Graph.from_edges(edges_df(spark, e1), num_partitions=4)
    prev = hits(g1, tol=1e-8, max_iters=200)
    assert prev.converged

    e2 = e1 + [(500 + i, (i * 13) % 200) for i in range(8)] + [
        ((i * 17) % 200, 500 + i) for i in range(8)
    ]
    g2 = Graph.from_edges(edges_df(spark, e2), num_partitions=4)
    cold = hits(g2, tol=1e-8, max_iters=200)
    warm = hits(g2, tol=1e-8, max_iters=200, init_scores=prev.state)
    assert cold.converged and warm.converged
    assert warm.iterations < cold.iterations, (
        f"warm {warm.iterations} !< cold {cold.iterations}"
    )
    hc = {r.vid: (r.hub, r.auth) for r in cold.state.collect()}
    hw = {r.vid: (r.hub, r.auth) for r in warm.state.collect()}
    assert set(hc) == set(hw)
    for v in hc:
        assert abs(hc[v][0] - hw[v][0]) < 1e-5
        assert abs(hc[v][1] - hw[v][1]) < 1e-5
