"""Property-based differential tests: random digraphs vs the CPU oracles.

The adversarial micro-graphs in FIXTURES.md pin known edge cases; this
module lets hypothesis hunt for UNKNOWN ones — partition-dependent
nondeterminism, tie-break divergence, dangling/self-loop handling — by
generating arbitrary small digraphs (duplicates and self-loops included,
which Graph.from_edges must normalize away identically to the oracles'
``_normalize``) and checking all four mandated primitives against their
sequential twins on each.  One generated graph exercises PR + CC + TC +
LP together so the Spark-side cost per example stays ~constant.

Kept deliberately small (max_examples=6, ≤14 vertices): each example is
several Spark jobs; the goal is shrunk counterexamples, not volume.
"""

from __future__ import annotations

import numpy as np
from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from conftest import edges_df
from linkgraph import (
    Graph,
    connected_components,
    label_propagation,
    pagerank,
)
from linkgraph.algorithms.triangles import triangle_count, triangle_counts_per_vertex
from oracles import cc_oracle, labelprop_oracle, pagerank_oracle, triangle_oracle

edge_lists = st.lists(
    st.tuples(st.integers(0, 13), st.integers(0, 13)),
    min_size=1,
    max_size=40,
)


@given(edges=edge_lists)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
    print_blob=True,
)
def test_primitives_match_oracles_on_random_digraphs(spark, edges):
    # Graph.from_edges drops self-loops + dupes; a list that normalizes
    # to nothing is the empty graph (covered by test_pagerank's empty case)
    norm = {(s, d) for s, d in edges if s != d}
    if not norm:
        return
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)

    # PageRank: allclose 1e-6 at convergence (probability form)
    res = pagerank(g, tol=1e-9, max_iters=200)
    want, _ = pagerank_oracle(edges, tol=1e-9, max_iters=200)
    got = {r.vid: r.rank for r in res.state.collect()}
    assert set(got) == set(want)
    assert np.allclose(
        [got[v] for v in sorted(got)],
        [want[v] for v in sorted(want)],
        atol=1e-6,
    )

    # Connected components: exact
    cc = connected_components(g)
    assert {r.vid: r.comp for r in cc.state.collect()} == cc_oracle(edges)

    # Triangle count: exact, total and per-vertex
    want_total, want_per_vertex = triangle_oracle(edges)
    assert triangle_count(g) == want_total
    got_tc = {r.vid: r.triangles for r in triangle_counts_per_vertex(g).collect()}
    assert got_tc == want_per_vertex

    # Label propagation: exact under synchronous min-tie-break semantics
    lp = label_propagation(g, max_iters=8)
    want_lp, _ = labelprop_oracle(edges, max_iters=8)
    assert {r.vid: r.label for r in lp.state.collect()} == want_lp


@given(edges=edge_lists)
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
    print_blob=True,
)
def test_traversal_and_structure_match_oracles(spark, edges):
    """BFS / SSSP / k-core vs sequential oracles + coloring validity.

    Same shape as the four-primitive test above, over the frontier-style
    algorithms whose failure modes differ (anti-join frontier subtraction,
    full_outer relaxation merge, iterative peeling, random-priority MIS):
    hypothesis hunts for source-unreachable islands, relaxation ties and
    peel-order dependence that the fixed fixtures can't.
    """
    from linkgraph.algorithms.bfs import bfs
    from linkgraph.algorithms.coloring import jpl_coloring
    from linkgraph.algorithms.kcore import k_core
    from linkgraph.algorithms.sssp import sssp
    from oracles import bfs_oracle, kcore_oracle, sssp_oracle

    norm = {(s, d) for s, d in edges if s != d}
    if not norm:
        return
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    source = min(min(s, d) for s, d in norm)

    # BFS depths: exact over reachable vertices
    res = bfs(g, source)
    assert {r.vid: r.depth for r in res.state.collect()} == bfs_oracle(
        edges, source
    )

    # SSSP with unit weights: exercises the full_outer relaxation merge
    res = sssp(g, source)
    assert {r.vid: r.dist for r in res.state.collect()} == sssp_oracle(
        edges, source
    )

    # 2-core + within-core degrees: exact (peel order must not matter)
    res = k_core(g, k=2)
    got = {r.vid: r.deg for r in res.state.collect()}
    assert got == kcore_oracle(edges, k=2)

    # JPL coloring: proper on the symmetrized graph (no same-color edge)
    colors = {r.vid: r.color for r in jpl_coloring(g).state.collect()}
    for s, d in norm:
        assert colors[s] != colors[d], (s, d)


@given(edges=edge_lists)
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
    print_blob=True,
)
def test_contraction_and_spatial_match_oracles(spark, edges):
    """MST / geolocation / single-source BC / knuth32 coloring.

    The remaining oracle-able algorithm families: union-find contraction
    (Borůvka merge order must not matter), iterative spatial medians
    (even/odd neighbor counts hit the interpolated-median path), Brandes'
    two-phase accumulation (σ ratios on multi-path graphs), and the
    arithmetic-priority coloring round indices (exact vs the sequential
    twin, not just validity)."""
    from linkgraph.algorithms.bc import betweenness_centrality
    from linkgraph.algorithms.coloring import jpl_coloring
    from linkgraph.algorithms.geolocation import geolocate
    from linkgraph.algorithms.mst import minimum_spanning_forest
    from oracles import bc_oracle, geolocation_oracle, mst_oracle

    norm = {(s, d) for s, d in edges if s != d}
    if not norm:
        return
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    verts = sorted({v for e in norm for v in e})

    # MST: distinct weights (s*100+d over canonical pairs) ⇒ unique MSF
    wedges = [
        (s, d, float(min(s, d) * 100 + max(s, d)))
        for s, d in sorted({(min(s, d), max(s, d)) for s, d in norm})
    ]
    wdf = spark.createDataFrame(wedges, "src long, dst long, weight double")
    got_msf = {(r.src, r.dst): r.weight for r in minimum_spanning_forest(wdf).collect()}
    total, n_edges = mst_oracle(wedges)
    assert len(got_msf) == n_edges
    assert abs(sum(got_msf.values()) - total) < 1e-9

    # Geolocation: every 3rd vertex seeded with integer coords
    locs = {v: (float(v % 19 - 9), float(v % 37 - 18)) for v in verts[::3]}
    ldf = spark.createDataFrame(
        [(v, a, b) for v, (a, b) in locs.items()],
        "vid long, lat double, lon double",
    )
    got_geo = {
        r.vid: (r.lat, r.lon)
        for r in geolocate(g, ldf).state.collect()
        if r.lat is not None
    }
    want_geo = geolocation_oracle(edges, locs)
    assert set(got_geo) == set(want_geo)
    for v in want_geo:
        assert np.allclose(got_geo[v], want_geo[v], atol=1e-9), v

    # Single-source BC from the smallest vertex: allclose vs Brandes twin
    source = verts[0]
    got_bc = {
        r.vid: r.bc for r in betweenness_centrality(g, [source]).collect()
    }
    want_bc = bc_oracle(edges, [source])
    assert set(got_bc) == set(want_bc)
    assert np.allclose(
        [got_bc[v] for v in sorted(got_bc)],
        [want_bc[v] for v in sorted(want_bc)],
        atol=1e-9,
    )

    # knuth32 coloring: exact round indices vs the sequential twin
    colors = {
        r.vid: r.color
        for r in jpl_coloring(g, priority="knuth32").state.collect()
    }
    adj: dict[int, set[int]] = {}
    for s, d in norm:
        adj.setdefault(s, set()).add(d)
        adj.setdefault(d, set()).add(s)
    pri = {v: (v * 2654435761) % (1 << 32) for v in adj}
    unc, expect, rnd = set(adj), {}, 0
    while unc:
        win = [v for v in unc if all(pri[v] > pri[u] for u in adj[v] if u in unc)]
        for v in win:
            expect[v] = rnd
        unc -= set(win)
        rnd += 1
    assert colors == expect


@given(edges=edge_lists)
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
    print_blob=True,
)
def test_spmv_and_bfs_directions_match_oracles(spark, edges):
    """Weighted SpMV vs a dense NumPy product (duplicate COO entries
    accumulate), and push/pull/optimized BFS tri-mode equality — the
    pull path's unvisited/frontier semi-joins must agree with plain
    advance on arbitrary digraphs, including self-loops, dangling
    vertices, and disconnected remainders."""
    from linkgraph.algorithms.bfs import bfs
    from linkgraph.algorithms.spmv import spmv
    from oracles import bfs_oracle

    # SpMV on the RAW edge list (duplicates/self-loops are all rows of A)
    n = 14
    wrows = [(s, d, float((s * 3 + d * 5) % 7 + 1)) for s, d in edges]
    A = np.zeros((n, n))
    for s, d, w in wrows:
        A[d, s] += w
    x = np.arange(n, dtype=float) / 4.0
    wdf = spark.createDataFrame(wrows, "src long, dst long, weight double")
    xdf = spark.createDataFrame(
        [(i, float(x[i])) for i in range(n)], "vid long, x double"
    )
    got_y = {r.vid: r.y for r in spmv(wdf, xdf).collect()}
    want_y = A @ x
    assert set(got_y) == {d for _, d, _ in wrows}
    for v, y in got_y.items():
        assert abs(y - want_y[v]) < 1e-9, v

    # BFS tri-mode equality from the smallest vertex present
    norm = {(s, d) for s, d in edges if s != d}
    if not norm:
        return
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    src = min(v for e in norm for v in e)
    want = bfs_oracle(edges, src)
    for direction in ("forward", "pull", "optimized"):
        got = {
            r.vid: r.depth
            for r in bfs(g, src, direction=direction).state.collect()
        }
        assert got == want, direction


@given(edges=edge_lists)
@settings(
    max_examples=6,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
    print_blob=True,
)
def test_census_layering_bipartite_match_oracles(spark, edges):
    """Round-2 structural ops vs sequential twins on one random digraph:
    triad census (itertools enumeration), condensation levels
    (longest-path relaxation), bipartiteness (BFS 2-coloring)."""
    import itertools

    from linkgraph.algorithms.graphstats import bipartite_components
    from linkgraph.algorithms.scc import condensation_levels
    from linkgraph.algorithms.triangles import triad_census

    norm = {(s, d) for s, d in edges if s != d}
    if not norm:
        return
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    es = norm
    verts = sorted({v for e in es for v in e})

    # --- triad census twin
    nt = nc = ntr = 0
    adj_und = lambda a, b: (a, b) in es or (b, a) in es  # noqa: E731
    for x, y, z in itertools.combinations(verts, 3):
        if adj_und(x, y) and adj_und(y, z) and adj_und(x, z):
            nt += 1
            for s_, m_, t_ in itertools.permutations((x, y, z)):
                if (s_, m_) in es and (m_, t_) in es and (s_, t_) in es:
                    ntr += 1
            nc += int((x, y) in es and (y, z) in es and (z, x) in es)
            nc += int((x, z) in es and (z, y) in es and (y, x) in es)
    row = triad_census(g).collect()[0]
    assert (row.n_triangles, row.n_cyclic, row.n_transitive) == (nt, nc, ntr)

    # --- condensation levels twin (Tarjan-free: mutual-reach closure)
    adj = {v: set() for v in verts}
    for s_, d_ in es:
        adj[s_].add(d_)
    reach = {}
    for v in verts:
        seen, stack = {v}, [v]
        while stack:
            u = stack.pop()
            for w in adj[u]:
                if w not in seen:
                    seen.add(w)
                    stack.append(w)
        reach[v] = seen
    scc = {
        v: min(u for u in verts if u in reach[v] and v in reach[u])
        for v in verts
    }
    cedges = {(scc[s_], scc[d_]) for s_, d_ in es if scc[s_] != scc[d_]}
    level = {c: 0 for c in set(scc.values())}
    changed = True
    while changed:
        changed = False
        for s_, d_ in cedges:
            if level[s_] + 1 > level[d_]:
                level[d_] = level[s_] + 1
                changed = True
    sizes = {}
    for v, c in scc.items():
        sizes[c] = sizes.get(c, 0) + 1
    got_lv = {
        r.scc: (r.level, r.n_vertices)
        for r in condensation_levels(g).collect()
    }
    assert got_lv == {c: (level[c], sizes[c]) for c in level}

    # --- bipartiteness twin (BFS parity from per-component min root)
    und = {v: set() for v in verts}
    for s_, d_ in es:
        und[s_].add(d_)
        und[d_].add(s_)
    want_bp = {}
    done = set()
    for v in verts:
        if v in done:
            continue
        members, stack = {v}, [v]
        while stack:
            u = stack.pop()
            for w in und[u]:
                if w not in members:
                    members.add(w)
                    stack.append(w)
        root = min(members)
        depth = {root: 0}
        frontier = [root]
        while frontier:
            nxt = []
            for u in frontier:
                for w in und[u]:
                    if w not in depth:
                        depth[w] = depth[u] + 1
                        nxt.append(w)
            frontier = nxt
        conf = sum(
            1
            for a, b in {(min(x, y), max(x, y)) for x in members for y in und[x]}
            if (depth[a] + depth[b]) % 2 == 0
        )
        want_bp[root] = (len(members), conf, int(conf == 0))
        done |= members
    got_bp = {
        r.comp: (r.n_vertices, r.n_conflict_edges, r.is_bipartite)
        for r in bipartite_components(g).collect()
    }
    assert got_bp == want_bp


@given(edges=edge_lists)
@settings(
    max_examples=4,
    deadline=None,
    suppress_health_check=[HealthCheck.too_slow],
    print_blob=True,
)
def test_delta_stepping_matches_sssp_on_random_digraphs(spark, edges):
    """Δ-stepping ≡ frontier Bellman-Ford on arbitrary digraphs with
    arithmetic weights — both exact SSSP, any divergence is a bucket
    boundary/settlement bug."""
    from pyspark.sql import functions as F

    from linkgraph.algorithms.sssp import delta_stepping, sssp

    norm = {(s, d) for s, d in edges if s != d}
    if not norm:
        return
    base = edges_df(spark, edges).withColumn(
        "w",
        (F.lit(1) + (F.col("src") * 7 + F.col("dst") * 13) % 10).cast(
            "double"
        ),
    )
    g = Graph(base, 4)
    exact = {
        r.vid: r.dist for r in sssp(g, 0, weight_col="w").state.collect()
    }
    got = {
        r.vid: r.dist
        for r in delta_stepping(
            g, 0, delta=4.0, weight_col="w"
        ).state.collect()
    }
    # sssp() seeds vertex 0 even when absent from the edge list; both do
    assert got == exact
