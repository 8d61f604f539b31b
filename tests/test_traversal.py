"""BFS / SSSP vs oracles (reference A5/A6 — out-of-scope extras)."""

from __future__ import annotations

from conftest import edges_df
from linkgraph.algorithms.bfs import bfs
from linkgraph.algorithms.sssp import sssp
from linkgraph.fixtures import chesapeake_edges
from linkgraph.graph import Graph
from oracles import bfs_oracle, sssp_oracle


def test_bfs_chain(spark):
    g = Graph.from_edges(edges_df(spark, [(i, i + 1) for i in range(6)]), num_partitions=2)
    res = bfs(g, 0)
    got = {r.vid: r.depth for r in res.state.collect()}
    assert got == bfs_oracle([(i, i + 1) for i in range(6)], 0)


def test_bfs_chesapeake_undirected(spark, chesapeake_graph):
    res = bfs(chesapeake_graph, 0, directed=False)
    got = {r.vid: r.depth for r in res.state.collect()}
    assert got == bfs_oracle(chesapeake_edges(), 0, directed=False)


def test_sssp_unit_weights(spark):
    edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=2)
    res = sssp(g, 0)
    assert res.converged
    got = {r.vid: r.dist for r in res.state.collect()}
    assert got == sssp_oracle(edges, 0)


def test_max_iters_cutoff_reports_not_converged(spark):
    chain = [(i, i + 1) for i in range(6)]
    g = Graph.from_edges(edges_df(spark, chain), num_partitions=2)
    b = bfs(g, 0, max_iters=2)
    assert not b.converged
    assert {r.vid for r in b.state.collect()} == {0, 1, 2}
    s = sssp(g, 0, max_iters=2)
    assert not s.converged
    full = bfs(g, 0)
    assert full.converged


def test_bfs_direction_modes_identical(spark):
    # push vs pull vs optimized must produce the SAME depth labels — the
    # three modes compute the same frontier set each round
    from linkgraph.fixtures import synthetic_crawl

    edges = synthetic_crawl(250)
    g = Graph.from_edges(
        edges_df(spark, [(int(s), int(d)) for s, d in edges]), num_partitions=4
    )
    fwd = bfs(g, 0)
    opt = bfs(g, 0, direction="optimized")
    pull = bfs(g, 0, direction="pull")
    want = {r["vid"]: r["depth"] for r in fwd.state.collect()}
    assert {r["vid"]: r["depth"] for r in opt.state.collect()} == want
    assert {r["vid"]: r["depth"] for r in pull.state.collect()} == want
    assert want == bfs_oracle([(int(s), int(d)) for s, d in edges], 0)
    # on a directed crawl with a large forever-unreachable remainder the
    # count heuristic must KEEP pushing (pull would scan the in-edges of
    # every unreachable vertex each round)
    assert all(h["mode"] == "push" for h in opt.history), opt.history


def test_bfs_optimized_switches_to_pull(spark):
    # fan-out then funnel: round 1's frontier (the 60 middles) dwarfs the
    # 6 remaining unvisited leaves, so the optimized run must flip to
    # pull for round 2 — and still match push exactly
    edges = [(0, m) for m in range(1, 61)] + [
        (m, 61 + (m % 6)) for m in range(1, 61)
    ]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    fwd = bfs(g, 0)
    opt = bfs(g, 0, direction="optimized")
    want = {r["vid"]: r["depth"] for r in fwd.state.collect()}
    assert {r["vid"]: r["depth"] for r in opt.state.collect()} == want
    assert want == bfs_oracle(edges, 0)
    modes = [h["mode"] for h in opt.history]
    assert modes[0] == "push" and "pull" in modes, modes


def test_bfs_optimized_undirected(spark, chesapeake_graph):
    res = bfs(chesapeake_graph, 0, directed=False, direction="optimized")
    got = {r["vid"]: r["depth"] for r in res.state.collect()}
    assert got == bfs_oracle(chesapeake_edges(), 0, directed=False)


def test_multi_source_bfs_single_source_matches_bfs(spark):
    from conftest import edges_df

    from linkgraph.algorithms.bfs import bfs, multi_source_bfs
    from linkgraph.graph import Graph
    from pyspark.sql import functions as F

    edges = [(0, 1), (1, 2), (2, 3), (3, 4), (1, 4), (5, 6)]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    one = g.vertices.where(F.col("vid") == 0)
    ms = {
        r.vid: r.depth
        for r in multi_source_bfs(g, one).state.collect()
        if r.depth is not None
    }
    single = {
        r.vid: r.depth
        for r in bfs(g, 0).state.collect()
        if r.depth is not None
    }
    assert ms == single  # reachable depths identical; ms keeps NULL rows


def test_multi_source_bfs_nearest_seed(spark):
    from conftest import edges_df

    from linkgraph.algorithms.bfs import multi_source_bfs
    from linkgraph.graph import Graph

    # chain 0→1→2→3→4→5 with seeds {0, 4}: depths 0,1,2,3,0,1
    edges = [(i, i + 1) for i in range(5)]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    seeds = spark.createDataFrame([(0,), (4,)], "vid long")
    got = {r.vid: r.depth for r in multi_source_bfs(g, seeds).state.collect()}
    assert got == {0: 0, 1: 1, 2: 2, 3: 3, 4: 0, 5: 1}


def test_landmark_bfs_single_landmark_matches_bfs(spark, chesapeake_graph):
    from linkgraph.algorithms.bfs import landmark_bfs

    idx = landmark_bfs(chesapeake_graph, [0], directed=False)
    got = {r.vid: r.depth for r in idx.collect()}
    exact = bfs_oracle(chesapeake_edges(), 0, directed=False)
    reached = {v: d for v, d in exact.items() if d is not None}
    assert got == reached


def test_landmark_bfs_multi_root_keyed(spark, chesapeake_graph):
    from linkgraph.algorithms.bfs import landmark_bfs

    idx = landmark_bfs(chesapeake_graph, [0, 5, 11], directed=False)
    by_lm = {}
    for r in idx.collect():
        by_lm.setdefault(r.landmark, {})[r.vid] = r.depth
    assert set(by_lm) == {0, 5, 11}
    for lm, got in by_lm.items():
        exact = bfs_oracle(chesapeake_edges(), lm, directed=False)
        assert got == {v: d for v, d in exact.items() if d is not None}


def test_landmark_estimate_is_valid_upper_bound(spark, chesapeake_graph):
    """min_l d(l,u)+d(l,v) ≥ d(u,v), with equality when a landmark lies
    on a shortest path (u or v itself being a landmark guarantees it)."""
    from linkgraph.algorithms.bfs import estimate_distance_upper, landmark_bfs

    idx = landmark_bfs(chesapeake_graph, [0, 7], directed=False)
    pairs = spark.createDataFrame(
        [(2, 9), (0, 13), (4, 4), (7, 21)], "a long, b long"
    )
    ub = {
        (r.a, r.b): r.dist_ub
        for r in estimate_distance_upper(idx, pairs).collect()
    }
    for (a, b), bound in ub.items():
        exact_a = bfs_oracle(chesapeake_edges(), a, directed=False)
        d = exact_a[b]
        assert bound is not None and d is not None
        assert bound >= d
    # an endpoint that IS a landmark: the bound is exact
    exact_0 = bfs_oracle(chesapeake_edges(), 0, directed=False)
    assert ub[(0, 13)] == exact_0[13]


def test_delta_stepping_matches_bellman_ford(spark):
    """Δ-stepping at several Δ values equals converged Bellman-Ford on
    a weighted digraph with real light/heavy edge classes."""
    from linkgraph.algorithms.sssp import delta_stepping

    edges = [
        (0, 1, 1.0), (0, 2, 9.0), (1, 2, 1.0), (2, 3, 2.0),
        (1, 4, 8.0), (4, 3, 1.0), (3, 5, 5.0), (0, 5, 30.0),
        (5, 6, 1.0), (2, 6, 20.0),
    ]
    df = spark.createDataFrame(edges, "src long, dst long, w double")
    g = Graph(df, 2)
    exact = {
        r.vid: r.dist for r in sssp(g, 0, weight_col="w").state.collect()
    }
    for delta in (1.5, 4.0, 100.0):
        res = delta_stepping(g, 0, delta=delta, weight_col="w")
        assert res.converged
        got = {r.vid: r.dist for r in res.state.collect()}
        assert got == exact, (delta, got, exact)


def test_delta_stepping_unit_weights_matches_bfs_depths(spark):
    from linkgraph.algorithms.sssp import delta_stepping
    from oracles import bfs_oracle

    edges = [(i, i + 1) for i in range(5)] + [(0, 3), (2, 5)]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=2)
    res = delta_stepping(g, 0, delta=2.0)
    got = {r.vid: int(r.dist) for r in res.state.collect()}
    want = {
        v: d for v, d in bfs_oracle(edges, 0).items() if d is not None
    }
    assert got == want


def test_sssp_warm_start_epoch_increment(spark):
    """Warm start (init_dists): a previous epoch's converged distances
    are valid upper bounds after an append-only edge increment, so the
    warm run reaches the identical fixpoint in fewer rounds."""
    # epoch 1: a long weighted chain (cold pays ~length rounds)
    e1 = [(i, i + 1) for i in range(25)]
    g1 = Graph.from_edges(edges_df(spark, e1), num_partitions=4)
    prev = sssp(g1, 0)
    assert prev.converged

    # epoch 2: extend the chain and add a shortcut that SHORTENS the
    # tail's distances (stale bounds must be lowered, not trusted)
    e2 = e1 + [(25, 26), (0, 20)]
    g2 = Graph.from_edges(edges_df(spark, e2), num_partitions=4)
    cold = sssp(g2, 0)
    warm = sssp(g2, 0, init_dists=prev.state, prev_edges=g1.edges)
    assert cold.converged and warm.converged
    assert warm.iterations < cold.iterations, (
        f"warm {warm.iterations} !< cold {cold.iterations}"
    )
    dc = {r.vid: r.dist for r in cold.state.collect()}
    dw = {r.vid: r.dist for r in warm.state.collect()}
    assert dc == dw
    assert dw[20] == 1.0  # the shortcut beat the stale bound of 20
    assert dw[26] == 7.0  # new vertex reached through lowered tail


def test_sssp_warm_start_exact_init_verifies_in_one_round(spark):
    """Degenerate warm start (init = the true distances on an unchanged
    graph): one relax round, zero improvements, identical output."""
    edges = [(0, 1), (1, 2), (0, 2), (2, 3)]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=2)
    cold = sssp(g, 0)
    warm = sssp(g, 0, init_dists=cold.state, assume_append_only=True)
    assert warm.converged and warm.iterations == 1
    assert {r.vid: r.dist for r in warm.state.collect()} == {
        r.vid: r.dist for r in cold.state.collect()
    }


def test_multi_source_bfs_warm_start_epoch_increment(spark):
    """Warm start (init_depths): min-relaxation lowers stale depth
    labels that a new shortcut edge invalidated — exact fixpoint, fewer
    rounds than cold (bfs()'s union-grow state cannot do this)."""
    from linkgraph.algorithms.bfs import multi_source_bfs

    e1 = [(i, i + 1) for i in range(25)]
    g1 = Graph.from_edges(edges_df(spark, e1), num_partitions=4)
    seeds = spark.createDataFrame([(0,)], "vid long")
    prev = multi_source_bfs(g1, seeds)
    assert prev.converged

    e2 = e1 + [(25, 26), (0, 20)]
    g2 = Graph.from_edges(edges_df(spark, e2), num_partitions=4)
    cold = multi_source_bfs(g2, seeds)
    warm = multi_source_bfs(
        g2,
        seeds,
        init_depths=prev.state.where("depth is not null"),
        prev_edges=g1.edges,
    )
    assert cold.converged and warm.converged
    assert warm.iterations < cold.iterations, (
        f"warm {warm.iterations} !< cold {cold.iterations}"
    )
    dc = {r.vid: r.depth for r in cold.state.collect()}
    dw = {r.vid: r.depth for r in warm.state.collect()}
    assert dc == dw
    assert dw[20] == 1  # shortcut overrode the stale depth-20 label
    assert dw[26] == 7  # new vertex settled through the lowered tail


def test_sssp_warm_start_delta_edges_frontier(spark):
    """delta_edges shrinks round 1 to the increment's source endpoints;
    the fixpoint must still equal cold (old-graph-fixpoint argument:
    only new-edge relaxations can start an improvement chain)."""
    import pytest as _pytest

    e1 = [(i, i + 1) for i in range(25)]
    g1 = Graph.from_edges(edges_df(spark, e1), num_partitions=4)
    prev = sssp(g1, 0)
    delta = [(25, 26), (0, 20)]
    g2 = Graph.from_edges(edges_df(spark, e1 + delta), num_partitions=4)
    cold = sssp(g2, 0)
    warm = sssp(
        g2, 0,
        init_dists=prev.state,
        delta_edges=edges_df(spark, delta),
        assume_append_only=True,
    )
    assert warm.converged
    assert {r.vid: r.dist for r in warm.state.collect()} == {
        r.vid: r.dist for r in cold.state.collect()
    }
    # the delta frontier must also be CHEAPER in messages: round 1
    # relaxes 2 vertices, not all 26 seeded ones
    full = sssp(g2, 0, init_dists=prev.state, assume_append_only=True)
    assert warm.history[0]["improved"] <= full.history[0]["improved"]

    with _pytest.raises(ValueError, match="requires init_dists"):
        sssp(g2, 0, delta_edges=edges_df(spark, delta))


def test_multi_source_bfs_warm_delta_edges(spark):
    """Same contract for the BFS min-relaxation, including the
    undirected case where either endpoint of an added edge may improve."""
    import pytest as _pytest

    from linkgraph.algorithms.bfs import multi_source_bfs

    e1 = [(i, i + 1) for i in range(25)]
    g1 = Graph.from_edges(edges_df(spark, e1), num_partitions=4)
    seeds = spark.createDataFrame([(0,)], "vid long")
    prev = multi_source_bfs(g1, seeds)
    delta = [(25, 26), (0, 20)]
    g2 = Graph.from_edges(edges_df(spark, e1 + delta), num_partitions=4)
    cold = multi_source_bfs(g2, seeds)
    warm = multi_source_bfs(
        g2, seeds,
        init_depths=prev.state.where("depth is not null"),
        delta_edges=edges_df(spark, delta),
        assume_append_only=True,
    )
    assert {r.vid: r.depth for r in warm.state.collect()} == {
        r.vid: r.depth for r in cold.state.collect()
    }

    # undirected: the added edge (20, 0) improves vertex 20 via its DST
    # endpoint too — the frontier must include both ends
    g1u = Graph.from_edges(edges_df(spark, e1), num_partitions=4)
    prevu = multi_source_bfs(g1u, seeds, directed=False)
    deltau = [(20, 0)]
    g2u = Graph.from_edges(edges_df(spark, e1 + deltau), num_partitions=4)
    coldu = multi_source_bfs(g2u, seeds, directed=False)
    warmu = multi_source_bfs(
        g2u, seeds, directed=False,
        init_depths=prevu.state.where("depth is not null"),
        delta_edges=edges_df(spark, deltau),
        assume_append_only=True,
    )
    assert {r.vid: r.depth for r in warmu.state.collect()} == {
        r.vid: r.depth for r in coldu.state.collect()
    }
    assert {r.vid: r.depth for r in warmu.state.collect()}[20] == 1

    with _pytest.raises(ValueError, match="requires init_depths"):
        multi_source_bfs(g2, seeds, delta_edges=edges_df(spark, delta))
