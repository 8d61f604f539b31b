"""Regression guards on the engine's three bounded driver-side collects
(VERDICT r01 item 10): each gate must actually ROUTE work away from the
driver past its bound, so a future edit cannot silently unbound them.

1. csr.spmv_contrib_sums auto mode: broadcast (dense driver vector) only
   below BROADCAST_MAX_VERTICES of max_vid; above it the join path runs
   and the broadcast kernel is never touched.
2. mst: driver union-find contraction only at/below
   DRIVER_CONTRACT_THRESHOLD merge edges; above it the distributed
   hash-min contraction runs with identical output.
3. ann.train_ivf_centroids: every driver collect is ≤ train_size rows
   regardless of corpus size.
"""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tests.conftest import edges_df


# ---------------------------------------------------------------------------
# 1. SpMV broadcast gate
# ---------------------------------------------------------------------------


def _tiny_graph(spark, max_vid_offset=0):
    from linkgraph.graph import Graph

    edges = [(0, 1), (1, 2), (2, 0), (1, 0)]
    if max_vid_offset:
        # one edge touching a huge id => sparse id space, big max_vid
        edges.append((0, max_vid_offset))
    return Graph.from_edges(edges_df(spark, edges), num_partitions=2)


def test_spmv_auto_gates_broadcast_on_max_vid(spark, monkeypatch):
    import linkgraph.csr as csr

    g = _tiny_graph(spark, max_vid_offset=10_000)
    contrib = g.out_degrees.select(
        "vid", (F.lit(1.0) / F.col("outdeg")).alias("contrib")
    )
    # Shrink the gate below this graph's max_vid and booby-trap the
    # broadcast kernel: auto MUST route to join without touching it.
    monkeypatch.setattr(csr, "BROADCAST_MAX_VERTICES", 1_000)

    def boom():
        raise AssertionError("broadcast kernel used past the max_vid gate")

    monkeypatch.setattr(csr, "_make_csc_kernel", boom)
    out = {
        r["vid"]: r["msum"]
        for r in csr.spmv_contrib_sums(g, contrib, mode="auto").collect()
    }
    # vertex 0 receives from 1 (outdeg 2) and 2 (outdeg 1)
    assert out[0] == pytest.approx(0.5 + 1.0)


def test_spmv_auto_uses_broadcast_below_gate(spark, monkeypatch):
    import linkgraph.csr as csr

    g = _tiny_graph(spark)
    contrib = g.out_degrees.select(
        "vid", (F.lit(1.0) / F.col("outdeg")).alias("contrib")
    )
    used = {}
    real = csr._make_csc_kernel

    def spy():
        used["broadcast"] = True
        return real()

    monkeypatch.setattr(csr, "_make_csc_kernel", spy)
    csr.spmv_contrib_sums(g, contrib, mode="auto").collect()
    assert used.get("broadcast"), "auto below the gate should pick broadcast"


def test_spmv_broadcast_rejects_negative_ids(spark):
    from linkgraph.csr import spmv_contrib_sums
    from linkgraph.graph import Graph

    g = Graph.from_edges(
        edges_df(spark, [(-5, 1), (1, 2)]), num_partitions=2
    )
    contrib = spark.createDataFrame(
        [(-5, 1.0), (1, 1.0)], "vid long, contrib double"
    )
    with pytest.raises(ValueError, match="non-negative"):
        spmv_contrib_sums(g, contrib, mode="broadcast").collect()


# ---------------------------------------------------------------------------
# 2. MST driver-contraction gate
# ---------------------------------------------------------------------------


def _weighted_path(spark):
    # weighted 6-cycle + chord: unique-weight MST is deterministic
    rows = [
        (0, 1, 1.0), (1, 2, 2.0), (2, 3, 3.0),
        (3, 4, 4.0), (4, 5, 5.0), (5, 0, 6.0), (1, 4, 2.5),
    ]
    return spark.createDataFrame(rows, "src long, dst long, weight double")


def test_mst_gate_routes_distributed_above_threshold(spark, monkeypatch):
    import linkgraph.algorithms.mst as mst_mod

    wdf = _weighted_path(spark)
    baseline = sorted(
        (r["src"], r["dst"], r["weight"])
        for r in mst_mod.minimum_spanning_forest(wdf).collect()
    )
    # Force every round over the gate and booby-trap the driver path:
    # the distributed contraction must produce the identical tree.
    monkeypatch.setattr(mst_mod, "DRIVER_CONTRACT_THRESHOLD", -1)

    def boom(pairs):
        raise AssertionError("driver contraction used past the gate")

    monkeypatch.setattr(mst_mod, "_contract_driver", boom)
    forced = sorted(
        (r["src"], r["dst"], r["weight"])
        for r in mst_mod.minimum_spanning_forest(wdf).collect()
    )
    assert forced == baseline


# ---------------------------------------------------------------------------
# 3. IVF training-sample bound
# ---------------------------------------------------------------------------


def test_ivf_train_collects_at_most_train_size(spark, monkeypatch):
    from linkgraph.textops.ann import train_ivf_centroids

    rng = np.random.default_rng(7)
    rows = [
        (i, [float(x) for x in rng.standard_normal(4)]) for i in range(500)
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<float>")

    train_size = 32
    seen: list[int] = []
    # patch the RUNTIME class (pyspark.sql.classic subclass overrides
    # the pyspark.sql.DataFrame base method)
    cls = type(emb)
    real_collect = cls.collect

    def spy(self):
        out = real_collect(self)
        seen.append(len(out))
        return out

    monkeypatch.setattr(cls, "collect", spy)
    cent = train_ivf_centroids(emb, dim=4, n_cells=4, train_size=train_size)
    assert cent.shape == (4, 4)
    assert seen, "training must collect its bounded sample"
    assert max(seen) <= train_size


# ---------------------------------------------------------------------------
# 4. Crawl-budget scheduler must not accumulate checkpoint blocks
# ---------------------------------------------------------------------------


def test_allocate_crawl_budget_releases_intermediate_blocks(spark):
    """ADVICE r02: repeated scheduler invocations in one session must not
    pile up the intermediate `base` localCheckpoint blocks — only the
    returned (caller-held) allocation leaf may remain persisted per call."""
    from linkgraph.algorithms.opic import allocate_crawl_budget

    weights = spark.createDataFrame(
        [(f"h{i}", float(i + 1)) for i in range(20)], "host string, w double"
    )
    jsc = spark.sparkContext._jsc.sc()

    def n_persisted():
        return jsc.getPersistentRDDs().size()

    before = n_persisted()
    outs = []
    for _ in range(3):
        out = allocate_crawl_budget(weights, total_slots=100)
        assert out.agg(F.sum("slots")).collect()[0][0] == 100
        outs.append(out)
    # 3 invocations → at most 3 surviving leaves (the returned outputs);
    # the leaked-base behavior would leave 6.
    assert n_persisted() - before <= 3, (
        f"checkpoint blocks accumulated: {before} -> {n_persisted()}"
    )


# ---------------------------------------------------------------------------
# 5. Trussness triangle-table budget
# ---------------------------------------------------------------------------


def test_trussness_triangle_budget_fails_loud(spark):
    """VERDICT r02 #9: a graph whose triangle count exceeds max_triangles
    must raise TriangleBudgetExceeded BEFORE persisting the 3T corner
    table; within budget the run proceeds and (with a tiny
    corner_rows_per_partition forcing the scaled partition count) still
    produces the exact decomposition."""
    from linkgraph.algorithms.ktruss import (
        TriangleBudgetExceeded,
        trussness,
    )
    from linkgraph.graph import Graph

    # K6: C(6,3) = 20 triangles, trussness 6 on every edge (s = 4)
    edges = [(i, j) for i in range(6) for j in range(6) if i < j]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)

    with pytest.raises(TriangleBudgetExceeded):
        trussness(g, max_triangles=10)

    out = {
        (r.a, r.b): r.trussness
        for r in trussness(
            g, max_triangles=100, corner_rows_per_partition=7
        ).collect()
    }
    assert set(out.values()) == {6} and len(out) == 15


def test_trussness_on_budget_peel_degrades_exactly(spark):
    """VERDICT r03 #9: on_budget='peel' over a blown budget must degrade
    to the memory-bounded iterated-peeling path and produce the exact
    same decomposition as the (in-budget) h-operator path — never raise,
    never materialize the corner table."""
    from linkgraph.algorithms.ktruss import trussness
    from linkgraph.graph import Graph

    # K5 ∪ a pendant triangle sharing vertex 0: mixed truss levels
    edges = [(i, j) for i in range(5) for j in range(5) if i < j]
    edges += [(0, 10), (0, 11), (10, 11)]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)

    want = {
        (r.a, r.b): r.trussness for r in trussness(g).collect()
    }  # h-operator path, no budget
    got = {
        (r.a, r.b): r.trussness
        for r in trussness(g, max_triangles=1, on_budget="peel").collect()
    }  # budget blown (11 triangles > 1) → peel degrade
    assert got == want
    assert got[(10, 11)] == 3 and got[(0, 1)] == 5


def test_trussness_on_budget_validation(spark):
    from linkgraph.algorithms.ktruss import trussness
    from linkgraph.graph import Graph

    g = Graph.from_edges(edges_df(spark, [(0, 1)]), num_partitions=2)
    with pytest.raises(ValueError, match="on_budget"):
        trussness(g, max_triangles=1, on_budget="typo")
