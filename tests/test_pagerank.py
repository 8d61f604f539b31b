"""PageRank vs NumPy oracle — allclose 1e-6 at convergence
(BASELINE.json:6; SURVEY.md §5.2.1)."""

from __future__ import annotations

import numpy as np
import pytest

from conftest import edges_df
from linkgraph.algorithms.pagerank import pagerank
from linkgraph.fixtures import MICRO_GRAPHS, chesapeake_edges, synthetic_crawl
from linkgraph.graph import Graph
from oracles import pagerank_oracle


def _check(spark, edges, graph=None, **kw):
    g = graph or Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    res = pagerank(g, tol=1e-6, **kw)
    got = {r.vid: r.rank for r in res.state.collect()}
    want, _ = pagerank_oracle(edges, tol=1e-6)
    assert set(got) == set(want)
    if want:
        gv = np.array([got[v] for v in sorted(want)])
        wv = np.array([want[v] for v in sorted(want)])
        np.testing.assert_allclose(gv, wv, atol=1e-6)
        assert abs(gv.sum() - 1.0) < 1e-9  # probability form, Σ=1
    return res


def test_chesapeake(spark, chesapeake_graph):
    _check(spark, chesapeake_edges(), graph=chesapeake_graph)


def test_dangling_pair(spark):
    res = _check(spark, MICRO_GRAPHS["dangling_pair"])
    assert res.converged


def test_star_hub_salted(spark):
    _check(spark, MICRO_GRAPHS["star_hub"], salted=True, salt_buckets=8)


def test_two_cliques(spark):
    _check(spark, MICRO_GRAPHS["two_cliques"])


def test_chain(spark):
    _check(spark, MICRO_GRAPHS["chain"])


def test_empty(spark):
    res = pagerank(Graph.from_edges(edges_df(spark, []), num_partitions=2))
    assert res.state.count() == 0 and res.converged


def test_crawl(spark, crawl_graph):
    edges = synthetic_crawl(500)
    _check(spark, edges, graph=crawl_graph)


def test_unsalted_matches_salted(spark, chesapeake_graph):
    a = pagerank(chesapeake_graph, tol=1e-6, salted=True).state.collect()
    b = pagerank(chesapeake_graph, tol=1e-6, salted=False).state.collect()
    da = {r.vid: r.rank for r in a}
    db = {r.vid: r.rank for r in b}
    for v in da:
        assert abs(da[v] - db[v]) < 1e-9


def _weighted_oracle(edges_w, n_iters, alpha=0.85, tol=0.0):
    """NumPy weighted power iteration in the engine's probability form."""
    verts = sorted({v for e in edges_w for v in e[:2]})
    idx = {v: i for i, v in enumerate(verts)}
    n = len(verts)
    wsum = np.zeros(n)
    for s, d, w in edges_w:
        wsum[idx[s]] += w
    r = np.full(n, 1.0 / n)
    for _ in range(n_iters):
        nxt = np.zeros(n)
        for s, d, w in edges_w:
            nxt[idx[d]] += r[idx[s]] * w / wsum[idx[s]]
        dangling = r[wsum == 0].sum()
        nxt = (1 - alpha) / n + alpha * (nxt + dangling / n)
        delta = np.abs(nxt - r).max()
        r = nxt
        if tol and delta < tol:
            break
    return {v: r[idx[v]] for v in verts}


def test_weighted_pagerank_matches_numpy(spark):
    edges_w = [
        (0, 1, 3.0), (0, 2, 1.0), (1, 2, 2.0), (2, 0, 1.0),
        (3, 0, 5.0), (1, 3, 0.5), (4, 2, 1.0),  # 4 has out, 5 below dangling
        (2, 5, 1.0),
    ]
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    df = spark.createDataFrame(edges_w, "src long, dst long, w double")
    g = Graph(
        df.repartition(parts, "src").sortWithinPartitions("src", "dst"),
        parts,
    )
    res = pagerank(g, alpha=0.85, tol=0.0, max_iters=12, weight_col="w")
    got = {r.vid: r.rank for r in res.state.collect()}
    want = _weighted_oracle(edges_w, 12)
    assert set(got) == set(want)
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12, v
    assert abs(sum(got.values()) - 1.0) < 1e-9


def test_weighted_pagerank_unit_weights_equals_unweighted(spark):
    edges = chesapeake_edges()[:60]
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    g_plain = Graph.from_edges(edges_df(spark, edges), num_partitions=parts)
    import pyspark.sql.functions as F

    gw = Graph(g_plain.edges.withColumn("w", F.lit(1.0)), parts)
    plain = pagerank(g_plain, tol=0.0, max_iters=8)
    weighted = pagerank(gw, tol=0.0, max_iters=8, weight_col="w")
    p = {r.vid: r.rank for r in plain.state.collect()}
    w = {r.vid: r.rank for r in weighted.state.collect()}
    assert set(p) == set(w)
    for v in p:
        assert abs(p[v] - w[v]) < 1e-12


def test_weighted_pagerank_rejects_spmv(spark):
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    df = spark.createDataFrame([(0, 1, 1.0)], "src long, dst long, w double")
    g = Graph(df.repartition(parts, "src"), parts)
    with pytest.raises(ValueError):
        pagerank(g, weight_col="w", strategy="spmv")


def test_recency_weighted_pagerank_prefers_fresh_sources(spark):
    """Freshness weighting must shift rank toward pages linked by
    RECENT captures: two targets with identical in-link structure
    except source freshness diverge in the weighted walk, while plain
    PageRank ties them."""
    from conftest import edges_df

    from linkgraph.algorithms.pagerank import pagerank
    from linkgraph.graph import Graph
    from pyspark.sql import functions as F

    # hub 0 (fresh) -> 10; hub 1 (stale) -> 11; identical shape
    edges = [(0, 10), (1, 11), (2, 0), (2, 1)]
    e = edges_df(spark, edges)
    w = F.when(F.col("src") == 0, F.lit(1.0)).otherwise(
        F.when(F.col("src") == 1, F.lit(0.1)).otherwise(F.lit(1.0))
    )
    def wgraph(edf, wcol):
        # weighted graphs use the direct constructor: from_edges
        # normalizes to (src, dst) and would drop the weight column
        we = (
            edf.withColumn("w", wcol)
            .repartition(4, "src")
            .sortWithinPartitions("src", "dst")
        )
        return Graph(we, 4)

    g = wgraph(e, w)
    plain = {r.vid: r.rank for r in pagerank(g, tol=0.0, max_iters=8).state.collect()}
    # structurally identical targets tie without weights
    assert abs(plain[10] - plain[11]) < 1e-12
    wres = {
        r.vid: r.rank
        for r in pagerank(g, tol=0.0, max_iters=8, weight_col="w").state.collect()
    }
    # weight only rescales the walk THROUGH 0 and 1 (single out-edge
    # each: w/Σw = 1 either way) — the discriminating case is a source
    # with mixed-weight out-edges:
    edges2 = [(2, 0), (2, 1), (0, 10), (1, 11)]
    w2 = F.when(
        (F.col("src") == 2) & (F.col("dst") == 0), F.lit(1.0)
    ).otherwise(
        F.when((F.col("src") == 2) & (F.col("dst") == 1), F.lit(0.1)).otherwise(
            F.lit(1.0)
        )
    )
    g2 = wgraph(edges_df(spark, edges2), w2)
    wres2 = {
        r.vid: r.rank
        for r in pagerank(g2, tol=0.0, max_iters=8, weight_col="w").state.collect()
    }
    assert wres2[0] > wres2[1]
    assert wres2[10] > wres2[11]
    _ = wres
