"""CSR/SpMV physical path vs the naive join path — differential test
(SURVEY.md §7 M3) and vs oracle."""

from __future__ import annotations

import numpy as np

from conftest import edges_df
from linkgraph.algorithms.pagerank import pagerank
from linkgraph.csr import spmv_contrib_sums
from linkgraph.fixtures import MICRO_GRAPHS, chesapeake_edges, synthetic_crawl
from linkgraph.graph import Graph
from oracles import pagerank_oracle

from pyspark.sql import functions as F


def _pr_allclose(spark, edges, graph, **kw):
    res = pagerank(graph, tol=1e-6, strategy="spmv", **kw)
    got = {r.vid: r.rank for r in res.state.collect()}
    want, _ = pagerank_oracle(edges, tol=1e-6)
    assert set(got) == set(want)
    gv = np.array([got[v] for v in sorted(want)])
    wv = np.array([want[v] for v in sorted(want)])
    np.testing.assert_allclose(gv, wv, atol=1e-6)


def test_spmv_broadcast_pagerank(spark, chesapeake_graph):
    _pr_allclose(spark, chesapeake_edges(), chesapeake_graph)


def test_spmv_modes_agree(spark, crawl_graph):
    g = crawl_graph
    contrib = g.out_degrees.select(
        "vid", (F.lit(1.0) / F.col("outdeg")).alias("contrib")
    )
    a = {
        r.vid: r.msum
        for r in spmv_contrib_sums(g, contrib, mode="broadcast").collect()
    }
    b = {
        r.vid: r.msum for r in spmv_contrib_sums(g, contrib, mode="join").collect()
    }
    assert set(a) == set(b)
    for v in a:
        assert abs(a[v] - b[v]) < 1e-12


def test_spmv_star_hub(spark):
    g = Graph.from_edges(edges_df(spark, MICRO_GRAPHS["star_hub"]), num_partitions=4)
    _pr_allclose(spark, MICRO_GRAPHS["star_hub"], g)
