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


def test_kernels_flush_boundaries_differential():
    """Spark-free differential sweep of both map-side kernels.

    Random batch splits (including empty batches), flush thresholds down
    to 1 row, destination runs spanning batch AND flush boundaries — the
    merged output must equal brute-force sums after a final re-merge
    (the downstream groupBy's role)."""
    import pyarrow as pa

    from linkgraph.csr import _make_combiner, _make_csc_kernel

    rng = np.random.default_rng(42)
    for trial in range(30):
        n = int(rng.integers(0, 400))
        dst = np.sort(rng.integers(0, 25, size=n))  # sorted: CSC layout
        orig = rng.integers(0, 50, size=n)
        vec = rng.uniform(0.1, 2.0, size=50)
        vals = vec[orig]
        want: dict[int, float] = {}
        for d, v in zip(dst, vals):
            want[int(d)] = want.get(int(d), 0.0) + float(v)

        # random batch split with occasional empty batches
        cuts = np.sort(rng.integers(0, n + 1, size=int(rng.integers(0, 6))))
        bounds = [0, *cuts.tolist(), n]

        def batches(xcol, xname, xtype, ycol, yname, ytype):
            for lo, hi in zip(bounds[:-1], bounds[1:]):
                yield pa.RecordBatch.from_arrays(
                    [
                        pa.array(xcol[lo:hi], type=xtype),
                        pa.array(ycol[lo:hi], type=ytype),
                    ],
                    names=[xname, yname],
                )

        flush = int(rng.choice([1, 2, 7, 10_000]))
        for got_batches in (
            # CSC kernel reads (src=destination, dst=origin) + broadcast vec
            _make_csc_kernel(flush)(
                batches(dst, "src", pa.int64(), orig, "dst", pa.int64()), vec
            ),
            # join-mode combiner reads unsorted (dst, contrib)
            _make_combiner(flush)(
                batches(dst, "dst", pa.int64(), vals, "contrib", pa.float64())
            ),
        ):
            got: dict[int, float] = {}
            for b in got_batches:
                for d, v in zip(
                    b.column("dst").to_numpy(), b.column("partial").to_numpy()
                ):
                    got[int(d)] = got.get(int(d), 0.0) + float(v)
            assert set(got) == set(want), (trial, flush)
            for k in want:
                assert abs(got[k] - want[k]) < 1e-9, (trial, flush, k)


def test_weighted_spmv_matches_numpy(spark):
    # generalized y = A·x (reference A13) against a dense NumPy product
    import numpy as np

    from linkgraph.algorithms.spmv import spmv

    rng = np.random.default_rng(7)
    n = 12
    rows = [
        (int(s), int(d), float(w))
        for s, d, w in zip(
            rng.integers(0, n, 40), rng.integers(0, n, 40),
            rng.integers(1, 5, 40),
        )
    ]
    A = np.zeros((n, n))
    for s, d, w in rows:
        A[d, s] += w  # duplicate COO entries accumulate, like the agg
    x = np.arange(n, dtype=float) / 4.0
    edges = spark.createDataFrame(rows, "src long, dst long, weight double")
    xdf = spark.createDataFrame(
        [(i, float(x[i])) for i in range(n)], "vid long, x double"
    )
    got = {r["vid"]: r["y"] for r in spmv(edges, xdf).collect()}
    want = A @ x
    for v, y in got.items():
        assert abs(y - want[v]) < 1e-9
    # every dst with a nonzero row is present
    assert set(got) == {d for _, d, _ in rows}
