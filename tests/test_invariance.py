"""Parallelism invariance (SURVEY.md §5.2.5): identical results at
different core counts / partition counts — guards reduction-order and
partitioning-dependence bugs.

Different SparkSessions can't coexist in one JVM, so the cross-master
check runs the CLI in subprocesses (which also exercises the
spark-submit surface, SURVEY.md §7 M5).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys

import numpy as np
import pytest

from conftest import edges_df
from linkgraph.algorithms.cc import connected_components
from linkgraph.algorithms.labelprop import label_propagation
from linkgraph.algorithms.pagerank import pagerank
from linkgraph.fixtures import synthetic_crawl
from linkgraph.graph import Graph

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_partition_count_invariance_in_session(spark):
    """Same session, different partition counts → identical CC/LP, PR close."""
    edges = synthetic_crawl(300)
    g2 = Graph.from_edges(edges_df(spark, edges), num_partitions=2)
    g8 = Graph.from_edges(edges_df(spark, edges), num_partitions=8)

    cc2 = {r.vid: r.comp for r in connected_components(g2).state.collect()}
    cc8 = {r.vid: r.comp for r in connected_components(g8).state.collect()}
    assert cc2 == cc8

    lp2 = {r.vid: r.label for r in label_propagation(g2, max_iters=8).state.collect()}
    lp8 = {r.vid: r.label for r in label_propagation(g8, max_iters=8).state.collect()}
    assert lp2 == lp8

    pr2 = {r.vid: r.rank for r in pagerank(g2, tol=1e-6).state.collect()}
    pr8 = {r.vid: r.rank for r in pagerank(g8, tol=1e-6).state.collect()}
    assert set(pr2) == set(pr8)
    assert max(abs(pr2[v] - pr8[v]) for v in pr2) < 1e-9


@pytest.mark.slow
def test_cross_master_invariance(tmp_path):
    """local[2] vs local[8] via the CLI — byte-stable CC, allclose PR."""
    edges = synthetic_crawl(200)
    import pandas as pd

    edges_path = str(tmp_path / "edges.parquet")
    pd.DataFrame({"src": edges[:, 0], "dst": edges[:, 1]}).to_parquet(edges_path)

    outs = {}
    for cores in (2, 8):
        out = str(tmp_path / f"pr{cores}")
        env = dict(
            os.environ,
            PYTHONPATH=REPO,
            PYSPARK_SUBMIT_ARGS=f"--master local[{cores}] --conf spark.sql.shuffle.partitions={cores} --conf spark.ui.enabled=false pyspark-shell",
        )
        r = subprocess.run(
            [sys.executable, "-m", "linkgraph.cli", "pagerank",
             "--edges", edges_path, "--out", out, "--tol", "1e-6"],
            capture_output=True, text=True, env=env, timeout=480, cwd=REPO,
        )
        assert r.returncode == 0, r.stderr[-2000:]
        outs[cores] = out

    df2 = pd.read_parquet(outs[2]).set_index("vid").sort_index()
    df8 = pd.read_parquet(outs[8]).set_index("vid").sort_index()
    assert list(df2.index) == list(df8.index)
    np.testing.assert_allclose(df2["rank"], df8["rank"], atol=1e-9)


@pytest.mark.slow
def test_spark_submit_py_files_zip(tmp_path):
    """Ship the package as a zip via real spark-submit --py-files.

    Runs from a scratch cwd with the repo absent from PYTHONPATH, so
    every ``linkgraph.*`` import on driver and executors must resolve
    from the archive — proving the package is --py-files-complete (pure
    Python, no ``__file__``-relative data), per the north rule's
    "launched via spark-submit --py-files" clause.
    """
    sys.path.insert(0, os.path.join(REPO, "tools"))
    try:
        from build_pyfiles_zip import build_zip
    finally:
        sys.path.pop(0)
    from oracles import cc_oracle

    edges = synthetic_crawl(200)
    import pandas as pd

    edges_path = str(tmp_path / "edges.parquet")
    pd.DataFrame({"src": edges[:, 0], "dst": edges[:, 1]}).to_parquet(edges_path)
    zip_path = str(build_zip(tmp_path / "linkgraph.zip"))
    app = tmp_path / "app.py"
    app.write_text("import sys\nfrom linkgraph.cli import main\nsys.exit(main())\n")

    out = str(tmp_path / "cc")
    env = {k: v for k, v in os.environ.items() if k != "PYTHONPATH"}
    env["PYSPARK_PYTHON"] = sys.executable
    env["PYSPARK_DRIVER_PYTHON"] = sys.executable
    r = subprocess.run(
        ["spark-submit", "--master", "local[4]",
         "--conf", "spark.sql.shuffle.partitions=4",
         "--conf", "spark.ui.enabled=false",
         "--py-files", zip_path, str(app),
         "cc", "--edges", edges_path, "--out", out],
        capture_output=True, text=True, env=env, timeout=480, cwd=str(tmp_path),
    )
    assert r.returncode == 0, (r.stdout[-1000:], r.stderr[-2000:])

    got = pd.read_parquet(out).set_index("vid")["comp"].to_dict()
    assert got == cc_oracle([tuple(e) for e in edges])


def test_round2_ops_partition_count_invariance(spark):
    """Louvain move phase, link prediction, related pages, edge sample,
    and closeness are all partition-count invariant (deterministic
    tie-breaks / integer argmax keys / hash coins — no reduction-order
    or partitioning dependence)."""
    from pyspark.sql import functions as F

    from linkgraph.algorithms.anf import closeness_centrality
    from linkgraph.algorithms.community import modularity_lp
    from linkgraph.algorithms.linkpred import link_prediction, related_pages
    from linkgraph.algorithms.sampling import edge_sample

    edges = synthetic_crawl(300)
    g2 = Graph.from_edges(edges_df(spark, edges), num_partitions=2)
    g8 = Graph.from_edges(edges_df(spark, edges), num_partitions=8)

    lv2 = {r.vid: r.label for r in modularity_lp(g2, max_iters=4).state.collect()}
    lv8 = {r.vid: r.label for r in modularity_lp(g8, max_iters=4).state.collect()}
    assert lv2 == lv8

    lp2 = [(r.a, r.b, r.cn) for r in link_prediction(g2, top_k=30).collect()]
    lp8 = [(r.a, r.b, r.cn) for r in link_prediction(g8, top_k=30).collect()]
    assert lp2 == lp8

    q2 = g2.vertices.where(F.col("vid") % 37 == 0).select(F.col("vid").alias("qid"))
    q8 = g8.vertices.where(F.col("vid") % 37 == 0).select(F.col("vid").alias("qid"))
    rp2 = [(r.q, r.c, r.cocite) for r in related_pages(g2, q2, k=5).collect()]
    rp8 = [(r.q, r.c, r.cocite) for r in related_pages(g8, q8, k=5).collect()]
    assert rp2 == rp8

    es2 = sorted((r.src, r.dst) for r in edge_sample(g2, 10).collect())
    es8 = sorted((r.src, r.dst) for r in edge_sample(g8, 10).collect())
    assert es2 == es8

    cl2 = {r.vid: r.closeness for r in closeness_centrality(g2, k=4, max_iters=8).collect()}
    cl8 = {r.vid: r.closeness for r in closeness_centrality(g8, k=4, max_iters=8).collect()}
    assert cl2 == cl8  # bit-identical: integer sketches + fixed fold order
