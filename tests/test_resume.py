"""Checkpoint/resume mid-convergence (BASELINE.json:6; SURVEY.md §5.2.4).

Simulated crash: run k iterations with a checkpoint dir, stop, relaunch
with the same dir — the run must resume from the last durable epoch and
finish with results identical to an uninterrupted run.
"""

from __future__ import annotations

import json
import os

import numpy as np

from conftest import edges_df
from linkgraph.algorithms.cc import connected_components
from linkgraph.algorithms.pagerank import pagerank
from linkgraph.fixtures import chesapeake_edges
from linkgraph.graph import Graph
from linkgraph.superstep import CheckpointManager


def test_pagerank_resume(spark, tmp_path, chesapeake_graph):
    g = chesapeake_graph
    full = pagerank(g, tol=1e-6)
    want = {r.vid: r.rank for r in full.state.collect()}

    ckdir = str(tmp_path / "pr_ck")
    # phase 1: "crash" after 7 iterations (checkpoint_every=3 → last
    # durable epoch is 6)
    ck1 = CheckpointManager(spark, ckdir)
    part = pagerank(g, tol=1e-6, max_iters=7, checkpoint=ck1, checkpoint_every=3)
    assert not part.converged
    found = ck1.latest()
    assert found is not None and found[0] in (6, 7)

    # phase 2: fresh manager, same dir — resumes and converges
    ck2 = CheckpointManager(spark, ckdir)
    res = pagerank(g, tol=1e-6, checkpoint=ck2, checkpoint_every=3)
    assert res.converged
    assert res.iterations == full.iterations  # same trajectory
    got = {r.vid: r.rank for r in res.state.collect()}
    for v in want:
        assert abs(got[v] - want[v]) < 1e-12

    # metrics + manifests exist (per-partition lineage sidecar)
    assert os.path.exists(os.path.join(ckdir, "metrics.jsonl"))
    epochs = [d for d in os.listdir(ckdir) if d.startswith("epoch=")]
    assert epochs
    mf = json.load(
        open(os.path.join(ckdir, sorted(epochs)[-1], "_manifest.json"))
    )
    assert mf["complete"] and mf["partitions"]


def test_cc_resume_exact(spark, tmp_path):
    edges = chesapeake_edges()
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)
    want = {r.vid: r.comp for r in connected_components(g).state.collect()}

    ckdir = str(tmp_path / "cc_ck")
    connected_components(
        g, max_iters=2, checkpoint=CheckpointManager(spark, ckdir), checkpoint_every=1
    )
    res = connected_components(
        g, checkpoint=CheckpointManager(spark, ckdir), checkpoint_every=1
    )
    got = {r.vid: r.comp for r in res.state.collect()}
    assert got == want


def test_resume_ignores_incomplete_epoch(spark, tmp_path):
    ckdir = str(tmp_path / "bad_ck")
    g = Graph.from_edges(edges_df(spark, chesapeake_edges()), num_partitions=4)
    ck = CheckpointManager(spark, ckdir)
    pagerank(g, tol=1e-6, max_iters=4, checkpoint=ck, checkpoint_every=2)
    # corrupt the newest epoch: delete its manifest (simulates crash mid-write)
    epochs = sorted(d for d in os.listdir(ckdir) if d.startswith("epoch="))
    os.remove(os.path.join(ckdir, epochs[-1], "_manifest.json"))
    found = CheckpointManager(spark, ckdir).latest()
    assert found is not None
    assert found[0] == int(epochs[-2].split("=")[1])


def test_resume_of_converged_run_is_noop(spark, tmp_path):
    """Re-invoking a converged checkpointed run must not execute another
    superstep, append an epoch, or inflate the iteration count."""
    ckdir = str(tmp_path / "noop_ck")
    g = Graph.from_edges(edges_df(spark, chesapeake_edges()), num_partitions=4)
    first = pagerank(
        g, tol=1e-6, checkpoint=CheckpointManager(spark, ckdir), checkpoint_every=5
    )
    assert first.converged
    epochs_before = sorted(d for d in os.listdir(ckdir) if d.startswith("epoch="))
    metrics_before = sum(1 for _ in open(os.path.join(ckdir, "metrics.jsonl")))

    again = pagerank(
        g, tol=1e-6, checkpoint=CheckpointManager(spark, ckdir), checkpoint_every=5
    )
    assert again.converged
    assert again.iterations == first.iterations
    assert again.history == []  # no supersteps ran
    epochs_after = sorted(d for d in os.listdir(ckdir) if d.startswith("epoch="))
    metrics_after = sum(1 for _ in open(os.path.join(ckdir, "metrics.jsonl")))
    assert epochs_after == epochs_before
    assert metrics_after == metrics_before
    want = {r.vid: r.rank for r in first.state.collect()}
    got = {r.vid: r.rank for r in again.state.collect()}
    assert got == want


def test_bfs_resume_exact(spark, tmp_path):
    from linkgraph.algorithms.bfs import bfs
    from linkgraph.fixtures import synthetic_crawl

    edges = synthetic_crawl(300)
    g = Graph.from_edges(
        edges_df(spark, [(int(s), int(d)) for s, d in edges]), num_partitions=4
    )
    full = bfs(g, 0, directed=False, direction="optimized")
    want = {r.vid: r.depth for r in full.state.collect()}

    ckdir = str(tmp_path / "bfs_ck")
    ck1 = CheckpointManager(spark, ckdir)
    part = bfs(g, 0, directed=False, direction="optimized", max_iters=3,
               checkpoint=ck1, checkpoint_every=2)
    assert not part.converged
    assert ck1.latest() is not None

    ck2 = CheckpointManager(spark, ckdir)
    res = bfs(g, 0, directed=False, direction="optimized",
              checkpoint=ck2, checkpoint_every=2)
    assert res.converged
    assert res.iterations == full.iterations
    assert {r.vid: r.depth for r in res.state.collect()} == want
    assert os.path.exists(os.path.join(ckdir, "metrics.jsonl"))


def test_sssp_resume_exact(spark, tmp_path):
    from linkgraph.algorithms.sssp import sssp
    from linkgraph.fixtures import synthetic_crawl

    edges = synthetic_crawl(300)
    g = Graph.from_edges(
        edges_df(spark, [(int(s), int(d)) for s, d in edges]), num_partitions=4
    )
    full = sssp(g, 0)
    want = {r.vid: r.dist for r in full.state.collect()}

    ckdir = str(tmp_path / "sssp_ck")
    ck1 = CheckpointManager(spark, ckdir)
    part = sssp(g, 0, max_iters=3, checkpoint=ck1, checkpoint_every=2)
    assert not part.converged
    assert ck1.latest() is not None

    res = sssp(g, 0, checkpoint=CheckpointManager(spark, ckdir),
               checkpoint_every=2)
    assert res.converged
    assert res.iterations == full.iterations
    assert {r.vid: r.dist for r in res.state.collect()} == want


def test_bfs_sssp_converged_resume_is_noop(spark, tmp_path):
    from linkgraph.algorithms.bfs import bfs
    from linkgraph.algorithms.sssp import sssp

    edges = [(i, i + 1) for i in range(6)]
    g = Graph.from_edges(edges_df(spark, edges), num_partitions=4)

    for name, run in (
        ("bfs", lambda ck: bfs(g, 0, checkpoint=ck, checkpoint_every=2)),
        ("sssp", lambda ck: sssp(g, 0, checkpoint=ck, checkpoint_every=2)),
    ):
        ckdir = str(tmp_path / f"{name}_ck")
        first = run(CheckpointManager(spark, ckdir))
        assert first.converged
        epochs = sorted(
            d for d in os.listdir(ckdir) if d.startswith("epoch=")
        )
        # re-invoking on a converged dir must be a no-op: same iteration
        # count, NO new epoch, no extra superstep round
        again = run(CheckpointManager(spark, ckdir))
        assert again.converged and again.iterations == first.iterations
        assert sorted(
            d for d in os.listdir(ckdir) if d.startswith("epoch=")
        ) == epochs


def test_resume_truncates_rerun_metrics(spark, tmp_path):
    """Metrics rows from iterations re-run after a crash-resume are
    dropped (ADVICE r01): consumers summing new_vertices/iter rows see
    each iteration exactly once, plus an explicit resume marker."""
    import json

    from linkgraph.algorithms.bfs import bfs
    from linkgraph.fixtures import synthetic_crawl
    from linkgraph.graph import Graph
    from tests.conftest import edges_df

    import shutil

    g = Graph.from_edges(edges_df(spark, synthetic_crawl(200)), num_partitions=4)
    ckdir = str(tmp_path / "trunc_ck")
    ck = CheckpointManager(spark, ckdir)
    bfs(g, 0, directed=False, max_iters=3, checkpoint=ck, checkpoint_every=2)
    # simulate a crash after the iter-3 metrics row but before its epoch
    # survived: drop the epoch=3 directory — resume restarts from epoch 2
    # and RE-RUNS iteration 3
    shutil.rmtree(ck.epoch_dir(3))
    res = bfs(g, 0, directed=False, checkpoint=CheckpointManager(spark, ckdir),
              checkpoint_every=2)
    assert res.converged
    with open(f"{ckdir}/metrics.jsonl") as f:
        rows = [json.loads(line) for line in f]
    iters = [r["iter"] for r in rows if "iter" in r]
    assert len(iters) == len(set(iters)), f"duplicate metrics rows: {iters}"
    assert sorted(iters) == list(range(1, res.iterations + 1))
    assert any("resume_from" in r for r in rows)
