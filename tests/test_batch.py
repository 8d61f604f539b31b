"""batch operator (O6): concurrent independent runs over one shared Graph."""

from __future__ import annotations

import pytest

from linkgraph.operators.batch import run_batch


def test_batch_multi_source_bfs_matches_sequential(spark, chesapeake_graph):
    from linkgraph.algorithms.bfs import bfs

    g = chesapeake_graph
    sources = [0, 5, 10, 20]

    def mk(src):
        return lambda: {
            r.vid: r.depth for r in bfs(g, src, directed=False).state.collect()
        }

    concurrent = run_batch(spark, [mk(s) for s in sources], max_concurrent=4)
    sequential = [mk(s)() for s in sources]
    assert concurrent == sequential


def test_aqe_gate_refcounts_and_restores(spark):
    """The AQE-off window is refcounted (first-in disables, last-out
    restores) so concurrent superstep checkpoints can overlap instead of
    serializing on a lock held across the materialization job."""
    import threading

    from linkgraph.superstep import _aqe_disabled

    key = "spark.sql.adaptive.enabled"
    orig = spark.conf.get(key)
    with _aqe_disabled(spark):
        assert spark.conf.get(key) == "false"
        with _aqe_disabled(spark):  # nested holder (second batch instance)
            assert spark.conf.get(key) == "false"
        # inner exit must NOT restore while the outer holder is inside
        assert spark.conf.get(key) == "false"
    assert spark.conf.get(key) == orig

    # Overlapping holders from real threads: AQE stays off throughout,
    # restored only after the last exit.
    barrier = threading.Barrier(4)
    seen = []

    def hold():
        with _aqe_disabled(spark):
            barrier.wait(timeout=30)  # all four inside simultaneously
            seen.append(spark.conf.get(key))

    threads = [threading.Thread(target=hold) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join()
    assert seen == ["false"] * 4
    assert spark.conf.get(key) == orig


def test_batch_fail_at_end(spark):
    def ok():
        return spark.range(10).count()

    def boom():
        raise ValueError("instance 1 died")

    with pytest.raises(RuntimeError, match="1/3 batch tasks failed"):
        run_batch(spark, [ok, boom, ok])
