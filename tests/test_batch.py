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


def test_batch_fail_at_end(spark):
    def ok():
        return spark.range(10).count()

    def boom():
        raise ValueError("instance 1 died")

    with pytest.raises(RuntimeError, match="1/3 batch tasks failed"):
        run_batch(spark, [ok, boom, ok])
