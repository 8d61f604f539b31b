"""MatrixMarket loader (reference I1) against the chesapeake-style fixture."""

from __future__ import annotations

import os

from linkgraph.fixtures import chesapeake_edges, chesapeake_mtx
from linkgraph.graph import Graph
from linkgraph.io.mtx import read_mtx, read_mtx_local


def _write_fixture(tmp_path):
    p = os.path.join(str(tmp_path), "chesapeake.mtx")
    with open(p, "w") as f:
        f.write(chesapeake_mtx())
    return p


def test_read_mtx_symmetrizes(spark, tmp_path):
    p = _write_fixture(tmp_path)
    df = read_mtx(spark, p)
    g = Graph.from_edges(df, num_partitions=2)
    assert g.num_vertices == 39
    assert g.num_edges == 340  # symmetric: both directions


def test_local_and_distributed_agree(spark, tmp_path):
    p = _write_fixture(tmp_path)
    a = {(r.src, r.dst) for r in read_mtx(spark, p).collect()}
    b = {(r.src, r.dst) for r in read_mtx_local(spark, p).collect()}
    assert a == b
    want = set()
    for u, v in chesapeake_edges():
        want.add((u, v))
        want.add((v, u))
    assert a == want


def test_value_matrix(spark, tmp_path):
    p = os.path.join(str(tmp_path), "w.mtx")
    with open(p, "w") as f:
        f.write(
            "%%MatrixMarket matrix coordinate real general\n"
            "3 3 2\n1 2 0.5\n2 3 1.5\n"
        )
    rows = {(r.src, r.dst, r.weight) for r in read_mtx(spark, p).collect()}
    assert rows == {(0, 1, 0.5), (1, 2, 1.5)}
