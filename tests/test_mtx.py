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


def test_value_matrix_data_line_equal_to_header(spark, tmp_path):
    """A data line byte-identical to the size header must survive (the
    header is dropped positionally, not by content)."""
    p = os.path.join(str(tmp_path), "collide.mtx")
    with open(p, "w") as f:
        f.write(
            "%%MatrixMarket matrix coordinate real general\n"
            "4 4 3\n1 2 0.5\n4 4 3\n2 3 1.5\n"
        )
    rows = {(r.src, r.dst, r.weight) for r in read_mtx(spark, p).collect()}
    assert rows == {(0, 1, 0.5), (3, 3, 3.0), (1, 2, 1.5)}


def test_read_smtx_roundtrip(spark, tmp_path):
    """smtx (CSR-as-text, reference I2) expands to the same COO edge set."""
    import numpy as np

    from linkgraph.io.smtx import read_smtx_local

    rng = np.random.default_rng(3)
    nrows, ncols = 12, 12
    dense = rng.random((nrows, ncols)) < 0.25
    offsets = np.concatenate([[0], np.cumsum(dense.sum(axis=1))])
    cols = np.concatenate([np.flatnonzero(row) for row in dense])
    p = os.path.join(str(tmp_path), "g.smtx")
    with open(p, "w") as f:
        f.write(f"{nrows}, {ncols}, {int(offsets[-1])}\n")
        f.write(" ".join(str(int(x)) for x in offsets) + "\n")
        f.write(" ".join(str(int(x)) for x in cols) + "\n")
    got = {(r.src, r.dst) for r in read_smtx_local(spark, p).collect()}
    want = {(int(i), int(j)) for i, j in zip(*np.nonzero(dense))}
    assert got == want


def test_read_smtx_rejects_malformed(spark, tmp_path):
    import pytest

    from linkgraph.io.smtx import read_smtx_local

    p = os.path.join(str(tmp_path), "bad.smtx")
    with open(p, "w") as f:
        f.write("2, 2, 3\n0 1 3\n0 1\n")  # cols line shorter than nnz
    with pytest.raises(ValueError):
        read_smtx_local(spark, p)
