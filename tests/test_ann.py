"""Similarity search: brute-force exact top-k + LSH approximate variants."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from linkgraph.textops.ann import (
    cosine_topk,
    embedding_near_duplicates,
    exact_near_duplicates,
    lsh_cosine_topk,
)

DIM = 8


def _emb_df(spark, n=60, seed=7, planted_pairs=5):
    """Random vectors + planted near-identical pairs (ids n..n+planted)."""
    rng = np.random.default_rng(seed)
    vecs = rng.standard_normal((n, DIM)).astype(np.float32)
    rows = [(i, vecs[i].tolist()) for i in range(n)]
    for j in range(planted_pairs):
        noisy = vecs[j] + rng.standard_normal(DIM).astype(np.float32) * 0.01
        rows.append((n + j, noisy.tolist()))
    return (
        spark.createDataFrame(rows, "vec_id long, embedding array<float>"),
        np.array([r[1] for r in rows]),
    )


def _oracle_topk(mat, qids, k):
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = normed @ normed.T
    out = {}
    for q in qids:
        order = sorted(
            (i for i in range(len(mat)) if i != q),
            key=lambda i: (-sims[q, i], i),
        )
        out[q] = order[:k]
    return out


def test_cosine_topk_exact(spark):
    df, mat = _emb_df(spark)
    queries = df.where("vec_id < 4").selectExpr("vec_id as query_id", "embedding")
    got = {}
    for r in cosine_topk(df, queries, k=5).collect():
        got.setdefault(r.query_id, []).append((r.rank, r.vec_id))
    want = _oracle_topk(mat, [0, 1, 2, 3], 5)
    for q in want:
        assert [v for _, v in sorted(got[q])] == want[q]


def test_lsh_finds_planted_neighbors(spark):
    df, mat = _emb_df(spark, n=60, planted_pairs=5)
    queries = df.where("vec_id >= 60").selectExpr("vec_id as query_id", "embedding")
    res = lsh_cosine_topk(df, queries, dim=DIM, k=3, num_tables=8, bits_per_table=4)
    top1 = {r.query_id: r.vec_id for r in res.collect() if r.rank == 1}
    # each planted vector's nearest neighbor is its source vector; LSH with
    # 8 tables must recover ≥ 4/5 (deterministic, seeded planes)
    hits = sum(1 for j in range(5) if top1.get(60 + j) == j)
    assert hits >= 4, top1


def test_embedding_near_duplicates(spark):
    df, mat = _emb_df(spark, n=40, planted_pairs=4)
    pairs = {
        (r.a, r.b)
        for r in embedding_near_duplicates(
            df, dim=DIM, threshold=0.99, num_tables=8, bits_per_table=4
        ).collect()
    }
    want = {(j, 40 + j) for j in range(4)}
    assert want <= pairs
    # precision: every reported pair's TRUE cosine clears the threshold
    # (a regression that returns raw LSH candidates without the cosine
    # filter emits random-pair false positives here)
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    for a, b in pairs:
        assert float(normed[a] @ normed[b]) >= 0.99 - 1e-9, (a, b)


def test_exact_near_duplicates_matches_numpy(spark):
    df, mat = _emb_df(spark, n=40, planted_pairs=4)
    thr = 0.6
    got = {
        (r.a, r.b): r.cosine
        for r in exact_near_duplicates(df, threshold=thr).collect()
    }
    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    sims = normed @ normed.T
    want = {
        (a, b): sims[a, b]
        for a in range(len(mat))
        for b in range(a + 1, len(mat))
        if sims[a, b] >= thr
    }
    assert set(got) == set(want)
    for k in want:
        assert abs(got[k] - want[k]) < 1e-9
    # the exact baseline is a superset of any LSH candidate pass
    lsh = {
        (r.a, r.b)
        for r in embedding_near_duplicates(
            df, dim=DIM, threshold=thr, num_tables=8, bits_per_table=4
        ).collect()
    }
    assert lsh <= set(got)


def test_lsh_recall_vs_bruteforce(spark):
    df, mat = _emb_df(spark, n=80, planted_pairs=0)
    queries = df.where("vec_id < 10").selectExpr("vec_id as query_id", "embedding")
    bf = {
        (r.query_id, r.vec_id) for r in cosine_topk(df, queries, k=5).collect()
    }
    ap = {
        (r.query_id, r.vec_id)
        for r in lsh_cosine_topk(
            df, queries, dim=DIM, k=5, num_tables=16, bits_per_table=3
        ).collect()
    }
    recall = len(bf & ap) / len(bf)
    assert recall >= 0.5, recall  # random data is LSH-hostile; bound is loose


def test_ivf_full_probe_equals_bruteforce(spark):
    from linkgraph.textops.ann import ivf_cosine_topk

    df, _ = _emb_df(spark, n=60, planted_pairs=0)
    queries = df.where("vec_id < 6").selectExpr("vec_id as query_id", "embedding")
    bf = {
        (r.query_id, r.rank, r.vec_id)
        for r in cosine_topk(df, queries, k=5).collect()
    }
    # nprobe == n_cells → every cell probed → IVF IS the exact baseline
    full = {
        (r.query_id, r.rank, r.vec_id)
        for r in ivf_cosine_topk(
            df, queries, dim=DIM, k=5, n_cells=8, nprobe=8
        ).collect()
    }
    assert full == bf


def test_ivf_pivot_full_probe_equals_bruteforce(spark):
    from linkgraph.textops.ann import ivf_pivot_topk

    df, _ = _emb_df(spark, n=60, planted_pairs=0)
    queries = df.where("vec_id < 6").selectExpr("vec_id as query_id", "embedding")
    bf = {
        (r.query_id, r.rank, r.vec_id)
        for r in cosine_topk(df, queries, k=5).collect()
    }
    # deterministic pivot quantizer, nprobe == n_cells → exact baseline
    full = {
        (r.query_id, r.rank, r.vec_id)
        for r in ivf_pivot_topk(
            df, queries, k=5, n_cells=8, nprobe=8
        ).collect()
    }
    assert full == bf


def test_ivf_pivot_partial_probe_matches_numpy_twin(spark):
    """Full semantic oracle for the partial-probe path: a NumPy replica
    of the deterministic pivot quantizer (cells = argmax cosine vs the 8
    lowest-id vectors, queries probe top-nprobe cells, exact cosine
    re-rank) must produce the SAME (query, rank, vec) triples."""
    from linkgraph.textops.ann import ivf_pivot_topk

    n_cells, nprobe, k = 8, 2, 5
    df, mat = _emb_df(spark, n=60, planted_pairs=0)
    queries = df.where("vec_id < 6").selectExpr("vec_id as query_id", "embedding")
    part = ivf_pivot_topk(df, queries, k=k, n_cells=n_cells, nprobe=nprobe).collect()
    assert len(part) > 0

    normed = mat / np.linalg.norm(mat, axis=1, keepdims=True)
    piv = normed[:n_cells]  # pivots = the n_cells lowest vec_ids
    cell_sims = normed @ piv.T  # (n, n_cells)
    corpus_cell = cell_sims.argmax(axis=1)  # ties: argmax = lowest cell
    want = {}
    for q in range(6):
        probed = set(np.argsort(-cell_sims[q], kind="stable")[:nprobe])
        cand = [
            v for v in range(60) if v != q and corpus_cell[v] in probed
        ]
        ranked = sorted(cand, key=lambda v: (-(normed[q] @ normed[v]), v))
        for rank, v in enumerate(ranked[:k], start=1):
            want[(q, rank)] = v
    got = {(r.query_id, r.rank): r.vec_id for r in part}
    assert got == want
    # and reported cosines are the true cosines
    for r in part:
        assert abs(r.cosine - float(normed[r.query_id] @ normed[r.vec_id])) < 1e-9


def test_ivf_recall_on_clustered_corpus(spark):
    from linkgraph.textops.ann import ivf_cosine_topk

    # clustered data (IVF's home turf): 4 well-separated centers + noise
    rng = np.random.default_rng(11)
    centers = rng.standard_normal((4, DIM)) * 6
    vecs = np.concatenate(
        [c + rng.standard_normal((30, DIM)) * 0.5 for c in centers]
    ).astype(np.float32)
    df = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    queries = df.where("vec_id % 30 = 0").selectExpr(
        "vec_id as query_id", "embedding"
    )
    bf = {
        (r.query_id, r.vec_id) for r in cosine_topk(df, queries, k=5).collect()
    }
    ivf = {
        (r.query_id, r.vec_id)
        for r in ivf_cosine_topk(
            df, queries, dim=DIM, k=5, n_cells=8, nprobe=3
        ).collect()
    }
    recall = len(bf & ivf) / len(bf)
    assert recall >= 0.9, recall
