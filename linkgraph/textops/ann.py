"""Similarity search over embedding columns (``array<float>``).

- :func:`cosine_topk` — brute-force exact top-k: query set ⨯ corpus with
  the dot product expressed in built-in higher-order functions
  (``zip_with`` + ``aggregate`` — JVM-side, no Python).  Exact baseline;
  cost |Q|·|N|·d.  Scale discipline: the QUERY side must be the small
  side (broadcast), never corpus⨯corpus.
- :func:`lsh_cosine_topk` — random-hyperplane LSH: deterministic seeded
  projection planes (driver-generated, broadcast), sign-bit bucket keys,
  candidates = same-bucket rows under any of ``num_tables`` independent
  tables, then exact cosine re-rank of candidates only.  Approximate;
  recall grows with tables.  This is the 100 TB path: each table is one
  hash-partitioned equi-join on the bucket key.
- :func:`embedding_near_duplicates` — corpus near-dup pairs with
  cosine ≥ threshold via the same LSH bucketing (never all-pairs).
- :func:`ivf_cosine_topk` — IVF (inverted-file) ANN: seeded k-means
  centroids trained on a deterministic hash-sample collected to the
  driver (bounded — the FAISS training discipline), broadcast back;
  corpus assignment is one Arrow pass; queries probe their ``nprobe``
  nearest cells, candidates come from a cell-key equi-join, exact
  cosine re-ranks.  Complement to LSH: recall is tunable by nprobe
  without re-hashing the corpus.
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _dot(a, b):
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x * y),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a):
    return F.sqrt(
        F.aggregate(a, F.lit(0.0), lambda acc, x: acc + x * x)
    )


def cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Exact top-k by cosine: ``(query_id, vec_id, cosine, rank)``.

    ``queries``: ``(query_id, embedding)`` — broadcast (must be small).
    Self-matches (query_id == vec_id) are excluded.  Deterministic
    ordering: ties broken by vec_id ascending.
    """
    q = F.broadcast(
        queries.select(
            F.col(query_id_col).alias("query_id"),
            F.col(vec_col).alias("_qv"),
        )
    )
    c = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    qd = q.select("query_id", F.col("_qv").cast("array<double>").alias("_qv"))
    scored = (
        c.crossJoin(qd)
        .where(F.col("vec_id") != F.col("query_id"))
        .select(
            "query_id",
            "vec_id",
            (
                _dot(F.col("_qv"), F.col("_cv"))
                / (_norm(F.col("_qv")) * _norm(F.col("_cv")))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
    )


def _hyperplanes(dim: int, n_planes: int, seed: int) -> np.ndarray:
    rng = np.random.default_rng(seed)
    return rng.standard_normal((n_planes, dim)).astype(np.float64)


def lsh_bucket_ids(
    embeddings: DataFrame,
    dim: int,
    num_tables: int = 4,
    bits_per_table: int = 8,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Sign-bit LSH buckets: ``(vec_id, table, bucket)`` — one row per table.

    Planes are seeded and broadcast; the projection runs vectorized in one
    Arrow pass (|N|·tables·bits·d flops, linear in corpus size).
    """
    planes = _hyperplanes(dim, num_tables * bits_per_table, seed)
    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast(planes)
    nt, bpt = num_tables, bits_per_table

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        P = bc.value
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            vecs = batch.column(1)
            if len(ids) == 0:
                continue
            mat = np.array(vecs.to_pylist(), dtype=np.float64)
            signs = (mat @ P.T) > 0  # (n, nt*bpt)
            weights = (1 << np.arange(bpt)).astype(np.int64)
            out_ids, out_tbl, out_bkt = [], [], []
            for t in range(nt):
                block = signs[:, t * bpt : (t + 1) * bpt].astype(np.int64)
                buckets = block @ weights
                out_ids.append(ids)
                out_tbl.append(np.full(len(ids), t, dtype=np.int64))
                out_bkt.append(buckets)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.concatenate(out_ids), type=pa.int64()),
                    pa.array(np.concatenate(out_tbl), type=pa.int64()),
                    pa.array(np.concatenate(out_bkt), type=pa.int64()),
                ],
                names=["vec_id", "table", "bucket"],
            )

    return embeddings.select(
        F.col(id_col).cast("long"), F.col(vec_col)
    ).mapInArrow(run, schema="vec_id long, table long, bucket long")


#: Rademacher-plane hash constants for the portable bucket path: plane j,
#: dim i gets sign +1 iff ((j·A + i)·K) mod 2^32 < 2^31.  K odd ⇒ the map
#: is uniform-ish over the 2^32 ring; pure int64 arithmetic (max operand
#: ~1.6e17 — ANSI-safe), evaluable identically in Spark SQL and DuckDB.
ARITH_PLANE_A = 1000003
ARITH_PLANE_K = 2654435761


def lsh_bucket_ids_portable(
    embeddings: DataFrame,
    dim: int,
    num_tables: int = 4,
    bits_per_table: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: int = 0,
) -> DataFrame:
    """``(vec_id, table, bucket)`` like :func:`lsh_bucket_ids`, but with
    arithmetic Rademacher (±1) planes and a SEQUENTIAL left-fold dot
    product in JVM expressions.

    Sign-random-projection LSH is valid for any i.i.d. symmetric ±1
    plane entries (Rademacher ≡ Gaussian up to constants for cosine
    LSH); the point of this variant is *engine portability*: the fold
    ``aggregate(zip_with(v, sequence, ±), 0.0, +)`` evaluates in exactly
    the order DuckDB's ``list_reduce(list_prepend(0.0, ·), +)`` does, so
    a SQL twin reproduces every dot product BIT-identically — signs and
    buckets can never diverge (the DuckDB-oracle path for the lsh_ann /
    embed_neardup_lsh catalog entries).  The seeded-Gaussian Arrow path
    (:func:`lsh_bucket_ids`) remains the default for production use.

    ``seed`` offsets the plane index (plane ``j`` uses hash row
    ``j + seed``), so different seeds select disjoint-by-construction
    plane families — independent tables for recall sweeps.  A SQL twin
    must apply the same offset (``seed=0`` reproduces the un-offset
    formula the catalog oracles use).
    """
    v = F.col(vec_col).cast("array<double>")
    idx = F.sequence(F.lit(0), F.lit(dim - 1))

    def dot_j(j: int):
        def signed(x, i):
            h = (
                (F.lit(j + seed) * F.lit(ARITH_PLANE_A) + i.cast("long"))
                * F.lit(ARITH_PLANE_K)
            ) % F.lit(1 << 32)
            return F.when(h < F.lit(1 << 31), x).otherwise(-x)

        return F.aggregate(
            F.zip_with(v, idx, signed), F.lit(0.0), lambda a, x: a + x
        )

    tables = []
    for t in range(num_tables):
        bucket = F.lit(0)
        for b in range(bits_per_table):
            bucket = bucket + F.when(
                dot_j(t * bits_per_table + b) > 0, F.lit(1 << b)
            ).otherwise(F.lit(0))
        tables.append(
            F.struct(
                F.lit(t).cast("long").alias("table"),
                bucket.cast("long").alias("bucket"),
            )
        )
    return embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.explode(F.array(*tables)).alias("_tb"),
    ).select(
        "vec_id",
        F.col("_tb.table").alias("table"),
        F.col("_tb.bucket").alias("bucket"),
    )


def _resolve_seed(seed: int | None, planes: str) -> int:
    """Per-family default seed: 42 for gaussian (historical default),
    0 for arith — the value the arith path effectively used before it
    honored ``seed``, so un-pinned callers keep their pre-fix buckets
    (ADVICE r01: breaking-behavior guard)."""
    if seed is not None:
        return seed
    return 0 if planes == "arith" else 42


def _bucket_fn(planes: str):
    if planes == "arith":
        return lambda df, dim, nt, bpt, seed, idc, vc: lsh_bucket_ids_portable(
            df, dim, nt, bpt, idc, vc, seed=seed
        )
    if planes != "gaussian":
        raise ValueError(f"unknown planes mode {planes!r}")
    return lsh_bucket_ids


def lsh_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    num_tables: int = 4,
    bits_per_table: int = 8,
    seed: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
    planes: str = "gaussian",
) -> DataFrame:
    """Approximate top-k: LSH candidates → exact cosine re-rank.

    Same output shape as :func:`cosine_topk`; recall < 1 by construction
    (tested against the brute-force baseline).  ``planes``: "gaussian"
    (seeded NumPy, Arrow matmul — default) or "arith" (portable
    Rademacher folds — the DuckDB-oracle path).

    ``seed=None`` resolves per plane family: 42 for "gaussian" (its
    historical default) and 0 for "arith" — the arith path's effective
    value from before it honored ``seed`` at all, so callers who never
    pinned a seed keep their pre-fix buckets/pairs (and the catalog
    oracles' un-offset formula).  Pass an explicit seed to select a
    different plane family on either path.
    """
    seed = _resolve_seed(seed, planes)
    bucket = _bucket_fn(planes)
    corpus_b = bucket(
        embeddings, dim, num_tables, bits_per_table, seed, id_col, vec_col
    )
    query_b = bucket(
        queries, dim, num_tables, bits_per_table, seed, query_id_col, vec_col
    ).withColumnRenamed("vec_id", "query_id")
    cand = (
        query_b.join(corpus_b, ["table", "bucket"])
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
        .dropDuplicates(["query_id", "vec_id"])
    )
    qv = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    cv = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "vec_id")
        .select(
            "query_id",
            "vec_id",
            (
                _dot(F.col("_qv"), F.col("_cv"))
                / (_norm(F.col("_qv")) * _norm(F.col("_cv")))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def train_ivf_centroids(
    embeddings: DataFrame,
    dim: int,
    n_cells: int = 16,
    seed: int = 42,
    train_size: int = 4096,
    iters: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> np.ndarray:
    """Seeded Lloyd k-means on a bounded, deterministic training sample.

    The sample is hash-selected (``pmod(xxhash64(id), 997) == 0``, a
    fixed ~0.1% thinning) so it is stable under repartitioning and
    parallelism level, then top-``train_size``-by-id collected to the
    driver — bounded rows regardless of corpus size, the same
    train-on-a-sample discipline FAISS uses for IVF, in ONE corpus pass
    (no count() pre-pass).  Small corpora where the thinned sample is
    too sparse fall back to the un-thinned top-``train_size``.
    Centroids are L2-normalized (spherical k-means) because downstream
    scoring is cosine.  Returns a ``(n_cells, dim)`` float64 array.
    """
    base = embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).alias("_v")
    )
    sample = (
        base.where(F.pmod(F.xxhash64(F.col("_id")), F.lit(997)) == 0)
        .orderBy("_id")
        .limit(train_size)
        .collect()
    )
    if len(sample) < min(train_size, 16 * n_cells):
        sample = base.orderBy("_id").limit(train_size).collect()
    if not sample:
        raise ValueError("cannot train IVF centroids on an empty corpus")
    mat = np.array([r._v for r in sample], dtype=np.float64)
    if mat.shape[1] != dim:
        raise ValueError(
            f"embedding width {mat.shape[1]} != declared dim {dim}"
        )
    mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
    k = min(n_cells, len(mat))
    rng = np.random.default_rng(seed)
    cent = mat[rng.choice(len(mat), size=k, replace=False)]
    for _ in range(iters):
        assign = np.argmax(mat @ cent.T, axis=1)
        for c in range(k):
            members = mat[assign == c]
            if len(members):
                cent[c] = members.mean(axis=0)
        cent /= np.maximum(np.linalg.norm(cent, axis=1, keepdims=True), 1e-12)
    return cent


def ivf_assign_cells(
    embeddings: DataFrame,
    centroids: np.ndarray,
    nprobe: int = 1,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(vec_id, cell)`` rows: each vector's ``nprobe`` nearest centroids
    by cosine — one broadcast + one Arrow pass, linear in corpus size."""
    spark = embeddings.sparkSession
    bc = spark.sparkContext.broadcast(centroids)
    p = nprobe

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        C = bc.value
        top = min(p, len(C))
        for batch in batches:
            ids = batch.column(0).to_numpy(zero_copy_only=False)
            if len(ids) == 0:
                continue
            mat = np.array(batch.column(1).to_pylist(), dtype=np.float64)
            mat /= np.maximum(np.linalg.norm(mat, axis=1, keepdims=True), 1e-12)
            sims = mat @ C.T  # (n, k)
            cells = np.argsort(-sims, axis=1)[:, :top]  # (n, top)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(np.repeat(ids, top), type=pa.int64()),
                    pa.array(cells.ravel().astype(np.int64), type=pa.int64()),
                ],
                names=["vec_id", "cell"],
            )

    return embeddings.select(
        F.col(id_col).cast("long"), F.col(vec_col)
    ).mapInArrow(run, schema="vec_id long, cell long")


def ivf_cosine_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    dim: int,
    k: int = 10,
    n_cells: int = 16,
    nprobe: int = 4,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Approximate top-k via IVF: same output shape as :func:`cosine_topk`.

    Corpus vectors live in exactly one cell; queries probe ``nprobe``
    cells, so candidate generation is one hash-partitioned equi-join on
    the cell key (quadratic only within probed cells).  Recall rises
    monotonically with nprobe and hits 1.0 at nprobe == n_cells (then it
    IS the exact baseline, just pre-partitioned).
    """
    centroids = train_ivf_centroids(
        embeddings, dim, n_cells=n_cells, seed=seed,
        id_col=id_col, vec_col=vec_col,
    )
    corpus_cells = ivf_assign_cells(
        embeddings, centroids, nprobe=1, id_col=id_col, vec_col=vec_col
    )
    query_cells = ivf_assign_cells(
        queries, centroids, nprobe=nprobe, id_col=query_id_col, vec_col=vec_col
    ).withColumnRenamed("vec_id", "query_id")
    cand = (
        query_cells.join(corpus_cells, "cell")
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
        .dropDuplicates(["query_id", "vec_id"])
    )
    qv = queries.select(
        F.col(query_id_col).alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_qv"),
    )
    cv = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_cv"),
    )
    scored = (
        cand.join(F.broadcast(qv), "query_id")
        .join(cv, "vec_id")
        .select(
            "query_id",
            "vec_id",
            (
                _dot(F.col("_qv"), F.col("_cv"))
                / (_norm(F.col("_qv")) * _norm(F.col("_cv")))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(F.desc("cosine"), F.asc("vec_id"))
    return scored.withColumn("rank", F.row_number().over(w)).where(
        F.col("rank") <= k
    )


def ivf_pivot_topk(
    embeddings: DataFrame,
    queries: DataFrame,
    k: int = 10,
    n_cells: int = 8,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """IVF top-k with a DETERMINISTIC coarse quantizer: the ``n_cells``
    lowest-id corpus vectors *are* the centroids (no RNG, no k-means).

    Same IVF plumbing as :func:`ivf_cosine_topk` — single-cell corpus
    assignment, ``nprobe``-cell query probing, candidates from one
    cell-key equi-join, exact cosine re-rank — but every float op is a
    sequential JVM fold (:func:`_dot`/:func:`_norm`), so a DuckDB twin
    replays cell assignments, candidate sets, cosines and ranks
    BIT-identically (the oracle path for the ``ivf_ann`` catalog entry).
    Pivot pick is ``orderBy(id).limit(n_cells)`` — a TakeOrdered, not a
    global sort; cell assignment is a broadcast of ``n_cells`` rows.
    The seeded-k-means quantizer (:func:`ivf_cosine_topk`) remains the
    production path — quantizer quality is orthogonal to the plumbing
    this variant pins.
    """
    corpus = embeddings.select(
        F.col(id_col).cast("long").alias("vec_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    qdf = queries.select(
        F.col(query_id_col).cast("long").alias("query_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    piv = corpus.orderBy("vec_id").limit(n_cells).select(
        (F.row_number().over(Window.orderBy("vec_id")) - 1)
        .cast("long")
        .alias("cell"),
        F.col("_v").alias("_pv"),
    )

    def assign(df: DataFrame, idname: str, limit: int) -> DataFrame:
        sims = df.crossJoin(F.broadcast(piv)).select(
            idname,
            "cell",
            (
                _dot(F.col("_v"), F.col("_pv"))
                / (_norm(F.col("_v")) * _norm(F.col("_pv")))
            ).alias("_sim"),
        )
        w = Window.partitionBy(idname).orderBy(F.desc("_sim"), F.asc("cell"))
        return (
            sims.withColumn("_r", F.row_number().over(w))
            .where(F.col("_r") <= limit)
            .select(idname, "cell")
        )

    corpus_cells = assign(corpus, "vec_id", 1)
    query_cells = assign(qdf, "query_id", min(nprobe, n_cells))
    cand = (
        query_cells.join(corpus_cells, "cell")
        .where(F.col("query_id") != F.col("vec_id"))
        .select("query_id", "vec_id")
        .dropDuplicates(["query_id", "vec_id"])
    )
    scored = (
        cand.join(
            F.broadcast(qdf.withColumnRenamed("_v", "_qv")), "query_id"
        )
        .join(corpus.withColumnRenamed("_v", "_cv"), "vec_id")
        .select(
            "query_id",
            "vec_id",
            (
                _dot(F.col("_qv"), F.col("_cv"))
                / (_norm(F.col("_qv")) * _norm(F.col("_cv")))
            ).alias("cosine"),
        )
    )
    w = Window.partitionBy("query_id").orderBy(
        F.desc("cosine"), F.asc("vec_id")
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .where(F.col("rank") <= k)
        .select("query_id", "vec_id", "cosine", "rank")
    )


def exact_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact corpus near-dup pairs ``(a, b, cosine)`` with cosine ≥ threshold.

    All-pairs self-join (a < b) with the cosine expressed in built-in
    higher-order functions — JVM-side, no Python.  This is the |N|²·d
    exact BASELINE (correctness twin of a SQL oracle); the 100 TB scale
    path is :func:`embedding_near_duplicates`, which generates candidates
    through LSH buckets and only scores within-bucket pairs.
    """
    v = embeddings.select(
        F.col(id_col).alias("_id"),
        F.col(vec_col).cast("array<double>").alias("_v"),
    )
    va = v.select(F.col("_id").alias("a"), F.col("_v").alias("_va"))
    vb = v.select(F.col("_id").alias("b"), F.col("_v").alias("_vb"))
    return (
        va.join(vb, F.col("a") < F.col("b"))
        .select(
            "a",
            "b",
            (
                _dot(F.col("_va"), F.col("_vb"))
                / (_norm(F.col("_va")) * _norm(F.col("_vb")))
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )


def embedding_near_duplicates(
    embeddings: DataFrame,
    dim: int,
    threshold: float = 0.95,
    num_tables: int = 6,
    bits_per_table: int = 10,
    seed: int | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    planes: str = "gaussian",
) -> DataFrame:
    """Corpus near-dup pairs ``(a, b, cosine)`` with cosine ≥ threshold.

    LSH-bucketed self-join — quadratic only within buckets.  ``planes``
    and the ``seed=None`` per-family default (42 gaussian / 0 arith,
    back-compatible with pre-seed-fix arith callers) as in
    :func:`lsh_cosine_topk`.
    """
    seed = _resolve_seed(seed, planes)
    b = _bucket_fn(planes)(
        embeddings, dim, num_tables, bits_per_table, seed, id_col, vec_col
    )
    l = b.select(F.col("vec_id").alias("a"), "table", "bucket")
    r = b.select(F.col("vec_id").alias("b"), "table", "bucket")
    cand = (
        l.join(r, ["table", "bucket"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )
    v = embeddings.select(
        F.col(id_col).alias("_id"), F.col(vec_col).cast("array<double>").alias("_v")
    )
    va = v.select(F.col("_id").alias("a"), F.col("_v").alias("_va"))
    vb = v.select(F.col("_id").alias("b"), F.col("_v").alias("_vb"))
    return (
        cand.join(va, "a")
        .join(vb, "b")
        .select(
            "a",
            "b",
            (
                _dot(F.col("_va"), F.col("_vb"))
                / (_norm(F.col("_va")) * _norm(F.col("_vb")))
            ).alias("cosine"),
        )
        .where(F.col("cosine") >= threshold)
    )
