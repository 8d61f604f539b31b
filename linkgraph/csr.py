"""Per-partition CSR gather-scatter — the mandated SpMV superstep core.

BASELINE.json:6: "Edges are range-partitioned into per-partition CSR
blocks held in Arrow buffers, with each superstep a sparse gather-scatter
(SpMV-style) pandas UDF over CSR followed by a shuffle-reduce by
destination vertex, salted to handle hub-page skew."

Reference analog: ``neighborreduce`` via moderngpu ``transform_segreduce``
over the device CSR [ref: include/gunrock/framework/operators/
neighborreduce/neighborreduce.hxx — UNVERIFIED] — i.e. SpMV (A13,
SURVEY.md §2.3).

Two physical modes, chosen by |V| (both end in the same shuffle-reduce):

- **broadcast** (|V| ≤ threshold): the per-vertex contrib vector is
  broadcast as a dense NumPy array; ``mapInArrow`` streams the persisted
  edge partitions (already sorted by (src, dst) = the CSR layout) with
  ZERO join and ZERO shuffle of edges, computes ``contrib[src]`` by NumPy
  fancy-indexing (the gather), combines per destination inside the batch
  via ``np.unique`` + ``np.bincount`` (the scatter+map-side combine), and
  emits compact ``(dst, partial)`` rows.  The vector build is a SERIAL
  driver collect + torrent broadcast per call, so this mode only wins
  for small vertex sets (see ``BROADCAST_MAX_VERTICES``); each call
  destroys the previous call's vector (callers must materialize one
  result before requesting the next — the superstep runtime does).

- **join** (the scale path, default beyond the threshold): gather by
  equi-join on ``src``.  With the superstep runtime's co-partitioned
  state this join is EXCHANGE-FREE (edges reuse their persisted
  HashPartitioning; contrib is a narrow projection of the hash(vid, P)
  checkpoint leaf), then the same Arrow batch scatter-combine.

The map-side combine is the skew treatment here: a hub destination
appears at most once **per Arrow batch** in the UDF output (≤ P·batches
rows globally) instead of once per in-edge (10^8 rows), so the final
``groupBy(dst).sum()`` is uniform — a stronger guarantee than salting and
the same two-phase structure (partial by (dst, partition) → final by dst).
"""

from __future__ import annotations

from collections.abc import Iterator

import numpy as np
import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph

# Broadcast mode pays a SERIAL per-call cost (driver collect of |V| rows
# + torrent broadcast) that join mode does not: with the superstep
# runtime's co-partitioned state, the join-mode gather is already
# exchange-free, so broadcast only wins while the collect is trivially
# cheap.  Measured at 10^7 vertices / 3×10^7 edges (local[8]): join mode
# 11.1 s/call flat; broadcast mode degraded 13 → 61 s/call before stale-
# broadcast cleanup, ~13 s after — hence the small threshold.
BROADCAST_MAX_VERTICES = 2_000_000

# Stale-broadcast registry: the superstep contract materializes each
# call's result before the next call, so the previous vector can be
# destroyed then (a PageRank run otherwise accumulates one 8·|V|-byte
# broadcast per iteration — measured multi-GB leak + GC churn).
# THREAD-LOCAL: concurrent algorithm instances (operators/batch.run_batch)
# each manage their own previous broadcast — a shared registry would let
# thread B destroy thread A's vector while A's tasks still read it.
import threading

_tl = threading.local()


def _live_broadcasts() -> list:
    if not hasattr(_tl, "bcs"):
        _tl.bcs = []
    return _tl.bcs

def _make_combiner():
    """Map-side combine: sum values per distinct dst (vectorized).

    Defined as a factory returning a LOCAL function so cloudpickle ships
    it by value inside the UDF closure — the library then works on
    executors that don't have ``linkgraph`` on their PYTHONPATH (plain
    ``python script.py`` without ``--py-files``).
    """

    def combine(dst: np.ndarray, vals: np.ndarray) -> pa.RecordBatch:
        uniq, inv = np.unique(dst, return_inverse=True)
        partial = np.bincount(inv, weights=vals, minlength=len(uniq))
        return pa.RecordBatch.from_arrays(
            [pa.array(uniq, type=pa.int64()), pa.array(partial, type=pa.float64())],
            schema=pa.schema(
                [pa.field("dst", pa.int64()), pa.field("partial", pa.float64())]
            ),
        )

    return combine


def spmv_contrib_sums(
    graph: Graph,
    contrib: DataFrame,
    mode: str = "auto",
) -> DataFrame:
    """Σ_{u→v} contrib(u) per destination v → ``(vid, msum)``.

    ``contrib`` is ``(vid, contrib)`` for non-dangling vertices.
    """
    if mode == "auto":
        # gate on max_vid, not num_vertices: the dense vector is sized
        # max_vid+1, so a sparse/hashed id space (1M vertices, 10^18 max
        # id) must never pick broadcast just because the COUNT is small
        mode = (
            "broadcast"
            if graph.max_vid < BROADCAST_MAX_VERTICES
            else "join"
        )

    if mode == "broadcast":
        live = _live_broadcasts()
        while live:
            try:
                live.pop().destroy(blocking=False)
            except Exception:
                pass
        pdf = contrib.toPandas()
        vids = pdf["vid"].to_numpy()
        if len(vids) and vids.min() < 0:
            raise ValueError(
                "broadcast SpMV requires non-negative dense vertex ids "
                "(negative ids would silently wrap NumPy indexing); "
                "encode ids first or use mode='join'"
            )
        size = int(graph.max_vid) + 1
        vec = np.zeros(size, dtype=np.float64)
        vec[vids] = pdf["contrib"].to_numpy()
        bc = graph.spark.sparkContext.broadcast(vec)
        live.append(bc)

        combine = _make_combiner()

        def gather_scatter(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            v = bc.value
            for batch in batches:
                src = batch.column("src").to_numpy(zero_copy_only=False)
                dst = batch.column("dst").to_numpy(zero_copy_only=False)
                if len(src) == 0:
                    continue
                if src.min() < 0:
                    raise ValueError(
                        "negative src vertex id in broadcast SpMV gather"
                    )
                yield combine(dst, v[src])

        partials = graph.edges.mapInArrow(
            gather_scatter, schema="dst long, partial double"
        )
    elif mode == "join":
        # merge hint: pins the streaming sort-merge join — Catalyst/AQE
        # would otherwise broadcast a sub-threshold |V|-sized contrib
        # side, a SERIAL per-call driver collect (the same pathology
        # neighbor_reduce.py documents as 10× per-superstep cost)
        gathered = graph.edges.join(
            contrib.select(F.col("vid").alias("src"), "contrib").hint("merge"),
            "src",
        ).select("dst", "contrib")

        combine = _make_combiner()

        def scatter(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            for batch in batches:
                dst = batch.column("dst").to_numpy(zero_copy_only=False)
                c = batch.column("contrib").to_numpy(zero_copy_only=False)
                if len(dst) == 0:
                    continue
                yield combine(dst, c)

        partials = gathered.mapInArrow(scatter, schema="dst long, partial double")
    else:
        raise ValueError(f"unknown spmv mode: {mode!r}")

    return (
        partials.groupBy("dst")
        .agg(F.sum("partial").alias("msum"))
        .withColumnRenamed("dst", "vid")
    )
