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

- **broadcast** (|V| ≤ threshold): a TRUE per-partition CSR-block SpMV
  over the graph's persisted CSC view (``Graph.reversed_edges``: edges
  re-keyed and sorted by DESTINATION).  The per-vertex contrib vector is
  broadcast as a dense NumPy array; ``mapInArrow`` streams the cached,
  destination-sorted partitions with ZERO join and ZERO shuffle of
  edges.  Because each partition arrives sorted by destination, its
  segment boundaries ARE the CSR ``row_offsets`` (computed per Arrow
  batch by ``np.flatnonzero(np.diff(dest))``), the gather is
  ``vec[origin]`` fancy-indexing, and the segmented reduction is ONE
  ``np.add.reduceat`` — the textbook CSR SpMV kernel, no per-batch sort
  or hash.  Output is at most one ``(dst, partial)`` row per distinct
  destination per partition, and destinations are hash-partitioned, so
  the follow-up ``groupBy(dst)`` shuffle moves ≤ |V| pre-combined rows
  whose partitioning already matches the state-merge join's demand.
  The vector build is a SERIAL driver collect + torrent broadcast per
  call, so this mode only wins while |V| is small (see
  ``BROADCAST_MAX_VERTICES``); each call destroys the previous call's
  vector (callers must materialize one result before requesting the
  next — the superstep runtime does).

- **join** (the scale path, default beyond the threshold): gather by
  equi-join on ``src``.  With the superstep runtime's co-partitioned
  state this join is EXCHANGE-FREE (edges reuse their persisted
  HashPartitioning; contrib is a narrow projection of the hash(vid, P)
  checkpoint leaf), then an Arrow scatter pass combines per destination
  across the WHOLE partition (per-batch ``np.unique`` + ``bincount``
  partials, re-combined once at partition end) before the shuffle.

The map-side combine is the skew treatment here: a hub destination
appears at most once **per flush** in the UDF output (one flush per
task in the common case, so ≈ P rows globally; a task whose distinct
destinations exceed ``_FLUSH_ROWS`` emits one extra row per flush)
instead of once per in-edge (10^8 rows), so the final
``groupBy(dst).sum()`` is uniform — a stronger guarantee than salting and
the same two-phase structure (partial by (dst, partition) → final by dst).

Costs the modes do NOT share: broadcast mode's first call triggers the
one-time build + MEMORY_AND_DISK persist of ``Graph.reversed_edges``
(one |E| exchange + sort, a second cached copy of the edge set — shared
with HITS' hub gather); join mode reuses the primary ``Graph.edges``
cache.  "Zero shuffle" above is per-superstep, after that view exists.
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

# Flush accumulated partials once this many combined rows are buffered
# in a single task.  Sizing: 16 B/row buffered (int64 dst + float64
# partial) = 32 MB at the threshold, peaking ~3× that transiently in
# the flush merge (concatenate + unique/reduceat scratch) ≈ 100 MB per
# task — size spark.executor.pyspark.memory for cores × that.  One
# combine per partition in the common case (a 128 MB parquet split is
# ~8M edges but far fewer distinct destinations).  Flushing early is
# correctness-neutral — the downstream groupBy re-merges.
_FLUSH_ROWS = 2_000_000

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


def _out_batch(dst: np.ndarray, partial: np.ndarray) -> pa.RecordBatch:
    return pa.RecordBatch.from_arrays(
        [pa.array(dst, type=pa.int64()), pa.array(partial, type=pa.float64())],
        schema=pa.schema(
            [pa.field("dst", pa.int64()), pa.field("partial", pa.float64())]
        ),
    )


def _make_buffered_flusher(merge, flush_rows: int):
    """Shared buffer/flush/final-merge skeleton for both map-side kernels.

    ``merge(us, ps) -> RecordBatch`` re-combines the buffered per-batch
    partial arrays.  Returns a LOCAL driver function so cloudpickle ships
    it by value inside the UDF closure — the library then works on
    executors that don't have ``linkgraph`` on their PYTHONPATH (plain
    ``python script.py`` without ``--py-files``); ``merge`` must itself
    be factory-local for the same reason.
    """

    def drive(pairs: Iterator[tuple]) -> Iterator[pa.RecordBatch]:
        us: list[np.ndarray] = []
        ps: list[np.ndarray] = []
        buffered = 0
        for u, p in pairs:
            us.append(u)
            ps.append(p)
            buffered += len(u)
            if buffered >= flush_rows:
                yield merge(us, ps)
                us, ps, buffered = [], [], 0
        if us:
            yield merge(us, ps)

    return drive


def _make_csc_kernel(flush_rows: int = _FLUSH_ROWS):
    """CSR-block segmented-sum kernel over destination-sorted partitions.

    Per batch: row_offsets from the sorted destination run boundaries,
    gather by fancy index, segmented sum by reduceat.  Batch partials
    are buffered and merged once per partition / flush (a destination
    run can span batch boundaries; the buffered uniques stay globally
    sorted, so the merge is another diff+reduceat, not a sort).
    Factory-local for cloudpickle-by-value (:func:`_make_buffered_flusher`).
    """

    def _merge_sorted_runs(us, ps):
        u = np.concatenate(us)
        p = np.concatenate(ps)
        starts = np.concatenate(([0], np.flatnonzero(np.diff(u)) + 1))
        return _out_batch(u[starts], np.add.reduceat(p, starts))

    drive = _make_buffered_flusher(_merge_sorted_runs, flush_rows)

    def kernel(
        batches: Iterator[pa.RecordBatch], vec: np.ndarray
    ) -> Iterator[pa.RecordBatch]:
        def pairs():
            for batch in batches:
                dest = batch.column("src").to_numpy(zero_copy_only=False)
                orig = batch.column("dst").to_numpy(zero_copy_only=False)
                if len(dest) == 0:
                    continue
                if orig.min() < 0:
                    raise ValueError(
                        "negative vertex id in broadcast SpMV gather"
                    )
                row_offsets = np.concatenate(
                    ([0], np.flatnonzero(np.diff(dest)) + 1)
                )
                yield dest[row_offsets], np.add.reduceat(vec[orig], row_offsets)

        yield from drive(pairs())

    return kernel


def _make_combiner(flush_rows: int = _FLUSH_ROWS):
    """Map-side combine for UNSORTED (dst, val) batches (join-mode scatter).

    Per batch: ``np.unique`` + ``bincount`` partials; buffered and
    re-combined once per partition / flush so a destination leaves the
    task once per flush (instead of once per batch).  Factory-local for
    cloudpickle-by-value (:func:`_make_buffered_flusher`).
    """

    def _combine(us, ps):
        u = np.concatenate(us)
        p = np.concatenate(ps)
        uniq, inv = np.unique(u, return_inverse=True)
        return _out_batch(uniq, np.bincount(inv, weights=p, minlength=len(uniq)))

    drive = _make_buffered_flusher(_combine, flush_rows)

    def scatter(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        def pairs():
            for batch in batches:
                dst = batch.column("dst").to_numpy(zero_copy_only=False)
                vals = batch.column("contrib").to_numpy(zero_copy_only=False)
                if len(dst) == 0:
                    continue
                uniq, inv = np.unique(dst, return_inverse=True)
                yield uniq, np.bincount(inv, weights=vals, minlength=len(uniq))

        yield from drive(pairs())

    return scatter


def spmv_contrib_sums(
    graph: Graph,
    contrib: DataFrame,
    mode: str = "auto",
) -> DataFrame:
    """Σ_{u→v} contrib(u) per destination v → ``(vid, msum)``.

    ``contrib`` is ``(vid, contrib)`` and MUST cover every non-dangling
    vertex (every edge origin).  With partial coverage the modes diverge
    on the output key set — broadcast (dense vector, missing = 0.0)
    emits ``(v, 0.0)`` for a destination all of whose in-origins are
    missing, join (inner gather) omits ``v`` entirely.  Callers
    left-join + ``coalesce(msum, 0)`` (the PageRank round does), so both
    conventions read back identically; direct callers inner-joining the
    result must honor the coverage precondition.
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

        kernel = _make_csc_kernel()

        def gather_scatter(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
            yield from kernel(batches, bc.value)

        # CSC view: (src=destination, dst=origin), hash(destination, P),
        # sorted — the persisted CSR-block layout this kernel assumes.
        partials = graph.reversed_edges.mapInArrow(
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

        scatter = _make_combiner()
        partials = gathered.mapInArrow(scatter, schema="dst long, partial double")
    else:
        raise ValueError(f"unknown spmv mode: {mode!r}")

    # The final reduce: ≤ one row per (destination, task) enters this
    # shuffle, and its output HashPartitioning(dst, P) is exactly the
    # distribution the caller's state-merge join needs — one |V|-row
    # exchange per superstep, total.
    return (
        partials.groupBy("dst")
        .agg(F.sum("partial").alias("msum"))
        .withColumnRenamed("dst", "vid")
    )
