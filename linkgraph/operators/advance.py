"""advance — frontier expansion (reference O1, SURVEY.md §2.1).

Reference: for each vertex in the input frontier visit its neighbor list;
a user lambda decides emission into the output frontier
[ref: include/gunrock/framework/operators/advance/*.hxx — UNVERIFIED].

Spark mapping: ``frontier ⋈ edges on vid == src``.  Catalyst picks the
physical join:

- small frontier → **broadcast hash join** (the reference's small-frontier
  thread-mapped fast path): no shuffle of the edge table at all;
- large frontier → shuffled hash/sort-merge join; because the canonical
  edges DataFrame is persisted hash-partitioned on ``src`` (graph.py), only
  the frontier side shuffles;
- near-full frontier → callers should skip advance entirely and scan all
  edges (bitmap mode, SURVEY.md §4.5) — expressed by passing
  ``frontier=None``.

The emission predicate (reference: the advance lambda) is a Column
expression evaluated JVM-side inside whole-stage codegen.

Direction variants (reference: ``advance_direction_t``
forward/backward/optimized): a BACKWARD advance — visit each frontier
vertex's in-neighbors — is this same function over
``Graph.reversed_edges`` (the persisted CSC-layout view), keeping the
src-keyed join exchange-free; the per-round OPTIMIZED switch lives in
``algorithms/bfs.py`` (push/pull), where frontier/unvisited sizes are
known to the driver loop.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def advance(
    frontier: DataFrame | None,
    edges: DataFrame,
    emit: Column | None = None,
    payload: list[str] | None = None,
    broadcast_frontier: bool | None = None,
) -> DataFrame:
    """Expand ``frontier(vid)`` along ``edges(src, dst, ...)``.

    Returns a DataFrame of visited edges: ``(src, dst, *payload columns)``
    filtered by ``emit``.  ``frontier=None`` means the full-graph advance
    (``advance_io_type_t::graph`` in the reference): scan every edge.

    ``broadcast_frontier=True`` forces the broadcast fast path;
    ``False`` pins the shuffled merge join (for frontiers whose size
    statistics under-estimate badly — a mistaken auto-broadcast collects
    the frontier to the driver); ``None`` lets Catalyst/AQE decide from
    size statistics.
    """
    cols = ["src", "dst"] + (payload or [])
    if frontier is None:
        out = edges
    else:
        f = frontier.select(F.col("vid"))
        if broadcast_frontier:
            f = F.broadcast(f)
        elif broadcast_frontier is False:
            f = f.hint("merge")
        out = f.join(edges, on=f["vid"] == edges["src"], how="inner")
    out = out.select(*[F.col(c) for c in cols])
    if emit is not None:
        out = out.where(emit)
    return out
