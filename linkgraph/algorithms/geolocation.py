"""Geolocation — iterative spatial label median (reference A15,
[ref: include/gunrock/algorithms/geo.hxx — UNVERIFIED]; SURVEY.md §2.3
A15: "iterative spatial label median").

A subset of vertices has known coordinates ``(lat, lon)``; every other
vertex is located from its neighborhood.  Pinned deterministic
semantics (the reference's spatial-median refinement loop is
GPU-schedule-dependent; this engine pins the synchronous variant so the
output is replay-stable under any partitioning, like LP/A3):

- init: located = the input locations, fixed forever;
- superstep: every UNlocated vertex with ≥1 located (undirected)
  neighbor takes ``(median(lat), median(lon))`` of its located
  neighbors — the component-wise spatial median, exact
  ``percentile(x, 0.5)`` with linear interpolation;
- converged when no vertex becomes located (vertices in components with
  no seed stay NULL).

Physical plan per superstep: gather located coords along the
symmetrized edges (co-partitioned merge join, no broadcast build), then
``groupBy(dst).agg(percentile(...))``.  Median is NOT decomposable, so
map-side partial aggregation buffers per-group values; for hub-heavy
web graphs pass ``exact=False`` to use ``approx_percentile`` (a
mergeable sketch — bounded map-side state, same shuffle shape as the
PageRank reduce).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.superstep import (
    CheckpointManager,
    IterationResult,
    changed_stats,
    iterate,
)


def geolocate(
    graph: Graph,
    locations: DataFrame,
    max_iters: int = 50,
    exact: bool = True,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 5,
    resume: bool = True,
) -> IterationResult:
    """Spread ``locations(vid, lat, lon)`` over the graph; result state
    ``(vid, lat, lon)`` with NULLs for unreachable vertices."""
    sym = graph.symmetrized_edges
    init = graph.vertices.join(
        locations.select(
            "vid",
            F.col("lat").cast("double").alias("lat"),
            F.col("lon").cast("double").alias("lon"),
        ),
        "vid",
        "left",
    )

    def med(col: str):
        if exact:
            return F.percentile(F.col(col), F.lit(0.5))
        return F.approx_percentile(F.col(col), F.lit(0.5), F.lit(10000))

    def step(state: DataFrame, i: int) -> DataFrame:
        located = state.where(F.col("lat").isNotNull())
        gathered = sym.join(
            located.select(F.col("vid").alias("src"), "lat", "lon").hint("merge"),
            "src",
        ).select("dst", "lat", "lon")
        est = gathered.groupBy(F.col("dst").alias("vid")).agg(
            med("lat").alias("_elat"), med("lon").alias("_elon")
        )
        # located vertices keep their coords; unlocated take the estimate
        new_lat = F.coalesce("lat", "_elat")
        new_lon = F.coalesce("lon", "_elon")
        return state.join(est.hint("merge"), "vid", "left").select(
            "vid",
            new_lat.alias("lat"),
            new_lon.alias("lon"),
            (F.col("lat").isNull() & new_lat.isNotNull()).alias("_changed"),
        )

    result = iterate(
        init,
        step,
        stats_cols=changed_stats(),
        converged=lambda s: (s.get("changed") or 0) == 0,
        max_iters=max_iters,
        checkpoint=checkpoint,
        checkpoint_every=checkpoint_every,
        resume=resume,
    )
    result.state = result.state.select("vid", "lat", "lon")
    return result
