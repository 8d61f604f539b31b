"""Personalized PageRank — teleport restricted to a seed set (reference
A7, [ref: include/gunrock/algorithms/ppr.hxx — UNVERIFIED]; SURVEY.md
§2.3 A7: "A1 with personalized teleport vector").

Same damped power iteration as :mod:`linkgraph.algorithms.pagerank`, with
the uniform teleport ``(1-α)/N`` replaced by a personalization vector
``t`` that is uniform over ``seeds`` and zero elsewhere::

    p'(v) = (1-α)·t(v) + α · (Σ_{u→v} p(u)/outdeg(u) + dangling·t(v))

Dangling mass is redistributed by ``t`` as well (the standard choice:
random surfers who fall off a dangling page restart at a seed), so Σp = 1
is preserved every iteration.  Convergence: ``max_v |p'(v) − p(v)| < tol``
— identical to the reference's PR validator discipline (BASELINE.json:6).

Physical shape per superstep is exactly PageRank's: one |V|-side shuffle
into the persisted hash-partitioned edges, one salted reduce-by-dst, one
stats action.  The seed set is a driver-side list (personalization sets
are small by definition); membership is a broadcast ``isin`` — no join.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.operators.neighbor_reduce import neighbor_reduce
from linkgraph.superstep import CheckpointManager, IterationResult, iterate


def personalized_pagerank(
    graph: Graph,
    seeds: Sequence[int],
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iters: int = 100,
    salted: bool = True,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 5,
    resume: bool = True,
) -> IterationResult:
    """PPR from ``seeds``; result state is ``(vid, rank)`` with Σrank = 1."""
    seeds = sorted({int(s) for s in seeds})
    if not seeds:
        raise ValueError("personalized_pagerank requires a non-empty seed set")
    t_seed = 1.0 / len(seeds)  # teleport mass per seed vertex

    teleport = F.when(F.col("vid").isin(seeds), F.lit(t_seed)).otherwise(F.lit(0.0))
    init = graph.vertices.select(
        "vid", teleport.alias("rank")
    ).join(graph.out_degrees, "vid", "left")

    dangling_cell: list[float | None] = [None]

    def step(state: DataFrame, i: int) -> DataFrame:
        if dangling_cell[0] is None:
            row = state.agg(
                F.coalesce(
                    F.sum(F.when(F.col("outdeg").isNull(), F.col("rank"))),
                    F.lit(0.0),
                ).alias("d")
            ).collect()[0]
            dangling_cell[0] = float(row["d"])
        dangling = dangling_cell[0]
        contrib = state.where(F.col("outdeg").isNotNull()).select(
            "vid", (F.col("rank") / F.col("outdeg")).alias("contrib")
        )
        sums = neighbor_reduce(
            graph.edges, contrib, F.col("contrib"),
            op="sum", out="msum", salted=salted,
        )
        new_rank = (F.lit(1.0 - alpha) + F.lit(alpha * dangling)) * teleport + (
            F.lit(alpha) * F.coalesce(F.col("msum"), F.lit(0.0))
        )
        return state.join(sums.hint("merge"), "vid", "left").select(
            "vid",
            new_rank.alias("rank"),
            "outdeg",
            F.abs(new_rank - F.col("rank")).alias("_delta"),
        )

    stats_cols = [
        F.max("_delta").alias("delta"),
        F.coalesce(
            F.sum(F.when(F.col("outdeg").isNull(), F.col("rank"))),
            F.lit(0.0),
        ).alias("dangling"),
    ]

    def converged(s: dict) -> bool:
        if s.get("dangling") is not None:
            dangling_cell[0] = float(s["dangling"])
        return s.get("delta") is not None and s["delta"] < tol

    result = iterate(
        init, step, stats_cols=stats_cols, converged=converged,
        max_iters=max_iters, checkpoint=checkpoint,
        checkpoint_every=checkpoint_every, resume=resume,
        ephemeral_cols=("_delta",),
    )
    result.state = result.state.select("vid", "rank")
    return result
