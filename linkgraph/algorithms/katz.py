"""Katz centrality — truncated attenuated-path-count iteration.

Public-knowledge formulation (Katz 1953): ``x = Σ_{k≥1} α^k (Aᵀ)^k 1``,
computed by the fixpoint iteration ``x' = α·Aᵀx + β·1`` (β = 1).  Unlike
PageRank there is no degree normalization and no dangling redistribution
— each vertex's score is the attenuated count of walks ENDING at it, so
the gather message is just ``α·x(src)`` reduced by dst.

Superstep shape is identical to PageRank's (the engine's one-live-
shuffle contract): exchange-free gather join on the persisted hash(src)
edges + map-side-combined sum by dst, state checkpointed per round via
:func:`iterate`.  Truncation at ``max_iters`` is the catalog form (the
DuckDB twin unrolls the same K rounds); ``tol`` stops early when the
max per-vertex delta falls below it (α must be < 1/λ_max for the series
to converge — callers pick α; the default 0.05 is safely inside any web
graph's spectral bound at this scale).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.operators.neighbor_reduce import neighbor_reduce
from linkgraph.superstep import CheckpointManager, IterationResult, iterate


def katz_round(graph: Graph, state: DataFrame, alpha: float, beta: float) -> DataFrame:
    """ONE ``x' = α·Aᵀx + β`` superstep over ``(vid, score)`` state
    (production round body — plan-asserted like pagerank_round)."""
    sums = neighbor_reduce(
        graph.edges,
        state.select("vid", F.col("score").alias("contrib")),
        F.col("contrib"),
        op="sum",
        out="msum",
    )
    new_score = F.lit(beta) + F.lit(alpha) * F.coalesce(
        F.col("msum"), F.lit(0.0)
    )
    return state.join(sums.hint("merge"), "vid", "left").select(
        "vid",
        new_score.alias("score"),
        F.abs(new_score - F.col("score")).alias("_delta"),
    )


def katz(
    graph: Graph,
    alpha: float = 0.05,
    beta: float = 1.0,
    tol: float = 0.0,
    max_iters: int = 10,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 5,
    resume: bool = True,
    init_scores: DataFrame | None = None,
) -> IterationResult:
    """Truncated Katz centrality: ``(vid, score)`` after ≤ max_iters
    rounds of ``x' = α·Aᵀx + β·1`` from ``x₀ = β·1``.

    ``init_scores`` — warm start: a ``(vid, score)`` table (typically a
    previous epoch's converged scores).  The Katz map ``T(x) = α·Aᵀx +
    β·1`` is an α‖A‖-contraction for α < 1/λ_max, so it converges to
    the SAME unique fixpoint from ANY init — a warm start near the
    fixpoint pays fewer rounds, and no append-only precondition is
    needed (unlike CC/SSSP warm starts, nothing here is a bound
    argument; removals just move the fixpoint the iteration converges
    to anyway).  The step is memoryless, so seeding with round-k's
    state continues the cold trajectory exactly: katz(k cold) → warm m
    rounds ≡ katz(k+m cold) — the property the ``katz_warm8`` catalog
    entry hash-checks against the SAME unrolled-SQL twin as ``katz8``.
    Vertices absent from ``init_scores`` (new urls) seed the cold β.
    """
    if init_scores is None:
        init = graph.vertices.select("vid", F.lit(beta).alias("score"))
    else:
        prev = init_scores.select(
            "vid", F.col("score").cast("double").alias("_prev")
        )
        init = graph.vertices.join(prev.hint("merge"), "vid", "left").select(
            "vid", F.coalesce("_prev", F.lit(beta)).alias("score")
        )

    def step(state: DataFrame, i: int) -> DataFrame:
        return katz_round(graph, state, alpha=alpha, beta=beta)

    stats_cols = [F.max("_delta").alias("delta")]

    def converged(s: dict) -> bool:
        return s.get("delta") is not None and s["delta"] < tol

    result = iterate(
        init,
        step,
        stats_cols=stats_cols,
        converged=converged,
        max_iters=max_iters,
        checkpoint=checkpoint,
        checkpoint_every=checkpoint_every,
        resume=resume,
        ephemeral_cols=("_delta",),
    )
    result.state = result.state.select("vid", "score")
    return result
