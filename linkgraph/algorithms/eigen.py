"""Eigenvector centrality — power iteration on the link matrix.

Reference: none — upstream essentials has PageRank/HITS but not plain
eigenvector centrality (Bonacich 1972); added to complete the centrality
family next to pagerank.py (damped, stochastic), katz.py (attenuated
path counts) and hits.py/salsa.py (mutual reinforcement).

Update (the auth half of HITS, alone)::

    x'(v) = Σ_{u→v} x(u)        ;  x' ← x'/‖x'‖₂

Init x = 1.  Convergence: L∞ delta < tol (or ``max_iters``).  On a
reducible web graph mass drains from source-only components — that is
the textbook behavior of undamped eigenvector centrality (the reason
PageRank adds teleport), reproduced faithfully, not "fixed".

Physical shape: ONE exchange-free gather over the persisted hash(src)
edge layout + the broadcast 1-row L2 norm per iteration — the same
single live |V|-shuffle superstep contract as PageRank, with no
dangling/teleport terms at all.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.operators.neighbor_reduce import neighbor_reduce
from linkgraph.superstep import CheckpointManager, IterationResult, iterate


def eigenvector_centrality(
    graph: Graph,
    tol: float = 1e-9,
    max_iters: int = 100,
    salted: bool = True,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 10,
    resume: bool = True,
    init_scores: DataFrame | None = None,
) -> IterationResult:
    """Run power iteration; result state is ``(vid, score)``, L2-normalized.

    ``init_scores`` — warm start: a ``(vid, score)`` table.  Power
    iteration converges to the principal eigenvector from any
    non-negative init with non-zero overlap on it (Perron-Frobenius on
    the reachable web core); a previous epoch's scores are exactly such
    an init, so warm runs pay fewer normalization rounds.  The step is
    memoryless (per-round L2 normalization carries no history), so
    seeding with round-k's state continues the cold trajectory exactly
    — the ``eigen_warm6`` catalog entry hash-checks warm(4 + 2) against
    the same unrolled twin as cold ``eigen6``.  Vertices absent from
    ``init_scores`` seed the cold 1.0 (the next normalization absorbs
    the scale mismatch).  No append-only guard: nothing here is a bound
    argument — see katz.py's warm-start note.
    """
    if init_scores is None:
        init = graph.vertices.select("vid", F.lit(1.0).alias("score"))
    else:
        prev = init_scores.select(
            "vid", F.col("score").cast("double").alias("_prev")
        )
        init = graph.vertices.join(prev.hint("merge"), "vid", "left").select(
            "vid", F.coalesce("_prev", F.lit(1.0)).alias("score")
        )

    def step(state: DataFrame, i: int) -> DataFrame:
        raw = neighbor_reduce(
            graph.edges,
            state.select("vid", "score"),
            F.col("score"),
            op="sum",
            out="raw",
            salted=salted,
        )
        x = graph.vertices.join(raw.hint("merge"), "vid", "left").select(
            "vid", F.coalesce("raw", F.lit(0.0)).alias("nscore")
        )
        norm = x.agg(F.sqrt(F.sum(F.col("nscore") * F.col("nscore"))).alias("_n"))
        x = x.crossJoin(F.broadcast(norm)).select(
            "vid",
            F.when(F.col("_n") > 0, F.col("nscore") / F.col("_n"))
            .otherwise(F.col("nscore"))
            .alias("nscore"),
        )
        return x.join(
            state.select("vid", F.col("score").alias("_old")), "vid"
        ).select(
            "vid",
            F.col("nscore").alias("score"),
            F.abs(F.col("nscore") - F.col("_old")).alias("_delta"),
        )

    result = iterate(
        init,
        step,
        stats_cols=[F.max("_delta").alias("delta")],
        converged=lambda s: s.get("delta") is not None and s["delta"] < tol,
        max_iters=max_iters,
        checkpoint=checkpoint,
        checkpoint_every=checkpoint_every,
        resume=resume,
        ephemeral_cols=("_delta",),
    )
    result.state = result.state.select("vid", "score")
    return result
