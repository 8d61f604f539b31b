"""HITS — hubs & authorities power iteration (reference A10,
[ref: include/gunrock/algorithms/hits.hxx — UNVERIFIED]; SURVEY.md §2.3
A10: "two coupled A1-style supersteps").

Kleinberg's update with L2 normalization, synchronous ordering pinned for
replay-stable output (auth from OLD hubs, then hubs from NEW auths —
matching the reference enactor's two-kernel iteration)::

    a'(v) = Σ_{u→v} h(u)           ;  a' ← a'/‖a'‖₂
    h'(v) = Σ_{v→w} a'(w)          ;  h' ← h'/‖h'‖₂

Init h = a = 1 on every vertex.  Convergence: ``max(|a'−a|, |h'−h|) <
tol`` or ``max_iters``.

Physical shape: the auth gather reuses the graph's persisted
HashPartitioning(src); the hub gather runs over the reversed view
(dst-keyed), built once and persisted like the CSC view the reference
keeps next to CSR.  L2 norms are computed INSIDE the superstep plan via a
1-row aggregate crossJoin (broadcast nested-loop of one row) — no extra
driver action; the per-iteration action count stays at one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.operators.neighbor_reduce import neighbor_reduce
from linkgraph.superstep import CheckpointManager, IterationResult, iterate


def hits(
    graph: Graph,
    tol: float = 1e-6,
    max_iters: int = 50,
    salted: bool = True,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 10,
    resume: bool = True,
    init_scores: DataFrame | None = None,
) -> IterationResult:
    """Run HITS; result state is ``(vid, hub, auth)``, each L2-normalized.

    ``init_scores`` — warm start: a ``(vid, hub, auth)`` table (a
    previous crawl epoch's converged scores).  HITS is the power
    iteration for the principal eigenvectors of AᵀA / AAᵀ, which
    converges from any non-negative init with non-zero overlap on the
    principal component — a near-fixpoint init converges in fewer
    normalization rounds.  Vertices absent from ``init_scores`` (new
    urls) seed at the cold value 1.0 (also what keeps the overlap
    condition trivially satisfied).
    """
    if init_scores is None:
        init = graph.vertices.select(
            "vid", F.lit(1.0).alias("hub"), F.lit(1.0).alias("auth")
        )
    else:
        init = graph.vertices.join(
            init_scores.select(
                "vid",
                F.col("hub").alias("_ph"),
                F.col("auth").alias("_pa"),
            ).hint("merge"),
            "vid",
            "left",
        ).select(
            "vid",
            F.coalesce("_ph", F.lit(1.0)).alias("hub"),
            F.coalesce("_pa", F.lit(1.0)).alias("auth"),
        )
    # reversed edge view for the hub gather (reference: the CSC view) —
    # persisted hash(src, P) + sorted on the Graph, so the per-superstep
    # hub gather plans exchange-free (a bare column swap would keep the
    # ORIGINAL src partitioning and re-shuffle |E| every iteration).
    redges = graph.reversed_edges

    def _l2_normalized(df: DataFrame, col: str) -> DataFrame:
        norm = df.agg(
            F.sqrt(F.sum(F.col(col) * F.col(col))).alias("_n")
        )
        return df.crossJoin(F.broadcast(norm)).withColumn(
            col,
            F.when(F.col("_n") > 0, F.col(col) / F.col("_n")).otherwise(
                F.col(col)
            ),
        ).drop("_n")

    def step(state: DataFrame, i: int) -> DataFrame:
        a_raw = neighbor_reduce(
            graph.edges,
            state.select("vid", "hub"),
            F.col("hub"),
            op="sum", out="a_raw", salted=salted,
        )
        a = graph.vertices.join(a_raw.hint("merge"), "vid", "left").select(
            "vid", F.coalesce("a_raw", F.lit(0.0)).alias("auth")
        )
        a = _l2_normalized(a, "auth")
        h_raw = neighbor_reduce(
            redges,
            a.select("vid", "auth"),
            F.col("auth"),
            op="sum", out="h_raw", salted=salted,
        )
        new = (
            a.join(h_raw.hint("merge"), "vid", "left")
            .select("vid", "auth", F.coalesce("h_raw", F.lit(0.0)).alias("hub"))
        )
        new = _l2_normalized(new, "hub")
        return new.join(
            state.select("vid", F.col("hub").alias("_oh"), F.col("auth").alias("_oa")),
            "vid",
        ).select(
            "vid", "hub", "auth",
            F.greatest(
                F.abs(F.col("hub") - F.col("_oh")),
                F.abs(F.col("auth") - F.col("_oa")),
            ).alias("_delta"),
        )

    result = iterate(
        init, step,
        stats_cols=[F.max("_delta").alias("delta")],
        converged=lambda s: s.get("delta") is not None and s["delta"] < tol,
        max_iters=max_iters, checkpoint=checkpoint,
        checkpoint_every=checkpoint_every, resume=resume,
        ephemeral_cols=("_delta",),
    )
    result.state = result.state.select("vid", "hub", "auth")
    return result
