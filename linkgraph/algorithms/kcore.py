"""k-core — iterative peeling of deg < k vertices (reference A11,
[ref: include/gunrock/algorithms/kcore.hxx — UNVERIFIED]; SURVEY.md §2.3
A11: "loop: degree agg + anti-join removal").

``k_core(G, k)`` = the maximal subgraph of the undirected graph in which
every vertex has degree ≥ k.  Peel to fixpoint: each round recomputes
degrees over the surviving subgraph and drops vertices below k.  Output
is exact and unique (the k-core is well-defined), so the result is
independent of peel order/parallelism.

Superstep state = ``(vid, deg)`` where ``deg`` counts edges to vertices
alive at the START of the round; vertices with ``deg < k`` are *pending
removal*.  Each round removes the pending set simultaneously and
DECREMENTS neighbors' degrees (delta peeling — equivalent to recomputing
degrees over survivors, but the shuffled data is proportional to the
round's removals, not |E|):

    pending = state where deg < k
    dec     = sym_edges ⋉ pending(src)  .groupBy(dst).count()
    state'  = (state where deg ≥ k) ⟕ dec : deg −= dec

The src-side semi-join reuses the persisted hash(src, P) layout of the
symmetrized view (exchange-free); the ``groupBy(dst)`` shuffles only the
partial-aggregated decrement counts.  Both |V|-scale join sides carry
merge hints so no round ever serially broadcasts a large vertex set
(the measured 10× per-superstep pathology — operators/neighbor_reduce).
Convergence: pending count is 0, observed during the round's own
materialization job (no extra equal-count round).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.superstep import IterationResult, iterate


def peel_round(sym: DataFrame, state: DataFrame, k: int) -> DataFrame:
    """ONE delta-peel round over ``(vid, deg)`` state (the production
    round body :func:`k_core` iterates — exposed so the plan-regression
    tests and tools/explain_plans.py assert the shipping plan, not a
    replica)."""
    pending = state.where(F.col("deg") < k).select("vid")
    dec = (
        sym.join(
            pending.withColumnRenamed("vid", "src").hint("merge"),
            "src",
            "left_semi",
        )
        .groupBy(F.col("dst").alias("vid"))
        .agg(F.count(F.lit(1)).alias("_dec"))
    )
    return (
        state.where(F.col("deg") >= k)
        .join(dec.hint("merge"), "vid", "left")
        .select(
            "vid",
            (F.col("deg") - F.coalesce("_dec", F.lit(0))).alias("deg"),
        )
    )


def k_core(graph: Graph, k: int, max_iters: int = 500) -> IterationResult:
    """Vertices of the k-core: state ``(vid, deg)`` (degree within core)."""
    sym = graph.symmetrized_edges
    init = sym.groupBy(F.col("src").alias("vid")).agg(
        F.count(F.lit(1)).alias("deg")
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        return peel_round(sym, state, k)

    # Converged when nothing is pending removal — at that point every
    # surviving deg counts only edges into the surviving set, i.e. the
    # state IS the k-core with in-core degrees.
    result = iterate(
        init,
        step,
        stats_cols=[
            F.sum((F.col("deg") < k).cast("long")).alias("pending")
        ],
        converged=lambda s: (s.get("pending") or 0) == 0,
        max_iters=max_iters,
    )
    # A converged state has no pending rows; on max_iters exhaustion drop
    # the round's pending (deg < k) vertices so the output honors the
    # "(vid, deg) with deg within core" contract either way (a partial
    # run then over-approximates the core, matching the recompute-peel
    # formulation's partial output).
    result.state = result.state.where(F.col("deg") >= k)
    return result


def k_core_peel_rounds(graph: Graph, k: int, rounds: int) -> DataFrame:
    """``rounds`` peel rounds AFTER the initial full-graph degree filter
    (which is itself the first peel — so ``rounds=0`` already filters by
    deg >= k, and the total is rounds+1 peels).  Deterministic partial
    peel used by the SQL-oracle harness; the DuckDB twin unrolls the
    SAME rounds+1 structure, so the two cannot drift — but a
    re-implemented twin must match this counting, not "exactly
    rounds"."""
    sym = graph.symmetrized_edges
    alive = (
        sym.groupBy(F.col("src").alias("vid"))
        .agg(F.count(F.lit(1)).alias("deg"))
        .where(F.col("deg") >= k)
    )
    for _ in range(rounds):
        av = alive.select("vid")
        alive_edges = sym.join(
            av.withColumnRenamed("vid", "src"), "src", "left_semi"
        ).join(av.withColumnRenamed("vid", "dst"), "dst", "left_semi")
        alive = (
            alive_edges.groupBy(F.col("src").alias("vid"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .where(F.col("deg") >= k)
        )
        # fixed small round count: localCheckpoint keeps the plan shallow
        alive = alive.localCheckpoint(eager=False)
    return alive
