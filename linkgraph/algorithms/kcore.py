"""k-core — iterative peeling of deg < k vertices (reference A11,
[ref: include/gunrock/algorithms/kcore.hxx — UNVERIFIED]; SURVEY.md §2.3
A11: "loop: degree agg + anti-join removal").

``k_core(G, k)`` = the maximal subgraph of the undirected graph in which
every vertex has degree ≥ k.  Peel to fixpoint: each round recomputes
degrees over the surviving subgraph and drops vertices below k.  Output
is exact and unique (the k-core is well-defined), so the result is
independent of peel order/parallelism.

Superstep state = surviving vertex set ``(vid)``; each round:

    alive_edges = sym_edges ⋉ alive(src) ⋉ alive(dst)   (two semi-joins)
    deg         = alive_edges.groupBy(src).count()       (salted optional)
    alive'      = deg.filter(deg ≥ k)

The symmetrized edge DF is persisted once (graph view); only |V|-sized
vertex sets shuffle per round.  Convergence: no vertex removed.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.superstep import IterationResult, iterate


def k_core(graph: Graph, k: int, max_iters: int = 500) -> IterationResult:
    """Vertices of the k-core: state ``(vid, deg)`` (degree within core)."""
    sym = graph.symmetrized_edges
    deg0 = sym.groupBy(F.col("src").alias("vid")).agg(
        F.count(F.lit(1)).alias("deg")
    )
    init = deg0.where(F.col("deg") >= k)

    def step(state: DataFrame, i: int) -> DataFrame:
        alive = state.select("vid")
        alive_edges = sym.join(
            alive.withColumnRenamed("vid", "src"), "src", "left_semi"
        ).join(alive.withColumnRenamed("vid", "dst"), "dst", "left_semi")
        deg = alive_edges.groupBy(F.col("src").alias("vid")).agg(
            F.count(F.lit(1)).alias("deg")
        )
        return deg.where(F.col("deg") >= k)

    # Converged when no vertex was removed: alive count is observed during
    # each superstep's materialization job (zero extra jobs); the previous
    # generation's count is simply last iteration's observation, carried
    # driver-side.
    prev_alive: list[float | None] = [None]

    def converged(s: dict) -> bool:
        same = prev_alive[0] is not None and s.get("alive") == prev_alive[0]
        prev_alive[0] = s.get("alive")
        return same

    result = iterate(
        init,
        step,
        stats_cols=[F.count(F.lit(1)).alias("alive")],
        converged=converged,
        max_iters=max_iters,
    )
    return result


def k_core_peel_rounds(graph: Graph, k: int, rounds: int) -> DataFrame:
    """Exactly ``rounds`` peel rounds (no convergence check) —
    deterministic partial peel used by the SQL-oracle harness, where the
    DuckDB twin unrolls the same fixed number of rounds."""
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
