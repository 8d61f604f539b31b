"""PageRank — damped power iteration (reference A1, SURVEY.md §2.3).

Reference [ref: include/gunrock/algorithms/pr.hxx + examples/algorithms/pr/
pr_cpu.hxx — UNVERIFIED]: ``p' = (1-α)/N + α·(Σ_{u→v} p(u)/outdeg(u) +
dangling_mass/N)``, converged when ``max_v |p'(v) − p(v)| < tol``
(tol 1e-6, BASELINE.json:6).  We use the probability normalization
(Σp = 1 every iteration, dangling mass redistributed uniformly) — pinned
per SURVEY.md §2.3 A1; the NumPy oracle in tests/oracles.py is the
authoritative twin while the reference mount is empty.

Superstep dataflow (SURVEY.md §3.2)::

    contrib = rank / outdeg                    (parallel_for, narrow)
    sums    = Σ contrib over in-edges          (neighbor_reduce: gather join
                                                + salted shuffle-reduce by dst)
    rank'   = (1-α)/N + α (sums + dangling/N)  (vertices left-join sums)
    delta   = max |rank' − rank|               (one stats action)

Physical properties at scale:

- the gather join reuses the graph's persisted HashPartitioning(src, P):
  only the |V|-sized contrib side shuffles each iteration, never |E| edges;
- the reduce-by-dst is salted (two-phase) so hub pages with 10^8 in-links
  don't serialize one reducer (BASELINE.json:6);
- strategy="spmv" replaces join+agg with the per-partition CSR
  gather-scatter pandas UDF (linkgraph/csr.py) — one Arrow pass per
  superstep emitting pre-combined (dst, partial) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.operators.neighbor_reduce import neighbor_reduce
from linkgraph.superstep import (
    CheckpointManager,
    IterationResult,
    delta_stats,
    iterate,
)


def pagerank(
    graph: Graph,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iters: int = 100,
    salted: bool = True,
    salt_buckets: int = 32,
    strategy: str = "join",
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 5,
    resume: bool = True,
) -> IterationResult:
    """Run PageRank to convergence; result state is ``(vid, rank)``, Σ=1."""
    n = graph.num_vertices
    if n == 0:
        empty = graph.spark.createDataFrame([], "vid long, rank double")
        return IterationResult(state=empty, iterations=0, converged=True)
    p = graph.num_partitions
    deg = graph.out_degrees
    verts = graph.vertices
    init = verts.select("vid", F.lit(1.0 / n).alias("rank"))

    if strategy == "spmv":
        from linkgraph.csr import spmv_contrib_sums
    elif strategy != "join":
        raise ValueError(f"unknown strategy: {strategy!r}")

    def step(state: DataFrame, i: int) -> DataFrame:
        withdeg = state.join(deg, "vid", "left")
        dangling = withdeg.where(F.col("outdeg").isNull()).agg(
            F.coalesce(F.sum("rank"), F.lit(0.0)).alias("_dangling")
        )
        contrib = withdeg.where(F.col("outdeg").isNotNull()).select(
            "vid", (F.col("rank") / F.col("outdeg")).alias("contrib")
        )
        if strategy == "spmv":
            sums = spmv_contrib_sums(graph, contrib)
        else:
            sums = neighbor_reduce(
                graph.edges,
                contrib,
                F.col("contrib"),
                op="sum",
                out="msum",
                salted=salted,
                salt_buckets=salt_buckets,
            )
        new = (
            verts.join(sums, "vid", "left")
            .crossJoin(F.broadcast(dangling))
            .select(
                "vid",
                (
                    F.lit((1.0 - alpha) / n)
                    + alpha
                    * (
                        F.coalesce(F.col("msum"), F.lit(0.0))
                        + F.col("_dangling") / n
                    )
                ).alias("rank"),
            )
            .repartition(p, "vid")
        )
        return new

    return iterate(
        init,
        step,
        stats_fn=delta_stats("rank"),
        converged=lambda s: s.get("delta") is not None and s["delta"] < tol,
        max_iters=max_iters,
        checkpoint=checkpoint,
        checkpoint_every=checkpoint_every,
        resume=resume,
    )
