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

- the gather join reuses the graph's persisted HashPartitioning(src, P)
  AND the superstep runtime's co-partitioned state (hash(vid, P)), so it
  is exchange-free — the one real shuffle per superstep is the
  reduce-by-dst of map-side-combined partials;
- hub-page skew (10^8 in-links) is absorbed by partial aggregation (each
  hub receives ≤1 row per map partition); ``salted=True`` switches to the
  explicit two-phase salted reduce (operators/neighbor_reduce.py), needed
  only for non-decomposable aggregations;
- strategy="spmv" replaces join+agg with the per-partition CSR
  gather-scatter pandas UDF (linkgraph/csr.py) — one Arrow pass per
  superstep emitting pre-combined (dst, partial) rows.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.operators.neighbor_reduce import neighbor_reduce
from linkgraph.superstep import CheckpointManager, IterationResult, iterate


def pagerank_round(
    graph: Graph,
    state: DataFrame,
    alpha: float,
    n: int,
    dangling: float,
    salted: bool = False,
    salt_buckets: int = 32,
    strategy: str = "join",
    weight_col: str | None = None,
) -> DataFrame:
    """ONE power-iteration superstep over ``(vid, rank, outdeg)`` state.

    This is the production round body :func:`pagerank` iterates — exposed
    so the plan-regression tests (tests/test_plans.py) and the evidence
    tool (tools/explain_plans.py) assert the physical plan of the code
    that actually ships, not a hand-kept replica that could drift.

    ``weight_col`` names an edge-weight column on ``graph.edges`` (e.g.
    the host graph's link count): the walk follows edge u→v with
    probability w(u,v)/Σ_out w(u), so ``outdeg`` in the state is the
    weighted out-STRENGTH and the gathered message is contrib·w — the
    same exchange-free gather + map-side-combined reduce, with the
    multiply folded into the message expression (zero extra stages).
    """
    contrib = state.where(F.col("outdeg").isNotNull()).select(
        "vid", (F.col("rank") / F.col("outdeg")).alias("contrib")
    )
    if strategy == "spmv":
        from linkgraph.csr import spmv_contrib_sums

        sums = spmv_contrib_sums(graph, contrib)
    else:
        msg = (
            F.col("contrib")
            if weight_col is None
            else F.col("contrib") * F.col(weight_col)
        )
        sums = neighbor_reduce(
            graph.edges,
            contrib,
            msg,
            op="sum",
            out="msum",
            salted=salted,
            salt_buckets=salt_buckets,
        )
    new_rank = F.lit((1.0 - alpha) / n) + alpha * (
        F.coalesce(F.col("msum"), F.lit(0.0)) + F.lit(dangling / n)
    )
    return state.join(sums.hint("merge"), "vid", "left").select(
        "vid",
        new_rank.alias("rank"),
        "outdeg",
        F.abs(new_rank - F.col("rank")).alias("_delta"),
    )


def pagerank(
    graph: Graph,
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iters: int = 100,
    salted: bool = False,
    salt_buckets: int = 32,
    strategy: str = "join",
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 5,
    resume: bool = True,
    init_ranks: DataFrame | None = None,
    weight_col: str | None = None,
) -> IterationResult:
    """Run PageRank to convergence; result state is ``(vid, rank)``, Σ=1.

    ``init_ranks`` — warm start: a ``(vid, rank)`` table (typically the
    PREVIOUS crawl epoch's converged state) seeds the iteration instead
    of the uniform vector.  Vertices absent from it (new pages) start at
    the uniform prior 1/n; the seeded vector is renormalized to Σ=1 so
    the probability-form invariant holds from iteration 0.  Power
    iteration converges to the same unique fixpoint from any
    non-degenerate start (α < 1 ⇒ the damped operator is a contraction),
    so a warm start changes ONLY the iteration count — fewer iterations
    the closer the previous epoch's graph is to the current one
    (tests/test_streaming.py pins warm < cold on an incremented crawl).

    ``weight_col`` — weighted random walk (see :func:`pagerank_round`):
    ``outdeg`` becomes the out-STRENGTH Σ w per source (so dangling =
    zero/absent out-strength, handled identically), join strategy only.
    """
    if weight_col is not None and strategy == "spmv":
        raise ValueError("weight_col requires strategy='join'")
    n = graph.num_vertices
    if n == 0:
        empty = graph.spark.createDataFrame([], "vid long, rank double")
        return IterationResult(state=empty, iterations=0, converged=True)
    # State permanently carries outdeg (null for dangling vertices): the
    # degree table is joined ONCE at init, not per superstep — the
    # reference likewise keeps degrees resident next to ranks in problem_t.
    if weight_col is None:
        degrees = graph.out_degrees
    else:
        degrees = graph.edges.groupBy(F.col("src").alias("vid")).agg(
            F.sum(F.col(weight_col).cast("double")).alias("outdeg")
        )
    if init_ranks is not None:
        seeded = graph.vertices.join(
            init_ranks.select("vid", F.col("rank").alias("_r0")), "vid", "left"
        ).select(
            "vid", F.coalesce("_r0", F.lit(1.0 / n)).alias("rank")
        )
        total = float(
            seeded.agg(F.sum("rank").alias("t")).collect()[0]["t"]
        )
        if total <= 0:
            raise ValueError("init_ranks must have positive total mass")
        init = seeded.select(
            "vid", (F.col("rank") / F.lit(total)).alias("rank")
        ).join(degrees, "vid", "left")
    else:
        init = graph.vertices.select(
            "vid", F.lit(1.0 / n).alias("rank")
        ).join(degrees, "vid", "left")

    if strategy == "spmv":
        from linkgraph.csr import spmv_contrib_sums
    elif strategy != "join":
        raise ValueError(f"unknown strategy: {strategy!r}")

    # Dangling mass is a driver-side scalar: iteration i needs
    # Σ rank over outdeg-null vertices of state_i, which the PREVIOUS
    # iteration's stats action already computed (one action/iter total —
    # the reference's device→host readback, SURVEY.md §4.9).  None ⇒
    # compute lazily from the current state (first iteration / resume).
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
        return pagerank_round(
            graph,
            state,
            alpha=alpha,
            n=n,
            dangling=dangling_cell[0],
            salted=salted,
            salt_buckets=salt_buckets,
            strategy=strategy,
            weight_col=weight_col,
        )

    # Observed during the superstep job itself (superstep.py: stats_cols)
    # — the delta readback and next iteration's dangling mass cost no
    # extra job.
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
    result.state = result.state.select("vid", "rank")
    return result
