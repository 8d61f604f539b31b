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
    init_ranks: DataFrame | None = None,
) -> IterationResult:
    """PPR from ``seeds``; result state is ``(vid, rank)`` with Σrank = 1.

    ``init_ranks`` — warm start: a ``(vid, rank)`` table, typically the
    previous crawl epoch's converged PPR for the same seed set.  The
    iteration map is affine with linear part α·(stochastic matrix) — an
    L1 contraction with factor α — so the fixpoint is unique and ANY
    init converges to it; a near-fixpoint init just converges in fewer
    iterations (the same argument as ``pagerank(init_ranks=...)``).
    Vertices absent from ``init_ranks`` (new urls) seed at the cold
    teleport value.
    """
    seeds = sorted({int(s) for s in seeds})
    if not seeds:
        raise ValueError("personalized_pagerank requires a non-empty seed set")
    t_seed = 1.0 / len(seeds)  # teleport mass per seed vertex

    teleport = F.when(F.col("vid").isin(seeds), F.lit(t_seed)).otherwise(F.lit(0.0))
    init_rank = teleport
    verts = graph.vertices
    if init_ranks is not None:
        verts = verts.join(
            init_ranks.select(
                "vid", F.col("rank").alias("_prev_rank")
            ).hint("merge"),
            "vid",
            "left",
        )
        init_rank = F.coalesce(F.col("_prev_rank"), teleport)
    init = verts.select(
        "vid", init_rank.alias("rank")
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


def ppr_push(
    graph: Graph,
    source: int,
    alpha: float = 0.15,
    eps: float = 1e-4,
    rounds: int | None = None,
    max_rounds: int = 200,
) -> DataFrame:
    """Approximate single-source PPR by synchronous forward push
    (Andersen, Chung & Lang, *Local graph partitioning using PageRank
    vectors*, FOCS 2006 — the batch-synchronous variant): returns the
    sparse ``(vid, p, r)`` state (settled mass / residual) over TOUCHED
    vertices only.

    Why a second PPR: power iteration (:func:`personalized_pagerank`)
    touches all |V| rows every superstep; push's per-round work is
    proportional to the RESIDUAL MASS MOVED — for a single source on a
    10⁹-vertex crawl the touched set is the source's neighborhood
    (thousands of rows), making point queries ~|V|/|touched| cheaper.
    This is the work-efficient local algorithm behind "related pages"
    and seed-expansion community detection at web scale.

    Semantics (α here = teleport probability, matching the paper's
    lazy-free form): init r(s)=1, p=0; each round EVERY vertex with
    ``r(v) > eps·max(outdeg(v),1)`` pushes simultaneously::

        p(v) += α·r(v)
        r(u) += (1−α)·r(v)/outdeg(v)   for each v→u
        r(s) += (1−α)·r(v)             if outdeg(v)=0 (dangling: restart)
        r(v)  = 0 (then receives pushes from other frontier vertices)

    Invariant Σ(p+r) = 1 every round (mass conservation — pinned by
    test).  At convergence (empty frontier) ``|ppr(v) − p(v)| ≤
    eps·outdeg(v)`` (the paper's residual bound; differential-tested
    against the power-iteration twin at small eps).  ``rounds`` pins a
    deterministic partial run (the catalog's unrollable form);
    otherwise runs to frontier exhaustion or ``max_rounds``.

    Physical shape per round: frontier filter (no shuffle) → one
    edge-gather join keyed on the persisted hash(src) layout → one
    map-side-combined sum by dst → full-outer merge with the sparse
    state + a 1-row dangling aggregate broadcast back.  State size =
    |touched|, NOT |V| — the whole point.
    """
    from linkgraph.superstep import plain_checkpoint

    spark = graph.spark
    src = int(source)
    state = plain_checkpoint(
        spark.createDataFrame(
            [(src, 0.0, 1.0)], "vid long, p double, r double"
        ).join(graph.out_degrees, "vid", "left")
    )
    n_rounds = rounds if rounds is not None else max_rounds
    for i in range(n_rounds):
        thresh = F.lit(eps) * F.greatest(
            F.coalesce(F.col("outdeg"), F.lit(0)), F.lit(1)
        ).cast("double")
        # the threshold compares QUANTIZED residuals (round to 12
        # decimals): float-sum order across partitions perturbs r by
        # ~1e-18, and an unquantized compare would let that noise flip
        # frontier membership — a structural divergence, unlike the
        # harmless last-ulp noise in the values themselves
        st = state.withColumn("_push", F.round(F.col("r"), 12) > thresh)
        frontier = st.where(
            F.col("_push") & F.coalesce(F.col("outdeg") > 0, F.lit(False))
        ).select(F.col("vid").alias("src"), "r", "outdeg")
        if rounds is None and st.where("_push").isEmpty():
            break
        pushes = (
            graph.edges.join(frontier.hint("merge"), "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg(
                F.sum(
                    F.lit(1.0 - alpha) * F.col("r") / F.col("outdeg")
                ).alias("_in")
            )
        )
        dang = st.where(
            F.col("_push") & (F.coalesce("outdeg", F.lit(0)) == 0)
        ).agg(F.coalesce(F.sum("r"), F.lit(0.0)).alias("_d"))
        merged = (
            st.select("vid", "p", "r", "_push")
            .join(pushes, "vid", "full_outer")
            .crossJoin(F.broadcast(dang))
            .select(
                "vid",
                (
                    F.coalesce("p", F.lit(0.0))
                    + F.when(
                        F.coalesce("_push", F.lit(False)),
                        F.lit(alpha) * F.col("r"),
                    ).otherwise(F.lit(0.0))
                ).alias("p"),
                (
                    F.when(
                        F.coalesce("_push", F.lit(False)), F.lit(0.0)
                    ).otherwise(F.coalesce("r", F.lit(0.0)))
                    + F.coalesce("_in", F.lit(0.0))
                    + F.when(
                        F.col("vid") == src,
                        F.lit(1.0 - alpha) * F.col("_d"),
                    ).otherwise(F.lit(0.0))
                ).alias("r"),
            )
        )
        state = plain_checkpoint(
            merged.join(graph.out_degrees, "vid", "left"), replaces=state
        )
    return state.select("vid", "p", "r")
