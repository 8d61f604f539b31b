"""Betweenness centrality — Brandes forward/backward supersteps
(reference A8, [ref: include/gunrock/algorithms/bc.hxx — UNVERIFIED];
SURVEY.md §2.3 A8: "forward BFS + backward dependency accumulation").

Single-source exact BC on the undirected (symmetrized) graph, matching
the reference's single-source enactor; ``betweenness_centrality`` sums
dependencies over a source list (exact when sources = all vertices,
Brandes-sampled approximation otherwise — the standard scale path, since
all-sources exact is Θ(V·E) and no engine runs that at 10^12 docs).

Phase 1 (forward, level-synchronous BFS): depth(v) and σ(v) = number of
shortest s→v paths::

    σ(w) at depth d+1 = Σ_{v∈frontier_d, v~w} σ(v)     (neighbor_reduce)

Phase 2 (backward, depths D-1 … 0): dependency accumulation::

    δ(v) = Σ_{w: v~w, depth(w)=depth(v)+1} σ(v)/σ(w) · (1 + δ(w))

BC(v) += δ(v) for v ≠ s.  Both phases are |V|-side joins into the
persisted symmetrized edges; per-round state is localCheckpoint-ed so the
D forward + D backward rounds keep a flat plan (SURVEY.md §4.4).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.operators.neighbor_reduce import neighbor_reduce
from linkgraph.superstep import plain_checkpoint

#: Arithmetic permutation constants for the deterministic source sample
#: (same public-knowledge multiplicative-hash family as the ANN arith
#: planes): source order = (vid·A + seed) mod P, P = 2^31 − 1 prime.
#: Pure int64 arithmetic ⇒ evaluable identically in Spark SQL and DuckDB
#: (the bc_sampled catalog oracle replays the same sample).
BC_SAMPLE_A = 1000003
BC_SAMPLE_P = 2147483647


def brandes_backward_round(
    sym: DataFrame, state: DataFrame, d: int, root_keyed: bool = False
) -> DataFrame:
    """ONE backward dependency-accumulation round (the production body —
    exposed so tests/test_plans.py asserts the physical plan of the code
    that ships, per the engine's plan-regression convention).

    Key the gather on SRC, not dst: ``sym`` is persisted hash(src, P),
    so a dst-keyed join would re-exchange the full |E| side every
    backward round; because sym is symmetric, "edges whose dst is w" ≡
    "edges whose src is w with the endpoints read swapped" — the join
    streams on the persisted layout and only the message rows shuffle
    (for the groupBy), volume ∝ in-edges of the depth-(d+1) slice.  The
    merge hint pins against Catalyst broadcasting the |V|-scale slice.

    ``root_keyed=True`` is the multi-source (bc_batched) variant: state
    and messages carry a ``root`` column and every key grows it.
    """
    kcols = ["root"] if root_keyed else []
    upper = state.where(F.col("depth") == d + 1).select(
        *kcols,
        F.col("vid").alias("src"),
        F.col("sigma").alias("_sw"),
        F.col("dep").alias("_dw"),
    )
    contrib = (
        sym.join(upper.hint("merge"), "src")
        .groupBy(*kcols, F.col("dst").alias("vid"))
        # σ(v)/σ(w)·(1+δ(w)) summed over w; σ(v) factored in post-join
        .agg(F.sum((1.0 + F.col("_dw")) / F.col("_sw")).alias("_part"))
    )
    return state.join(contrib, kcols + ["vid"], "left").select(
        *kcols,
        "vid",
        "depth",
        "sigma",
        F.when(
            (F.col("depth") == d) & F.col("_part").isNotNull(),
            F.col("sigma") * F.col("_part"),
        )
        .otherwise(F.col("dep"))
        .alias("dep"),
    )


def _brandes_single_source(graph: Graph, source: int) -> DataFrame:
    """δ-dependencies of one source: ``(vid, dep)`` (dep = 0 for s itself
    and for vertices unreachable from s)."""
    sym = graph.symmetrized_edges
    spark = graph.spark

    # ---- forward: (vid, depth, sigma) --------------------------------
    # plain_checkpoint per round: the anti-join + union shape both grows
    # the plan and squares the preserved sizeInBytes estimate per level
    # (driver-stall pathology past ~20-25 levels — superstep.py), and
    # superseded generations' blocks are freed instead of piling up.
    settled = plain_checkpoint(
        spark.createDataFrame(
            [(int(source), 0, 1.0)], "vid long, depth int, sigma double"
        )
    )
    frontier = settled
    depth = 0
    while True:
        sums = neighbor_reduce(
            sym,
            frontier.select("vid", "sigma"),
            F.col("sigma"),
            op="sum",
            out="sigma",
            salted=False,
        )
        # At depth 0 the frontier IS the settled leaf — only free a
        # frontier that is a separate (previous-level) leaf.
        nxt = plain_checkpoint(
            sums.join(settled.select("vid"), "vid", "left_anti").select(
                "vid", F.lit(depth + 1).alias("depth"), "sigma"
            ),
            replaces=frontier if frontier is not settled else None,
        )
        if nxt.isEmpty():
            break
        settled = plain_checkpoint(settled.unionAll(nxt), replaces=settled)
        frontier = nxt
        depth += 1

    # ---- backward: accumulate δ by descending depth ------------------
    # state: settled (vid, depth, sigma) + running delta
    state = plain_checkpoint(
        settled.withColumn("dep", F.lit(0.0)), replaces=settled
    )
    for d in range(depth - 1, -1, -1):
        state = plain_checkpoint(
            brandes_backward_round(sym, state, d), replaces=state
        )
    # Materialize the 2-column result and free the 4-column state leaf —
    # the returned leaf is what betweenness_centrality accumulates (and
    # frees) across sources.
    return plain_checkpoint(
        state.where(F.col("vid") != source).select("vid", "dep"),
        replaces=state,
    )


def betweenness_centrality(
    graph: Graph,
    sources: Sequence[int],
    normalize_pairs: bool = True,
) -> DataFrame:
    """Sum of Brandes dependencies over ``sources`` → ``(vid, bc)``.

    ``normalize_pairs`` halves the scores (each undirected shortest path
    is counted from both endpoints when summing over all sources) —
    matching the usual undirected-BC convention.  Vertices in no shortest
    path get bc = 0.
    """
    from linkgraph.superstep import _free_checkpoint_blocks

    total: DataFrame | None = None
    for s in sources:
        dep = _brandes_single_source(graph, int(s))
        if total is None:
            total = dep
        else:
            new_total = plain_checkpoint(
                total.unionAll(dep).groupBy("vid").agg(F.sum("dep").alias("dep")),
                replaces=total,
            )
            _free_checkpoint_blocks(dep)
            total = new_total
    if total is None:
        raise ValueError("betweenness_centrality requires ≥1 source")
    scale = 0.5 if normalize_pairs else 1.0
    return graph.vertices.join(total, "vid", "left").select(
        "vid",
        (F.lit(scale) * F.coalesce("dep", F.lit(0.0))).alias("bc"),
    )


def bc_batched(
    graph: Graph,
    sources: Sequence[int],
    normalize_pairs: bool = True,
) -> DataFrame:
    """Multi-source Brandes in ONE set of supersteps → ``(vid, bc)``.

    Same result as :func:`betweenness_centrality` (differential-tested),
    but the per-vertex state carries a ``root`` column so ALL sources'
    forward BFS levels and backward dependency rounds run in the same
    jobs: the number of Spark jobs is 2·D (D = max eccentricity over
    sources), independent of |sources| — vs 2·D·|sources| for the
    sequential loop.  At web scale this is the only way a 64-source
    Brandes sample finishes: per-job work grows with Σ_root |reach(root)|
    rows (the state is (root, vid)-keyed, so memory scales with the
    sample size — pick |sources| accordingly), but job-count — the
    driver-side serial floor — stays constant.
    """
    if not sources:
        raise ValueError("bc_batched requires ≥1 source")
    sym = graph.symmetrized_edges
    spark = graph.spark

    # ---- forward: (root, vid, depth, sigma), all roots in lockstep ----
    settled = plain_checkpoint(
        spark.createDataFrame(
            [(int(s), int(s), 0, 1.0) for s in dict.fromkeys(sources)],
            "root long, vid long, depth int, sigma double",
        )
    )
    frontier = settled
    depth = 0
    while True:
        sums = (
            sym.join(
                frontier.select(
                    "root", F.col("vid").alias("src"), "sigma"
                ).hint("merge"),
                "src",
            )
            .groupBy("root", F.col("dst").alias("vid"))
            .agg(F.sum("sigma").alias("sigma"))
        )
        nxt = plain_checkpoint(
            sums.join(
                settled.select("root", "vid"), ["root", "vid"], "left_anti"
            ).select("root", "vid", F.lit(depth + 1).alias("depth"), "sigma"),
            replaces=frontier if frontier is not settled else None,
        )
        if nxt.isEmpty():
            break
        settled = plain_checkpoint(settled.unionAll(nxt), replaces=settled)
        frontier = nxt
        depth += 1

    # ---- backward: accumulate δ per (root, vid) by descending depth ---
    state = plain_checkpoint(
        settled.withColumn("dep", F.lit(0.0)), replaces=settled
    )
    for d in range(depth - 1, -1, -1):
        state = plain_checkpoint(
            brandes_backward_round(sym, state, d, root_keyed=True),
            replaces=state,
        )
    scale = 0.5 if normalize_pairs else 1.0
    total = plain_checkpoint(
        state.where(F.col("vid") != F.col("root"))
        .groupBy("vid")
        .agg(F.sum("dep").alias("dep")),
        replaces=state,
    )
    return graph.vertices.join(total, "vid", "left").select(
        "vid",
        (F.lit(scale) * F.coalesce("dep", F.lit(0.0))).alias("bc"),
    )


def sample_sources(graph: Graph, num_sources: int, seed: int = 0) -> list[int]:
    """Deterministic pseudo-random source sample: the ``num_sources``
    vertices smallest under the TWICE-applied arithmetic permutation
    ``h(h(vid))``, ``h(x) = (x·A + seed) mod P`` (ties by vid).  Stable
    under repartitioning and parallelism, replayable in any SQL engine.
    Two rounds because one round of ``x·A mod P`` is monotonic (no
    wrap-around ⇒ no decorrelation) whenever ``vid < P/A`` ≈ 2147 —
    exactly the fixture-scale id range; after the first round values
    fill [0, P), so the second round wraps and decorrelates at every
    scale.  Max intermediate is (P−1)·A ≈ 2^51 — int64-safe in Spark
    and DuckDB alike."""
    h1 = (F.col("vid") * F.lit(BC_SAMPLE_A) + F.lit(seed)) % F.lit(
        BC_SAMPLE_P
    )
    order = (h1 * F.lit(BC_SAMPLE_A) + F.lit(seed)) % F.lit(BC_SAMPLE_P)
    rows = (
        graph.vertices.orderBy(order.asc(), F.col("vid").asc())
        .limit(num_sources)
        .collect()
    )
    return [int(r["vid"]) for r in rows]


def bc_sampled(
    graph: Graph,
    num_sources: int,
    seed: int = 0,
    scale: bool = True,
) -> DataFrame:
    """Brandes source-sampled BC estimate → ``(vid, bc)``.

    The standard estimator (Brandes & Pich 2007, public): run exact
    single-source dependency accumulation from a uniform sample of s
    sources and scale by n/s — unbiased for the exact BC, with error
    O(n/√s)·diam in the worst case and far better on power-law web
    graphs (tests pin s = n ⇒ EXACTLY the all-sources value, plus a
    relative-error bound at s < n on fixtures).  Sources come from the
    deterministic arithmetic sample (:func:`sample_sources`) so the run
    — and its DuckDB catalog oracle — is replay-stable; the batched
    runner keeps job count independent of s.
    """
    sources = sample_sources(graph, num_sources, seed=seed)
    est = bc_batched(graph, sources)
    if not scale:
        return est
    factor = graph.num_vertices / len(sources)
    return est.select("vid", (F.col("bc") * F.lit(factor)).alias("bc"))
