"""SSSP — single-source shortest paths (reference A6, SURVEY.md §2.3).

Out-of-scope extra (shares the superstep runtime).  Distributed
Bellman-Ford: each superstep relaxes every edge from vertices whose
distance improved last round; the reference's ``atomicMin`` relax becomes
``groupBy(dst).min()`` (SURVEY.md §2.4 U2).  Frontier-restricted: only
vertices improved in the previous round send messages, so late supersteps
touch a shrinking edge subset (the advance fast path).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.superstep import (
    CheckpointManager,
    IterationResult,
    plain_checkpoint,
)


def sssp(
    graph: Graph,
    source: int,
    weight_col: str | None = None,
    max_iters: int = 10_000,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 5,
    resume: bool = True,
    init_dists: DataFrame | None = None,
    delta_edges: DataFrame | None = None,
    prev_edges: DataFrame | None = None,
    assume_append_only: bool = False,
) -> IterationResult:
    """Shortest distance to every reachable vertex: ``(vid, dist)``.

    ``converged`` is True only when a round relaxed nothing; a loop cut
    off by ``max_iters`` returns ``converged=False`` (distances may still
    be improvable).

    ``init_dists`` — warm start: a ``(vid, dist)`` table of VALID UPPER
    BOUNDS on the current graph's distances from the SAME source
    (typically the previous crawl epoch's converged distances, edges
    only ADDED / weights only decreased since — a subgraph's distances
    are ≥ the supergraph's, so they qualify).  Bellman-Ford converges to
    the true distances from any such init (same argument family as
    coreness ``init_bound``): relaxation is monotone non-increasing and
    preserves "dist(v) ≥ true(v)" (each candidate is a bound's value
    plus a real edge weight), so the fixpoint — where every vertex
    satisfies the Bellman equations with dist(source) = 0 — is the true
    distance table; the loop only pays rounds for the region the new
    edges improved.  Every seeded vertex relaxes once in round 1 (its
    bound may serve new out-edges even if the bound itself is final).
    The source is forced to 0 via least().  NOT valid after edge
    REMOVALS or weight increases (a stale bound could undercut a now-
    longer path) — rebuild cold on compaction epochs.  ENFORCED
    (linkgraph/epoch.py): warm calls must pass ``prev_edges`` (epoch
    edges, diffed; removals raise EpochRemovalError) or
    ``assume_append_only=True``.  Note the guard checks edge PRESENCE
    only — weight increases on surviving edges are still the caller's
    responsibility (weights live outside the (src, dst) key).

    ``delta_edges`` (optional, only with ``init_dists``): the
    ``(src, dst)`` edges ADDED since the epoch.  The previous state is
    a fixpoint of the old graph, so relaxing an old edge from an
    unchanged bound is a no-op — only relaxations ACROSS new edges can
    start an improvement chain.  When given, round 1 relaxes only from
    ``src(delta_edges) ∪ {source}`` instead of every seeded vertex —
    cost ∝ the increment, not the graph; later rounds ride the normal
    improved-vertex frontier.  An understated delta silently yields
    stale distances — derive it from the same log as the graph
    increment.

    ``checkpoint``/``checkpoint_every``/``resume``: durable Parquet
    epochs (manifests + metrics) in the iterate() protocol.  The FULL
    loop state is ``(vid, dist, _improved)`` — the relax frontier is the
    ``_improved`` slice — so a relaunch rehydrates from the last
    complete epoch and continues the identical trajectory.
    """
    spark = graph.spark
    edges = graph.edges
    if weight_col is None:
        edges = edges.withColumn("_w", F.lit(1.0))
    else:
        edges = edges.withColumn("_w", F.col(weight_col).cast("double"))
    # Eager checkpoint leaf per superstep: the state appears twice in each
    # iteration's plan (gather + full_outer merge), so without lineage
    # truncation the plan grows per round AND the merge join would square
    # the preserved sizeInBytes estimate per iteration — past ~25 rounds
    # the driver stalls in million-digit BigInteger multiplies
    # (plain_checkpoint strips it and frees the replaced generation).
    if delta_edges is not None and init_dists is None:
        raise ValueError("delta_edges requires init_dists (a warm start)")
    if init_dists is not None:
        # the NOT-valid-after-removals docstring clause, enforced:
        # epoch evidence (prev_edges, diffed) or an explicit assertion
        from linkgraph.epoch import require_warm_evidence

        require_warm_evidence(
            "init_dists",
            graph.edges,
            prev_edges,
            assume_append_only,
            "sssp warm start",
        )
    src_df = spark.createDataFrame(
        [(int(source), 0.0)], "vid long, dist double"
    )
    if init_dists is None:
        leaf = plain_checkpoint(src_df)
    else:
        leaf = plain_checkpoint(
            init_dists.select(
                "vid", F.col("dist").cast("double").alias("dist")
            )
            .unionAll(src_df)
            .groupBy("vid")
            .agg(F.min("dist").alias("dist"))
            .repartition(graph.num_partitions, "vid")
        )
    state = leaf
    improved = leaf
    if delta_edges is not None:
        # fixpoint-of-the-old-graph argument (docstring): round 1 only
        # needs relaxations across NEW edges, so restrict the initial
        # frontier to the delta's source endpoints (+ the source row)
        dsrc = (
            delta_edges.select(F.col("src").alias("vid"))
            .unionAll(src_df.select("vid"))
            .distinct()
        )
        improved = leaf.join(dsrc.hint("merge"), "vid", "left_semi")
    history = []
    it = 0
    done = False
    if checkpoint is not None and resume:
        got = checkpoint.latest()
        if got is not None:
            it, saved, stats = got
            leaf = plain_checkpoint(saved, replaces=leaf)
            state = leaf.select("vid", "dist")
            improved = leaf.where("_improved").select("vid", "dist")
            n_prev = stats.get("improved") if stats else None
            if n_prev is None:
                n_prev = improved.count()
            if n_prev == 0:
                # converged-resume no-op (iterate() protocol): rerunning
                # the relax over an empty frontier would append a
                # spurious epoch + metrics row per invocation
                return IterationResult(
                    state=state, iterations=it, converged=True, history=[],
                )
            # truncate only when relax rounds WILL re-run (a converged
            # no-op resume must leave metrics.jsonl untouched)
            checkpoint.truncate_metrics(it)
    while it < max_iters:
        it += 1
        relaxed = (
            edges.join(
                improved.select(F.col("vid").alias("src"), "dist"), "src"
            )
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.min(F.col("dist") + F.col("_w")).alias("cand"))
        )
        leaf = plain_checkpoint(
            state.join(relaxed, "vid", "full_outer").select(
                "vid",
                F.least(
                    F.coalesce("dist", F.lit(float("inf"))),
                    F.coalesce("cand", F.lit(float("inf"))),
                ).alias("dist"),
                (
                    F.col("dist").isNull()
                    | (F.col("cand") < F.col("dist"))
                ).alias("_improved"),
            ),
            replaces=leaf,
        )
        n_improved = leaf.where("_improved").count()
        history.append({"iter": it, "improved": n_improved})
        state = leaf.select("vid", "dist")
        if n_improved == 0:
            done = True
        if checkpoint is not None:
            checkpoint.append_metrics({"iter": it, "improved": n_improved})
            if it % checkpoint_every == 0 or done or it >= max_iters:
                # max_iters cutoff is a resume point (iterate() protocol)
                checkpoint.write(leaf, it, {"improved": n_improved})
        if done:
            break
        improved = leaf.where("_improved").select("vid", "dist")
    return IterationResult(state=state, iterations=it, converged=done, history=history)


def delta_stepping(
    graph: Graph,
    source: int,
    delta: float = 10.0,
    weight_col: str | None = None,
    max_buckets: int = 10_000,
    max_light_rounds: int = 10_000,
) -> IterationResult:
    """SSSP by Δ-stepping (Meyer & Sanders, *Δ-stepping: a parallelizable
    shortest path algorithm*, J. Algorithms 2003) — the bucketed relax
    the reference's sssp.hxx implements on GPU [ref:
    include/gunrock/algorithms/sssp.hxx — UNVERIFIED; SURVEY.md §2.3 A6
    "delta-ish advance+filter"]: ``(vid, dist)``, EXACT (equal to
    :func:`sssp` at convergence — differential-tested).

    Why a second SSSP: Bellman-Ford's frontier re-relaxes a vertex once
    per distance improvement — on weighted web graphs a vertex's
    tentative distance can improve many times, each re-expanding its
    out-edges.  Δ-stepping settles vertices bucket by bucket
    ([iΔ, (i+1)Δ)): LIGHT edges (w ≤ Δ) relax to fixpoint INSIDE the
    bucket (they cannot re-open an earlier bucket), HEAVY edges (w > Δ)
    relax ONCE per bucket member — each heavy edge is traversed at most
    once per endpoint settlement, the work bound Bellman-Ford lacks.

    Physical shape: the light/heavy edge split is computed once and
    both sides stay on the persisted hash(src) layout; every relax
    round is the engine's standard exchange-keyed gather + min-reduce +
    full-outer merge on checkpoint leaves.  Driver-side control: one
    1-row aggregate per bucket (the next bucket index) plus the light
    fixpoint's convergence probes — job count O(#buckets + Σ light
    rounds), each touching only frontier-adjacent edges.
    """
    spark = graph.spark
    edges = graph.edges
    if weight_col is None:
        edges = edges.withColumn("_w", F.lit(1.0))
    else:
        edges = edges.withColumn("_w", F.col(weight_col).cast("double"))
    light = edges.where(F.col("_w") <= delta)
    heavy = edges.where(F.col("_w") > delta)

    state = plain_checkpoint(
        spark.createDataFrame([(int(source), 0.0)], "vid long, dist double")
    )
    rounds = 0

    def _relax(frontier, edge_side, st):
        cand = (
            edge_side.join(
                frontier.select(F.col("vid").alias("src"), "dist"), "src"
            )
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.min(F.col("dist") + F.col("_w")).alias("cand"))
        )
        merged = st.join(cand, "vid", "full_outer").select(
            "vid",
            F.least(
                F.coalesce("dist", F.lit(float("inf"))),
                F.coalesce("cand", F.lit(float("inf"))),
            ).alias("dist"),
            (
                F.col("cand").isNotNull()
                & (F.col("dist").isNull() | (F.col("cand") < F.col("dist")))
            ).alias("_improved"),
        )
        return merged

    history = []
    processed_below = 0.0
    buckets_done = 0
    settled_all = False
    while buckets_done < max_buckets:
        nxt_row = (
            state.where(F.col("dist") >= processed_below)
            .agg(F.min("dist").alias("m"))
            .collect()[0]
        )
        if nxt_row.m is None:
            settled_all = True
            break
        i = int(nxt_row.m // delta)
        lo_b, hi_b = i * delta, (i + 1) * delta
        # light-edge fixpoint inside bucket i
        frontier = state.where(
            (F.col("dist") >= lo_b) & (F.col("dist") < hi_b)
        )
        for _ in range(max_light_rounds):
            rounds += 1
            merged = _relax(frontier, light, state)
            state = plain_checkpoint(merged, replaces=state)
            frontier = state.where(
                F.col("_improved") & (F.col("dist") < hi_b)
            ).select("vid", "dist")
            if frontier.isEmpty():
                break
        # heavy relax ONCE from the bucket's settled members
        members = state.where(
            (F.col("dist") >= lo_b) & (F.col("dist") < hi_b)
        ).select("vid", "dist")
        rounds += 1
        state = plain_checkpoint(
            _relax(members, heavy, state), replaces=state
        )
        processed_below = hi_b
        buckets_done += 1
        history.append({"bucket": i, "rounds": rounds})
    if not settled_all and buckets_done >= max_buckets:
        # the bucket cap may have landed exactly on the last needed
        # bucket — probe once more so a fully-settled run reports
        # converged=True regardless of where the cap fell
        m = (
            state.where(F.col("dist") >= processed_below)
            .agg(F.min("dist").alias("m"))
            .collect()[0]
            .m
        )
        settled_all = m is None
    return IterationResult(
        state=state.select("vid", "dist"),
        iterations=rounds,
        converged=settled_all,
        history=history,
    )
