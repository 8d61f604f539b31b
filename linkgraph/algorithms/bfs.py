"""BFS — single-source depth labels (reference A5, SURVEY.md §2.3).

Out-of-scope for the graft's four mandated primitives but shares the
advance/filter operator pair verbatim, so it ships as the canonical
demonstration of frontier-style iteration (reference EP3):

    frontier' = uniquify(advance(frontier, edges)) ∖ visited

The frontier starts tiny (one vertex) — exactly the case where Catalyst's
broadcast-join fast path mirrors the reference's small-frontier
``thread_mapped`` advance.  The visited check is a **left_anti** join
(SURVEY.md §2.5 joins row).

Direction-optimized traversal (reference: advance direction
``optimized`` + bfs.hxx push/pull switch [ref:
include/gunrock/algorithms/bfs.hxx — UNVERIFIED]; SURVEY.md §4.5):
``direction="optimized"`` switches per round between

- **push** (forward): expand the frontier's out-edges — cost ∝
  out-edges of the frontier; wins while the frontier is small;
- **pull** (backward): for each UNVISITED vertex, keep it if any
  in-neighbor is in the frontier — cost ∝ in-edges of the unvisited
  set; wins in the dense middle rounds of low-diameter web graphs,
  where the frontier covers most of the graph but the unvisited
  remainder is already small.

The pull gather runs over the persisted reversed (CSC-layout) view:
the unvisited-side semi-join streams on the hash(src) edge layout
(no |E| exchange there), then its OUTPUT — the in-edges of the
unvisited set — is re-keyed by dst for the frontier semi-join, a
shuffle whose volume is that candidate edge count (small exactly when
pull is the right mode).  The per-round choice is a Beamer-style count
heuristic: pull iff ``|frontier| ≥ pull_ratio · |unvisited|`` AND
``|frontier| ≥ |V| / beta`` — the second condition is the classic
switch-back-to-push guard: a tiny tail frontier must not pay pull's
per-round |V|+|E|-scan floor to discover a handful of vertices
(loop counts are already on the driver; only ``num_vertices`` costs
one up-front count job, cached on the Graph).  The visited set and
depth labels are IDENTICAL in every mode (both compute "has an edge
from the depth-d frontier"); the differential test pins push vs
optimized vs pull equality on the synthetic crawl.  Measured on the
10^7-edge undirected crawl (local[8], interleaved reps,
BENCH/NOTES.md): with the default beta=24 switch-back guard,
optimized 26.2/29.6 s vs push-only 31.6/30.4 s to full traversal
(pull fires in the 2 densest rounds); with the guard disabled
(beta→∞-equivalent, NOT the shipped default) pull fires in 4 rounds
and measured 25.3/22.3 s vs 41.7/29.5 s — faster on this crawl, but
the guard is kept because a tiny tail frontier must never pay pull's
per-round |V|+|E|-scan floor on deeper graphs.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.operators.advance import advance
from linkgraph.operators.uniquify import uniquify
from linkgraph.superstep import (
    CheckpointManager,
    IterationResult,
    plain_checkpoint,
)


def pull_round(graph: Graph, rev: DataFrame, state: DataFrame, frontier: DataFrame) -> DataFrame:
    """One backward (pull) BFS round: the unvisited vertices with an
    in-neighbor in the frontier.

    Returns one row per (unvisited vertex, frontier in-neighbor) edge —
    the caller uniquifies, same frontier-dedup contract as the push path.

    Extracted as the production round body so the plan test drives the
    real closure (a replica would drift): both semi-joins carry merge
    hints — the frontier/unvisited sides are |V|-scale in the pull
    regime and must never become driver-built broadcasts.
    """
    unvisited = graph.vertices.join(state.hint("merge"), "vid", "left_anti")
    cand = rev.join(
        unvisited.select(F.col("vid").alias("src")).hint("merge"),
        "src",
        "left_semi",
    )
    return (
        cand.join(
            frontier.select(F.col("vid").alias("dst")).hint("merge"),
            "dst",
            "left_semi",
        )
        .select(F.col("src").alias("vid"))
    )


def bfs(
    graph: Graph,
    source: int,
    directed: bool = True,
    max_iters: int = 10_000,
    direction: str = "forward",
    pull_ratio: float = 1.0,
    beta: float = 24.0,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 5,
    resume: bool = True,
) -> IterationResult:
    """Depth of every reachable vertex from ``source``: ``(vid, depth)``.

    ``direction``: ``"forward"`` (push-only — the default), ``"pull"``
    (backward-only, mainly for testing), or ``"optimized"`` (per-round
    push/pull switch).  All three produce identical output.

    ``converged`` is True only when the frontier emptied; a loop cut off
    by ``max_iters`` returns ``converged=False`` (deeper vertices are
    missing from the state).

    ``checkpoint``/``checkpoint_every``/``resume`` mirror the iterate()
    runtime's protocol (durable Parquet epochs + manifests + metrics):
    BFS state is fully resumable because the frontier is DERIVED from
    the depth table — ``where(depth == max_depth)`` — so a relaunch
    rehydrates both from the last complete epoch and continues the
    identical trajectory (tests/test_resume.py).
    """
    if direction not in ("forward", "pull", "optimized"):
        raise ValueError(f"unknown direction {direction!r}")
    spark = graph.spark
    edges = graph.edges if directed else graph.symmetrized_edges
    # in-edges of v, keyed by v: the reversed (CSC) view for directed
    # graphs; the symmetrized view IS its own reverse (in-neighbors ==
    # out-neighbors), already hash(src)-laid-out
    rev = graph.reversed_edges if directed else graph.symmetrized_edges
    n_vertices = graph.num_vertices if direction == "optimized" else None
    # Eager checkpoint leaf per superstep: the new state's plan contains
    # the old state three times (union + anti-join + frontier filter), so
    # without lineage truncation the plan grows 3^k — and the anti-join
    # would also square the preserved sizeInBytes estimate per level
    # (plain_checkpoint strips it and frees the replaced generation).
    state = plain_checkpoint(
        spark.createDataFrame([(int(source), 0)], "vid long, depth int")
    )
    frontier = state.select("vid")
    history = []
    depth = 0
    size = 1
    frontier_size = 1
    done = False
    if checkpoint is not None and resume:
        got = checkpoint.latest()
        if got is not None:
            depth, saved, stats = got
            state = plain_checkpoint(saved, replaces=state)
            # metadata-only restart: the epoch manifest already stores
            # the size/frontier counts — no |V|-scan jobs on relaunch
            size = stats.get("size") if stats else None
            frontier_size = stats.get("new_vertices") if stats else None
            if size is None:
                size = state.count()
            frontier = state.where(F.col("depth") == depth).select("vid")
            if frontier_size is None:
                frontier_size = frontier.count()
            if frontier_size == 0:
                # converged-resume no-op (iterate() protocol): re-running
                # would append a spurious epoch + metrics row and inflate
                # the iteration count on every repeat invocation
                return IterationResult(
                    state=state, iterations=depth, converged=True,
                    history=[],
                )
            # truncate only when levels WILL re-run (a converged no-op
            # resume must leave metrics.jsonl untouched)
            checkpoint.truncate_metrics(depth)
    while depth < max_iters:
        if direction == "forward":
            pull = False
        elif direction == "pull":
            pull = True
        else:
            unvisited_est = n_vertices - size
            pull = (
                unvisited_est > 0
                and frontier_size >= pull_ratio * unvisited_est
                and frontier_size * beta >= n_vertices
            )
        if pull:
            nxt = uniquify(pull_round(graph, rev, state, frontier))
        else:
            nxt = uniquify(
                advance(frontier, edges).select(F.col("dst").alias("vid"))
            ).join(state, "vid", "left_anti")
        depth += 1
        new_state = plain_checkpoint(
            state.unionAll(
                nxt.select("vid", F.lit(depth).cast("int").alias("depth"))
            ),
            replaces=state,
        )
        new_size = new_state.count()
        grew = new_size - size
        history.append(
            {
                "iter": depth,
                "new_vertices": grew,
                "mode": "pull" if pull else "push",
            }
        )
        state, size, frontier_size = new_state, new_size, grew
        if grew == 0:
            done = True
        if checkpoint is not None:
            checkpoint.append_metrics(
                {"iter": depth, "new_vertices": grew,
                 "mode": "pull" if pull else "push"}
            )
            if (
                depth % checkpoint_every == 0
                or done
                or depth >= max_iters
            ):
                # the max_iters cutoff is a resume point too — otherwise
                # up to checkpoint_every-1 durable rounds are re-run by
                # the follow-up invocation
                checkpoint.write(
                    state, depth, {"new_vertices": grew, "size": size}
                )
        if done:
            break
        frontier = state.where(F.col("depth") == depth).select("vid")
    return IterationResult(
        state=state, iterations=depth, converged=done, history=history
    )


def multi_source_bfs(
    graph: Graph,
    sources: DataFrame,
    directed: bool = True,
    max_iters: int = 200,
    init_depths: DataFrame | None = None,
    delta_edges: DataFrame | None = None,
    prev_edges: DataFrame | None = None,
    assume_append_only: bool = False,
) -> IterationResult:
    """Depths from the NEAREST of many sources in one traversal:
    state ``(vid, depth)`` with depth = min over sources of hop
    distance; unreachable vertices keep NULL.

    ``sources`` is a DataFrame with a ``vid`` column (arbitrary size —
    a frontier seed set, every component root, a list of seed hosts).
    All sources start at depth 0 in the SAME fixpoint, so the cost is
    one BFS over the graph regardless of |sources| — the primitive
    behind :func:`linkgraph.algorithms.graphstats.bipartite_components`
    layering and the standard "distance to nearest seed" feature
    (spam distance, crawl-depth-from-seeds).

    ``init_depths`` — warm start: a ``(vid, depth)`` table of VALID
    UPPER BOUNDS on the current graph's nearest-source hop distances
    (a previous epoch's converged depths from the SAME source set,
    edges only ADDED since — a subgraph's depths are ≥ the
    supergraph's).  This round body is min-relaxation (unit-weight
    Bellman-Ford), so — unlike :func:`bfs`'s union-grow settled set,
    which can never LOWER a stale label — the warm run reaches exactly
    the cold fixpoint (same argument as :func:`~linkgraph.algorithms.
    sssp.sssp` ``init_dists``: relaxation is monotone non-increasing
    and preserves depth(v) ≥ true(v)).  Every finite-depth seeded
    vertex re-pushes once in round 1 — its label may serve edges added
    since the epoch even when the label itself is final — so round 1
    costs one gather over the settled region, after which the frontier
    shrinks to the regions the new edges actually improved.  Vertices
    absent from ``init_depths`` (new urls) seed NULL; sources are
    forced to 0.  NOT valid after edge removals — rebuild cold.
    ENFORCED (linkgraph/epoch.py): warm calls must pass ``prev_edges``
    (epoch edges, diffed; removals raise EpochRemovalError) or
    ``assume_append_only=True``.

    ``delta_edges`` (optional, only with ``init_depths``): the
    ``(src, dst)`` edges ADDED since the epoch that produced the init.
    The previous state is a fixpoint of the OLD graph, so relaxing an
    old edge from an unchanged label is a no-op — the only round-1
    messages that can improve anything flow across NEW edges.  When
    the caller knows the delta, round 1's frontier shrinks from the
    whole settled set to ``src(delta_edges) ∪ sources`` — cost ∝ the
    epoch increment instead of ∝ the graph (measured at 10⁷ edges:
    the full re-push round is the dominant warm cost).  Improvement
    chains beyond one hop are carried by the normal changed-vertex
    frontier.  Passing a delta that UNDERSTATES the added edges breaks
    the fixpoint argument and silently yields stale depths — derive it
    from the same log the graph increment came from.

    Each round is the engine's delta-frontier min-propagation superstep
    (exchange-free gather over the persisted layout, map-side-combined
    min) — identical physics to single-source :func:`bfs`, which it
    reproduces exactly when ``sources`` has one row (pinned by test).
    """
    from linkgraph.superstep import changed_stats, iterate

    if delta_edges is not None and init_depths is None:
        raise ValueError("delta_edges requires init_depths (a warm start)")
    if init_depths is not None:
        # the NOT-valid-after-removals docstring clause, enforced:
        # epoch evidence (prev_edges, diffed) or an explicit assertion
        from linkgraph.epoch import require_warm_evidence

        require_warm_evidence(
            "init_depths",
            graph.edges,
            prev_edges,
            assume_append_only,
            "multi_source_bfs warm start",
        )
    edges = graph.edges if directed else graph.symmetrized_edges
    seeds = sources.select(F.col("vid")).distinct()
    if init_depths is None:
        init = graph.vertices.join(
            seeds.withColumn("_s", F.lit(True)), "vid", "left"
        ).select(
            "vid",
            F.when(F.col("_s"), F.lit(0).cast("long")).alias("depth"),
            F.coalesce("_s", F.lit(False)).alias("_changed"),
        )
    else:
        prev = init_depths.select(
            "vid", F.col("depth").cast("long").alias("_prev")
        )
        depth0 = F.when(F.col("_s"), F.lit(0).cast("long")).otherwise(
            F.col("_prev")
        )
        base = graph.vertices.join(
            seeds.withColumn("_s", F.lit(True)), "vid", "left"
        ).join(prev.hint("merge"), "vid", "left")
        if delta_edges is None:
            # round-1 frontier = every finite-depth row (see above)
            changed0 = depth0.isNotNull()
        else:
            dv = delta_edges.select(F.col("src").alias("vid"))
            if not directed:
                # an undirected added edge can improve either endpoint
                dv = dv.unionAll(
                    delta_edges.select(F.col("dst").alias("vid"))
                )
            dsrc = dv.distinct().withColumn("_d", F.lit(True))
            base = base.join(dsrc.hint("merge"), "vid", "left")
            changed0 = depth0.isNotNull() & (
                F.coalesce("_s", F.lit(False))
                | F.coalesce("_d", F.lit(False))
            )
        init = base.select(
            "vid", depth0.alias("depth"), changed0.alias("_changed")
        )

    def _round(state: DataFrame, i: int) -> DataFrame:
        frontier = state.where(F.col("_changed")).select(
            F.col("vid").alias("src"), "depth"
        )
        cand = (
            edges.join(frontier, "src")
            .groupBy(F.col("dst").alias("vid"))
            .agg((F.min("depth") + F.lit(1)).cast("long").alias("_cand"))
        )
        improved = F.col("_cand").isNotNull() & (
            F.col("depth").isNull() | (F.col("_cand") < F.col("depth"))
        )
        return state.join(cand, "vid", "left").select(
            "vid",
            F.when(improved, F.col("_cand")).otherwise(F.col("depth")).alias(
                "depth"
            ),
            improved.alias("_changed"),
        )

    res = iterate(
        init,
        _round,
        stats_cols=changed_stats(),
        converged=lambda s: (s.get("changed") or 0) == 0,
        max_iters=max_iters,
    )
    return IterationResult(
        state=res.state.select("vid", "depth"),
        iterations=res.iterations,
        converged=res.converged,
        history=res.history,
    )


def landmark_bfs(
    graph: Graph,
    landmarks: Sequence[int],
    directed: bool = False,
    max_iters: int = 200,
) -> DataFrame:
    """Landmark distance index: exact hop distances from every landmark
    → ``(landmark, vid, depth)`` rows, one per (landmark, reached
    vertex).

    The standard web-scale shortest-path ESTIMATOR substrate (landmark /
    sketch-based distance oracles, cf. Potamias et al. CIKM'09 — public
    method): pick k well-spread landmarks, store d(l, ·) for each, and
    answer d(u, v) queries with the triangle-inequality upper bound
    ``min_l d(u,l) + d(l,v)`` (:func:`estimate_distance_upper`) — the
    only way to serve point-to-point distance queries on a 10⁹-vertex
    crawl without a per-query traversal.

    All k landmarks run in ONE root-keyed frontier fixpoint (state is
    (landmark, vid)-keyed, the bc_batched pattern): job count = graph
    eccentricity, independent of k; per-round work ∝ Σ_l |frontier_l|.
    Undirected by default (distance estimation wants the symmetric
    metric; ``directed=True`` gives forward distances).

    Each round is one hash-layout join of the frontier against the
    persisted edge view + an anti-join against the settled set — the
    same physics as :func:`bfs`, which this reproduces exactly for a
    single landmark (pinned by test).
    """
    from linkgraph.superstep import plain_checkpoint

    if not landmarks:
        raise ValueError("landmark_bfs requires ≥1 landmark")
    edges = graph.edges if directed else graph.symmetrized_edges
    spark = graph.spark
    settled = plain_checkpoint(
        spark.createDataFrame(
            [(int(l), int(l), 0) for l in dict.fromkeys(landmarks)],
            "landmark long, vid long, depth long",
        )
    )
    frontier = settled
    depth = 0
    done = False
    for _ in range(max_iters):
        cand = (
            edges.join(
                frontier.select(
                    "landmark", F.col("vid").alias("src")
                ).hint("merge"),
                "src",
            )
            .select("landmark", F.col("dst").alias("vid"))
            .dropDuplicates(["landmark", "vid"])
        )
        nxt = plain_checkpoint(
            cand.join(
                settled.select("landmark", "vid"),
                ["landmark", "vid"],
                "left_anti",
            ).select(
                "landmark", "vid", F.lit(depth + 1).cast("long").alias("depth")
            ),
            replaces=frontier if frontier is not settled else None,
        )
        if nxt.isEmpty():
            done = True
            break
        settled = plain_checkpoint(settled.unionAll(nxt), replaces=settled)
        frontier = nxt
        depth += 1
    if not done:
        # a truncated index is indistinguishable from a converged one
        # downstream (estimate_distance_upper reads missing rows as
        # "unreachable"), so refuse to return it silently
        raise RuntimeError(
            f"landmark_bfs did not settle within max_iters={max_iters} "
            f"(graph eccentricity exceeds the cap); raise max_iters"
        )
    return settled


def estimate_distance_upper(
    index: DataFrame, pairs: DataFrame
) -> DataFrame:
    """Triangle-inequality upper bound from a :func:`landmark_bfs`
    index (symmetric metric — build the index undirected):
    ``(a, b) → (a, b, dist_ub)`` with
    ``dist_ub = min_l depth(l,a) + depth(l,b)``; pairs with no common
    reachable landmark get NULL (different components, as far as the
    index can see).

    Two broadcast-or-hash joins of the (small) query pair set against
    the index + one min-agg — no traversal at query time.
    """
    da = index.select(
        "landmark", F.col("vid").alias("a"), F.col("depth").alias("_da")
    )
    db = index.select(
        "landmark", F.col("vid").alias("b"), F.col("depth").alias("_db")
    )
    return (
        pairs.join(da, "a", "left")
        .join(db, ["landmark", "b"], "left")
        .groupBy("a", "b")
        .agg(F.min(F.col("_da") + F.col("_db")).alias("dist_ub"))
    )
