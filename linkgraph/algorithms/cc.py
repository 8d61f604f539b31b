"""Connected components — hash-min label propagation (reference A2).

Fork-side primitive; semantics authoritative from BASELINE.json:6
("connected components (hash-min label propagation)"; SURVEY.md §2.3 A2):
undirected CC, ``comp(v) = v`` initially, each superstep
``comp(v) = min(comp(v), min_{u∈N(v)} comp(u))`` until no change.
Output is exact: every vertex labeled with the minimum vertex id in its
component.

Superstep = neighbor_reduce(min) over the symmetrized edge set + a
least() merge — the reference's atomicMin becomes ``groupBy(dst).min()``
(SURVEY.md §2.4 U2).  Convergence: changed-count == 0, folded into the
single per-iteration stats action.

``pointer_jumping=True`` adds the standard doubling shortcut (comp(v) ←
comp(comp(v)) each superstep), reducing iterations from graph diameter to
~log(diameter) — OFF by default to match the reference's plain hash-min
iteration structure exactly (SURVEY.md §4.5); the converged labels are
identical either way (min id per component), so it is safe to enable at
scale where diameters are large.

``frontier=True`` (default) gathers only from vertices whose ``comp``
CHANGED in the previous round — the delta/frontier form of hash-min.
This is trajectory-identical to the full gather, not merely
same-fixpoint: ``comp`` is monotone non-increasing and the merge is
``least(old, min_in)``, so a silent (unchanged) neighbor u's message is
exactly the value v already merged in the round after u last changed —
re-sending it every round is a no-op.  Per-round states, change counts
and the iteration count are therefore bit-identical (asserted by
tests/test_cc.py's differential test), while the shuffled message volume
shrinks with the frontier instead of staying at 2|E| every round — on a
web crawl most vertices settle in 2-3 rounds and the remaining rounds
only pay for the long-diameter tail.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.operators.neighbor_reduce import neighbor_reduce
from linkgraph.superstep import (
    CheckpointManager,
    IterationResult,
    changed_stats,
    iterate,
)


def cc_round(
    sym: DataFrame,
    state: DataFrame,
    salted: bool = False,
    frontier: bool = True,
    pointer_jumping: bool = False,
    num_partitions: int | None = None,
) -> DataFrame:
    """ONE hash-min round over ``(vid, comp, _changed)`` state (the
    production round body :func:`connected_components` iterates —
    exposed so plan tests assert the shipping plan, not a replica)."""
    src_state = state.select("vid", "comp")
    if frontier:
        # delta gather: only last round's changed vertices push their
        # comp (trajectory-identical — module docstring)
        src_state = state.where(F.col("_changed")).select("vid", "comp")
    min_in = neighbor_reduce(
        sym,
        src_state,
        F.col("comp"),
        op="min",
        out="min_in",
        salted=salted,
    )
    merged = F.least("comp", F.coalesce("min_in", F.col("comp")))
    new = state.join(min_in.hint("merge"), "vid", "left").select(
        "vid",
        merged.alias("comp"),
        (merged != F.col("comp")).alias("_changed"),
    )
    if pointer_jumping:
        if num_partitions is None:
            num_partitions = int(
                state.sparkSession.conf.get("spark.sql.shuffle.partitions")
            )
        # comp(v) ← comp(comp(v)): join the new labels against
        # themselves — a |V|-sized self-join, shrinks tall trees.
        # merge hint: Catalyst would otherwise broadcast the |V|-sized
        # parent side (per-superstep driver collect — the pathology
        # neighbor_reduce.py documents as 10× iteration cost).
        parent = new.select(
            F.col("vid").alias("comp"), F.col("comp").alias("gcomp")
        )
        jumped = F.least("comp", F.coalesce("gcomp", "comp"))
        new = (
            new.join(parent.hint("merge"), "comp", "left")
            .select(
                "vid",
                jumped.alias("comp"),
                (F.col("_changed") | (jumped != F.col("comp"))).alias(
                    "_changed"
                ),
            )
            # the self-join re-clustered the state on comp; restore
            # the canonical hash(vid, P) + sorted layout the superstep
            # runtime's checkpoint-leaf contract requires (iterate()
            # skips relayout for step outputs).  Honest cost note:
            # `new` is an UN-materialized subtree referenced twice
            # (probe side + parent projection), so beyond this |V|
            # re-key the plan recomputes the round's gather/merge a
            # second time and exchanges both self-join sides on comp —
            # roughly 3 extra |V|-scale shuffles per superstep.  That
            # is why pointer_jumping is OFF by default: it pays off
            # only on long-diameter graphs where the log(diameter)
            # round saving dominates; the default hash-min path also
            # matches the reference's per-round trajectory exactly
            .repartition(num_partitions, "vid")
            .sortWithinPartitions("vid")
        )
    return new


def connected_components(
    graph: Graph,
    max_iters: int = 200,
    salted: bool = False,
    frontier: bool = True,
    pointer_jumping: bool = False,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 10,
    resume: bool = True,
    init_labels: DataFrame | None = None,
    prev_edges: DataFrame | None = None,
    assume_append_only: bool = False,
) -> IterationResult:
    """Label each vertex with min vid of its component: state ``(vid, comp)``.

    ``init_labels`` — warm start: a ``(vid, comp)`` table (typically the
    previous crawl epoch's converged labels over a
    ``graph_from_link_log`` increment).  Hash-min is monotone
    non-increasing and a previous epoch's label ``comp(v)`` names a
    vertex connected to v in that epoch — still connected after an
    APPEND-ONLY increment (components only merge when edges are added),
    so seeding ``comp = least(prev_label, vid)`` is a valid intermediate
    state of the cold run's own trajectory: the fixpoint is identical
    and the loop only pays rounds for the regions the new edges changed
    (tests/test_streaming.py::test_incremental_cc_warm_start — strictly
    fewer rounds than cold on a grown crawl).  NOT valid if edges were
    REMOVED between epochs (a stale label could bridge split
    components) — rebuild cold on compaction/deletion epochs.
    Vertices absent from ``init_labels`` (new urls) seed ``comp = vid``.

    That precondition is ENFORCED (linkgraph/epoch.py): a warm call must
    supply ``prev_edges`` (the epoch's (src, dst) edges — diffed against
    this graph via snapshot_diff; any removal raises
    :class:`~linkgraph.epoch.EpochRemovalError`) or assert
    ``assume_append_only=True``; neither raises ``ValueError`` before
    any cluster work (tests/test_epoch_guard.py).
    """
    if init_labels is not None:
        from linkgraph.epoch import require_warm_evidence

        require_warm_evidence(
            "init_labels",
            graph.edges,
            prev_edges,
            assume_append_only,
            "connected_components warm start",
        )
    sym = graph.symmetrized_edges
    # _changed=True seeds round 1's frontier with every vertex
    if init_labels is None:
        init = graph.vertices.select(
            "vid", F.col("vid").alias("comp"), F.lit(True).alias("_changed")
        )
    else:
        prev = init_labels.select(
            "vid", F.col("comp").alias("_prev_comp")
        )
        init = (
            graph.vertices.join(prev.hint("merge"), "vid", "left")
            .select(
                "vid",
                F.least(
                    F.coalesce("_prev_comp", F.col("vid")), F.col("vid")
                ).alias("comp"),
                F.lit(True).alias("_changed"),
            )
        )

    def step(state: DataFrame, i: int) -> DataFrame:
        return cc_round(
            sym,
            state,
            salted=salted,
            frontier=frontier,
            pointer_jumping=pointer_jumping,
            num_partitions=graph.num_partitions,
        )

    result = iterate(
        init,
        step,
        stats_cols=changed_stats(),
        converged=lambda s: (s.get("changed") or 0) == 0,
        max_iters=max_iters,
        checkpoint=checkpoint,
        checkpoint_every=checkpoint_every,
        resume=resume,
    )
    result.state = result.state.select("vid", "comp")
    return result
