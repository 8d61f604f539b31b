"""Community label propagation (reference A3, SURVEY.md §2.3).

Fork-side primitive; semantics authoritative from BASELINE.json:6
("community label propagation"): init ``label(v) = v``; each synchronous
superstep ``label(v) = mode of neighbor labels`` over the undirected
graph, deterministic tie-break (minimum label); vertices with no
neighbors keep their label; run to fixpoint or ``max_iters``.

Determinism (SURVEY.md §7 watch list): synchronous updates + total-order
tie-break make the output replay-stable under any partitioning —
verified by the parallelism-invariance test.

Physical plan: ``groupBy(dst, label).count()`` (partial+final hash agg —
the (dst, label) composite key already spreads hub destinations across
reducers) then argmax-per-dst via ``max(struct(cnt, -label))`` — a second
hash aggregation rather than a window: a window over ``partitionBy(dst)``
would put all of a hub's rows in one task, the agg keeps partial
aggregation and AQE balancing.  (SURVEY.md §2.5 lists the window form;
the struct-max form is the skew-safe equivalent and is what we ship, with
the window form available for small graphs via ``use_window=True``.)
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.superstep import (
    CheckpointManager,
    IterationResult,
    changed_stats,
    iterate,
)


def label_propagation(
    graph: Graph,
    max_iters: int = 20,
    use_window: bool = False,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 5,
    resume: bool = True,
    init_labels: DataFrame | None = None,
) -> IterationResult:
    """Synchronous LP; result state ``(vid, label)``.

    ``init_labels`` — warm start: a ``(vid, label)`` table seeding the
    propagation (vertices absent from it seed ``label = vid``).
    **Semantics differ from the CC/coreness/PPR warm starts**: LP is not
    monotone and its fixpoints are INIT-DEPENDENT — a warm run is a
    different (equally valid) LP trajectory, NOT a shortcut to the cold
    run's labeling, and no same-fixpoint claim is made (refuted by a
    two-triangle example: seed both triangles with one label and no
    round ever splits them, while the cold run keeps them apart).  What
    warm start buys on an epoch pipeline is (a) **community-id
    stability** — previous-epoch labels persist through the new round
    rather than being renumbered from scratch, so downstream joins on
    community id survive the epoch — and (b) **fewer rounds**: a
    previous converged labeling is a synchronous fixpoint, so re-running
    it on an unchanged graph verifies in one round, and on a grown graph
    only the regions the new edges touch move (tests pin both).
    Determinism is unchanged — synchronous rounds + total-order
    tie-break replay identically under any partitioning.

    Deliberately EXEMPT from the linkgraph/epoch.py append-only guard
    that CC/coreness/SSSP/BFS warm starts enforce: those rely on
    upper-bound arguments that removals break; LP makes no same-fixpoint
    claim in the first place (above), so a removal epoch yields another
    valid trajectory, not a silently wrong answer.
    """
    sym = graph.symmetrized_edges
    if init_labels is None:
        init = graph.vertices.select("vid", F.col("vid").alias("label"))
    else:
        prev = init_labels.select(
            "vid", F.col("label").cast("long").alias("_prev")
        )
        init = graph.vertices.join(prev.hint("merge"), "vid", "left").select(
            "vid", F.coalesce("_prev", F.col("vid")).alias("label")
        )

    def step(state: DataFrame, i: int) -> DataFrame:
        # gather neighbor labels: edges(src,dst) ⋈ state on src → (dst, label)
        # merge hint: |V|-sized co-partitioned side must not be broadcast
        # (per-superstep broadcast build is serial — neighbor_reduce.py)
        gathered = sym.join(
            state.select(F.col("vid").alias("src"), "label").hint("merge"),
            "src",
        ).select("dst", "label")
        counts = gathered.groupBy("dst", "label").agg(
            F.count(F.lit(1)).alias("cnt")
        )
        if use_window:
            w = Window.partitionBy("dst").orderBy(
                F.desc("cnt"), F.asc("label")
            )
            best = (
                counts.withColumn("rn", F.row_number().over(w))
                .where(F.col("rn") == 1)
                .select(F.col("dst").alias("vid"), F.col("label").alias("new_label"))
            )
        else:
            # argmax by (cnt desc, label asc) == max of struct(cnt, -label)
            best = (
                counts.groupBy("dst")
                .agg(F.max(F.struct(F.col("cnt"), (-F.col("label")).alias("nl"))).alias("m"))
                .select(
                    F.col("dst").alias("vid"),
                    (-F.col("m.nl")).alias("new_label"),
                )
            )
        upd = F.coalesce("new_label", "label")
        return state.join(best.hint("merge"), "vid", "left").select(
            "vid",
            upd.alias("label"),
            (upd != F.col("label")).alias("_changed"),
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
    result.state = result.state.select("vid", "label")
    return result
