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
) -> IterationResult:
    """Shortest distance to every reachable vertex: ``(vid, dist)``.

    ``converged`` is True only when a round relaxed nothing; a loop cut
    off by ``max_iters`` returns ``converged=False`` (distances may still
    be improvable).

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
    leaf = plain_checkpoint(
        spark.createDataFrame([(int(source), 0.0)], "vid long, dist double")
    )
    state = leaf
    improved = leaf
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
