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
from pyspark.storagelevel import StorageLevel

from linkgraph.graph import Graph
from linkgraph.superstep import IterationResult


def sssp(
    graph: Graph,
    source: int,
    weight_col: str | None = None,
    max_iters: int = 10_000,
) -> IterationResult:
    """Shortest distance to every reachable vertex: ``(vid, dist)``."""
    spark = graph.spark
    edges = graph.edges
    if weight_col is None:
        edges = edges.withColumn("_w", F.lit(1.0))
    else:
        edges = edges.withColumn("_w", F.col(weight_col).cast("double"))
    # Eager localCheckpoint per superstep (lineage truncation — the state
    # appears twice in each iteration's plan; see superstep.py rationale).
    state = spark.createDataFrame(
        [(int(source), 0.0)], "vid long, dist double"
    ).localCheckpoint(eager=True)
    improved = state
    history = []
    it = 0
    while it < max_iters:
        it += 1
        relaxed = (
            edges.join(
                improved.select(F.col("vid").alias("src"), "dist"), "src"
            )
            .groupBy(F.col("dst").alias("vid"))
            .agg(F.min(F.col("dist") + F.col("_w")).alias("cand"))
        )
        merged = (
            state.join(relaxed, "vid", "full_outer")
            .select(
                "vid",
                F.least(
                    F.coalesce("dist", F.lit(float("inf"))),
                    F.coalesce("cand", F.lit(float("inf"))),
                ).alias("dist"),
                (
                    F.col("dist").isNull()
                    | (F.col("cand") < F.col("dist"))
                ).alias("_improved"),
            )
            .localCheckpoint(eager=True)
        )
        n_improved = merged.where("_improved").count()
        history.append({"iter": it, "improved": n_improved})
        new_state = merged.select("vid", "dist")
        if n_improved == 0:
            state = new_state
            break
        improved = merged.where("_improved").select("vid", "dist")
        state = new_state
    return IterationResult(state=state, iterations=it, converged=True, history=history)
