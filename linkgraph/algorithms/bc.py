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
        upper = state.where(F.col("depth") == d + 1).select(
            F.col("vid").alias("dst"),
            F.col("sigma").alias("_sw"),
            F.col("dep").alias("_dw"),
        )
        msgs = (
            sym.join(upper, "dst")
            .select(F.col("src").alias("vid"), "_sw", "_dw")
        )
        contrib = (
            msgs.groupBy("vid")
            # σ(v)/σ(w)·(1+δ(w)) summed over w; σ(v) factored in post-join
            .agg(F.sum((1.0 + F.col("_dw")) / F.col("_sw")).alias("_part"))
        )
        state = plain_checkpoint(
            state.join(contrib, "vid", "left").select(
                "vid",
                "depth",
                "sigma",
                F.when(
                    (F.col("depth") == d) & F.col("_part").isNotNull(),
                    F.col("sigma") * F.col("_part"),
                )
                .otherwise(F.col("dep"))
                .alias("dep"),
            ),
            replaces=state,
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
