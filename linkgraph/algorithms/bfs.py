"""BFS — single-source depth labels (reference A5, SURVEY.md §2.3).

Out-of-scope for the graft's four mandated primitives but shares the
advance/filter operator pair verbatim, so it ships as the canonical
demonstration of frontier-style iteration (reference EP3):

    frontier' = uniquify(advance(frontier, edges)) ∖ visited

The frontier starts tiny (one vertex) — exactly the case where Catalyst's
broadcast-join fast path mirrors the reference's small-frontier
``thread_mapped`` advance.  The visited check is a **left_anti** join
(SURVEY.md §2.5 joins row).
"""

from __future__ import annotations

from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.operators.advance import advance
from linkgraph.operators.uniquify import uniquify
from linkgraph.superstep import IterationResult, plain_checkpoint


def bfs(
    graph: Graph,
    source: int,
    directed: bool = True,
    max_iters: int = 10_000,
) -> IterationResult:
    """Depth of every reachable vertex from ``source``: ``(vid, depth)``.

    ``converged`` is True only when the frontier emptied; a loop cut off
    by ``max_iters`` returns ``converged=False`` (deeper vertices are
    missing from the state).
    """
    spark = graph.spark
    edges = graph.edges if directed else graph.symmetrized_edges
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
    done = False
    while depth < max_iters:
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
        history.append({"iter": depth, "new_vertices": grew})
        state, size = new_state, new_size
        if grew == 0:
            done = True
            break
        frontier = state.where(F.col("depth") == depth).select("vid")
    return IterationResult(
        state=state, iterations=depth, converged=done, history=history
    )
