"""Maximal matching — synchronous local-max edge selection
(Israeli & Itai 1986, *A fast and simple randomized parallel algorithm
for maximal matching*; the edge-level sibling of Luby's MIS, which this
engine ships as :mod:`linkgraph.algorithms.mis`).

Reference: none — upstream essentials has no matching kernel; added as
the standard symmetric-pairing primitive (crawl-dedup pairing, 1:1
mirror assignment, graph coarsening's heavy-edge step all reduce to
it).

Each round over the ACTIVE subgraph (edges whose endpoints are both
unmatched):

    an edge wins iff its priority is the maximum among all active
    edges incident to EITHER endpoint

— winners are vertex-disjoint by construction (each endpoint certifies
the same max), so they join the matching atomically; the globally
max-priority active edge always wins, so every round matches ≥ 1 edge
while any active edge remains — termination is guaranteed, and with
well-mixed priorities the expected round count is O(log |E|).

Priorities are md5 over (a, b, seed) — the engine-portable total order
(identical hex in DuckDB) the dedup operators already rely on, so the
catalog twin replays the exact trajectory.  Maximality: the loop only
stops when no edge has two unmatched endpoints.

Scale shape per round: two left-semi prunes of the canonical edge set
against the unmatched vertex set (persisted layout, exchange-free), one
map-side-combined per-vertex max over the 2·|active| incident rows, and
one pair-keyed winner join — no step materializes a vertex's full
neighbor list, and the active set shrinks geometrically.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.superstep import IterationResult, iterate


def _edge_priority(seed: int):
    return F.md5(
        F.concat_ws(
            ":",
            F.col("a").cast("string"),
            F.col("b").cast("string"),
            F.lit(str(seed)),
        )
    )


def matching_round(
    canon: DataFrame, state: DataFrame, seed: int = 42
) -> DataFrame:
    """ONE local-max round over ``(vid, mate)`` state (NULL = unmatched).
    Exposed so plan tests assert the shipping round body."""
    un = state.where(F.col("mate").isNull()).select("vid")
    active = canon.join(
        un.withColumnRenamed("vid", "a").hint("merge"), "a", "left_semi"
    ).join(un.withColumnRenamed("vid", "b").hint("merge"), "b", "left_semi")
    pe = active.select("a", "b", _edge_priority(seed).alias("p"))
    inc = pe.select(F.col("a").alias("vid"), "p").unionAll(
        pe.select(F.col("b").alias("vid"), "p")
    )
    vmax = inc.groupBy("vid").agg(F.max("p").alias("vp"))
    winners = (
        pe.join(
            vmax.select(F.col("vid").alias("a"), F.col("vp").alias("_pa")),
            "a",
        )
        .join(
            vmax.select(F.col("vid").alias("b"), F.col("vp").alias("_pb")),
            "b",
        )
        .where((F.col("p") == F.col("_pa")) & (F.col("p") == F.col("_pb")))
        .select("a", "b")
    )
    mates = winners.select(
        F.col("a").alias("vid"), F.col("b").alias("_nm")
    ).unionAll(winners.select(F.col("b").alias("vid"), F.col("a").alias("_nm")))
    act = vmax.select("vid", F.lit(True).alias("_act"))
    return (
        state.join(mates.hint("merge"), "vid", "left")
        .join(act.hint("merge"), "vid", "left")
        .select(
            "vid",
            F.coalesce("mate", "_nm").alias("mate"),
            (
                F.col("_act").isNotNull()
                & F.col("mate").isNull()
                & F.col("_nm").isNull()
            )
            .cast("long")
            .alias("_active"),
        )
    )


def maximal_matching(
    graph: Graph, seed: int = 42, max_iters: int = 100
) -> IterationResult:
    """Maximal matching over the undirected simple graph: final state
    ``(vid, mate)`` — mate = the paired vertex, NULL for unmatched
    vertices (no edge with two unmatched endpoints remains)."""
    canon = graph.canonical_edges.select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )
    init = graph.vertices.select(
        "vid", F.lit(None).cast("long").alias("mate")
    )
    res = iterate(
        init,
        lambda s, i: matching_round(canon, s, seed=seed),
        stats_cols=[F.sum("_active").alias("active")],
        converged=lambda s: (s.get("active") or 0) == 0,
        max_iters=max_iters,
    )
    res.state = res.state.select("vid", "mate")
    return res


def matched_pairs(graph: Graph, seed: int = 42, max_iters: int = 100) -> DataFrame:
    """The matching as canonical pairs ``(a, b)`` with a < b."""
    st = maximal_matching(graph, seed=seed, max_iters=max_iters).state
    return (
        st.where(F.col("mate").isNotNull() & (F.col("vid") < F.col("mate")))
        .select(F.col("vid").alias("a"), F.col("mate").alias("b"))
    )
