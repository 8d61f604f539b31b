"""Maximal independent set — Luby's classic randomized-priority rounds
(Luby 1986, *A Simple Parallel Algorithm for the Maximal Independent Set
Problem*; the same independent-set machinery the JPL coloring operator
uses, reference A9 [ref: include/gunrock/algorithms/color.hxx —
UNVERIFIED], with the MIS-specific twist that each round also REMOVES
the winners' neighbors).

Each round over the undecided vertices:

    winners  = undecided v with priority(v) > priority(u) for every
               undecided neighbor u            (an independent set)
    removed  = undecided neighbors of winners  (can never join the MIS)

Winners take the round number as their MIS label; removed vertices are
marked out; the rest stay undecided.  Terminates in expected O(log V)
rounds (each round kills a constant fraction of edges in expectation);
the result is maximal by construction — a vertex only leaves the
undecided pool by joining the MIS or by gaining an MIS neighbor.

Priorities reuse the coloring operator's injective schemes: seeded
``xxhash64`` (default) or ``knuth32`` pure arithmetic (the
DuckDB-oracled catalog path — evaluable identically in any SQL engine).

Scale shape: each round gathers over edges whose SRC is undecided —
an exchange-free left-semi prune against the persisted hash(src, P)
edge layout (same plan as the coloring round; see color_round's
docstring for why the dst side is restricted AFTER the aggregation).
The winners' neighborhood pass is a second semi-join over the same
layout keyed on the (geometrically shrinking) winner set.  Both
aggregations map-side combine; no step touches a vertex's full
neighbor list.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.algorithms.coloring import _priority
from linkgraph.graph import Graph
from linkgraph.superstep import IterationResult, iterate


def mis_round(
    sym: DataFrame,
    state: DataFrame,
    round_no: int,
    seed: int = 42,
    priority: str = "xxhash64",
) -> DataFrame:
    """ONE Luby round over ``(vid, status)`` state (NULL = undecided,
    ≥0 = joined the MIS at that round, -1 = removed).  Exposed so plan
    tests assert the shipping round body, not a replica."""
    und = state.where(F.col("status").isNull()).select("vid")
    active_edges = sym.join(
        und.withColumnRenamed("vid", "src").hint("merge"),
        "src",
        "left_semi",
    )
    nbr_max = (
        active_edges.select(
            F.col("dst").alias("vid"),
            _priority("src", seed, priority).alias("p"),
        )
        .groupBy("vid")
        .agg(F.max("p").alias("nbr_max"))
    )
    winners = (
        und.join(nbr_max.hint("merge"), "vid", "left")
        .where(
            F.col("nbr_max").isNull()
            | (_priority("vid", seed, priority) > F.col("nbr_max"))
        )
        .select("vid")
    )
    removed = (
        sym.join(
            winners.withColumnRenamed("vid", "src").hint("merge"),
            "src",
            "left_semi",
        )
        .select(F.col("dst").alias("vid"))
        .distinct()
        .withColumn("_rm", F.lit(True))
    )
    win_marked = winners.withColumn(
        "_win", F.lit(round_no).cast("int")
    )
    return (
        state.join(win_marked.hint("merge"), "vid", "left")
        .join(removed.hint("merge"), "vid", "left")
        .select(
            "vid",
            F.coalesce(
                "status",
                "_win",
                F.when(F.col("_rm"), F.lit(-1).cast("int")),
            ).alias("status"),
            (
                F.col("status").isNull()
                & F.col("_win").isNull()
                & F.col("_rm").isNull()
            ).cast("long").alias("_undecided"),
        )
    )


def luby_mis(
    graph: Graph,
    seed: int = 42,
    max_iters: int = 100,
    priority: str = "xxhash64",
) -> IterationResult:
    """Maximal independent set over the symmetrized edge set: final
    state ``(vid, status)`` with status ≥ 0 (the round the vertex
    joined the MIS) for members and -1 for non-members.

    ``priority`` as in :func:`~linkgraph.algorithms.coloring.jpl_coloring`
    (``"knuth32"`` is the catalog's engine-portable arithmetic path and
    needs vid < 2^31)."""
    if priority == "knuth32" and graph.max_vid >= (1 << 31):
        raise ValueError(
            "knuth32 priority requires vid < 2^31 (the multiplicative "
            f"hash is only injective there; max_vid={graph.max_vid}) — "
            "use the default xxhash64 priority for larger id spaces"
        )
    sym = graph.symmetrized_edges
    init = graph.vertices.select(
        "vid", F.lit(None).cast("int").alias("status")
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        return mis_round(sym, state, i, seed=seed, priority=priority)

    result = iterate(
        init,
        step,
        stats_cols=[F.sum("_undecided").alias("undecided")],
        converged=lambda s: (s.get("undecided") or 0) == 0,
        max_iters=max_iters,
    )
    result.state = result.state.select("vid", "status")
    return result
