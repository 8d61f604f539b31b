"""Graph coloring — Jones–Plassmann–Luby independent sets (reference A9,
[ref: include/gunrock/algorithms/color.hxx — UNVERIFIED]; SURVEY.md §2.3
A9: "iterative join + max-hash filter").

Each round, every uncolored vertex with a hash-priority strictly greater
than all of its uncolored neighbors joins the round's independent set and
takes the round number as its color.  Priorities are a seeded xxhash64 of
the vertex id — deterministic across runs/partitionings, so the coloring
is replay-stable (ties broken by vid, which the strict > on (hash, vid)
pairs makes impossible anyway).

Guarantees: adjacent vertices never share a color (each color class is an
independent set by construction); every vertex is colored in ≤ Δ+1 rounds
whp (expected O(log V) rounds).  The palette is not minimal — same as the
reference's JPL.

State ``(vid, color)`` with color NULL while uncolored; each superstep:

    u = uncolored(state)                           (filter O2)
    nbr_max = neighbor_reduce(max (hash,vid) over uncolored neighbors)
    winners = u where own (hash,vid) > nbr_max     (or no uncolored nbr)

Only uncolored vertices flow through the join; the frontier shrinks
geometrically, so late rounds are nearly free (the reference's shrinking
frontier, O9).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.superstep import IterationResult, iterate


KNUTH_K = 2654435761  # odd ⇒ v·K mod 2^32 is a bijection (injective priority)


def _priority(col: str = "vid", seed: int = 42, scheme: str = "xxhash64"):
    if scheme == "knuth32":
        # Knuth multiplicative hash, engine-portable pure arithmetic
        # (evaluable identically in Spark SQL and DuckDB — this is the
        # catalog entry's DuckDB-oracle path).  Injective, so no
        # tie-break column is needed.  Requires vid < 2^31 (the product
        # must fit a signed 64-bit int under ANSI arithmetic).
        return (F.col(col) * F.lit(KNUTH_K)) % F.lit(1 << 32)
    # default: seeded xxhash64, strictly totally ordered per vertex via
    # the (hash, vid) struct (the reference's random GPU priorities)
    return F.struct(
        F.xxhash64(F.col(col), F.lit(seed)).alias("h"),
        F.col(col).alias("v"),
    )


def color_round(
    sym: DataFrame,
    state: DataFrame,
    round_no: int,
    seed: int = 42,
    priority: str = "xxhash64",
) -> DataFrame:
    """ONE JPL round over ``(vid, color)`` state (the production round
    body :func:`jpl_coloring` iterates — exposed so the plan-regression
    tests and tools/explain_plans.py assert the shipping plan, not a
    replica).

    Gather: max priority among each vertex's UNCOLORED neighbors.  Only
    the SRC side prunes the edge scan (exchange-free semi-join against
    the persisted hash(src, P) layout); restricting the dst side happens
    after the aggregation, on the |V|-sized nbr_max — a dst-keyed
    semi-join on the edges would re-shuffle |E| (or serially broadcast a
    near-|V| uncolored set) every round.
    """
    unc = state.where(F.col("color").isNull()).select("vid")
    active_edges = sym.join(
        unc.withColumnRenamed("vid", "src").hint("merge"),
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
        unc.join(nbr_max.hint("merge"), "vid", "left")
        .where(
            F.col("nbr_max").isNull()
            | (_priority("vid", seed, priority) > F.col("nbr_max"))
        )
        .select("vid", F.lit(round_no).cast("int").alias("new_color"))
    )
    return (
        state.join(winners.hint("merge"), "vid", "left")
        .select(
            "vid",
            F.coalesce("color", "new_color").alias("color"),
            (
                F.col("color").isNull() & F.col("new_color").isNull()
            ).cast("long").alias("_uncolored"),
        )
    )


def jpl_coloring(
    graph: Graph,
    seed: int = 42,
    max_iters: int = 500,
    priority: str = "xxhash64",
) -> IterationResult:
    """Color all vertices: state ``(vid, color)``, colors in [0, rounds).

    ``priority`` picks the hash ordering: ``"xxhash64"`` (default, seeded)
    or ``"knuth32"`` (pure arithmetic — identical in any SQL engine,
    used by the DuckDB-oracled catalog entry; needs vid < 2^31)."""
    if priority == "knuth32" and graph.max_vid >= (1 << 31):
        raise ValueError(
            "knuth32 priority requires vid < 2^31 (the multiplicative "
            f"hash is only injective there; max_vid={graph.max_vid}) — "
            "use the default xxhash64 priority for larger id spaces"
        )
    sym = graph.symmetrized_edges
    init = graph.vertices.select(
        "vid", F.lit(None).cast("int").alias("color")
    )

    def step(state: DataFrame, i: int) -> DataFrame:
        return color_round(sym, state, i, seed=seed, priority=priority)

    result = iterate(
        init,
        step,
        stats_cols=[F.sum("_uncolored").alias("uncolored")],
        converged=lambda s: (s.get("uncolored") or 0) == 0,
        max_iters=max_iters,
    )
    result.state = result.state.select("vid", "color")
    return result
