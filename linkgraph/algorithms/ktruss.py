"""k-truss — iterative peeling of edges with triangle support < k−2.

Reference: none — upstream essentials has k-core (A11) but no truss
kernel; added as the standard edge-level cohesion companion (Cohen,
*Trusses: cohesive subgraphs for social network analysis*, NSA tech
report 2008).  The k-truss is the maximal subgraph of the undirected
simple graph in which every edge lies on ≥ k−2 triangles; it is unique,
so the fixpoint output is peel-order independent (same argument as
k-core's).

Peel shape: each round re-enumerates triangles over the SURVIVING edge
set with the degree-ordered oriented wedge join (triangles.py's kernel —
oriented out-degree bounded at O(√|E|), hub-safe), counts per-edge
support with one map-side-combined aggregation over the 3 corner edges,
and drops edges below threshold.  Support recomputation per round is the
standard distributed formulation (truss peeling is Ω(|E|^1.5) in the
worst case regardless); rounds needed = truss "onion depth", small on
web graphs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph


def _canon_ab(graph: Graph) -> DataFrame:
    """The graph's persisted canonical (src < dst) edge view under the
    (a, b) names the truss rounds use."""
    return graph.canonical_edges.select(
        F.col("src").alias("a"), F.col("dst").alias("b")
    )


def _edge_support(canon: DataFrame) -> DataFrame:
    """Per-edge triangle support over a canonical (a < b) edge set:
    returns ``(a, b, support)`` for EVERY input edge (0 if none).

    Degree-ordered orientation recomputed within the current subgraph —
    the orientation changes the join cost, never the triangle set, so
    support counts are orientation-independent (what the naive x<y<z
    DuckDB twin relies on).
    """
    deg = (
        canon.select(F.col("a").alias("v"))
        .unionAll(canon.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ed = (
        canon.join(deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da"), "a")
        .join(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db"), "b")
    )
    lo_first = (F.col("da") < F.col("db")) | (
        (F.col("da") == F.col("db")) & (F.col("a") < F.col("b"))
    )
    o = ed.select(
        F.when(lo_first, F.col("a")).otherwise(F.col("b")).alias("x"),
        F.when(lo_first, F.col("b")).otherwise(F.col("a")).alias("y"),
    )
    e1 = o.select(F.col("x").alias("u"), F.col("y").alias("v"))
    e2 = o.select(F.col("x").alias("v"), F.col("y").alias("w"))
    wedges = e1.join(e2, "v").select("u", "v", "w")
    closing = o.select(F.col("x").alias("u"), F.col("y").alias("w"))
    tris = wedges.join(closing, ["u", "w"], "left_semi")
    # one pass emits the 3 canonical corner edges per triangle
    corner_edges = tris.select(
        F.explode(
            F.array(
                F.struct(
                    F.least("u", "v").alias("a"), F.greatest("u", "v").alias("b")
                ),
                F.struct(
                    F.least("v", "w").alias("a"), F.greatest("v", "w").alias("b")
                ),
                F.struct(
                    F.least("u", "w").alias("a"), F.greatest("u", "w").alias("b")
                ),
            )
        ).alias("e")
    ).select("e.a", "e.b")
    sup = corner_edges.groupBy("a", "b").agg(F.count(F.lit(1)).alias("support"))
    return canon.join(sup, ["a", "b"], "left").select(
        "a", "b", F.coalesce("support", F.lit(0)).alias("support")
    )


def k_truss(graph: Graph, k: int, max_rounds: int = 100) -> DataFrame:
    """Edges of the k-truss with their in-truss support:
    ``(a: long, b: long, support: long)``, a < b, exact fixpoint."""
    if k < 3:
        raise ValueError("k-truss is defined for k >= 3")
    num_parts = graph.num_partitions
    canon = _canon_ab(graph)
    thr = k - 2
    for _ in range(max_rounds):
        supported = _edge_support(canon).localCheckpoint()
        survivors = supported.where(F.col("support") >= thr).select("a", "b")
        n_drop = supported.where(F.col("support") < thr).count()
        canon = survivors.repartition(num_parts, "a").localCheckpoint()
        if n_drop == 0:
            return supported.where(F.col("support") >= thr)
    raise RuntimeError(f"k-truss did not converge in {max_rounds} rounds")


def truss_peel_rounds(graph: Graph, k: int, rounds: int) -> DataFrame:
    """``rounds`` support-filter applications (deterministic partial
    peel for the SQL-oracle harness — the DuckDB twin unrolls the SAME
    count), then ONE final support recomputation over the survivors, so
    the returned ``(a, b, support)`` is self-consistent whether or not
    the peel reached fixpoint."""
    canon = _canon_ab(graph)
    thr = k - 2
    for _ in range(rounds):
        canon = (
            _edge_support(canon)
            .where(F.col("support") >= thr)
            .select("a", "b")
            .localCheckpoint()
        )
    return _edge_support(canon).select(
        "a", "b", F.col("support").cast("long").alias("support")
    )
