"""Triangle counting — exact, via oriented wedge-closure joins
(reference A4, [ref: include/gunrock/algorithms/tc.hxx — UNVERIFIED];
SURVEY.md §2.3 A4).

The reference intersects adjacency lists on the DAG orientation (u<v).
We orient each undirected edge **by (degree, vid) order** instead of plain
id order: ``u→v iff (deg(u), u) < (deg(v), v)``.  The triangle set is
identical (every triangle has exactly one cyclic-free orientation under
any total order), but degree-ordering bounds every vertex's out-degree in
the oriented graph by O(√|E|) — the standard exact trick that keeps the
wedge join from exploding on hub pages (SURVEY.md §7 watch list:
"degree-capped orientation").

Plan shape::

    oriented(a,b)  ⋈  oriented(b,c)  on b        → wedges (a,b,c)
    wedges         ⋈ₗₛ oriented on (a,c)          → closed triangles

The closure join is a **left_semi** (existence only — SURVEY.md §2.5
joins row).  Total count = triangle rows; per-vertex counts = explode the
three corners and hash-aggregate.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph


def _oriented_edges(graph: Graph) -> DataFrame:
    """Degree-ordered orientation of the undirected edge set."""
    deg = graph.degrees  # undirected degree
    e = graph.canonical_edges  # src < dst, unique undirected edges
    d1 = deg.select(F.col("vid").alias("src"), F.col("deg").alias("dsrc"))
    d2 = deg.select(F.col("vid").alias("dst"), F.col("deg").alias("ddst"))
    ed = e.join(d1, "src").join(d2, "dst")
    lo_first = (F.col("dsrc") < F.col("ddst")) | (
        (F.col("dsrc") == F.col("ddst")) & (F.col("src") < F.col("dst"))
    )
    return ed.select(
        F.when(lo_first, F.col("src")).otherwise(F.col("dst")).alias("a"),
        F.when(lo_first, F.col("dst")).otherwise(F.col("src")).alias("b"),
    )


def triangles(graph: Graph) -> DataFrame:
    """DataFrame of distinct triangles ``(a, b, c)`` (one row each)."""
    o = _oriented_edges(graph)
    e1 = o.select(F.col("a").alias("x"), F.col("b").alias("y"))
    e2 = o.select(F.col("a").alias("y"), F.col("b").alias("z"))
    wedges = e1.join(e2, "y").select("x", "y", "z")
    closing = o.select(F.col("a").alias("x"), F.col("b").alias("z"))
    return wedges.join(closing, ["x", "z"], "left_semi").select(
        F.col("x").alias("a"), F.col("y").alias("b"), F.col("z").alias("c")
    )


def triangle_count(graph: Graph) -> int:
    """Total number of distinct triangles in the undirected graph."""
    return triangles(graph).count()


def triangle_counts_per_vertex(graph: Graph) -> DataFrame:
    """``(vid, triangles)`` — number of triangles incident to each vertex.

    Vertices in no triangle are included with count 0 (exact output,
    matching the reference's per-vertex result array).
    """
    # explode the three corners in ONE pass over the triangle rows — a
    # three-branch union would re-execute the wedge + closure joins (the
    # costliest plan in the engine) once per branch
    corners = triangles(graph).select(
        F.explode(F.array("a", "b", "c")).alias("vid")
    )
    counts = corners.groupBy("vid").agg(F.count(F.lit(1)).alias("triangles"))
    return graph.vertices.join(counts, "vid", "left").select(
        "vid", F.coalesce("triangles", F.lit(0)).alias("triangles")
    )
