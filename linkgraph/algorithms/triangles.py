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


def triad_census(graph: Graph) -> DataFrame:
    """Directed triangle census: 1 row ``(n_triangles, n_cyclic,
    n_transitive)``.

    Over the simple digraph (loops dropped, duplicates collapsed):
    ``n_triangles`` = undirected triangles; ``n_cyclic`` = directed
    3-cycles x→y→z→x (each cycle counted once); ``n_transitive`` =
    transitive triads s→m, m→t, s→t (one count per ordered pattern
    instance — a fully-mutual triangle contributes 2 cycles and 6
    transitive patterns).  The cyclic/transitive ratio is the classic
    hierarchy-vs-feedback signal of a web graph (link hierarchies are
    overwhelmingly transitive; cliquey spam farms are not).

    Scale shape: triangle ENUMERATION reuses the degree-ordered oriented
    wedge kernel (O(√|E|) oriented out-degree bound — hub-safe), so the
    direction classification adds only three equi-joins of the triangle
    rows against the canonical direction-bit table ``(u, v, f, b)`` and
    one 3-counter aggregation.  No new quadratic term appears: the
    direction table is |undirected edges|-sized and every join is keyed
    on a vertex pair.
    """
    e = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    pairs = (
        e.select(
            F.least("src", "dst").alias("u"),
            F.greatest("src", "dst").alias("v"),
            (F.col("src") < F.col("dst")).alias("_fwd"),
        )
        .groupBy("u", "v")
        .agg(
            F.max(F.when(F.col("_fwd"), 1).otherwise(0)).alias("f"),
            F.max(F.when(~F.col("_fwd"), 1).otherwise(0)).alias("b"),
        )
    )
    tri = triangles(graph).select(
        F.array_sort(F.array("a", "b", "c")).alias("t")
    )
    txyz = tri.select(
        F.col("t")[0].alias("x"), F.col("t")[1].alias("y"), F.col("t")[2].alias("z")
    )
    j = (
        txyz.join(
            pairs.select(
                F.col("u").alias("x"), F.col("v").alias("y"),
                F.col("f").alias("fxy"), F.col("b").alias("bxy"),
            ),
            ["x", "y"],
        )
        .join(
            pairs.select(
                F.col("u").alias("x"), F.col("v").alias("z"),
                F.col("f").alias("fxz"), F.col("b").alias("bxz"),
            ),
            ["x", "z"],
        )
        .join(
            pairs.select(
                F.col("u").alias("y"), F.col("v").alias("z"),
                F.col("f").alias("fyz"), F.col("b").alias("byz"),
            ),
            ["y", "z"],
        )
    )
    # direction flags are 0/1 ints; every pattern is a 3-flag product.
    # cycles: x→y→z→x and its mirror x→z→y→x
    cyc = (
        F.col("fxy") * F.col("fyz") * F.col("bxz")
        + F.col("bxy") * F.col("byz") * F.col("fxz")
    )
    # transitive (s, m, t) over the 6 permutations of (x, y, z)
    trans = (
        F.col("fxy") * F.col("fyz") * F.col("fxz")
        + F.col("fxz") * F.col("byz") * F.col("fxy")
        + F.col("bxy") * F.col("fxz") * F.col("fyz")
        + F.col("fyz") * F.col("bxz") * F.col("bxy")
        + F.col("bxz") * F.col("fxy") * F.col("byz")
        + F.col("byz") * F.col("bxy") * F.col("bxz")
    )
    return j.agg(
        F.count(F.lit(1)).cast("long").alias("n_triangles"),
        F.coalesce(F.sum(cyc), F.lit(0)).cast("long").alias("n_cyclic"),
        F.coalesce(F.sum(trans), F.lit(0)).cast("long").alias("n_transitive"),
    )


def butterfly_count(graph: Graph, max_out_degree: int = 64) -> DataFrame:
    """Butterfly ((2,2)-biclique) census of the directed link graph
    viewed as a bipartite incidence source-pages × target-pages: one
    row ``(n_copairs, n_butterflies)``.

    A butterfly is two source pages both linking the same two target
    pages — the smallest dense-biclique motif, and the canonical
    LINK-FARM signature (spam networks cross-link a shared target set,
    producing butterfly densities orders of magnitude above organic
    linking; cf. the biclique-based spam-farm analyses following
    Kumar et al., *Trawling the Web for emerging cyber-communities*,
    WWW 1999 — public method).  ``n_copairs`` = distinct target pairs
    co-cited ≥ 2 times; ``n_butterflies`` = Σ_pairs C(c,2) over
    co-citation counts c.

    Physical shape — the same hub-safe wedge kernel as
    :func:`linkgraph.algorithms.linkpred.link_prediction`, centered on
    SOURCES: wedge cost is Σ_s outdeg(s)², so ``max_out_degree`` caps
    the wedge center (a directory page linking everything creates
    C(10⁵,2) wedges of zero spam signal — the 1/outdeg damping
    argument).  The cap is part of the operator definition: the DuckDB
    twin applies the identical cap, so the value hash is exact.  One
    capped self-join + two map-side-combined aggregations; the pair
    key (d1, d2) is skew-bounded by the cap (a pair's count ≤ number
    of capped sources citing both).
    """
    out_deg = graph.out_degrees
    centers = out_deg.where(
        (F.col("outdeg") >= 2) & (F.col("outdeg") <= max_out_degree)
    ).select(F.col("vid").alias("src"))
    e2 = graph.edges.join(centers, "src", "left_semi").select("src", "dst")
    x = e2.alias("x")
    y = e2.alias("y")
    copairs = (
        x.join(
            y,
            (F.col("x.src") == F.col("y.src"))
            & (F.col("x.dst") < F.col("y.dst")),
        )
        .groupBy(F.col("x.dst").alias("d1"), F.col("y.dst").alias("d2"))
        .agg(F.count(F.lit(1)).alias("c"))
        .where(F.col("c") >= 2)
    )
    return copairs.agg(
        F.count(F.lit(1)).cast("long").alias("n_copairs"),
        # integer `div`, not float `/`: exact at any count magnitude
        F.coalesce(
            F.sum(F.expr("(c * (c - 1)) div 2")), F.lit(0)
        ).cast("long").alias("n_butterflies"),
    )
