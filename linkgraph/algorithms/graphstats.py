"""Scalar / per-vertex web-graph statistics: reciprocity, degree
assortativity, clustering coefficients.

Reference: none — upstream essentials carries no summary-statistics
kernels; these are the standard link-graph health metrics (Newman,
*Assortative mixing in networks*, PRL 2002; Watts & Strogatz clustering,
Nature 1998; reciprocity as used in every web-graph characterization
since Broder et al. 2000) added per the task brief's link-graph mandate.

All three are one-pass aggregations over edge/degree DataFrames —
map-side combined, no iteration, no driver loops.  The assortativity
moments are INTEGER sums (degrees are integers), so Spark and the
DuckDB twin compute bit-identical intermediates; the single final
floating-point expression is evaluated once on each side, making the
value-hash gate exact rather than tolerance-based.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.algorithms.triangles import triangle_counts_per_vertex


def reciprocity(graph: Graph) -> DataFrame:
    """Fraction of directed (non-loop, deduped) edges whose reverse edge
    also exists: 1-row ``(n_edges, n_reciprocal, reciprocity)``.

    Physical shape: one left_semi self-join of the edge set against its
    transpose on the (dst, src) key + one count — both sides are the
    same persisted DataFrame, and the semi-join shuffles keys only.
    """
    e = (
        graph.edges.select("src", "dst")
        .where(F.col("src") != F.col("dst"))
        .dropDuplicates(["src", "dst"])
    )
    rev = e.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    recip = e.join(rev, ["src", "dst"], "left_semi")
    stats = e.agg(F.count("*").alias("n_edges")).crossJoin(
        recip.agg(F.count("*").alias("n_reciprocal"))
    )
    return stats.select(
        F.col("n_edges").cast("long").alias("n_edges"),
        F.col("n_reciprocal").cast("long").alias("n_reciprocal"),
        F.round(
            F.when(
                F.col("n_edges") > 0,
                F.col("n_reciprocal").cast("double") / F.col("n_edges"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("reciprocity"),
    )


def degree_assortativity(graph: Graph) -> DataFrame:
    """Directed out-in degree assortativity (Newman 2002): the Pearson
    correlation, over directed edges u→v, between outdeg(u) and
    indeg(v).  Returns 1 row ``(n_edges, assortativity)``.

    Moments Σx, Σy, Σxy, Σx², Σy² are exact integer sums (bit-stable
    across engines); only the final r = (nΣxy − ΣxΣy) /
    √((nΣx²−(Σx)²)(nΣy²−(Σy)²)) touches floats.
    """
    e = graph.edges.select("src", "dst").dropDuplicates(["src", "dst"])
    x = graph.out_degrees.withColumnRenamed("vid", "src")
    y = graph.in_degrees.withColumnRenamed("vid", "dst")
    xy = e.join(x, "src").join(y, "dst").select(
        F.col("outdeg").alias("x"), F.col("indeg").alias("y")
    )
    m = xy.agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
        F.sum(F.col("y") * F.col("y")).alias("syy"),
    )
    num = m["n"] * F.col("sxy") - F.col("sx") * F.col("sy")
    den = F.sqrt(
        (m["n"] * F.col("sxx") - F.col("sx") * F.col("sx")).cast("double")
        * (m["n"] * F.col("syy") - F.col("sy") * F.col("sy")).cast("double")
    )
    return m.select(
        F.col("n").cast("long").alias("n_edges"),
        F.round(
            F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0)), 6
        ).alias("assortativity"),
    )


def clustering_coefficients(graph: Graph) -> DataFrame:
    """Per-vertex local clustering coefficient over the undirected
    simple graph: ``(vid, deg, triangles, lcc)`` with
    ``lcc = triangles / C(deg, 2)`` (0 for deg < 2).

    Reuses the degree-ordered triangle kernel (triangles.py — hub-safe
    wedge join bounded at O(√|E|) oriented out-degree) plus the persisted
    degree view; the combine is a co-keyed |V| join.
    """
    tri = triangle_counts_per_vertex(graph)
    deg = graph.degrees
    pairs = (F.col("deg") * (F.col("deg") - 1) / 2).cast("double")
    return tri.join(deg, "vid", "left").select(
        "vid",
        F.coalesce("deg", F.lit(0)).cast("long").alias("deg"),
        F.col("triangles").cast("long").alias("triangles"),
        F.round(
            F.when(
                F.coalesce("deg", F.lit(0)) >= 2,
                F.col("triangles").cast("double") / pairs,
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("lcc"),
    )


def global_clustering(graph: Graph) -> DataFrame:
    """Global (transitivity) clustering coefficient: 1 row
    ``(triangles, wedges, transitivity)`` with transitivity =
    3 × triangles / wedges, wedges = Σ_v C(deg(v), 2)."""
    from linkgraph.algorithms.triangles import triangles as _tris

    tri_n = _tris(graph).agg(F.count("*").alias("triangles"))
    # Σ deg(deg−1) is an exact integer sum; halving it afterwards keeps
    # the whole wedge count integer-exact (deg(deg−1) is always even),
    # so the DuckDB twin reproduces it bit-for-bit
    wedge_n = graph.degrees.agg(
        (F.sum(F.col("deg") * (F.col("deg") - 1)) / F.lit(2))
        .cast("long")
        .alias("wedges")
    )
    return tri_n.crossJoin(wedge_n).select(
        F.col("triangles").cast("long").alias("triangles"),
        F.col("wedges").cast("long").alias("wedges"),
        F.round(
            F.when(
                F.col("wedges") > 0,
                F.lit(3.0) * F.col("triangles") / F.col("wedges"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("transitivity"),
    )


def double_sweep_diameter(graph: Graph, source: int = 0) -> DataFrame:
    """Double-sweep diameter lower bound (Magnien, Latapy & Habib,
    *Fast computation of empirically tight bounds for the diameter of
    massive graphs*, JEA 2009): BFS from ``source`` over the
    UNDIRECTED (symmetrized) edge set, hop to the farthest vertex
    found (ties → smallest vid, so the estimate is deterministic), BFS
    again from there; the second eccentricity lower-bounds the true
    diameter of ``source``'s component — and is exact on trees.

    One row: ``(start_vid, ecc_start, far_vid, diameter_lb)``.

    Reference: none — upstream essentials carries no diameter kernel;
    standard web-graph characterization statistic (Broder et al. 2000
    measure exactly this on the crawl giant component).

    Scale shape: two full BFS runs (each the engine's frontier
    machinery — exchange-free gathers over the persisted sym layout,
    geometrically shrinking frontiers) plus ONE driver round-trip of a
    single row to pick the pivot — bounded and unavoidable, since the
    second sweep's source is data-dependent (the same shape as the
    MST driver contract: O(1) rows, never O(V)).
    """
    from linkgraph.algorithms.bfs import bfs

    r1 = bfs(graph, source, directed=False)
    far = (
        r1.state.where(F.col("depth").isNotNull())
        .orderBy(F.desc("depth"), F.asc("vid"))
        .limit(1)
        .collect()[0]
    )
    r2 = bfs(graph, int(far.vid), directed=False)
    return r2.state.agg(
        F.lit(source).cast("long").alias("start_vid"),
        F.lit(int(far.depth)).cast("long").alias("ecc_start"),
        F.lit(int(far.vid)).cast("long").alias("far_vid"),
        F.max("depth").cast("long").alias("diameter_lb"),
    )


def powerlaw_alpha(graph: Graph, xmin: int = 2) -> DataFrame:
    """Discrete power-law exponent of the in-degree distribution via the
    Clauset–Shalizi–Newman (SIAM Rev. 2009, eq. 3.7) continuous-MLE
    approximation: 1 row ``(xmin, n_tail, alpha)`` with

        alpha = 1 + n_tail / Σ_{d ≥ xmin} ln(d / (xmin − 1/2))

    In-degrees because that is the heavy tail of a web crawl (hub pages
    collect inlinks; the out-degree tail is bounded by page size).
    Reference: none — upstream essentials has no distribution-fit
    utility; standard public estimator, fixed user-chosen ``xmin`` (no
    KS scan — at 10^12 docs the scan is a driver-side loop over ~40
    candidate xmins if ever needed).

    Physical shape: one degree aggregation (map-side combined, the
    engine's cached in_degrees) + one filtered 1-row agg — no shuffle
    beyond the degree count itself; a 10^9-vertex tail never leaves
    the executors.
    """
    if xmin < 1:
        raise ValueError(f"xmin must be >= 1, got {xmin}")
    tail = graph.in_degrees.where(F.col("indeg") >= xmin)
    logs = F.log(F.col("indeg").cast("double") / (xmin - 0.5))
    return tail.agg(
        F.lit(xmin).cast("long").alias("xmin"),
        F.count(F.lit(1)).cast("long").alias("n_tail"),
        F.round(
            F.lit(1.0) + F.count(F.lit(1)).cast("double") / F.sum(logs), 6
        ).alias("alpha"),
    )


def bipartite_components(graph: Graph, max_iters: int = 200) -> DataFrame:
    """Per-component bipartiteness (odd-cycle test) over the UNDIRECTED
    (symmetrized) simple graph: ``(comp, n_vertices, n_conflict_edges,
    is_bipartite)``.

    A component is bipartite iff a BFS 2-coloring from its root yields
    no edge inside a color class.  ``n_conflict_edges`` counts
    undirected edges whose endpoints share BFS-depth parity — each such
    edge closes an odd cycle (0 conflicts ⇔ bipartite).

    Reference: none — upstream essentials carries no bipartiteness
    kernel; standard 2-coloring analysis.

    Scale shape: one hash-min CC run (the engine's delta-frontier
    superstep) + one MULTI-source BFS layering — every component's root
    (its hash-min label, which IS its minimum vertex id) starts at depth
    0 in the same fixpoint, so the cost is one BFS over the whole graph
    regardless of component count — + one edge-level parity join and a
    component-keyed aggregation (map-side combined).  No per-component
    driver loop anywhere.
    """
    from linkgraph.algorithms.bfs import multi_source_bfs
    from linkgraph.algorithms.cc import connected_components

    sym = graph.symmetrized_edges
    comp = (
        connected_components(graph, max_iters=max_iters)
        .state.select("vid", "comp")
        .localCheckpoint()
    )
    # every component root (hash-min label == min vid) layers in ONE
    # multi-source traversal — cost independent of component count
    roots = comp.select(F.col("comp").alias("vid")).distinct()
    depth = multi_source_bfs(
        graph, roots, directed=False, max_iters=max_iters
    ).state

    und = sym.where(F.col("src") < F.col("dst"))
    tagged = (
        und.join(
            depth.select(F.col("vid").alias("src"), F.col("depth").alias("_ds")),
            "src",
        )
        .join(
            depth.select(F.col("vid").alias("dst"), F.col("depth").alias("_dd")),
            "dst",
        )
        .join(
            comp.select(F.col("vid").alias("src"), "comp"),
            "src",
        )
    )
    conf = tagged.groupBy("comp").agg(
        F.sum(
            F.when(((F.col("_ds") + F.col("_dd")) % 2) == 0, 1).otherwise(0)
        )
        .cast("long")
        .alias("n_conflict_edges")
    )
    sizes = comp.groupBy("comp").agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices")
    )
    return sizes.join(conf, "comp", "left").select(
        "comp",
        "n_vertices",
        F.coalesce("n_conflict_edges", F.lit(0).cast("long")).alias(
            "n_conflict_edges"
        ),
        (F.coalesce("n_conflict_edges", F.lit(0)) == 0)
        .cast("int")
        .alias("is_bipartite"),
    )
