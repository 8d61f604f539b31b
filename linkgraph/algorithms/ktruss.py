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
from linkgraph.algorithms.coreness import _H_FOLD


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
    from linkgraph.superstep import _free_checkpoint_blocks

    if k < 3:
        raise ValueError("k-truss is defined for k >= 3")
    num_parts = graph.num_partitions
    canon = _canon_ab(graph)
    thr = k - 2
    prev_canon = None
    prev_supported = None
    for _ in range(max_rounds):
        supported = _edge_support(canon).localCheckpoint()
        survivors = supported.where(F.col("support") >= thr).select("a", "b")
        n_drop = supported.where(F.col("support") < thr).count()
        canon = survivors.repartition(num_parts, "a").localCheckpoint()
        # free the superseded round's leaves (the new canon is
        # materialized off `supported`, so both prior-round leaves are
        # dead now; the final `supported` is the return value and is
        # never freed) — without this the peel accumulates one |E|-scale
        # cached leaf pair per round
        if prev_canon is not None:
            _free_checkpoint_blocks(prev_canon)
        if prev_supported is not None:
            _free_checkpoint_blocks(prev_supported)
        prev_canon, prev_supported = canon, supported
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


def _triangle_corner_edges(canon: DataFrame) -> DataFrame:
    """All (edge, other-edge, other-edge) triples of the triangle set
    over a canonical (a < b) edge table: columns ``(a, b, oa1, ob1,
    oa2, ob2)`` — three rows per triangle, one per corner edge.

    Built ONCE per decomposition (the h-operator iterates VALUES over
    this fixed structure, unlike k_truss peeling, which re-enumerates
    triangles over each shrinking subgraph); enumeration itself uses
    the same degree-ordered oriented wedge kernel as triangles.py.
    """
    deg = (
        canon.select(F.col("a").alias("v"))
        .unionAll(canon.select(F.col("b").alias("v")))
        .groupBy("v")
        .agg(F.count(F.lit(1)).alias("d"))
    )
    ed = canon.join(
        deg.withColumnRenamed("v", "a").withColumnRenamed("d", "da"), "a"
    ).join(deg.withColumnRenamed("v", "b").withColumnRenamed("d", "db"), "b")
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
    edge = lambda p, q: F.struct(  # noqa: E731
        F.least(p, q).alias("a"), F.greatest(p, q).alias("b")
    )
    uv, vw, uw = (
        edge(F.col("u"), F.col("v")),
        edge(F.col("v"), F.col("w")),
        edge(F.col("u"), F.col("w")),
    )
    corners = tris.select(
        F.explode(
            F.array(
                F.struct(uv.alias("e"), vw.alias("o1"), uw.alias("o2")),
                F.struct(vw.alias("e"), uv.alias("o1"), uw.alias("o2")),
                F.struct(uw.alias("e"), uv.alias("o1"), vw.alias("o2")),
            )
        ).alias("t")
    )
    return corners.select(
        F.col("t.e.a").alias("a"),
        F.col("t.e.b").alias("b"),
        F.col("t.o1.a").alias("oa1"),
        F.col("t.o1.b").alias("ob1"),
        F.col("t.o2.a").alias("oa2"),
        F.col("t.o2.b").alias("ob2"),
    )


class TriangleBudgetExceeded(RuntimeError):
    """The graph's triangle count exceeds the caller's ``max_triangles``
    budget for :func:`trussness` — the 3·T corner table would be
    persisted beyond the declared capacity.  Fail loud here instead of
    letting the checkpoint spill (or die) unbounded; callers should
    either raise the budget (with partitions sized by
    ``corner_rows_per_partition``) or answer the single-k question with
    :func:`k_truss` peeling, which never materializes the triangle set.
    """


def _trussness_by_peeling(
    graph: Graph, max_rounds: int = 100
) -> DataFrame:
    """Full truss decomposition WITHOUT materializing the 3·T corner
    table: iterated :func:`k_truss`-style peeling, one level per k.

    The (k+1)-truss is a subgraph of the k-truss, so each level peels
    the PREVIOUS level's survivors (never the full graph); edges
    dropped while peeling at level k have trussness k−1 (they survived
    the (k−1)-truss but not the k-truss).  Per-round memory is one
    support aggregation over the current survivor set — bounded by |E|,
    independent of T — which is why this is the sanctioned
    ``on_budget="peel"`` degrade path of :func:`trussness` for
    triangle-dense graphs whose corner table blows the declared budget.
    The trade is compute: triangles are re-enumerated per peel round
    (Σ levels · rounds wedge joins) instead of once.  Output is
    identical to the h-operator path (the decomposition is unique;
    differential-tested).
    """
    from linkgraph.superstep import _free_checkpoint_blocks, plain_checkpoint

    num_parts = graph.num_partitions
    cur = plain_checkpoint(
        _canon_ab(graph).repartition(num_parts, "a")
    )
    acc = plain_checkpoint(
        cur.select("a", "b").limit(0).select(
            "a", "b", F.lit(0).cast("long").alias("trussness")
        )
    )
    k = 3
    while True:
        # peel cur to the k-truss fixpoint; an edge dropped at level k
        # survived the (k-1)-truss but not the k-truss → trussness k-1,
        # recorded round-by-round as the peel discovers it
        for _ in range(max_rounds):
            sup = _edge_support(cur).localCheckpoint()
            dropped = sup.where(F.col("support") < k - 2).select("a", "b")
            n_drop = dropped.count()
            if n_drop:
                acc = plain_checkpoint(
                    acc.unionAll(
                        dropped.select(
                            "a",
                            "b",
                            F.lit(k - 1).cast("long").alias("trussness"),
                        )
                    ).repartition(num_parts, "a"),
                    replaces=acc,
                )
            cur = plain_checkpoint(
                sup.where(F.col("support") >= k - 2)
                .select("a", "b")
                .repartition(num_parts, "a"),
                replaces=cur,
            )
            # acc and cur are materialized off sup now — free its blocks
            # (k_truss-style unreleased per-round leaves would pile up
            # across levels × rounds at exactly the scale this degrade
            # path exists for)
            _free_checkpoint_blocks(sup)
            if n_drop == 0:
                break
        else:
            raise RuntimeError(
                f"truss peeling at k={k} did not converge in "
                f"{max_rounds} rounds"
            )
        if cur.isEmpty():
            return acc
        k += 1


def trussness(
    graph: Graph,
    max_iters: int = 200,
    max_triangles: int | None = None,
    corner_rows_per_partition: int = 5_000_000,
    on_budget: str = "raise",
) -> DataFrame:
    """Full truss decomposition — per-edge truss number ``(a, b,
    trussness)``: the max k such that the edge survives in the k-truss;
    triangle-free edges get 2.  The edge-level companion of
    :func:`linkgraph.algorithms.coreness.coreness`.

    Local h-operator formulation (Sariyuce, Seshadhri & Pinar, *Local
    algorithms for hierarchical dense subgraph discovery*, VLDB 2018):
    with s(e) = t(e) − 2, initialize s₀ = triangle support and iterate

        s'(e) = min(s(e), H({ min(s(f), s(g)) : triangles (e, f, g) }))

    (H = h-index).  Monotone non-increasing from the support upper
    bound, exact at fixpoint, and idempotent past it — the same
    convergence argument as the coreness H-operator, which is what lets
    the DuckDB twin unroll a fixed generous round count.

    Scale shape: triangles are enumerated ONCE (hub-safe oriented
    kernel) into a fixed 3·T-row corner table; each round is two
    equi-joins of that table against the |E|-row state plus one
    histogram-fold h-index aggregation (the same
    ``max-over-prefixes-of-min`` JVM fold as coreness) — no triangle
    re-enumeration per round, unlike ``k_truss`` peeling.

    **Triangle-table budget (VERDICT r02 #9).**  At web scale T can
    exceed |E| by orders of magnitude, and the corner table is a
    PERSISTED 3·T-row leaf.  ``max_triangles`` declares the capacity:
    when set, T is pre-counted from the per-edge supports (ONE extra
    wedge-join pass, nothing materialized) and the run raises
    :class:`TriangleBudgetExceeded` BEFORE enumerating corners if the
    budget is blown — fail loud, never an unbounded spill/OOM.  The same
    pre-count sizes the corner table's partitioning: ``max(graph
    partitions, ⌈3T / corner_rows_per_partition⌉)`` keeps each persisted
    partition bounded regardless of how triangle-dense the graph is.
    Default ``max_triangles=None`` skips the pre-count (no extra pass)
    and keeps the graph-partition layout — fixture-scale behavior.

    ``on_budget`` (VERDICT r03 #9) — what to do when the budget is
    blown: ``"raise"`` (default) raises :class:`TriangleBudgetExceeded`;
    ``"peel"`` degrades to :func:`_trussness_by_peeling` — the
    memory-bounded iterated-peeling path that never materializes the
    corner table (more compute, same exact output) — so a 100×-scale
    caller has a sanctioned continue option instead of a dead job.
    """
    from linkgraph.superstep import changed_stats, iterate

    if on_budget not in ("raise", "peel"):
        raise ValueError(
            f"on_budget must be 'raise' or 'peel', got {on_budget!r}"
        )
    num_parts = graph.num_partitions
    canon = _canon_ab(graph)
    corner_parts = num_parts
    if max_triangles is not None:
        row = (
            _edge_support(canon)
            .agg((F.sum("support") / 3).cast("long").alias("t"))
            .collect()[0]
        )
        n_tri = int(row["t"] or 0)
        if n_tri > max_triangles:
            if on_budget == "peel":
                return _trussness_by_peeling(graph)
            raise TriangleBudgetExceeded(
                f"graph has {n_tri} triangles > max_triangles="
                f"{max_triangles}; raise the budget, pass "
                "on_budget='peel' for the memory-bounded degrade path, "
                "or use k_truss peeling for a single k"
            )
        corner_parts = max(
            num_parts, -(-3 * n_tri // corner_rows_per_partition)
        )
    corners = (
        _triangle_corner_edges(canon)
        .repartition(corner_parts, "a", "b")
        .localCheckpoint()
    )
    support = corners.groupBy("a", "b").agg(F.count(F.lit(1)).alias("_sup"))
    init = (
        canon.join(support, ["a", "b"], "left")
        .select(
            "a",
            "b",
            F.coalesce("_sup", F.lit(0)).cast("long").alias("s"),
            F.lit(True).alias("_changed"),
        )
    )

    def _round(state: DataFrame, i: int) -> DataFrame:
        sv = state.select("a", "b", "s")
        vals = (
            corners.join(
                sv.select(
                    F.col("a").alias("oa1"),
                    F.col("b").alias("ob1"),
                    F.col("s").alias("_s1"),
                ),
                ["oa1", "ob1"],
            )
            .join(
                sv.select(
                    F.col("a").alias("oa2"),
                    F.col("b").alias("ob2"),
                    F.col("s").alias("_s2"),
                ),
                ["oa2", "ob2"],
            )
            .select("a", "b", F.least("_s1", "_s2").alias("_val"))
        )
        hist = vals.groupBy("a", "b", "_val").agg(F.count(F.lit(1)).alias("cnt"))
        h = (
            hist.groupBy("a", "b")
            .agg(
                F.reverse(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("_val").alias("c"), "cnt"))
                    )
                ).alias("_hist")
            )
            .select("a", "b", F.expr(_H_FOLD).alias("_h"))
        )
        merged = F.least("s", F.coalesce("_h", F.col("s")))
        return state.join(h, ["a", "b"], "left").select(
            "a",
            "b",
            merged.alias("s"),
            (merged != F.col("s")).alias("_changed"),
        )

    res = iterate(
        init.repartition(num_parts, "a", "b"),
        _round,
        stats_cols=changed_stats(),
        converged=lambda st: (st.get("changed") or 0) == 0,
        max_iters=max_iters,
        partition_key="a",
    )
    return res.state.select(
        "a", "b", (F.col("s") + 2).cast("long").alias("trussness")
    )
