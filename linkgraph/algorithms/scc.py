"""Strongly connected components (parallel coloring / FW-BW multistep)
and the Broder et al. bow-tie decomposition of a directed web graph.

Reference: none — upstream essentials carries no SCC primitive; these
are the standard directed-webgraph analyses (Orzan's coloring SCC, 2004;
Slota/Rajamanickam/Madduri *Multistep*, IPDPS'14; Broder et al. *Graph
structure in the Web*, WWW 2000) added per the task brief's link-graph
mandate.  The DuckDB twins (queries.py `scc` / `bowtie`) are
algorithm-independent mutual-reachability closures, so they pin the
SEMANTICS, not this implementation's trajectory.

Algorithm (coloring multistep), each phase a superstep fixpoint:

1. **Trim** — vertices with no in- or no out-edge inside the active
   subgraph are singleton SCCs; peel to fixpoint.  On web crawls this
   removes the giant DAG fringe (dangling pages, feeds) before any
   propagation work.
2. **Forward color** — ``color(v) = min(ancestors(v) ∪ {v})`` via
   monotone min propagation along forward edges (the delta-frontier
   form of CC's hash-min round, directed).
3. **Backward sweep** — every color-class root ``r`` (``color(r) = r``)
   seeds a flag propagated along REVERSED edges restricted to
   same-color endpoints; flagged vertices form exactly SCC(r)
   (standard coloring-SCC invariant: any v→…→r path inside a color
   class stays inside it).  All roots sweep in the same fixpoint — one
   round of the outer loop assigns one SCC per color class, not one
   SCC total.
4. Assign, remove, repeat.

Scale shape: every inner fixpoint is the engine's one-live-shuffle
superstep (neighbor_reduce min/max with map-side combine — a hub page
emits ≤1 partial row per map partition); the outer loop re-materializes
the active subgraph with left_anti/left_semi joins and cuts lineage with
an eager localCheckpoint per round.  Outer rounds needed = longest
chain of nested SCC "layers", small on web graphs (the giant SCC plus
fringe resolves in 1-2 rounds after trimming).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.operators.neighbor_reduce import neighbor_reduce
from linkgraph.superstep import changed_stats, iterate


def _min_color_round(edges: DataFrame, state: DataFrame) -> DataFrame:
    """One directed hash-min round over ``(vid, color, _changed)`` —
    cc.py's delta-frontier round without the symmetrization (monotone
    min ⇒ the changed-only gather is trajectory-identical, same proof
    as cc.py's module docstring)."""
    src_state = state.where(F.col("_changed")).select("vid", "color")
    min_in = neighbor_reduce(
        edges, src_state, F.col("color"), op="min", out="min_in"
    )
    merged = F.least("color", F.coalesce("min_in", F.col("color")))
    return state.join(min_in.hint("merge"), "vid", "left").select(
        "vid",
        merged.alias("color"),
        (merged != F.col("color")).alias("_changed"),
    )


def _flag_round(redges: DataFrame, state: DataFrame) -> DataFrame:
    """One backward OR-propagation round over ``(vid, flag, _changed)``:
    newly-flagged vertices push along the (reversed, color-matched)
    edge set; monotone flag ⇒ delta frontier is exact here too."""
    src_state = (
        state.where(F.col("_changed") & F.col("flag")).select("vid", "flag")
    )
    got = neighbor_reduce(
        redges, src_state, F.lit(1), op="max", out="hit"
    )
    merged = F.col("flag") | F.coalesce(F.col("hit") == 1, F.lit(False))
    return state.join(got.hint("merge"), "vid", "left").select(
        "vid",
        merged.alias("flag"),
        (merged & ~F.col("flag")).alias("_changed"),
    )


def strongly_connected_components(
    graph: Graph,
    max_outer: int = 50,
    max_inner: int = 200,
    trim: bool = True,
) -> DataFrame:
    """Label every vertex with the MINIMUM vertex id of its SCC:
    returns ``(vid: long, scc: long)``, exact.

    Raises ``RuntimeError`` if ``max_outer`` rounds leave unassigned
    vertices (pathological nesting depth) rather than returning a
    partial labeling.
    """
    num_parts = graph.num_partitions
    active_v = graph.vertices.select("vid")
    active_e = graph.edges.select("src", "dst").dropDuplicates(["src", "dst"])
    assigned_parts: list[DataFrame] = []

    for _ in range(max_outer):
        active_v = active_v.repartition(num_parts, "vid").localCheckpoint()
        if active_v.isEmpty():
            break
        active_e = (
            active_e.join(
                active_v.withColumnRenamed("vid", "src"), "src", "left_semi"
            )
            .join(active_v.withColumnRenamed("vid", "dst"), "dst", "left_semi")
            .select("src", "dst")
            .repartition(num_parts, "src")
            .sortWithinPartitions("src")
            .localCheckpoint()
        )

        if trim:
            # peel vertices lacking an in- OR out-edge (singleton SCCs)
            # to fixpoint; each pass is two semi-joins + a count
            for _t in range(max_inner):
                has_out = active_e.select(F.col("src").alias("vid"))
                has_in = active_e.select(F.col("dst").alias("vid"))
                keep = (
                    active_v.join(has_out, "vid", "left_semi")
                    .join(has_in, "vid", "left_semi")
                    .repartition(num_parts, "vid")
                    .localCheckpoint()
                )
                trimmed = active_v.join(keep, "vid", "left_anti").select(
                    "vid", F.col("vid").alias("scc")
                )
                if trimmed.isEmpty():
                    break
                assigned_parts.append(trimmed.localCheckpoint())
                active_v = keep
                active_e = (
                    active_e.join(
                        keep.withColumnRenamed("vid", "src"), "src", "left_semi"
                    )
                    .join(
                        keep.withColumnRenamed("vid", "dst"), "dst", "left_semi"
                    )
                    .select("src", "dst")
                    .repartition(num_parts, "src")
                    .sortWithinPartitions("src")
                    .localCheckpoint()
                )
            if active_v.isEmpty():
                break

        # forward min-coloring fixpoint
        color_init = active_v.select(
            "vid", F.col("vid").alias("color"), F.lit(True).alias("_changed")
        )
        colors = iterate(
            color_init,
            lambda s, i: _min_color_round(active_e, s),
            stats_cols=changed_stats(),
            converged=lambda s: (s.get("changed") or 0) == 0,
            max_iters=max_inner,
        ).state.select("vid", "color")

        # backward sweep inside each color class: reversed edges whose
        # endpoints share a color (invariant: v→…→root paths stay in
        # the class, so this restriction loses nothing)
        ec = (
            active_e.join(
                colors.withColumnRenamed("vid", "src").withColumnRenamed(
                    "color", "_cs"
                ),
                "src",
            )
            .join(
                colors.withColumnRenamed("vid", "dst").withColumnRenamed(
                    "color", "_cd"
                ),
                "dst",
            )
            .where(F.col("_cs") == F.col("_cd"))
        )
        redges = (
            ec.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
            .repartition(num_parts, "src")
            .sortWithinPartitions("src")
            .localCheckpoint()
        )
        flag_init = colors.select(
            "vid",
            (F.col("color") == F.col("vid")).alias("flag"),
            F.lit(True).alias("_changed"),
        )
        flags = iterate(
            flag_init,
            lambda s, i: _flag_round(redges, s),
            stats_cols=changed_stats(),
            converged=lambda s: (s.get("changed") or 0) == 0,
            max_iters=max_inner,
        ).state

        members = (
            colors.join(flags.where(F.col("flag")).select("vid"), "vid", "left_semi")
            .select("vid", F.col("color").alias("scc"))
            .localCheckpoint()
        )
        assigned_parts.append(members)
        active_v = active_v.join(members, "vid", "left_anti").select("vid")
    else:
        if not active_v.isEmpty():
            raise RuntimeError(
                f"SCC did not converge in {max_outer} outer rounds"
            )

    spark = graph.spark
    if not assigned_parts:
        return spark.createDataFrame([], "vid long, scc long")
    out = assigned_parts[0]
    for p in assigned_parts[1:]:
        out = out.unionAll(p)
    return out.repartition(num_parts, "vid")


def _reach_flags(
    edges: DataFrame,
    vertices: DataFrame,
    seeds: DataFrame,
    num_parts: int,
    max_inner: int = 200,
) -> DataFrame:
    """Vertices reachable from ``seeds`` along ``edges`` (seeds
    included): OR-propagation fixpoint, returns ``(vid)`` of reached."""
    init = vertices.join(
        seeds.select("vid").withColumn("flag", F.lit(True)), "vid", "left"
    ).select(
        "vid",
        F.coalesce("flag", F.lit(False)).alias("flag"),
        F.lit(True).alias("_changed"),
    )
    res = iterate(
        init,
        lambda s, i: _flag_round(edges, s),
        stats_cols=changed_stats(),
        converged=lambda s: (s.get("changed") or 0) == 0,
        max_iters=max_inner,
    )
    return res.state.where(F.col("flag")).select("vid")


def bowtie_decomposition(
    graph: Graph,
    scc_labels: DataFrame | None = None,
    max_inner: int = 200,
) -> DataFrame:
    """Broder et al. (WWW 2000) bow-tie regions of a directed graph:
    ``(vid: long, region: string)`` with region ∈ {CORE, IN, OUT, TUBE,
    TENDRIL, DISCONNECTED}.

    CORE = the largest SCC (ties broken by MIN scc id — deterministic);
    IN / OUT = reach / are reached from CORE; TUBE = on an IN→OUT path
    avoiding CORE; TENDRIL = hang off IN or lead into OUT (one-sided);
    DISCONNECTED = everything else.

    Four OR-propagation fixpoints (forward/backward from CORE, forward
    from IN and backward from OUT inside the CORE-free subgraph) — each
    the same one-live-shuffle superstep as BFS.
    """
    num_parts = graph.num_partitions
    if scc_labels is None:
        scc_labels = strongly_connected_components(graph, max_inner=max_inner)
    scc_labels = scc_labels.localCheckpoint()
    verts = graph.vertices.select("vid")
    edges = graph.edges.select("src", "dst").dropDuplicates(["src", "dst"])
    redges = (
        edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        .repartition(num_parts, "src")
        .sortWithinPartitions("src")
        .localCheckpoint()
    )

    core_id_row = (
        scc_labels.groupBy("scc")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), F.asc("scc"))
        .limit(1)
        .collect()
    )
    core = scc_labels.where(
        F.col("scc") == int(core_id_row[0]["scc"])
    ).select("vid").localCheckpoint()

    # OUT ∪ CORE = forward reach of CORE; IN ∪ CORE = backward reach
    fwd = _reach_flags(edges, verts, core, num_parts, max_inner)
    bwd = _reach_flags(redges, verts, core, num_parts, max_inner)
    out_r = fwd.join(core, "vid", "left_anti").localCheckpoint()
    in_r = bwd.join(core, "vid", "left_anti").localCheckpoint()

    # CORE-free subgraph for tendril/tube reach
    non_core_v = verts.join(core, "vid", "left_anti").localCheckpoint()
    nc_edges = (
        edges.join(core.withColumnRenamed("vid", "src"), "src", "left_anti")
        .join(core.withColumnRenamed("vid", "dst"), "dst", "left_anti")
        .repartition(num_parts, "src")
        .sortWithinPartitions("src")
        .localCheckpoint()
    )
    nc_redges = (
        nc_edges.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
        .repartition(num_parts, "src")
        .sortWithinPartitions("src")
        .localCheckpoint()
    )
    from_in = _reach_flags(nc_edges, non_core_v, in_r, num_parts, max_inner)
    to_out = _reach_flags(nc_redges, non_core_v, out_r, num_parts, max_inner)

    flags = (
        verts.join(core.withColumn("_core", F.lit(True)), "vid", "left")
        .join(in_r.withColumn("_in", F.lit(True)), "vid", "left")
        .join(out_r.withColumn("_out", F.lit(True)), "vid", "left")
        .join(from_in.withColumn("_fi", F.lit(True)), "vid", "left")
        .join(to_out.withColumn("_to", F.lit(True)), "vid", "left")
    )
    region = (
        F.when(F.col("_core"), F.lit("CORE"))
        .when(F.col("_in"), F.lit("IN"))
        .when(F.col("_out"), F.lit("OUT"))
        .when(F.col("_fi") & F.col("_to"), F.lit("TUBE"))
        .when(
            F.coalesce("_fi", F.lit(False)) | F.coalesce("_to", F.lit(False)),
            F.lit("TENDRIL"),
        )
        .otherwise(F.lit("DISCONNECTED"))
    )
    return flags.select("vid", region.alias("region"))


def condensation_levels(
    graph: Graph,
    scc_labels: DataFrame | None = None,
    max_iters: int = 200,
) -> DataFrame:
    """Topological layering of the SCC condensation DAG:
    ``(scc: long, level: long, n_vertices: long)``.

    ``level`` = longest path (in condensation edges) from any SOURCE
    component — the canonical "crawl depth" layering of a web graph's
    component structure (level 0 = components nothing links into;
    the giant CORE sits one hop below the IN fringe, etc.).  Reference:
    none — upstream essentials has no condensation primitive; this is
    the standard DAG longest-path layering over Orzan-style SCC output.

    Physical shape: the condensation edge set is built with two
    |E|-sized label joins + one dedup and is usually TINY relative to
    |E| (web crawls collapse into few large components), so the
    fixpoint that follows iterates over component-count-sized state.
    Each round is one equi-join + max-aggregation (map-side combined)
    — the same monotone-propagation superstep as hash-min CC, with
    ``max(level)`` instead of ``min(label)``.  Rounds = DAG depth + 1.
    Monotone and cycle-free by construction (condensation of SCCs is a
    DAG), so the fixpoint terminates; ``max_iters`` is a guard against
    a buggy labeling, not a tuning knob.
    """
    num_parts = graph.num_partitions
    if scc_labels is None:
        scc_labels = strongly_connected_components(graph, max_inner=max_iters)
    scc_labels = scc_labels.localCheckpoint()

    ls = scc_labels.select(F.col("vid").alias("src"), F.col("scc").alias("_cs"))
    ld = scc_labels.select(F.col("vid").alias("dst"), F.col("scc").alias("_cd"))
    cedges = (
        graph.edges.select("src", "dst")
        .join(ls, "src")
        .join(ld, "dst")
        .where(F.col("_cs") != F.col("_cd"))
        .select(F.col("_cs").alias("src"), F.col("_cd").alias("dst"))
        .dropDuplicates(["src", "dst"])
        .repartition(num_parts, "src")
        .sortWithinPartitions("src")
        .localCheckpoint()
    )
    comps = scc_labels.groupBy("scc").agg(
        F.count(F.lit(1)).cast("long").alias("n_vertices")
    )
    init = comps.select(
        F.col("scc").alias("vid"),
        F.lit(0).cast("long").alias("level"),
        F.col("n_vertices"),
        F.lit(True).alias("_changed"),
    )

    def _round(state: DataFrame, i: int) -> DataFrame:
        cand = (
            cedges.join(
                state.select(F.col("vid").alias("src"), "level"), "src"
            )
            .groupBy(F.col("dst").alias("vid"))
            .agg((F.max("level") + F.lit(1)).cast("long").alias("_cand"))
        )
        return state.join(cand, "vid", "left").select(
            "vid",
            F.greatest(
                "level", F.coalesce("_cand", F.lit(0).cast("long"))
            ).alias("level"),
            "n_vertices",
            (F.coalesce("_cand", F.lit(0).cast("long")) > F.col("level")).alias(
                "_changed"
            ),
        )

    res = iterate(
        init,
        _round,
        stats_cols=changed_stats(),
        converged=lambda s: (s.get("changed") or 0) == 0,
        max_iters=max_iters,
    )
    if not res.converged:
        raise RuntimeError(
            f"condensation levels did not converge in {max_iters} rounds "
            "(condensation contains a cycle — SCC labeling is broken)"
        )
    return res.state.select(F.col("vid").alias("scc"), "level", "n_vertices")
