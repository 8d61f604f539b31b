"""Full coreness decomposition — core number of every vertex in ONE run.

``k_core(G, k)`` (kcore.py) answers a single-k membership question; the
common batch-analytics ask is the whole decomposition: ``coreness(v)`` =
the largest k such that v belongs to the k-core.  Instead of peeling
once per k (O(k_max) sweeps over the graph), this implements the
distributed h-index fixpoint (Montresor, De Pellegrini, Miorandi,
"Distributed k-core decomposition", and Lü et al.'s H-operator result —
both public):

    c₀(v)    = deg(v)
    c_{i+1}(v) = min(c_i(v), H({c_i(u) : u ∈ N(v)}))

where ``H`` is the h-index of the neighbor-estimate multiset (the
largest h such that ≥ h neighbors have estimate ≥ h).  The sequence is
monotone non-increasing, bounded below by coreness, and its fixpoint IS
the coreness vector (locality theorem); iteration count is small in
practice (≤ graph diameter-ish; measured values in the catalog
docstring).

Spark shape — hub-safe by construction:

- **No per-vertex neighbor arrays.**  A 10^8-degree hub page must not
  ``collect_list`` its neighbors.  The h-index is computed from the
  per-vertex HISTOGRAM of neighbor estimates: ``groupBy(v, c_u).count``
  is decomposable (map-side partial agg bounds a hub at ≤1 row per map
  partition per distinct estimate), and the per-vertex histogram has at
  most |distinct estimates| ≤ k_max(v) buckets — degeneracy-bounded, not
  degree-bounded.  The h-index then folds over the DESC-sorted histogram
  in one JVM ``aggregate`` expression: h = max over prefixes of
  min(bucket value, cumulative count).
- **Delta rounds.**  A vertex needs recomputation only if some
  neighbor's estimate changed last round (the H-operator is local) —
  trajectory-identical to full recomputation because an unchanged
  neighborhood reproduces last round's H and ``c ≤ min(c, H)`` is
  already merged.  Round cost is ∝ edges incident to changed vertices,
  like cc.py's delta-frontier gather.
- The |V|-scale joins carry ``hint("merge")`` against the silent-
  broadcast pathology (operators/neighbor_reduce.py).

DuckDB twin: the same H-operator unrolled (queries._coreness_sql) with
the h-index as ``MAX(LEAST(val, row_number DESC))`` — idempotent past
the fixpoint, so a fixed unroll ≥ convergence rounds matches the
converge-or-max_iters engine run exactly.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.superstep import IterationResult, changed_stats, iterate

# h-index of a DESC-sorted histogram array<struct<c, cnt>>: running
# cumulative count; candidate at each bucket = min(bucket value, cum);
# the max over prefixes is the h-index.
_H_FOLD = (
    "aggregate(_hist, "
    "named_struct('cum', cast(0 as bigint), 'best', cast(0 as bigint)), "
    "(acc, x) -> named_struct("
    "  'cum', acc.cum + x.cnt, "
    "  'best', greatest(acc.best, least(x.c, acc.cum + x.cnt))), "
    "acc -> acc.best)"
)


def coreness_round(sym: DataFrame, state: DataFrame) -> DataFrame:
    """ONE H-operator round over ``(vid, c, _changed)`` state (the
    production round body :func:`coreness` iterates — exposed so plan
    tests assert the shipping plan, not a replica)."""
    changed = state.where(F.col("_changed")).select(F.col("vid").alias("src"))
    # vertices with ≥1 changed neighbor: sym is symmetric, so the dsts of
    # changed srcs are exactly the affected set; the semi-join reuses the
    # persisted hash(src, P) layout exchange-free
    affected = (
        sym.join(changed.hint("merge"), "src", "left_semi")
        .select("dst")
        .distinct()
    )
    # gather ALL neighbor estimates for affected vertices (the h-index
    # needs the full multiset, unlike min/sum gathers): rows (src=v, dst=u)
    # for v ∈ affected, then u's estimate.  The affected set arrives
    # hash(dst,P)-partitioned from the distinct; renaming to src keeps
    # that layout (same hash family), so this semi-join is exchange-free.
    edges_aff = sym.join(
        affected.withColumnRenamed("dst", "src").hint("merge"),
        "src",
        "left_semi",
    )
    vals = edges_aff.join(
        state.select(F.col("vid").alias("dst"), F.col("c").alias("_cn")).hint(
            "merge"
        ),
        "dst",
    )
    hist = vals.groupBy(F.col("src").alias("vid"), F.col("_cn").alias("c")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    h = (
        hist.groupBy("vid")
        .agg(
            F.reverse(
                F.array_sort(F.collect_list(F.struct("c", "cnt")))
            ).alias("_hist")
        )
        .select("vid", F.expr(_H_FOLD).alias("_h"))
    )
    merged = F.least("c", F.coalesce("_h", F.col("c")))
    return state.join(h.hint("merge"), "vid", "left").select(
        "vid",
        merged.alias("c"),
        (merged != F.col("c")).alias("_changed"),
    )


def coreness(
    graph: Graph,
    max_iters: int = 500,
    init_bound: DataFrame | None = None,
    prev_edges: DataFrame | None = None,
    assume_append_only: bool = False,
) -> IterationResult:
    """Core number of every vertex: state ``(vid, coreness)``.

    Exact (fixpoint of the H-operator == coreness, Lü et al.); isolated
    vertices (if the graph has any) get coreness 0.

    ``init_bound`` — warm start: a ``(vid, bound)`` table of per-vertex
    UPPER bounds on the new coreness; init becomes
    ``min(deg, coalesce(bound, deg))``.  Exactness from any upper bound:
    (i) T(c)(v) = min(c(v), H(neighbor c)) is monotone, and T(core) =
    core (locality theorem), so iterates stay ≥ core; (ii) at any
    fixpoint, S = {v : c(v) ≥ k} has ≥ k neighbors-in-S per member — an
    induced subgraph of min degree ≥ k — so c(v) ≥ k ⟹ core(v) ≥ k,
    i.e. every fixpoint ≤ core.  Hence the fixpoint from any upper-bound
    init IS core (tests assert equality with the cold run).

    Incremental-crawl recipe (append-only epochs): a single edge
    insertion raises any core number by at most 1 (standard streaming
    k-core bound — Sarıyüce et al., VLDB 2013, public), so ``bound =
    prev_coreness + m`` with m = the increment's edge count is valid.
    The head start pre-collapses vertices with ``deg ≫ core + m`` (hub
    pages: degree 10⁶, core ~10¹), so the delta rounds shuffle strictly
    fewer CHANGED rows (the scale win — measured in the warm-start
    test); round COUNT is governed by cascade length, which a value
    bound cannot shorten, so expect equal-or-fewer rounds, not fewer.
    An UNDER-estimate bound silently converges to a wrong fixpoint —
    callers own the validity argument (rebuild cold after deletions).

    ENFORCED (linkgraph/epoch.py): a warm call must supply
    ``prev_edges`` (epoch edges, diffed via snapshot_diff — removals
    raise :class:`~linkgraph.epoch.EpochRemovalError`) or assert
    ``assume_append_only=True``.  The flag doubles as the escape hatch
    for bounds valid by a DIFFERENT argument than append-only (removals
    only lower core numbers, so ``prev + m_added`` can remain an upper
    bound across mixed epochs — but that argument is the caller's to
    make, not this function's to assume).
    """
    if init_bound is not None:
        from linkgraph.epoch import require_warm_evidence

        require_warm_evidence(
            "init_bound",
            graph.edges,
            prev_edges,
            assume_append_only,
            "coreness warm start",
        )
    sym = graph.symmetrized_edges
    deg = sym.groupBy(F.col("src").alias("vid")).agg(
        F.count(F.lit(1)).alias("c")
    )
    init = (
        graph.vertices.join(deg.hint("merge"), "vid", "left")
        .select(
            "vid",
            F.coalesce("c", F.lit(0)).alias("c"),
            F.lit(True).alias("_changed"),
        )
    )
    if init_bound is not None:
        bound = init_bound.select("vid", F.col("bound").alias("_wb"))
        init = (
            init.join(bound.hint("merge"), "vid", "left")
            .select(
                "vid",
                F.least(
                    F.col("c"), F.coalesce("_wb", F.col("c"))
                ).alias("c"),
                F.col("_changed"),
            )
        )

    def step(state: DataFrame, i: int) -> DataFrame:
        return coreness_round(sym, state)

    result = iterate(
        init,
        step,
        stats_cols=changed_stats(),
        converged=lambda s: (s.get("changed") or 0) == 0,
        max_iters=max_iters,
    )
    result.state = result.state.select(
        "vid", F.col("c").cast("long").alias("coreness")
    )
    return result


def coreness_rounds(graph: Graph, rounds: int) -> DataFrame:
    """Exactly ``rounds`` H-operator rounds from c₀ = deg — the
    deterministic fixed-round form the SQL-oracle harness compares
    (the DuckDB twin unrolls the same count; past the fixpoint extra
    rounds are no-ops, so rounds ≥ convergence reproduces
    :func:`coreness`)."""
    sym = graph.symmetrized_edges
    state = (
        graph.vertices.join(
            sym.groupBy(F.col("src").alias("vid"))
            .agg(F.count(F.lit(1)).alias("c"))
            .hint("merge"),
            "vid",
            "left",
        )
        .select(
            "vid",
            F.coalesce("c", F.lit(0)).alias("c"),
            F.lit(True).alias("_changed"),
        )
    )
    for i in range(rounds):
        state = coreness_round(sym, state).localCheckpoint(eager=True)
    return state.select("vid", F.col("c").cast("long").alias("coreness"))
