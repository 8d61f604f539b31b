"""SALSA — Stochastic Approach for Link-Structure Analysis (Lempel &
Moran, WWW 2000).

Reference: none — upstream essentials has HITS (A10) but not SALSA;
added as the standard web-ranking companion (it is HITS with the
adjacency matrix row/column-stochasticized, i.e. the TKC-effect fix
search engines actually deployed).

Update (synchronous, auth-from-old-hubs ordering pinned exactly like
hits.py so the DuckDB twin replays it)::

    a'(v) = Σ_{u→v} h(u) / outdeg(u)     ;  a' ← a'/Σa'
    h'(v) = Σ_{v→w} a'(w) / indeg(w)     ;  h' ← h'/Σh'

L1 normalization (SALSA scores are stationary distributions of the
alternating random walk, so they live on the simplex — unlike HITS's
L2 sphere).  Init h = a = 1/|V|.

Physical shape = hits.py exactly: the auth gather rides the persisted
hash(src) edge layout, the hub gather the persisted reversed view; the
1/outdeg and 1/indeg factors are joined ONCE into those edge views
before iteration (degree is a static edge-side quantity), so the
superstep plan stays one live |V|-shuffle per gather with map-side
combine — no per-iteration degree join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.operators.neighbor_reduce import neighbor_reduce
from linkgraph.superstep import CheckpointManager, IterationResult, iterate


def salsa(
    graph: Graph,
    tol: float = 1e-9,
    max_iters: int = 50,
    salted: bool = True,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 10,
    resume: bool = True,
    init_scores: DataFrame | None = None,
) -> IterationResult:
    """Run SALSA; result state is ``(vid, hub, auth)``, each L1-normalized.

    ``init_scores`` — warm start: a ``(vid, hub, auth)`` table (a
    previous epoch's scores).  SALSA scores are the stationary
    distribution of the alternating bipartite walk; the per-round L1
    normalization makes the iteration a normalized power method that
    converges from any non-negative init with support on the walk's
    recurrent classes — previous-epoch scores qualify, and the step is
    memoryless, so seeding with round-k's state continues the cold
    trajectory exactly (``salsa_warm5`` hash-checks warm(3 + 2) against
    the cold ``salsa5`` twin).  Vertices absent from ``init_scores``
    seed the cold 1/|V|.  No append-only guard — see katz.py's
    warm-start note.
    """
    num_parts = graph.num_partitions
    n_verts = graph.num_vertices
    if init_scores is None:
        init = graph.vertices.select(
            "vid",
            F.lit(1.0 / n_verts).alias("hub"),
            F.lit(1.0 / n_verts).alias("auth"),
        )
    else:
        prev = init_scores.select(
            "vid",
            F.col("hub").cast("double").alias("_ph"),
            F.col("auth").cast("double").alias("_pa"),
        )
        init = graph.vertices.join(prev.hint("merge"), "vid", "left").select(
            "vid",
            F.coalesce("_ph", F.lit(1.0 / n_verts)).alias("hub"),
            F.coalesce("_pa", F.lit(1.0 / n_verts)).alias("auth"),
        )
    # Fold the stochastic factors into static edge views once: forward
    # edges carry 1/outdeg(src) (the auth gather's weight), reversed
    # edges carry 1/indeg(src) where src is the ORIGINAL dst (the hub
    # gather's weight).  Joined pre-iteration, re-keyed to the layout
    # neighbor_reduce's exchange-free merge join expects.
    fwd = (
        graph.edges.join(
            graph.out_degrees.withColumnRenamed("vid", "src"), "src"
        )
        .select("src", "dst", (F.lit(1.0) / F.col("outdeg")).alias("w"))
        .repartition(num_parts, "src")
        .sortWithinPartitions("src")
        .persist()
    )
    rev = (
        graph.reversed_edges.join(
            graph.in_degrees.withColumnRenamed("vid", "src"), "src"
        )
        .select("src", "dst", (F.lit(1.0) / F.col("indeg")).alias("w"))
        .repartition(num_parts, "src")
        .sortWithinPartitions("src")
        .persist()
    )

    def _l1_normalized(df: DataFrame, col: str) -> DataFrame:
        norm = df.agg(F.sum(F.col(col)).alias("_n"))
        return (
            df.crossJoin(F.broadcast(norm))
            .withColumn(
                col,
                F.when(F.col("_n") > 0, F.col(col) / F.col("_n")).otherwise(
                    F.col(col)
                ),
            )
            .drop("_n")
        )

    def step(state: DataFrame, i: int) -> DataFrame:
        a_raw = neighbor_reduce(
            fwd,
            state.select("vid", "hub"),
            F.col("hub") * F.col("w"),
            op="sum",
            out="a_raw",
            salted=salted,
        )
        a = graph.vertices.join(a_raw.hint("merge"), "vid", "left").select(
            "vid", F.coalesce("a_raw", F.lit(0.0)).alias("auth")
        )
        a = _l1_normalized(a, "auth")
        h_raw = neighbor_reduce(
            rev,
            a.select("vid", "auth"),
            F.col("auth") * F.col("w"),
            op="sum",
            out="h_raw",
            salted=salted,
        )
        new = a.join(h_raw.hint("merge"), "vid", "left").select(
            "vid", "auth", F.coalesce("h_raw", F.lit(0.0)).alias("hub")
        )
        new = _l1_normalized(new, "hub")
        return new.join(
            state.select(
                "vid", F.col("hub").alias("_oh"), F.col("auth").alias("_oa")
            ),
            "vid",
        ).select(
            "vid",
            "hub",
            "auth",
            F.greatest(
                F.abs(F.col("hub") - F.col("_oh")),
                F.abs(F.col("auth") - F.col("_oa")),
            ).alias("_delta"),
        )

    result = iterate(
        init,
        step,
        stats_cols=[F.max("_delta").alias("delta")],
        converged=lambda s: s.get("delta") is not None and s["delta"] < tol,
        max_iters=max_iters,
        checkpoint=checkpoint,
        checkpoint_every=checkpoint_every,
        resume=resume,
        ephemeral_cols=("_delta",),
    )
    result.state = result.state.select("vid", "hub", "auth")
    fwd.unpersist()
    rev.unpersist()
    return result
