"""Deterministic distributed random walks (training-data sampling).

The sampling front end for graph-embedding pipelines (DeepWalk/node2vec
family, public knowledge: Perozzi et al. 2014, Grover & Leskovec 2016):
emit fixed-length walks from a start set; downstream treats each walk as
a "sentence" over vertex tokens.

Spark-first shape — every step is ONE hub-safe equi-join, never an
explode of the neighbor list:

1. **edge index (once, persisted)**: rank each source's out-edges by dst
   → ``(src, idx, dst)`` with ``idx ∈ [0, outdeg)``; ``(src, idx)`` is a
   unique key.  Derived from the graph's persisted CSR-style layout
   (hash(src)-partitioned, sorted within partitions by (src, dst) —
   graph.py from_edges) by ONE Arrow pass running a cumulative per-run
   counter — no Window: a ``row_number over partitionBy(src)`` would put
   a 10⁸-out-link hub's entire edge list into a single window task
   (VERDICT r02 watch item); the Arrow pass is embarrassingly parallel
   per partition and the hub's run is already contiguous and sorted.
2. **choice**: the walker at ``v`` on step ``t`` picks
   ``idx = ((walk_id·A₁ + t·A₂ + seed) mod P) mod outdeg(v)`` — the same
   public multiplicative-hash family as the engine's BC source sampling
   and ANN arith planes (pure int64 arithmetic ⇒ the DuckDB oracle
   replays the walk bit-for-bit).  Seeded per (walk, step): two walkers
   meeting at the same hub diverge.
3. **step**: state ``(walk_id, vid)`` joins the degree table (compute
   the choice), then equi-joins the index on ``(src, idx)`` — a 10⁸-
   out-link hub costs one probe per visiting walker, not a 10⁸-row
   expansion.  Walks reaching a dangling vertex terminate (inner join
   drops them — the standard truncation semantics).

State per step is ``plain_checkpoint``-ed like every engine iteration
(flat plans, freed generations); emitted path rows accumulate as a
union of per-step leaves.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.superstep import plain_checkpoint

#: multiplicative-hash constants (same public family as bc.py's source
#: sample): int64-safe for walk_id up to ~9·10^12 at A₁ ≈ 10^6.
WALK_A1 = 1000003
WALK_A2 = 10007
WALK_P = 2147483647
#: per-attempt stride for the node2vec rejection sampler (prime,
#: distinct from A1/A2 so attempts decorrelate from steps/walks)
WALK_A3 = 9973
#: fixed-point scale for the node2vec class weights: weights become
#: integers round(SCALE/p), SCALE, round(SCALE/q) so the acceptance test
#: is pure int64 comparison — bit-replayable in the DuckDB twin (no
#: cross-engine float-division ulp risk)
N2V_SCALE = 1_000_000


def indexed_edges(graph: Graph) -> DataFrame:
    """``(src, idx, dst)`` with idx = dense rank of dst within src.

    ONE Arrow map pass over the graph's persisted layout — from_edges
    guarantees hash(src) partitioning (every src's edges land in one
    partition) and a (src, dst) sort within partitions (every src's run
    is contiguous and dst-ascending), so idx is a vectorized cumulative
    counter per run, carried across Arrow batch boundaries.  No shuffle,
    no Window: cost is |E|/P per task regardless of hub degree, where
    the former ``row_number over partitionBy(src)`` gave the largest hub
    a task sized by ITS degree (single-task straggler at web scale).
    Callers should persist the result when walking multiple steps.

    The layout contract is ASSERTED, not assumed (ADVICE r03): each
    batch is checked for lexicographically increasing (src, dst) —
    including across batch boundaries — and a violation (e.g. a bare
    ``Graph(...)`` built from unsorted edges, or a future change to
    from_edges' persisted layout) raises ``ValueError`` instead of
    silently emitting wrong/duplicate idx values.  The check is two
    vectorized compares per batch — noise next to the hash itself.
    """
    import numpy as np
    import pyarrow as pa

    def add_idx(batches):
        # (src of the run in progress, #rows already indexed for it,
        # last dst seen) — carried across batches; a hub's run may span
        # many Arrow batches
        cur_src = None
        cur_count = 0
        cur_dst = None
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            src = b.column(0).to_numpy(zero_copy_only=False)
            dst = b.column(1).to_numpy(zero_copy_only=False)
            # layout-contract assertion: (src, dst) strictly increasing
            # lexicographically within the partition (strict because
            # from_edges dedupes) — fail loud on violation
            bad = (src[1:] < src[:-1]) | (
                (src[1:] == src[:-1]) & (dst[1:] <= dst[:-1])
            )
            boundary_bad = cur_src is not None and (
                src[0] < cur_src
                or (src[0] == cur_src and dst[0] <= cur_dst)
            )
            if boundary_bad or bad.any():
                i = 0 if boundary_bad else int(np.argmax(bad)) + 1
                raise ValueError(
                    "indexed_edges: edge partition violates the "
                    "(src, dst)-sorted layout contract near row "
                    f"(src={int(src[i])}, dst={int(dst[i])}); build the "
                    "graph with Graph.from_edges (which sorts and "
                    "hash(src)-partitions) rather than a bare Graph(...)"
                )
            pos = np.arange(n, dtype=np.int64)
            change = np.empty(n, dtype=bool)
            change[0] = cur_src is None or src[0] != cur_src
            np.not_equal(src[1:], src[:-1], out=change[1:])
            # forward-filled start position of each run; −1 = the batch
            # head continues the previous batch's run
            run_start = np.maximum.accumulate(np.where(change, pos, -1))
            idx = np.where(
                run_start >= 0, pos - run_start, pos + cur_count
            )
            cur_src = int(src[-1])
            cur_count = int(idx[-1]) + 1
            cur_dst = int(dst[-1])
            yield pa.RecordBatch.from_arrays(
                [b.column(0), pa.array(idx, type=pa.int64()), b.column(1)],
                names=["src", "idx", "dst"],
            )

    return graph.edges.select("src", "dst").mapInArrow(
        add_idx, "src long, idx long, dst long"
    )


def walk_choice(walk_id, step: int, outdeg, seed: int):
    """The portable neighbor-choice expression (see module docstring)."""
    h = (walk_id * F.lit(WALK_A1) + F.lit(step * WALK_A2 + seed)) % F.lit(
        WALK_P
    )
    return h % outdeg


def random_walks(
    graph: Graph,
    num_steps: int,
    starts: DataFrame | None = None,
    seed: int = 42,
) -> DataFrame:
    """Fixed-length deterministic walks → ``(walk_id, step, vid)``.

    ``starts``: one walk per row of a ``(vid)`` DataFrame (walk_id =
    start vid); default = every vertex.  Step 0 rows are the starts;
    a walk truncated at a dangling vertex simply has no later rows.
    """
    if num_steps < 0:
        raise ValueError("num_steps must be >= 0")
    if starts is None:
        starts = graph.vertices
    # disambiguating rename: idx and deg both derive from graph.edges
    # (a self-join from Catalyst's perspective) — unique names sidestep
    # the ambiguous-attribute analysis failure
    idx = indexed_edges(graph).select(
        F.col("src").alias("_isrc"),
        F.col("idx").alias("_idx"),
        F.col("dst").alias("_idst"),
    ).persist()
    deg = graph.out_degrees  # (vid, outdeg)

    # One cumulative (walk_id, step, vid) leaf per round — the settled-set
    # shape (bc.py forward phase): the frontier is the step == t−1 slice,
    # so superseded generations can be freed safely (no dangling lazy
    # references into freed checkpoint blocks) and the plan stays flat.
    state = plain_checkpoint(
        starts.select(
            F.col("vid").alias("walk_id"),
            F.lit(0).alias("step"),
            F.col("vid").alias("vid"),
        )
    )
    try:
        for t in range(1, num_steps + 1):
            frontier = state.where(F.col("step") == t - 1).select(
                "walk_id", "vid"
            )
            with_deg = frontier.join(
                deg.withColumnRenamed("vid", "_dv"),
                frontier["vid"] == F.col("_dv"),
            ).select(
                "walk_id",
                "vid",
                walk_choice(F.col("walk_id"), t, F.col("outdeg"), seed).alias(
                    "_choice"
                ),
            )
            nxt = with_deg.join(
                idx,
                (with_deg["vid"] == idx["_isrc"])
                & (with_deg["_choice"] == idx["_idx"]),
            ).select(
                "walk_id", F.lit(t).alias("step"), idx["_idst"].alias("vid")
            )
            # repartition the cumulative leaf: a bare union concatenates
            # partition lists, so P grows every round and each frontier
            # slice re-scans them all — pin the leaf at the graph's count
            new_state = plain_checkpoint(
                state.unionAll(nxt).repartition(
                    graph.num_partitions, "walk_id"
                ),
                replaces=state,
            )
            grew = new_state.where(F.col("step") == t).isEmpty() is False
            state = new_state
            if not grew:
                break
        return state
    finally:
        idx.unpersist()


def weighted_walks(
    graph: Graph,
    num_steps: int,
    weights: DataFrame,
    weight_col: str = "w",
    starts: DataFrame | None = None,
    seed: int = 42,
    attempts: int = 4,
) -> DataFrame:
    """First-order weight-proportional walks → ``(walk_id, step, vid)``:
    the walker at ``v`` follows edge v→x with probability
    ``≈ w(v,x)/Σ_out w(v)`` (the weighted DeepWalk sampler; host graphs
    weight edges by inter-host link counts).

    ``weights`` is an ``(src, dst, w)`` table with INTEGER weights
    (counts) covering the graph's edges — integer because the
    per-edge acceptance threshold ``⌊w·SCALE / wmax(src)⌋`` is then pure
    int64 arithmetic, bit-replayable by the DuckDB twin with no float
    rounding seam.

    **Scale shape — the same deterministic rejection sampler as
    :func:`node2vec_walks`** (uniform proposal via the hub-safe
    ``(src, idx)`` probe, acceptance probability ``w/wmax``): exact
    weighted choice needs per-neighbor cumulative weights — a hub's full
    neighbor list per visiting walker — while each rejection attempt is
    one probe row.  Expected attempts per step is wmax/w̄; ``attempts``
    draws are generated at once and the first accepted wins, with the
    documented attempt-0 fallback when all reject (raise ``attempts``
    for heavily skewed weights).  The acceptance thresholds are
    precomputed INTO the persisted edge index (one join at build, zero
    per-step weight work).
    """
    if num_steps < 0:
        raise ValueError("num_steps must be >= 0")
    if attempts < 1:
        raise ValueError("attempts must be >= 1")
    if starts is None:
        starts = graph.vertices
    w = weights.select(
        "src", "dst", F.col(weight_col).cast("long").alias("_w")
    )
    # coverage contract (ADVICE r03): every graph edge must carry a
    # weight — an inner join would silently drop unweighted edges, so
    # probed candidates would vanish and walks truncate early with no
    # error.  Validate once at index build (one left_anti pass, build
    # is already a full edge scan) and fail loud.
    ie = indexed_edges(graph)
    missing = ie.join(w, ["src", "dst"], "left_anti")
    if not missing.isEmpty():
        ex = missing.select("src", "dst").limit(3).collect()
        raise ValueError(
            "weighted_walks: weights table does not cover the graph's "
            f"edges — e.g. {[(r.src, r.dst) for r in ex]} have no "
            f"'{weight_col}' row; supply a weight for every edge"
        )
    base = ie.join(w, ["src", "dst"])
    wmax = base.groupBy("src").agg(F.max("_w").alias("_wmax"))
    idx = (
        base.join(wmax, "src")
        .select(
            F.col("src").alias("_isrc"),
            F.col("idx").alias("_idx"),
            F.col("dst").alias("_idst"),
            F.expr(f"(_w * {N2V_SCALE}) div _wmax").alias("_thr"),
        )
        .persist()
    )
    deg = graph.out_degrees
    att = F.array(*[F.lit(a) for a in range(attempts)])

    state = plain_checkpoint(
        starts.select(
            F.col("vid").alias("walk_id"),
            F.lit(0).alias("step"),
            F.col("vid").alias("vid"),
        )
    )
    try:
        for t in range(1, num_steps + 1):
            frontier = state.where(F.col("step") == t - 1).select(
                "walk_id", "vid"
            )
            cand = (
                frontier.join(
                    deg.withColumnRenamed("vid", "_dv"),
                    frontier["vid"] == F.col("_dv"),
                )
                .select(
                    "walk_id", "vid", "outdeg", F.explode(att).alias("_a")
                )
                .withColumn(
                    "_choice",
                    (
                        F.col("walk_id") * F.lit(WALK_A1)
                        + F.col("_a") * F.lit(WALK_A3)
                        + F.lit(t * WALK_A2 + seed)
                    )
                    % F.lit(WALK_P)
                    % F.col("outdeg"),
                )
            )
            cand = cand.join(
                idx,
                (cand["vid"] == idx["_isrc"])
                & (cand["_choice"] == idx["_idx"]),
            ).select(
                "walk_id",
                "vid",
                "_a",
                idx["_idst"].alias("_cand"),
                idx["_thr"].alias("_thr"),
            )
            accepted = (
                (
                    F.col("walk_id") * F.lit(WALK_A2)
                    + F.col("_a") * F.lit(WALK_A3)
                    + F.lit(t * WALK_A1 + seed)
                )
                % F.lit(WALK_P)
                % F.lit(N2V_SCALE)
            ) < F.col("_thr")
            ranked = cand.select(
                "walk_id",
                "vid",
                F.struct(
                    F.when(accepted, F.col("_a"))
                    .otherwise(F.col("_a") + F.lit(attempts))
                    .alias("k"),
                    F.col("_cand").alias("c"),
                ).alias("_kc"),
            )
            nxt = (
                ranked.groupBy("walk_id", "vid")
                .agg(F.min("_kc").alias("_best"))
                .select(
                    "walk_id",
                    F.lit(t).alias("step"),
                    F.col("_best.c").alias("vid"),
                )
            )
            new_state = plain_checkpoint(
                state.unionAll(nxt).repartition(
                    graph.num_partitions, "walk_id"
                ),
                replaces=state,
            )
            grew = new_state.where(F.col("step") == t).isEmpty() is False
            state = new_state
            if not grew:
                break
        return state
    finally:
        idx.unpersist()


def _n2v_weights(p: float, q: float) -> tuple[int, int, int, int]:
    """Fixed-point (w_return, w_neighbor, w_far, w_max) for (p, q)."""
    if p <= 0 or q <= 0:
        raise ValueError(f"p and q must be > 0, got p={p} q={q}")
    wp = round(N2V_SCALE / p)
    w1 = N2V_SCALE
    wq = round(N2V_SCALE / q)
    return wp, w1, wq, max(wp, w1, wq)


def node2vec_walks(
    graph: Graph,
    num_steps: int,
    p: float = 1.0,
    q: float = 1.0,
    starts: DataFrame | None = None,
    seed: int = 42,
    attempts: int = 4,
) -> DataFrame:
    """Second-order biased walks (node2vec, Grover & Leskovec, KDD 2016
    — public method) → ``(walk_id, step, vid)``.

    The transition out of ``v`` given previous vertex ``u`` weights each
    neighbor ``x`` by 1/p (x == u, return), 1 (edge u→x exists, stays
    near), or 1/q (else, explores) — BFS-ish for small p, DFS-ish for
    small q.  Step 1 has no previous vertex and is the uniform
    first-order pick (same arithmetic as :func:`random_walks`).

    **Scale shape — deterministic rejection sampling** (the distributed
    node2vec trick, cf. KnightKing, SOSP 2019 — public method): exact
    weighted choice would join each walker to its vertex's FULL neighbor
    list (a 10⁸-out-link hub costs 10⁸ rows per visiting walker).
    Instead each walker draws a FIXED number of uniform candidates via
    the hub-safe ``(src, idx)`` probe — ``attempts`` rows per walker,
    regardless of degree — classifies each candidate (== prev → 1/p;
    one edge-existence equi-join against the indexed edges on
    (prev, candidate) → 1; else 1/q), and accepts candidate ``a`` iff
    ``H₂(walk, t, a) mod w_max < w_class`` (pure int64 fixed-point —
    acceptance probability w_class/w_max).  The walker takes the FIRST
    accepted attempt; if all ``attempts`` reject (probability
    (1−w̄/w_max)^attempts), it falls back to attempt 0's uniform
    candidate — a bounded, documented bias that keeps walks fixed-length
    and the whole trajectory replayable as unrolled SQL (the catalog
    twin).  Raise ``attempts`` to shrink the fallback rate.

    Every per-round leaf is ``plain_checkpoint``-ed like
    :func:`random_walks`; the per-step cost is attempts·|frontier| probe
    rows — hub-safe by construction.
    """
    if num_steps < 0:
        raise ValueError("num_steps must be >= 0")
    if attempts < 1:
        raise ValueError("attempts must be >= 1")
    wp, w1, wq, wmax = _n2v_weights(p, q)
    if starts is None:
        starts = graph.vertices
    idx = indexed_edges(graph).select(
        F.col("src").alias("_isrc"),
        F.col("idx").alias("_idx"),
        F.col("dst").alias("_idst"),
    ).persist()
    # edge-existence probe side (dedup'd by construction in from_edges)
    exist = idx.select(
        F.col("_isrc").alias("_esrc"), F.col("_idst").alias("_edst")
    )
    deg = graph.out_degrees
    att = F.array(*[F.lit(a) for a in range(attempts)])

    # state rows: (walk_id, step, prev, vid); prev at step t is the
    # walker's position at t-1 (needed for the 2nd-order class test)
    state = plain_checkpoint(
        starts.select(
            F.col("vid").alias("walk_id"),
            F.lit(0).alias("step"),
            F.col("vid").alias("prev"),
            F.col("vid").alias("vid"),
        )
    )
    try:
        for t in range(1, num_steps + 1):
            frontier = state.where(F.col("step") == t - 1).select(
                "walk_id", "prev", "vid"
            )
            with_deg = frontier.join(
                deg.withColumnRenamed("vid", "_dv"),
                frontier["vid"] == F.col("_dv"),
            ).select("walk_id", "prev", "vid", "outdeg")
            if t == 1:
                # uniform first step — identical arithmetic to random_walks
                picked = with_deg.select(
                    "walk_id",
                    "vid",
                    walk_choice(
                        F.col("walk_id"), t, F.col("outdeg"), seed
                    ).alias("_choice"),
                )
                nxt = picked.join(
                    idx,
                    (picked["vid"] == idx["_isrc"])
                    & (picked["_choice"] == idx["_idx"]),
                ).select(
                    "walk_id",
                    F.lit(t).alias("step"),
                    picked["vid"].alias("prev"),
                    idx["_idst"].alias("vid"),
                )
            else:
                cand = (
                    with_deg.select(
                        "walk_id",
                        "prev",
                        "vid",
                        "outdeg",
                        F.explode(att).alias("_a"),
                    )
                    .withColumn(
                        "_h1",
                        (
                            F.col("walk_id") * F.lit(WALK_A1)
                            + F.col("_a") * F.lit(WALK_A3)
                            + F.lit(t * WALK_A2 + seed)
                        )
                        % F.lit(WALK_P),
                    )
                    .withColumn("_choice", F.col("_h1") % F.col("outdeg"))
                )
                cand = cand.join(
                    idx,
                    (cand["vid"] == idx["_isrc"])
                    & (cand["_choice"] == idx["_idx"]),
                ).select(
                    "walk_id",
                    "prev",
                    "vid",
                    "_a",
                    idx["_idst"].alias("_cand"),
                )
                cand = cand.join(
                    exist,
                    (cand["prev"] == F.col("_esrc"))
                    & (cand["_cand"] == F.col("_edst")),
                    "left",
                ).select(
                    "walk_id",
                    "prev",
                    "vid",
                    "_a",
                    "_cand",
                    F.when(F.col("_cand") == F.col("prev"), F.lit(wp))
                    .when(F.col("_esrc").isNotNull(), F.lit(w1))
                    .otherwise(F.lit(wq))
                    .alias("_w"),
                )
                accepted = (
                    (
                        F.col("walk_id") * F.lit(WALK_A2)
                        + F.col("_a") * F.lit(WALK_A3)
                        + F.lit(t * WALK_A1 + seed)
                    )
                    % F.lit(WALK_P)
                    % F.lit(wmax)
                ) < F.col("_w")
                # first accepted attempt wins; all-rejected falls back to
                # attempt 0 (keys attempts..2·attempts−1 sort after all
                # accepted keys) — struct-min argmin, skew-safe
                ranked = cand.select(
                    "walk_id",
                    "vid",
                    F.struct(
                        F.when(accepted, F.col("_a"))
                        .otherwise(F.col("_a") + F.lit(attempts))
                        .alias("k"),
                        F.col("_cand").alias("c"),
                    ).alias("_kc"),
                )
                nxt = ranked.groupBy("walk_id", "vid").agg(
                    F.min("_kc").alias("_best")
                ).select(
                    "walk_id",
                    F.lit(t).alias("step"),
                    F.col("vid").alias("prev"),
                    F.col("_best.c").alias("vid"),
                )
            new_state = plain_checkpoint(
                state.unionAll(nxt).repartition(
                    graph.num_partitions, "walk_id"
                ),
                replaces=state,
            )
            grew = new_state.where(F.col("step") == t).isEmpty() is False
            state = new_state
            if not grew:
                break
        return state.select("walk_id", "step", "vid")
    finally:
        idx.unpersist()
