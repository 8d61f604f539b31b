"""Approximate neighborhood function / effective diameter — FM sketches.

Public-knowledge formulation: ANF (Palmer, Gibbons, Faloutsos, KDD 2002)
estimates ``N(v, t) = |{u : dist(u → v) ≤ t}|`` for every vertex with k
Flajolet-Martin bitmask sketches; HyperBall (Boldi & Vigna 2013) is the
same iteration with HyperLogLog registers.  The FM variant maps EXACTLY
onto the engine's superstep dataflow because the sketch union is a
bitwise OR — a decomposable aggregation Spark executes JVM-side with
map-side partial combine (``F.bit_or``), so each round is the standard
one-live-|V|-shuffle superstep: exchange-free gather join on the
persisted hash(src) edge layout + ``groupBy(dst).agg(bit_or)`` + merge.

Direction: the gather joins state on ``src`` and reduces by ``dst``, so
after t rounds vertex v's sketch covers ``{u : u →* v within t hops}``
— the IN-ball ("how many pages can reach v"), the natural web-graph
form.  For out-balls run on ``graph.reversed()``-style edges.

Determinism / oracle replay: register j of vertex v is initialized to
the isolated lowest set bit of ``h_j(v)`` where ``h_j(v)`` = first 8
hex chars of ``md5(f"{j}:{v}")`` — trailing-zero rank r occurs with
the FM-required geometric probability 2^-(r+1), and the whole pipeline
is md5 + integer bit ops, replayable bit-for-bit in DuckDB
(queries._anf_unrolled_sql).  No float appears anywhere in the sketch
state; rank extraction avoids ``log2`` (whose exactness on powers of
two is not guaranteed identical across engines) via the exact
``2^m mod 37`` perfect-hash CASE (all residues distinct for m ≤ 35).

Scale shape at 10^12 documents: state is (vid, k longs) — 8k bytes per
vertex; each round shuffles ≤ one partially-OR'd row per (dst,
partition), so a 10^8-in-link hub costs P rows, not 10^8 (same argument
as neighbor_reduce's skew note).  Rounds needed = graph diameter
(web graphs: ~16-20 effective).  k controls variance (stderr ≈
0.78/√k per vertex; sums over |V| concentrate much tighter).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.operators.neighbor_reduce import neighbor_reduce_multi
from linkgraph.superstep import CheckpointManager, IterationResult, iterate

# Flajolet-Martin bias correction: E[2^R] ≈ φ · n  ⇒  n̂ = 2^R / φ
FM_PHI = 0.77351

# exact power-of-two → exponent mapping: 2^m mod 37 is injective for
# m ∈ [0, 35] (37 is prime with multiplicative order 36 for 2)
_POW2_MOD37 = {pow(2, m) % 37: m for m in range(34)}


def _fm_init_col(vid: Column, j: int) -> Column:
    """Register j's initial sketch: 1 << (trailing zeros of h_j(vid)).

    ``h & -h`` isolates the lowest set bit — which IS ``1 << r`` — so no
    rank extraction is needed at init.  h = 0 (probability 2^-32) maps
    to the top bit of the 32-bit register window.
    """
    h = (
        F.conv(
            F.substring(F.md5(F.concat(F.lit(f"{j}:"), vid.cast("string"))), 1, 8),
            16,
            10,
        )
        .cast("long")
    )
    return F.when(h == 0, F.lit(1 << 31)).otherwise(h.bitwiseAND(-h))


# residue → exponent as a 37-slot lookup table (None on the 3 residues
# 2^m never hits for m ≤ 33)
_RANK_BY_RESIDUE = [_POW2_MOD37.get(r) for r in range(37)]


def _lowest_zero_rank(sk: Column) -> Column:
    """Index of the lowest ZERO bit of a sketch (int) — FM's R statistic.

    ``(s | (s+1)) ^ s`` isolates the lowest zero bit exactly; the
    exponent comes from the 2^m mod 37 perfect hash (exact integer
    arithmetic, engine-portable — see module doc), realized as ONE
    constant-folded array index rather than a nested WHEN chain: each
    ``when().otherwise()`` level is a separate CaseWhen that re-embeds
    the whole ``z % 37`` subtree, so the chain form duplicates the
    sketch expression 34× per register and overflows janino's 64 KB
    method limit (→ interpreted fallback) once k·34 copies fuse into
    one whole-stage method.  The DuckDB twin keeps the textual CASE —
    identical integer values either way (queries._anf_rank_sql)."""
    z = (sk.bitwiseOR(sk + 1)).bitwiseXOR(sk)
    arr = F.array(
        *[
            F.lit(m).cast("int") if m is not None else F.lit(None).cast("int")
            for m in _RANK_BY_RESIDUE
        ]
    )
    return F.element_at(arr, (z % 37).cast("int") + 1)


def rank_sum_col(k: int, cols: list[Column] | None = None) -> Column:
    """Σ_j lowest-zero-rank(sk_j) — the exact-integer per-vertex
    statistic the catalog entry exposes (the float estimate is a pure
    function of it: n̂ = 2^(rsum/k)/φ)."""
    cols = cols or [F.col(f"sk{j}") for j in range(k)]
    total = _lowest_zero_rank(cols[0])
    for j in range(1, k):
        total = total + _lowest_zero_rank(cols[j])
    return total.cast("int")


# 2^m as exact double literals (m ≤ 34 = max rank 33 + 1 headroom) and
# the fractional-power constants 2^(j/k): pow() with a non-integer
# exponent is only 1-ulp-accurate and NOT guaranteed identical across
# engines, so the estimate 2^(rsum/k) is decomposed into an exact CASE
# on the integer part times a literal constant for the fraction —
# bit-identical in Spark and DuckDB (queries._harmonic_unrolled_sql
# builds the same expression textually).
_POW2_FLOAT = {m: float(1 << m) for m in range(35)}


def frac_pow2_consts(k: int) -> list[float]:
    return [2.0 ** (j / k) for j in range(k)]


def ball_estimate_col(k: int, cols: list[Column] | None = None) -> Column:
    """Per-vertex in-ball size estimate n̂(v) = 2^(rsum/k)/φ, computed
    engine-portably: exact 2^⌊rsum/k⌋ × literal 2^((rsum mod k)/k) / φ —
    no fractional pow anywhere.  Both constants are selected by ARRAY
    INDEX (element_at on literal arrays), not nested WHEN chains: each
    WHEN level would re-embed the whole k-register rank-sum expression,
    and at k=64 that ~100× tree blowup OOMs the driver during codegen
    (the rsum subtree appears exactly 3× here — measured safe at k=64)."""
    rsum = rank_sum_col(k, cols)
    whole = F.floor(rsum / F.lit(k)).cast("int")
    pow2 = F.element_at(
        F.array(*[F.lit(_POW2_FLOAT[m]) for m in range(35)]), whole + 1
    )
    qf = F.element_at(
        F.array(*[F.lit(v) for v in frac_pow2_consts(k)]), (rsum % k) + 1
    )
    return pow2 * qf / FM_PHI


def anf_round(
    graph: Graph, state: DataFrame, k: int, t: int | None = None
) -> DataFrame:
    """ONE sketch-propagation superstep over ``(vid, sk0..sk{k-1})``.

    All k registers ride a single gather + a single bit_or shuffle
    (neighbor_reduce_multi); the merge join is exchange-free on the
    checkpoint leaves.  Emits ephemerals ``_changed`` (1 iff any
    register gained a bit — drives convergence) and ``_est`` (per-vertex
    ball estimate — observed to give NF(t) with zero extra jobs).

    With ``t`` (the 1-based round number) the state also carries ``est``
    (last round's ball estimate) and TWO geometric-centrality
    accumulators (HyperBall's headline applications, Boldi & Vigna
    2013): ``hc += (n̂_t − n̂_{t−1})/t`` (harmonic — each newly reached
    vertex at distance t contributes 1/t) and ``sd += (n̂_t − n̂_{t−1})·t``
    (sum of distances — the closeness denominator).  Carrying ``est``
    in state
    means the k-register estimate expression is built ONCE per round
    (over the new sketches) instead of 3× (old + delta + metric) — the
    3× form overflows janino's 64 KB method limit at k≥16 and falls
    back to interpreted eval.
    """
    new_sk_exprs = [
        F.col(f"sk{j}").bitwiseOR(F.coalesce(F.col(f"m{j}"), F.lit(0)))
        for j in range(k)
    ]
    sums = neighbor_reduce_multi(
        graph.edges,
        state,
        [(F.col(f"sk{j}"), "bit_or", f"m{j}") for j in range(k)],
    )
    merged = state.join(sums.hint("merge"), "vid", "left")
    changed = F.lit(False)
    for j in range(k):
        changed = changed | (new_sk_exprs[j] != F.col(f"sk{j}"))
    cols = ["vid"] + [e.alias(f"sk{j}") for j, e in enumerate(new_sk_exprs)]
    if t is None:
        out = merged.select(
            *cols, F.when(changed, 1).otherwise(0).alias("_changed")
        )
        return out.withColumn("_est", ball_estimate_col(k))
    # harmonic: estimate the new ball size once, in its own projection
    # (Catalyst's CollapseProject keeps a 3-referenced expensive
    # expression in its own node rather than re-inlining it)
    mid = merged.select(
        *cols,
        "hc",
        "sd",
        "est",
        F.when(changed, 1).otherwise(0).alias("_changed"),
        ball_estimate_col(k, new_sk_exprs).alias("_estnew"),
    )
    return mid.select(
        "vid",
        *[f"sk{j}" for j in range(k)],
        (F.col("hc") + (F.col("_estnew") - F.col("est")) / F.lit(float(t))).alias(
            "hc"
        ),
        (F.col("sd") + (F.col("_estnew") - F.col("est")) * F.lit(float(t))).alias(
            "sd"
        ),
        F.col("_estnew").alias("est"),
        "_changed",
        F.col("_estnew").alias("_est"),
    )


def anf(
    graph: Graph,
    k: int = 8,
    max_iters: int = 32,
    harmonic: bool = False,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 5,
    resume: bool = True,
) -> IterationResult:
    """Run sketch propagation until no register changes (≈ diameter
    rounds) or ``max_iters``.

    Result state: ``(vid, sk0..sk{k-1})`` (plus ``hc`` — the harmonic
    centrality Σ_u 1/d(u→v) estimate —, ``sd`` — the estimated sum of
    distances Σ_u d(u→v), closeness' denominator — and ``est`` — the
    final ball estimate — when ``harmonic=True``; early stability stop
    never changes hc/sd, because stable sketches make every later delta
    exactly 0).  ``history[t-1]["nf"]`` is the estimated
    neighborhood function NF(t) = Σ_v n̂(v, t) after round t (observed
    metric of the superstep job itself)."""
    init_exprs = [_fm_init_col(F.col("vid"), j) for j in range(k)]
    init_cols = [e.alias(f"sk{j}") for j, e in enumerate(init_exprs)]
    if harmonic:
        init_cols.append(F.lit(0.0).alias("hc"))
        init_cols.append(F.lit(0.0).alias("sd"))
        init_cols.append(ball_estimate_col(k, init_exprs).alias("est"))
    init = graph.vertices.select("vid", *init_cols)

    def step(state: DataFrame, i: int) -> DataFrame:
        return anf_round(graph, state, k, t=(i + 1) if harmonic else None)

    stats_cols = [
        F.sum("_changed").alias("changed"),
        F.sum("_est").alias("nf"),
    ]

    def converged(s: dict) -> bool:
        return s.get("changed") is not None and s["changed"] == 0

    result = iterate(
        init,
        step,
        stats_cols=stats_cols,
        converged=converged,
        max_iters=max_iters,
        checkpoint=checkpoint,
        checkpoint_every=checkpoint_every,
        resume=resume,
        ephemeral_cols=("_changed", "_est"),
    )
    keep = (
        ["vid"]
        + [f"sk{j}" for j in range(k)]
        + (["hc", "sd", "est"] if harmonic else [])
    )
    result.state = result.state.select(*keep)
    return result


def harmonic_centrality(
    graph: Graph,
    k: int = 8,
    max_iters: int = 32,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """Approximate in-harmonic centrality ``H(v) = Σ_{u≠v} 1/d(u→v)``
    per vertex — the HyperBall application (Boldi & Vigna, "In-Core
    Computation of Geometric Centralities with HyperBall", 2013):
    run sketch propagation to stability, accumulating
    ``(n̂_t − n̂_{t−1})/t`` per round.  Returns ``(vid, harmonic)``."""
    res = anf(
        graph, k=k, max_iters=max_iters, harmonic=True, checkpoint=checkpoint
    )
    return res.state.select("vid", F.col("hc").alias("harmonic"))


def closeness_centrality(
    graph: Graph,
    k: int = 8,
    max_iters: int = 32,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """Approximate in-closeness ``C(v) = reach(v) / Σ_{u≠v} d(u→v)``
    per vertex — HyperBall's second geometric centrality (Boldi &
    Vigna 2013, §4: "closeness" with the reachable-set numerator, the
    form that stays meaningful on disconnected/directed graphs).

    ``reach(v) = n̂_∞ − n̂_0`` and the distance sum rides the same
    sketch run as harmonic centrality (``sd`` accumulator), so the
    whole metric costs ZERO extra jobs over ``anf()``; vertices that
    reach nothing (sd = 0) get closeness 0.  Returns
    ``(vid, closeness)``."""
    res = anf(
        graph, k=k, max_iters=max_iters, harmonic=True, checkpoint=checkpoint
    )
    # n̂_0 is a pure function of vid (the init sketches are md5-derived),
    # so it is recomputed as an expression — no extra state column and
    # no extra job
    est0 = ball_estimate_col(
        k, [_fm_init_col(F.col("vid"), j) for j in range(k)]
    )
    return res.state.select(
        "vid",
        F.when(
            F.col("sd") > 0.0, (F.col("est") - est0) / F.col("sd")
        )
        .otherwise(F.lit(0.0))
        .alias("closeness"),
    )


def effective_diameter(
    graph: Graph,
    q: float = 0.9,
    k: int = 8,
    max_iters: int = 64,
    checkpoint: CheckpointManager | None = None,
) -> dict:
    """q-effective diameter: smallest t such that NF(t) ≥ q·NF(∞),
    linearly interpolated between rounds (ANF §3.3 convention).

    Returns ``{"diameter": float, "nf": [NF(0), NF(1), ...],
    "rounds": int, "converged": bool}``.  One extra small job computes
    NF(0) from the init sketches; every other point rides the
    superstep jobs as observed metrics."""
    res = anf(graph, k=k, max_iters=max_iters, checkpoint=checkpoint)
    nf0_df = graph.vertices.select(
        "vid", *[_fm_init_col(F.col("vid"), j).alias(f"sk{j}") for j in range(k)]
    )
    nf0 = nf0_df.select(F.sum(ball_estimate_col(k)).alias("nf")).collect()[0]["nf"]
    nfs = [float(nf0)] + [float(h["nf"]) for h in res.history]
    # ORed sketches only grow, but the ESTIMATE of a later round can
    # dip below an earlier one's bias noise; clamp to non-decreasing so
    # the quantile crossing is well-defined
    for i in range(1, len(nfs)):
        nfs[i] = max(nfs[i], nfs[i - 1])
    target = q * nfs[-1]
    d = float(len(nfs) - 1)
    for t in range(len(nfs)):
        if nfs[t] >= target:
            if t == 0:
                d = 0.0
            else:
                lo, hi = nfs[t - 1], nfs[t]
                frac = 0.0 if hi == lo else (target - lo) / (hi - lo)
                d = (t - 1) + frac
            break
    return {
        "diameter": d,
        "nf": nfs,
        "rounds": res.iterations,
        "converged": res.converged,
    }
