"""OPIC — Online Page Importance Computation (Abiteboul, Preda &
Cobena, *Adaptive on-line page importance computation*, WWW 2003):
the classic crawl-frontier prioritization signal.

Reference: none — upstream essentials carries no crawl-ordering kernel;
added per the task brief's web-crawl mandate.  Each page holds CASH
(current importance flow) and HISTORY (cash that has flowed through it);
a step moves every page's cash to its out-neighbors in equal shares and
banks the moved cash into history.  Importance ≈ history / total
history — pages that keep receiving cash are the ones worth crawling
next.  This is the batch-SYNCHRONOUS variant (all pages step together,
the natural Spark formulation; the paper's asynchronous per-page
schedule converges to the same fixpoint), with dangling pages
redistributing their cash uniformly — the same probability-form
handling as the engine's PageRank, to which OPIC is the un-damped
(alpha = 1) cousin with an accumulator.

Scale shape: identical to the PageRank superstep — one exchange-free
gather over the persisted edge layout + one map-side-combined
shuffle-reduce by destination — plus a 1-row dangling-mass aggregate
cross-joined back (broadcast of a single row, not a |V| side).  The
history column rides the state leaf; no extra jobs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.operators.neighbor_reduce import neighbor_reduce
from linkgraph.superstep import IterationResult, iterate, plain_checkpoint


def opic_round(graph: Graph, state: DataFrame, n: int) -> DataFrame:
    """ONE synchronous OPIC step over ``(vid, cash, hist, outdeg)``."""
    contrib = state.where(F.col("outdeg").isNotNull()).select(
        "vid", (F.col("cash") / F.col("outdeg")).alias("contrib")
    )
    sums = neighbor_reduce(
        graph.edges, contrib, F.col("contrib"), op="sum", out="msum"
    )
    dang = state.where(F.col("outdeg").isNull()).agg(
        F.coalesce(F.sum("cash"), F.lit(0.0)).alias("_dang")
    )
    return (
        state.join(sums.hint("merge"), "vid", "left")
        .crossJoin(F.broadcast(dang))
        .select(
            "vid",
            (
                F.coalesce(F.col("msum"), F.lit(0.0))
                + F.col("_dang") / F.lit(float(n))
            ).alias("cash"),
            (F.col("hist") + F.col("cash")).alias("hist"),
            "outdeg",
        )
    )


def opic(
    graph: Graph, iters: int = 8, init_state: DataFrame | None = None
) -> IterationResult:
    """Run ``iters`` synchronous OPIC steps: state ``(vid, cash, hist,
    outdeg)`` with Σcash = 1 invariant (cash is conserved; history
    grows by exactly 1 per step, so Σhist = iters).

    ``init_state`` — warm start: a ``(vid, cash, hist)`` table (a
    previous epoch's state).  Validity (the cash-conservation argument,
    verified here rather than assumed): the step is linear in cash and
    conserves Σcash, and the paper's importance estimate is the
    HISTORY's long-run rate, which converges for any non-negative cash
    vector with Σcash = 1 — so an arbitrary non-negative init is valid
    once RESCALED to the simplex, which this function does (a 1-row
    broadcast total; Σ ≤ 0 falls back to the cold uniform seed).  On
    the same graph the step is memoryless, so seeding with round-k's
    state continues the cold trajectory exactly — ``opic_warm8``
    hash-checks warm(5 + 3) against the cold ``opic8`` unrolled twin
    (the rescale divides by a Σ within fp-ulps of 1, absorbed by the
    entry's 6-decimal rounding).  Vertices absent from ``init_state``
    (new urls) seed cash 0 / hist 0 — they accumulate importance
    through in-links and dangling redistribution, the paper's adaptive
    behavior for newly discovered pages.
    """
    n = graph.num_vertices
    if init_state is None:
        init = (
            graph.vertices.select(
                "vid",
                F.lit(1.0 / n).alias("cash"),
                F.lit(0.0).alias("hist"),
            )
            .join(graph.out_degrees, "vid", "left")
        )
    else:
        prev = init_state.select(
            "vid",
            F.col("cash").cast("double").alias("_pc"),
            F.col("hist").cast("double").alias("_ph"),
        )
        base = graph.vertices.join(prev.hint("merge"), "vid", "left")
        tot = base.agg(F.coalesce(F.sum("_pc"), F.lit(0.0)).alias("_t"))
        init = (
            base.crossJoin(F.broadcast(tot))
            .select(
                "vid",
                F.when(
                    F.col("_t") > 0,
                    F.coalesce("_pc", F.lit(0.0)) / F.col("_t"),
                )
                .otherwise(F.lit(1.0 / n))
                .alias("cash"),
                F.coalesce("_ph", F.lit(0.0)).alias("hist"),
            )
            .join(graph.out_degrees, "vid", "left")
        )
    return iterate(
        init,
        lambda s, i: opic_round(graph, s, n),
        max_iters=iters,
    )


def crawl_priorities(graph: Graph, iters: int = 8) -> DataFrame:
    """Crawl-ordering view: ``(vid, importance)`` with importance =
    (hist + cash) / (iters + 1) — the paper's history-plus-current
    estimator, normalized to sum to 1."""
    res = opic(graph, iters=iters)
    return res.state.select(
        "vid",
        ((F.col("hist") + F.col("cash")) / F.lit(float(iters + 1))).alias(
            "importance"
        ),
    )


def allocate_crawl_budget(
    weights: DataFrame,
    total_slots: int,
    key_col: str = "host",
    weight_col: str = "w",
) -> DataFrame:
    """Integer fetch-slot allocation proportional to ``weight_col`` by
    the largest-remainder (Hamilton) method: ``(key, slots)`` with
    ``Σ slots = total_slots`` exactly.

    The crawl-scheduling step downstream of OPIC/PageRank: a politeness
    budget of N fetches per cycle split across hosts in proportion to
    importance, with the rounding residue assigned deterministically
    (largest fractional part first, key ASC on ties) so every scheduler
    replica computes the identical allocation.

    Physical shape: one 1-row total aggregate (broadcast), one
    projection computing ``floor(w·N/T)`` + fractional parts, and ONE
    global top-R selection for the residue — R < |keys| but the
    selection is a ``TakeOrdered`` (per-partition top-R then driver
    merge of R-row heads), never a full sort of the 10⁸-host table.
    The +1 set joins back broadcast-style.
    """
    if total_slots < 0:
        raise ValueError(f"total_slots must be >= 0, got {total_slots}")
    tot = weights.agg(F.sum(weight_col).alias("_t")).collect()[0]["_t"]
    if tot is None or float(tot) <= 0.0:
        raise ValueError(
            f"weights must sum to a positive value, got {tot} — a cold "
            "crawl cycle should seed uniform weights, not zeros"
        )
    # quota quantized to 9 decimals BEFORE floor/frac: the total is a
    # driver-side scalar (deterministic), but real-valued weights still
    # leave the floor/ranking one ulp from flipping at integer quota
    # boundaries across replicas — the same quantize-before-compare
    # discipline as ppr_push's frontier threshold
    quota = F.round(
        F.col(weight_col).cast("double")
        * float(total_slots)
        / float(tot),
        9,
    )
    base = weights.select(
        F.col(key_col),
        F.floor(quota).alias("_base"),
        F.round(quota - F.floor(quota), 9).alias("_frac"),
    ).localCheckpoint(eager=True)  # reused 3× below: one computation
    used = base.agg(F.sum("_base").alias("_u")).collect()[0]["_u"] or 0
    residue = int(total_slots - used)
    plus = (
        base.orderBy(F.desc("_frac"), F.asc(key_col))
        .limit(residue)
        .select(key_col, F.lit(1).alias("_plus"))
    )
    out = base.join(plus, key_col, "left").select(
        key_col,
        (F.col("_base") + F.coalesce("_plus", F.lit(0)))
        .cast("long")
        .alias("slots"),
    )
    # Materialize the (compact, |keys|-row) allocation as its own leaf and
    # free base's MEMORY_AND_DISK blocks — repeated scheduler invocations
    # in one session must not accumulate checkpoint storage for the
    # ContextCleaner (same replaces discipline as the iterate runtime).
    return plain_checkpoint(out, replaces=base)
