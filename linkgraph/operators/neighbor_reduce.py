"""neighborreduce — segmented reduction over neighbor lists (reference O4).

Reference: ``out[v] = reduce(op, map(e ∈ N(v)))`` via moderngpu
``transform_segreduce`` [ref: include/gunrock/framework/operators/
neighborreduce/neighborreduce.hxx — UNVERIFIED; SURVEY.md §2.1].

Spark mapping: ``groupBy(dst).agg(...)`` — Spark's partial+final hash
aggregation is the distributed segmented reduce, and the shuffle-reduce is
the reference's atomic (SURVEY.md §2.4 U2: atomicAdd → sum, atomicMin →
min).

Skew (BASELINE.json:6 "salted to handle hub-page skew"): a hub page with
10^8 in-links makes the final ``groupBy(dst)`` hot.  AQE's skew handling
covers joins, not aggregations (SURVEY.md §4.3), so :func:`salted_agg`
implements explicit two-phase salted aggregation: group on
``(dst, salt)`` first (spreads a hot key over S reducers), then re-group on
``dst``.  Both phases still get map-side partial aggregation for free, so
the extra shuffle moves at most ``S × distinct_dst`` rows.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_MERGE = {
    "sum": F.sum,
    "min": F.min,
    "max": F.max,
    # bitwise-OR union: decomposable (map-side combinable) like sum/min,
    # the reduce step of FM/HyperBall sketch propagation (algorithms/anf.py)
    "bit_or": F.bit_or,
    # phase-2 merge for count is sum of partial counts
}


def salted_agg(
    df: DataFrame,
    key: str,
    value: Column,
    op: str = "sum",
    out: str = "agg",
    salt_buckets: int = 32,
    salt_col: str | Column | None = None,
) -> DataFrame:
    """Two-phase salted ``groupBy(key).op(value)`` → ``(key, out)``.

    ``salt_col`` defaults to ``pmod(hash(all other grouping-safe bits), S)``
    — we use ``spark_partition_id()`` so phase 1 needs **no shuffle at all**
    (grouping by (key, partition_id) within already-partitioned data is
    still a shuffle in DataFrame terms, but each (key, salt) group receives
    rows from exactly one map partition, so partial aggregation collapses
    it to ≤1 row per (key, input-partition) before the exchange).
    """
    if op == "count":
        phase1, phase2 = F.count(value), F.sum
    else:
        phase1, phase2 = _MERGE[op](value), _MERGE[op]
    if salt_col is None:
        salt = F.spark_partition_id() % salt_buckets
    elif isinstance(salt_col, str):
        salt = F.pmod(F.hash(F.col(salt_col)), F.lit(salt_buckets))
    else:
        salt = salt_col
    partial = df.groupBy(F.col(key), salt.alias("_salt")).agg(phase1.alias("_partial"))
    return partial.groupBy(key).agg(phase2("_partial").alias(out))


def neighbor_reduce(
    edges: DataFrame,
    state: DataFrame,
    value: Column,
    op: str = "sum",
    out: str = "agg",
    salted: bool = False,
    salt_buckets: int = 32,
) -> DataFrame:
    """Gather `state` along edges and reduce per destination vertex.

    ``state`` must have a ``vid`` column; it is joined on ``src`` (the
    gather), then ``value`` (an expression over edge+state columns) is
    reduced per ``dst`` (the scatter+reduce).  This is one PageRank/CC
    superstep's dataflow core (SURVEY.md §2.3 A1/A2).

    The join is exchange-free when ``edges`` is the graph's persisted
    hash-partitioned DataFrame and ``state`` is the superstep runtime's
    co-partitioned generation (superstep.py).

    **Skew note (measured at 10^7 edges, SURVEY.md §4.3 revised).**  For
    the decomposable ops here (sum/min/max/count) Spark's partial (map-
    side) hash aggregation ALREADY bounds each hot destination at ≤1 row
    per map partition entering the shuffle — a 10^8-in-link hub page emits
    at most P partial rows, so the final reduce is never hot and
    ``salted=True`` only adds a second full |V|-shuffle (two-phase agg ≡
    what partial+final already does).  Salting remains available — and
    necessary — for NON-decomposable aggregations (exact distinct,
    collect_list, percentile) where no map-side combine exists; the
    explicit :func:`salted_agg` is the engine's operator for those.
    """
    # hint("merge"): the state side is |V|-sized and co-partitioned with
    # the persisted edges (hash(vid,P) == hash(src,P)), so a sort-merge
    # join here is EXCHANGE-FREE and (both sides pre-sorted) SORT-FREE.
    # Without the hint Catalyst broadcasts any state under the threshold —
    # a per-superstep serial driver collect + hash-relation build that
    # measured 10× the cost of the streaming join at 10^7 edges and
    # destroys N→4N scaling (broadcast build time doesn't parallelize).
    gathered = edges.join(
        state.withColumnRenamed("vid", "src").hint("merge"),
        on="src",
        how="inner",
    )
    msgs = gathered.select(F.col("dst"), value.alias("_v"))
    if salted:
        return salted_agg(
            msgs, "dst", F.col("_v"), op=op, out=out, salt_buckets=salt_buckets
        ).withColumnRenamed("dst", "vid")
    agg_fn = F.count if op == "count" else _MERGE[op]
    return (
        msgs.groupBy("dst")
        .agg(agg_fn("_v").alias(out))
        .withColumnRenamed("dst", "vid")
    )


def neighbor_reduce_multi(
    edges: DataFrame,
    state: DataFrame,
    aggs: list[tuple[Column, str, str]],
) -> DataFrame:
    """:func:`neighbor_reduce` for SEVERAL reductions in ONE gather pass.

    ``aggs`` is a list of ``(value, op, out)`` triples; all reductions
    share the single exchange-free gather join and the single
    shuffle-reduce by ``dst`` (one |V|-row exchange total, not one per
    reduction) — the dataflow of a multi-register sketch superstep
    (algorithms/anf.py propagates k FM registers per round this way).
    Every op must be decomposable (map-side combinable): sum/min/max/
    count/bit_or.
    """
    gathered = edges.join(
        state.withColumnRenamed("vid", "src").hint("merge"),
        on="src",
        how="inner",
    )
    exprs = []
    for value, op, out in aggs:
        agg_fn = F.count if op == "count" else _MERGE[op]
        exprs.append(agg_fn(value).alias(out))
    return gathered.groupBy("dst").agg(*exprs).withColumnRenamed("dst", "vid")
