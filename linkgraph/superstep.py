"""Superstep runtime — the engine's enactor (reference O7, SURVEY.md §2.1).

Reference [ref: include/gunrock/framework/enactor.hxx — UNVERIFIED]:
``enact() = prepare_frontier(); while (!is_converged()) loop(ctx);`` with
double-buffered frontiers living on-device across iterations.

Spark has no cross-job mutable state, so the runtime supplies what the
enactor got for free (SURVEY.md §4.4):

- **generation management + lineage truncation**: each superstep's output
  state is materialized (persist + stats action) and then re-rooted as an
  eager ``localCheckpoint`` leaf that KEEPS its hash-partitioning and
  in-partition ordering (see :func:`iterate` — the checkpoint job runs
  with AQE off because an adaptive plan checkpoints as
  ``UnknownPartitioning``).  Iteration ``k+1`` therefore plans against a
  single co-partitioned leaf node: joins against the persisted edges are
  exchange-free and sort-free, and the logical plan never grows (a naive
  persist chain triples per superstep and dies in driver-side planning).
  The previous generation is dropped (double-buffering); Spark's
  ContextCleaner reclaims its storage.
- **durable checkpoints**: every ``checkpoint_every`` iterations (and at
  convergence) the state is also written to Parquet with a manifest —
  the durable resume point (BASELINE.json:6 "checkpoints frontier + rank
  tables ... so runs resume mid-convergence").  ``localCheckpoint`` alone
  is not crash-durable; Parquet epochs are.
- **convergence**: ``stats_cols`` (aggregate Columns over the new state,
  e.g. ``max(_delta)``) are attached to the superstep plan with
  ``Dataset.observe`` and collected DURING the materialization job —
  the reference's device→host scalar readback (SURVEY.md §4.9) costs
  zero extra jobs (measured: the separate stats job was 0.6 s/superstep
  at 8 cores, 1.9 s at 2, on a 3×10^7-edge graph).  The legacy
  ``stats_fn(old, new) -> 1-row DataFrame`` path remains for metrics
  that must join both generations.
- **metrics**: one JSONL row per iteration (iter, wall_ms, stats),
  partition histogram in each epoch manifest — the per-partition lineage
  + metrics sidecar the graft mandates.

Checkpoint directory layout (FIXTURES.md F6)::

    <dir>/epoch=<iter>/state.parquet
    <dir>/epoch=<iter>/_manifest.json
    <dir>/metrics.jsonl
"""

from __future__ import annotations

import json
import os
import threading
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import Column, DataFrame, Observation, SparkSession
from pyspark.storagelevel import StorageLevel
from pyspark.sql import functions as F

StepFn = Callable[[DataFrame, int], DataFrame]
StatsFn = Callable[[DataFrame, DataFrame], DataFrame]
ConvergedFn = Callable[[dict], bool]

# Guards the AQE-off window around checkpoint-leaf builds.  The
# spark.sql.adaptive.enabled toggle is a SESSION-global RuntimeConfig:
# two iterate() calls on concurrent threads (operators/batch.run_batch)
# would otherwise race the read-toggle-restore sequence — one thread's
# checkpoint could run with AQE still on (an UnknownPartitioning leaf,
# silently re-introducing per-superstep exchanges) and the session could
# be left with AQE permanently off.
#
# Refcounted first-in/last-out rather than a plain lock held across the
# materialization job: essentially ALL of a superstep's work happens
# inside the eager localCheckpoint, so holding one lock across it would
# serialize concurrent run_batch instances (~1× instead of ~4×
# throughput).  Every holder wants the same state (AQE off), so only the
# conf read/toggle/restore needs mutual exclusion — the enclosed jobs
# overlap freely while the count is > 0.
_AQE_GATE = threading.Lock()
_AQE_HOLDERS: dict[str, list] = {}  # session key -> [holders, saved value]


class _aqe_disabled:
    """Context manager: AQE disabled for ``spark`` while ≥1 holder is
    inside (first-in saves + disables, last-out restores)."""

    def __init__(self, spark: SparkSession):
        self.spark = spark
        # id() alone can alias a recreated session at the same address;
        # pairing it with the context's applicationId (new per context)
        # makes stale aliasing harmless for these short-lived entries.
        self.key = f"{spark.sparkContext.applicationId}/{id(spark)}"

    def __enter__(self) -> "_aqe_disabled":
        with _AQE_GATE:
            st = _AQE_HOLDERS.get(self.key)
            if st is None:
                saved = self.spark.conf.get("spark.sql.adaptive.enabled")
                self.spark.conf.set("spark.sql.adaptive.enabled", "false")
                _AQE_HOLDERS[self.key] = [1, saved]
            else:
                st[0] += 1
        return self

    def __exit__(self, *exc) -> None:
        with _AQE_GATE:
            st = _AQE_HOLDERS[self.key]
            st[0] -= 1
            if st[0] == 0:
                del _AQE_HOLDERS[self.key]
                self.spark.conf.set("spark.sql.adaptive.enabled", st[1])


@dataclass
class IterationResult:
    state: DataFrame
    iterations: int
    converged: bool
    history: list[dict] = field(default_factory=list)


def delta_stats(col: str = "_delta", out: str = "delta") -> list[Column]:
    """L∞ convergence metric (PR, SURVEY.md §2.3 A1).

    The superstep computes per-vertex ``|rank' − rank|`` inline as a state
    column (the old state is already part of the superstep join, so this
    costs nothing); convergence is then ``max(_delta)`` observed during
    the materialization job — no extra job, no old⋈new join.
    """
    return [F.max(F.col(col)).alias(out)]


def changed_stats(col: str = "_changed", out: str = "changed") -> list[Column]:
    """Count of vertices whose label changed (CC/LP convergence); same
    inline-column pattern as :func:`delta_stats`."""
    return [F.sum(F.col(col).cast("long")).alias(out)]


class CheckpointManager:
    """Durable Parquet checkpoints with manifests for mid-run resume."""

    def __init__(self, spark: SparkSession, directory: str):
        self.spark = spark
        self.directory = directory
        os.makedirs(directory, exist_ok=True)

    def epoch_dir(self, iteration: int) -> str:
        return os.path.join(self.directory, f"epoch={iteration:06d}")

    def write(self, state: DataFrame, iteration: int, stats: dict) -> None:
        d = self.epoch_dir(iteration)
        path = os.path.join(d, "state.parquet")
        # Invalidate any prior manifest for this epoch BEFORE overwriting
        # its data: a crash mid-overwrite must not leave a complete:true
        # manifest pointing at partial/deleted parquet (latest() would
        # silently resume from corrupt state).
        mf = os.path.join(d, "_manifest.json")
        if os.path.exists(mf):
            os.remove(mf)
        state.write.mode("overwrite").parquet(path)
        # Per-partition lineage: row count per WRITTEN partition — computed
        # from the pre-write DataFrame (the checkpointed generation whose
        # partitions map 1:1 onto writer tasks/files), not from a re-read:
        # parquet scan splits merge/split files by size, so a read-side
        # histogram would describe arbitrary scan splits AND cost an extra
        # full |V| re-read per epoch.  This aggregate runs over the already
        # materialized checkpoint blocks.
        part_hist = [
            {"partition": int(r["pid"]), "rows": int(r["rows"])}
            for r in state.groupBy(F.spark_partition_id().alias("pid"))
            .agg(F.count(F.lit(1)).alias("rows"))
            .collect()
        ]
        manifest = {
            "iteration": iteration,
            "stats": stats,
            "partitions": part_hist,
            "schema": state.schema.jsonValue(),
            "complete": True,
        }
        with open(os.path.join(d, "_manifest.json"), "w") as f:
            json.dump(manifest, f)

    def append_metrics(self, row: dict) -> None:
        with open(os.path.join(self.directory, "metrics.jsonl"), "a") as f:
            f.write(json.dumps(row) + "\n")

    def truncate_metrics(self, resume_iter: int) -> None:
        """Drop metrics rows from iterations being re-run after a resume.

        A crash between the last durable epoch (iteration k) and the
        next one leaves metrics rows for iterations > k; the resumed run
        re-executes and re-appends those iterations, so consumers that
        count rows or sum ``new_vertices`` would double-count (ADVICE
        r01).  Called by the resume paths with the epoch iteration:
        rewrites metrics.jsonl keeping rows with ``iter`` ≤ k (and rows
        without an ``iter`` key), then appends a ``resume_from`` marker
        so the restart point stays visible in the log.
        """
        path = os.path.join(self.directory, "metrics.jsonl")
        if not os.path.exists(path):
            return
        with open(path) as f:
            lines = f.readlines()
        kept, dropped = [], 0
        for line in lines:
            try:
                row = json.loads(line)
            except json.JSONDecodeError:
                kept.append(line)
                continue
            if isinstance(row.get("iter"), (int, float)) and row["iter"] > resume_iter:
                dropped += 1
            else:
                kept.append(line)
        tmp = path + ".tmp"
        with open(tmp, "w") as f:
            f.writelines(kept)
            f.write(
                json.dumps({"resume_from": resume_iter, "dropped_rows": dropped})
                + "\n"
            )
        os.replace(tmp, path)

    def latest(self) -> tuple[int, DataFrame, dict] | None:
        """Most recent complete epoch → (iteration, state, stats)."""
        if not os.path.isdir(self.directory):
            return None
        best = None
        for name in os.listdir(self.directory):
            if not name.startswith("epoch="):
                continue
            mf = os.path.join(self.directory, name, "_manifest.json")
            try:
                with open(mf) as f:
                    manifest = json.load(f)
            except (OSError, json.JSONDecodeError):
                continue  # incomplete epoch (crash mid-write) — skip
            if manifest.get("complete"):
                it = int(manifest["iteration"])
                if best is None or it > best[0]:
                    best = (it, manifest)
        if best is None:
            return None
        it, manifest = best
        state = self.spark.read.parquet(
            os.path.join(self.epoch_dir(it), "state.parquet")
        )
        return it, state, manifest.get("stats", {})


def strip_origin_stats(df: DataFrame) -> DataFrame:
    """Re-wrap a ``localCheckpoint``-ed DataFrame's ``LogicalRDD`` leaf
    without its ``originStats`` (same RDD, same partitioning/ordering —
    no data movement, no extra job).

    Why (measured, PySpark 4.1): checkpoint leaves PRESERVE the origin
    plan's estimated ``sizeInBytes``.  An iterative superstep whose step
    references the previous state twice (e.g. PageRank's gather + merge
    join) therefore *squares* the estimate every generation — the
    BigInteger's digit count doubles per iteration, and past ~20
    iterations Catalyst's size-only stats visitor (consulted by
    broadcast and runtime-filter rules on every plan) grinds through
    million-digit Toom-Cook multiplications on the driver: late
    iterations stall with one core burning in ``BigInteger.multiply``.
    Dropping originStats resets every generation to the default size
    estimate (Long.MaxValue — deliberately conservative: these leaves
    must never be auto-broadcast anyway; the runtime pins merge joins).
    Best-effort: any reflection failure returns the input unchanged.
    """
    try:
        jdf = df._jdf
        plan = jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() != "LogicalRDD":
            return df
        spark = df.sparkSession
        jvm = spark._jvm
        none = getattr(getattr(jvm.scala, "None$"), "MODULE$")
        stripped = jvm.org.apache.spark.sql.execution.LogicalRDD(
            plan.output(), plan.rdd(), plan.outputPartitioning(),
            plan.outputOrdering(), plan.isStreaming(), plan.stream(),
            spark._jsparkSession, none, none,
        )
        ds = getattr(getattr(jvm.org.apache.spark.sql.classic, "Dataset$"), "MODULE$")
        return DataFrame(ds.ofRows(spark._jsparkSession, stripped), spark)
    except Exception:
        return df


def plain_checkpoint(
    df: DataFrame, replaces: DataFrame | None = None
) -> DataFrame:
    """Constant-stats checkpoint leaf for HAND-ROLLED iteration loops
    (bfs/sssp/bc and similar algorithms that don't run under
    :func:`iterate` because their loop shape doesn't fit the one-state
    protocol).

    Gives such loops the two properties the :func:`iterate` runtime
    provides (and whose absence was measured as driver stalls / storage
    pileup — see :func:`strip_origin_stats` and the per-iteration
    protocol comment):

    - ``strip_origin_stats``: a loop whose step references the previous
      leaf twice (any self-join/union+anti-join shape) otherwise squares
      the preserved ``sizeInBytes`` estimate per round — past ~20-25
      rounds the driver stalls in million-digit BigInteger multiplies;
    - ``replaces``: explicitly frees the superseded generation's
      checkpoint blocks (safe only AFTER the new leaf is materialized,
      which the eager checkpoint here guarantees) instead of letting
      |V|-sized block sets pile up for the ContextCleaner.

    Unlike ``iterate``'s ``checkpoint_leaf`` this does NOT toggle AQE or
    preserve partitioning metadata — hand-rolled loops don't rely on a
    canonical layout; callers that do should use :func:`iterate`.
    """
    new = strip_origin_stats(
        df.localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )
    if replaces is not None:
        _free_checkpoint_blocks(replaces)
    return new


def iterate(
    state: DataFrame,
    step: StepFn,
    stats_cols: list[Column] | None = None,
    converged: ConvergedFn = lambda s: False,
    max_iters: int = 100,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 5,
    resume: bool = True,
    partition_key: str = "vid",
    stats_fn: StatsFn | None = None,
    ephemeral_cols: tuple[str, ...] = (),
) -> IterationResult:
    """Run ``step`` until ``converged(stats)`` or ``max_iters``.

    ``ephemeral_cols``: step-output columns consumed ONLY by the observed
    ``stats_cols`` (e.g. PageRank's ``_delta``) — dropped after the
    observe node, BEFORE the checkpoint, so they are never serialized
    into the generation leaf.  A LogicalRDD leaf stores whole rows
    (column pruning can't skip bytes inside a serialized tuple), so an
    8-byte ephemeral on a 10⁷-vertex state costs ~160 MB of memory-bus
    traffic per superstep (leaf write + next iteration's scan) — measured
    ~25% of the state-leaf volume for PageRank's 4-column state.  NOT for
    columns the next iteration reads (bfs/cc frontier flags stay).

    ``stats_cols`` (preferred): aggregate Columns over the step's output
    state, attached via ``Dataset.observe`` and collected during the
    materialization job itself — zero extra jobs per superstep.
    ``stats_fn(old, new) -> 1-row DataFrame`` (legacy): runs as a second
    small job; only needed when a metric must reference BOTH generations.

    Generation management (SURVEY.md §4.4, revised twice after profiling
    at 10^7 edges and at 1-edge micro scale).  Requirements in tension:

    a. constant-size logical plans — a state plan that references the
       previous generation's plan grows ×3 per superstep (state appears in
       the gather, the merge join, and the delta column), and DRIVER-side
       analysis/optimization/cache-canonicalization over that tree is
       exponential: measured ×2.5 wall growth per iteration under pure
       ``persist`` chaining;
    b. stable partitioning metadata — a plain ``localCheckpoint`` under
       AQE yields ``ExistingRDD [UnknownPartitioning]``, re-introducing
       three |V|-sized exchanges per superstep that co-partitioning with
       the persisted edges makes free;
    c. no mid-chain unpersist — a non-cascading uncache lazily invalidates
       every dependent cache entry's buffers, silently degrading later
       iterations into full recomputes.

    The protocol in the loop body (persist → stats action → AQE-off
    checkpoint leaf → unpersist the raw generation) satisfies all three:
    every generation ends as a 1-node LogicalRDD that still advertises
    hash(partition_key, P) + in-partition ordering, costs one |V| exchange
    + sort per superstep, and holds no reference into the cache.
    """
    spark = state.sparkSession
    num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))

    def checkpoint_leaf(df: DataFrame, relayout: bool) -> DataFrame:
        """Materialize ``df`` as a CONSTANT-SIZE plan leaf that still
        advertises its physical partitioning + ordering.

        ``localCheckpoint`` under AQE yields ``ExistingRDD
        [UnknownPartitioning]`` (the adaptive plan's partitioning isn't
        known at checkpoint-build time), which re-introduces per-superstep
        exchanges.  With AQE disabled for just this job, the LogicalRDD
        leaf preserves the plan's layout — downstream supersteps then plan
        exchange-free, sort-free merge joins against it, and the logical
        plan never grows (each generation is 1 node, not the 3^k chain
        that made driver-side planning the bottleneck).

        ``relayout=True`` additionally forces hash(partition_key, P) +
        in-partition ordering — used for the CALLER-provided initial state
        whose layout is unknown.  Step outputs skip it: every built-in
        step ends in a merge join / aggregation keyed on ``partition_key``,
        so their physical layout is already the canonical one and the
        extra exchange would move every row to the partition it is
        already in."""
        with _aqe_disabled(spark):
            if relayout:
                df = df.repartition(
                    num_partitions, partition_key
                ).sortWithinPartitions(partition_key)
            # PySpark's MEMORY_AND_DISK is the SERIALIZED level: compact
            # bytes instead of object graphs (the localCheckpoint default
            # is deserialized, and |V|-row object generations churned the
            # old-gen heap into multi-second GC spikes every ~10 steps)
            return strip_origin_stats(
                df.localCheckpoint(
                    eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
                )
            )

    start_iter = 0
    if checkpoint is not None and resume:
        found = checkpoint.latest()
        if found is not None:
            start_iter, state, saved_stats = found
            # A resumed run whose saved stats already satisfy the
            # convergence predicate is a no-op: re-running a superstep
            # would append a spurious epoch + metrics row and inflate
            # the iteration count on every repeat invocation.
            if converged(saved_stats):
                return IterationResult(
                    state=state,
                    iterations=start_iter,
                    converged=True,
                    history=[],
                )
            # Truncate only when supersteps WILL re-run: a converged
            # no-op resume must leave metrics.jsonl byte-identical (no
            # spurious resume_from marker per repeat invocation).
            checkpoint.truncate_metrics(start_iter)

    # Per-iteration protocol (measured at 10^7 edges AND 1-edge micro):
    #   1. checkpoint_leaf(step(prev).observe(stats_cols)) — ONE job runs
    #      the superstep pipeline end-to-end, materializes the result as a
    #      1-node checkpointed leaf that keeps the canonical hash(vid, P) +
    #      sorted layout (AQE off for this job — see checkpoint_leaf), and
    #      collects the convergence metrics as observed metrics of that
    #      same job (the one driver↔cluster scalar readback per superstep,
    #      SURVEY.md §4.9 — an explicit stats job measured 0.6-1.9 s extra
    #      per superstep);
    #   2. free the PREVIOUS generation's checkpoint blocks explicitly.
    # No persist/unpersist anywhere: a non-cascading uncache lazily
    # invalidates dependent cache entries (full-recompute trap), and
    # relying on ContextCleaner for checkpoint blocks lets dozens of |V|-
    # sized block sets pile up (measured 10-50× iteration-wall spikes).
    prev = checkpoint_leaf(state, relayout=True)
    history: list[dict] = []
    it = start_iter
    done = False
    while it < max_iters and not done:
        t0 = time.perf_counter()
        out = step(prev, it)
        obs = None
        if stats_cols is not None:
            obs = Observation(f"superstep_stats_i{it}")
            out = out.observe(obs, *stats_cols)
        if ephemeral_cols:
            # after the observe node: the stats still see the columns,
            # the checkpointed leaf doesn't carry them
            out = out.drop(*ephemeral_cols)
        new_state = checkpoint_leaf(out, relayout=False)
        row = dict(obs.get) if obs is not None else {}
        if stats_fn is not None:
            row.update(stats_fn(prev, new_state).collect()[0].asDict())
        stats = {k: (None if v is None else float(v)) for k, v in row.items()}
        it += 1
        done = converged(stats)
        if checkpoint is not None and (
            it % checkpoint_every == 0 or done or it >= max_iters
        ):
            checkpoint.write(new_state, it, stats)
        wall_ms = (time.perf_counter() - t0) * 1000.0
        rec = {"iter": it, "wall_ms": wall_ms, **stats}
        history.append(rec)
        if checkpoint is not None:
            checkpoint.append_metrics(rec)
        # Free the replaced generation's checkpoint blocks — including the
        # initial leaf: checkpoint_leaf(relayout=True) always checkpoints a
        # FRESH repartitioned RDD, so its blocks can never back the
        # caller's input DataFrame, and leaving them to the ContextCleaner
        # lets |V|-sized block sets pile up (measured 10-50× wall spikes).
        _free_checkpoint_blocks(prev)
        prev = new_state
    return IterationResult(state=prev, iterations=it, converged=done, history=history)


def _free_checkpoint_blocks(df: DataFrame) -> None:
    """Unpersist the RDD behind a ``localCheckpoint``-ed DataFrame.

    The blocks belong to the internal RDD captured by the plan's
    ``LogicalRDD`` leaf — there is no public DataFrame API to release
    them (``unpersist()`` only touches CacheManager entries), so reach
    through the JVM plan.  Best-effort: any reflection failure leaves
    cleanup to the ContextCleaner as before.
    """
    try:
        plan = df._jdf.queryExecution().analyzed()
        if plan.getClass().getSimpleName() == "LogicalRDD":
            plan.rdd().unpersist(False)
    except Exception:
        pass
