"""Superstep runtime — the engine's enactor (reference O7, SURVEY.md §2.1).

Reference [ref: include/gunrock/framework/enactor.hxx — UNVERIFIED]:
``enact() = prepare_frontier(); while (!is_converged()) loop(ctx);`` with
double-buffered frontiers living on-device across iterations.

Spark has no cross-job mutable state, so the runtime supplies what the
enactor got for free (SURVEY.md §4.4):

- **generation management + lineage truncation**: each superstep's output
  state is eagerly ``localCheckpoint``-ed — this materializes it into
  executor storage AND cuts the logical plan, so iteration ``k+1`` plans
  against a leaf, not a k-deep join tree (a naive persist loop grows the
  plan unboundedly and dies in the optimizer around iteration ~50).  The
  previous generation is dropped (double-buffering); Spark's
  ContextCleaner reclaims its storage.
- **durable checkpoints**: every ``checkpoint_every`` iterations (and at
  convergence) the state is also written to Parquet with a manifest —
  the durable resume point (BASELINE.json:6 "checkpoints frontier + rank
  tables ... so runs resume mid-convergence").  ``localCheckpoint`` alone
  is not crash-durable; Parquet epochs are.
- **convergence**: ``stats_fn(old, new)`` returns a 1-row DataFrame of
  numeric metrics (e.g. ``delta``, ``changed``); it runs as one small job
  over the two materialized |V|-row states (reference: device→host scalar
  readback per iteration, SURVEY.md §4.9).
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
import time
from dataclasses import dataclass, field
from typing import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

StepFn = Callable[[DataFrame, int], DataFrame]
StatsFn = Callable[[DataFrame, DataFrame], DataFrame]
ConvergedFn = Callable[[dict], bool]


@dataclass
class IterationResult:
    state: DataFrame
    iterations: int
    converged: bool
    history: list[dict] = field(default_factory=list)


def delta_stats(col: str = "_delta", out: str = "delta") -> StatsFn:
    """L∞ convergence metric (PR, SURVEY.md §2.3 A1).

    The superstep computes per-vertex ``|rank' − rank|`` inline as a state
    column (the old state is already part of the superstep join, so this
    costs nothing); the stats job is then a single aggregation over the
    cached new state — no extra old⋈new join per iteration.
    """

    def fn(old: DataFrame, new: DataFrame) -> DataFrame:
        return new.agg(F.max(F.col(col)).alias(out))

    return fn


def changed_stats(col: str = "_changed", out: str = "changed") -> StatsFn:
    """Count of vertices whose label changed (CC/LP convergence); same
    inline-column pattern as :func:`delta_stats`."""

    def fn(old: DataFrame, new: DataFrame) -> DataFrame:
        return new.agg(F.sum(F.col(col).cast("long")).alias(out))

    return fn


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
        state.write.mode("overwrite").parquet(path)
        # Per-partition lineage: row count per written partition.
        part_hist = [
            {"partition": int(r["pid"]), "rows": int(r["rows"])}
            for r in self.spark.read.parquet(path)
            .groupBy(F.spark_partition_id().alias("pid"))
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


def iterate(
    state: DataFrame,
    step: StepFn,
    stats_fn: StatsFn,
    converged: ConvergedFn,
    max_iters: int = 100,
    checkpoint: CheckpointManager | None = None,
    checkpoint_every: int = 5,
    resume: bool = True,
) -> IterationResult:
    """Run ``step`` until ``converged(stats_fn(old, new))`` or ``max_iters``."""
    start_iter = 0
    if checkpoint is not None and resume:
        found = checkpoint.latest()
        if found is not None:
            start_iter, state, _ = found

    prev = state.localCheckpoint(eager=True)
    history: list[dict] = []
    it = start_iter
    done = False
    while it < max_iters and not done:
        t0 = time.perf_counter()
        new_state = step(prev, it).localCheckpoint(eager=True)
        row = stats_fn(prev, new_state).collect()[0].asDict()
        stats = {k: (None if v is None else float(v)) for k, v in row.items()}
        wall_ms = (time.perf_counter() - t0) * 1000.0
        it += 1
        done = converged(stats)
        if checkpoint is not None and (
            it % checkpoint_every == 0 or done or it >= max_iters
        ):
            checkpoint.write(new_state, it, stats)
        rec = {"iter": it, "wall_ms": wall_ms, **stats}
        history.append(rec)
        if checkpoint is not None:
            checkpoint.append_metrics(rec)
        prev = new_state  # old generation reclaimed by ContextCleaner
    return IterationResult(state=prev, iterations=it, converged=done, history=history)
