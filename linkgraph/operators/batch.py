"""batch — run several operator/algorithm instances concurrently (O6).

Reference [ref: include/gunrock/framework/operators/batch/batch.hxx —
UNVERIFIED]: launch N instances of an operator graph on separate CUDA
streams so independent work overlaps on one device.

Spark analog: one SparkSession schedules many concurrent JOBS; with the
FAIR scheduler each submitting thread gets its own pool so a long job
(e.g. a converging PageRank) cannot starve short ones (e.g. a BFS from
another source).  This is exactly the multi-stream overlap the reference
gets on-GPU: shared storage (the persisted Graph), independent compute.

Scale note: concurrency here multiplies DRIVER-side job submission, not
cluster work — each job still schedules tasks over all executors.  Use
it for many SMALL independent runs (multi-source BFS/PPR sweeps, a
hyper-parameter grid over alpha); for one big job, parallelism inside
the job is always better.

``spark.scheduler.mode=FAIR`` must be set at session build (it is a
static conf); :func:`run_batch` degrades gracefully to FIFO otherwise —
results are identical, only inter-job latency differs.
"""

from __future__ import annotations

from collections.abc import Callable, Sequence
from concurrent.futures import ThreadPoolExecutor

from pyspark.sql import SparkSession


def run_batch(
    spark: SparkSession,
    tasks: Sequence[Callable[[], object]],
    max_concurrent: int = 4,
    pool_prefix: str = "linkgraph-batch",
) -> list[object]:
    """Run ``tasks`` (zero-arg callables issuing Spark actions)
    concurrently; returns their results in input order.

    Each worker thread pins a distinct scheduler pool via the
    thread-local ``spark.scheduler.pool`` property, then clears it.
    Exceptions propagate after all tasks finish (fail-at-end, so one
    failed instance does not abandon the rest of the batch — the
    reference's per-stream independence).
    """
    sc = spark.sparkContext
    import itertools
    import threading

    # pool per WORKER THREAD, not per task index: with index-mod
    # assignment a freed worker could pick up a task whose pool is still
    # occupied by a long-running concurrent task (FIFO within a pool →
    # the starvation the per-stream isolation exists to prevent)
    _pool_of_thread: dict[int, str] = {}
    _counter = itertools.count()
    _lock = threading.Lock()

    def _my_pool() -> str:
        tid = threading.get_ident()
        with _lock:
            if tid not in _pool_of_thread:
                _pool_of_thread[tid] = f"{pool_prefix}-{next(_counter)}"
            return _pool_of_thread[tid]

    def run_one(i_task):
        i, task = i_task
        sc.setLocalProperty("spark.scheduler.pool", _my_pool())
        try:
            return task()
        except Exception as exc:  # fail-at-end: collect, re-raise later
            return _BatchError(i, exc)
        finally:
            sc.setLocalProperty("spark.scheduler.pool", None)

    with ThreadPoolExecutor(max_workers=max_concurrent) as ex:
        results = list(ex.map(run_one, enumerate(tasks)))
    errors = [r for r in results if isinstance(r, _BatchError)]
    if errors:
        first = errors[0]
        raise RuntimeError(
            f"{len(errors)}/{len(tasks)} batch tasks failed; first: "
            f"task {first.index}: {first.error!r}"
        ) from first.error
    return results


class _BatchError:
    def __init__(self, index: int, error: Exception):
        self.index = index
        self.error = error
