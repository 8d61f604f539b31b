"""SparkSession builder with the engine's required configuration.

Reference analog: the CUDA context + moderngpu launch setup in
``examples/algorithms/*/main`` (SURVEY.md §3.1 EP1).  Here the execution
substrate is Catalyst + AQE + Arrow; these configs are the ones the engine's
physical design assumes (SURVEY.md §4):

- AQE on (post-shuffle coalescing + skew-join handling = the analog of the
  reference's load-balanced advance variants);
- Arrow on (the JVM↔Python boundary for vectorized UDFs is Arrow batches);
- shuffle partitions sized to parallelism (so the same code scales
  local[8] → local[32] → multi-executor just by changing the master).
"""

from __future__ import annotations

from pyspark.sql import SparkSession


def get_spark(
    master: str = "local[*]",
    app_name: str = "linkgraph",
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession configured for the engine.

    ``shuffle_partitions`` defaults to the parallelism implied by ``master``
    (e.g. ``local[8]`` → 8), which keeps partition counts proportional to
    cores — the property the N→4N scaling criterion measures.
    """
    if shuffle_partitions is None:
        shuffle_partitions = _default_parallelism(master)
    b = (
        SparkSession.builder.master(master)
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.shuffle.partitions", str(shuffle_partitions))
        .config("spark.default.parallelism", str(shuffle_partitions))
        .config("spark.sql.autoBroadcastJoinThreshold", str(64 * 1024 * 1024))
        # Deterministic timestamp rendering regardless of host timezone
        # (oracle twins format stored naive-UTC values directly).
        .config("spark.sql.session.timeZone", "UTC")
        # Iterative supersteps re-plan each job; keep planning cheap.
        .config("spark.sql.execution.arrow.maxRecordsPerBatch", "100000")
        .config("spark.driver.memory", "16g")
        .config("spark.ui.enabled", "false")
        # Iterative engines churn checkpoint/cache blocks; reap weak refs
        # promptly so executor storage holds ~2 generations, not dozens.
        .config("spark.cleaner.periodicGC.interval", "1min")
        # lz4-compress serialized RDD blocks — the superstep state leaves
        # (eager localCheckpoint, MEMORY_AND_DISK) are written + re-read
        # every iteration, and on a bandwidth-bound box the compressed
        # form is a measured 12-13% per-superstep win at local[4]
        # (12.3 s → 10.7 s median, 3×10^7-edge crawl; BENCH/NOTES.md) at
        # ~1% decode CPU on the 1-core level.  On a cluster this also
        # shrinks what spills and what replicates.
        .config("spark.rdd.compress", "true")
    )
    for k, v in (extra_conf or {}).items():
        b = b.config(k, v)
    return b.getOrCreate()


def _default_parallelism(master: str) -> int:
    import os
    import re

    # accept every local-master form Spark does: local, local[N],
    # local[*], and the retry-enabled local[N,maxFailures] variants —
    # a missed match silently configures the 200-partition cluster
    # default, 25x over-partitioning every superstep on an 8-core box
    if master == "local":
        return 1  # Spark's bare "local" runs one worker thread
    m = re.match(r"local\[(\d+|\*)(?:\s*,\s*\d+)?\]$", master)
    if m:
        tok = m.group(1)
        return os.cpu_count() or 8 if tok == "*" else int(tok)
    return 200  # cluster default; callers should size explicitly
