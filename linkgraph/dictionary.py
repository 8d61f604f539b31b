"""url → dense vertex-id dictionary encoding (SURVEY.md §4.6).

Reference analog: compile-time dense ``vertex_t`` ids — the graph
algorithms assume small dense integer ids (CSR offsets index by them).

Dense ids WITHOUT single-partition bottlenecks: the naive
``row_number() over (order by url)`` funnels every url through one task.
Instead, the two-pass scheme the survey pins (SURVEY.md §4.6):

1. distinct urls are range-partitioned and sorted by url (deterministic
   global order, parallel);
2. per-partition counts → driver-side cumulative offsets (P scalars);
3. ``vid = partition_offset + local_index`` assigned in one Arrow pass.

The result is deterministic for a fixed partition count: ids follow the
global lexicographic url order.  Cost: one shuffle of the url set + one
P-row collect — no |V| bottleneck anywhere.
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def encode_urls(urls: DataFrame, num_partitions: int | None = None, col: str = "url") -> DataFrame:
    """Distinct values of ``col`` → ``(url, vid)`` with dense ids [0, V).

    Ids are assigned in global sort order of ``col`` (deterministic given
    the partition count).
    """
    spark = urls.sparkSession
    if num_partitions is None:
        num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
    distinct = (
        urls.select(F.col(col).alias("url"))
        .dropDuplicates(["url"])
        .repartitionByRange(num_partitions, "url")
        .sortWithinPartitions("url")
    )
    # Pin the partitioning before the two passes: repartitionByRange picks
    # its boundaries by reservoir SAMPLING (seeded per query execution),
    # so re-evaluating the plan for pass 2 could shift a boundary and
    # assign a url to a different partition than it was COUNTED in —
    # duplicate vids + gaps, silent graph corruption at any scale where
    # the sample is not exhaustive.  localCheckpoint materializes the
    # partitions once; if its blocks are ever lost the job fails loudly
    # instead of resampling differently.
    from pyspark.storagelevel import StorageLevel

    distinct = distinct.localCheckpoint(
        eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK
    )
    # pass 1: rows per partition (partition index = range order)
    sized = distinct.select(F.spark_partition_id().alias("pid"))
    counts = {
        int(r["pid"]): int(r["cnt"])
        for r in sized.groupBy("pid").agg(F.count(F.lit(1)).alias("cnt")).collect()
    }
    offsets = {}
    acc = 0
    for pid in range(num_partitions):
        offsets[pid] = acc
        acc += counts.get(pid, 0)
    bc = spark.sparkContext.broadcast(offsets)

    # pass 2: vid = offset[pid] + local index (one Arrow pass, no shuffle)
    def assign(it: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        from pyspark import TaskContext

        pid = TaskContext.get().partitionId()
        base = bc.value.get(pid, 0)
        seen = 0
        for batch in it:
            n = batch.num_rows
            vids = pa.array(range(base + seen, base + seen + n), type=pa.int64())
            seen += n
            yield pa.RecordBatch.from_arrays(
                [batch.column("url"), vids], names=["url", "vid"]
            )

    return distinct.mapInArrow(assign, schema="url string, vid long")


def extend_urls(
    existing: DataFrame, urls: DataFrame, col: str = "url"
) -> DataFrame:
    """Grow a dictionary with NEW urls only — existing ids never move.

    The incremental-crawl contract: per-vertex state keyed by vid from a
    previous epoch (ranks, components, checkpoints) stays valid across a
    dictionary extension, because a url present in ``existing`` keeps its
    vid verbatim.  Urls of ``urls`` not yet in the dictionary get dense
    ids starting at ``max(existing.vid) + 1``, assigned by the same
    deterministic two-pass scheme as :func:`encode_urls` (global sort
    order among the new urls).  Returns the unioned ``(url, vid)``
    dictionary.
    """
    new_urls = (
        urls.select(F.col(col).alias("url"))
        .dropDuplicates(["url"])
        .join(existing.select("url"), "url", "left_anti")
    )
    row = existing.agg(F.max("vid").alias("m")).collect()[0]
    base = int(row["m"]) + 1 if row["m"] is not None else 0
    fresh = encode_urls(new_urls).select(
        "url", (F.col("vid") + F.lit(base)).alias("vid")
    )
    return existing.select("url", "vid").unionByName(fresh)


def edges_from_url_pairs(
    url_pairs: DataFrame,
    vertices: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
) -> DataFrame:
    """(src_url, dst_url) ⋈ dictionary → (src, dst) vid pairs.

    Two hash joins on url; dst urls not present in the dictionary
    (links pointing outside the crawl) are dropped — matching a crawl
    whose frontier is closed over the corpus.
    """
    v_src = vertices.select(
        F.col("url").alias(src_col), F.col("vid").alias("src")
    )
    v_dst = vertices.select(
        F.col("url").alias(dst_col), F.col("vid").alias("dst")
    )
    return (
        url_pairs.join(v_src, src_col)
        .join(v_dst, dst_col)
        .select("src", "dst")
    )
