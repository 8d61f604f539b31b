"""Incremental page ingestion via Structured Streaming.

The reference is batch-iterative — upstream essentials has no streaming
operator (SURVEY.md §2.5), and the graft's resumability rule is met by
batch checkpoint epochs (linkgraph.superstep).  This module is the
engine-side extension a continuously crawled corpus needs: new WARC page
snapshots land as Parquet files under a directory; a stream turns each
micro-batch into edge rows using the SAME deterministic extraction as
the batch front end (linkgraph.extract — so the byte-identical-text
invariant holds identically on both paths), with exactly-once file
processing guaranteed by the stream checkpoint.

Design for scale (and its honest limits):

- **Extraction is stateless**, so ``mapInArrow`` + ``explode`` run
  unchanged on the streaming DataFrame — one Arrow pass per micro-batch,
  no per-row Python, identical code path to batch.
- **Latest-snapshot-per-url is NOT resolved in the stream.**  The batch
  front end uses a full window over all captures (extract.py); a stream
  can only dedup within its watermark horizon.  The sink therefore
  stores ``(src_url, dst_url, warc_ts)`` per capture — append-only, the
  only write mode that scales — and :func:`compact_link_log` resolves
  latest-wins semantics in batch when the graph is (re)built.  This is
  the standard streaming-append + periodic-compaction pattern; doing the
  dedup in-stream would require unbounded state.
- **Late data**: windowed link-rate monitoring uses an event-time
  watermark on ``warc_ts`` so state is bounded; captures later than the
  allowed lateness are dropped from the monitoring aggregate (never from
  the link log, which is append-only and complete).
- ``trigger(availableNow=True)`` drains everything new and stops —
  the incremental-batch operating mode (cron-style re-runs), each run
  picking up exactly the files not yet in the checkpoint.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from linkgraph.extract import extract_pages
from linkgraph.types import PAGES_SCHEMA

LINK_LOG_SCHEMA = (
    "src_url string, dst_url string, warc_ts timestamp, capture bigint"
)


def stream_pages(spark: SparkSession, pages_dir: str, **options) -> DataFrame:
    """readStream over a directory of page-snapshot Parquet files.

    Schema is pinned (PAGES_SCHEMA) — no inference on the hot path.
    ``maxFilesPerTrigger`` etc. pass through via ``options``.
    """
    reader = spark.readStream.schema(PAGES_SCHEMA)
    for k, v in options.items():
        reader = reader.option(k, v)
    return reader.parquet(pages_dir)


def stream_link_log(pages_stream: DataFrame) -> DataFrame:
    """Streaming pages → append-only link log
    ``(src_url, dst_url, warc_ts, capture)``.

    Same extraction pass as the batch front end; per-capture rows (the
    latest-snapshot resolution happens at compaction, see module doc).
    Two details make compaction able to reproduce the batch front end
    EXACTLY:

    - every capture emits at least one row — a page recrawled with no
      out-links (or only self-links) produces a single ``dst_url IS
      NULL`` marker row via ``explode_outer``, so the recrawl is visible
      to latest-wins compaction and its old edges really disappear;
    - ``capture = xxhash64(html)`` rides along (computed JVM-side before
      extraction), the same discriminator the batch snapshot dedup uses
      to break ``warc_ts`` ties deterministically.

    Self-links are removed inside the link array (before the explode) so
    they can't mask the marker row; within-page duplicate hrefs collapse
    per capture (narrow ``array_distinct`` — no state).
    """
    with_capture = pages_stream.withColumn("capture", F.xxhash64("html"))
    extracted = extract_pages(with_capture, passthrough=("capture",))
    return extracted.select(
        F.col("url").alias("src_url"),
        F.explode_outer(
            F.array_distinct(
                F.filter("links", lambda d: d != F.col("url"))
            )
        ).alias("dst_url"),
        "warc_ts",
        "capture",
    ).select("src_url", "dst_url", "warc_ts", "capture")


def run_ingest(
    spark: SparkSession,
    pages_dir: str,
    link_log_dir: str,
    checkpoint_dir: str,
    **read_options,
) -> None:
    """Drain all unprocessed page files into the link log, then stop.

    Exactly-once per source file via the stream checkpoint: re-running
    with the same ``checkpoint_dir`` processes only files not yet seen;
    a run with nothing new appends nothing.
    """
    q = (
        stream_link_log(stream_pages(spark, pages_dir, **read_options))
        .writeStream.format("parquet")
        .option("path", link_log_dir)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination()


def compact_link_log(link_log: DataFrame) -> DataFrame:
    """Batch latest-wins compaction: the edge set of each src's newest capture.

    A page recrawled at T2 replaces its T1 out-links entirely (links
    removed from the page disappear from the graph — the marker rows
    written by :func:`stream_link_log` make link-less recrawls visible).
    The winning capture per url is picked by the SAME total order as the
    batch front end's snapshot dedup (``warc_ts`` desc, then
    ``xxhash64(html)`` desc), so streaming-ingest + compaction is
    replay-identical to running :func:`linkgraph.extract.pages_to_edge_urls`
    over all captures at once.
    """
    w = Window.partitionBy("src_url").orderBy(
        F.desc("warc_ts"), F.desc("capture")
    )
    best = (
        link_log.select("src_url", "warc_ts", "capture")
        .dropDuplicates(["src_url", "warc_ts", "capture"])
        .withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )
    return (
        link_log.join(best, ["src_url", "warc_ts", "capture"])
        .where(F.col("dst_url").isNotNull())
        .select("src_url", "dst_url")
        .dropDuplicates(["src_url", "dst_url"])
    )


def graph_from_link_log(
    link_log: DataFrame,
    vertices: DataFrame | None = None,
    num_partitions: int | None = None,
):
    """Compacted link log → ``(Graph, dictionary)`` — the incremental
    crawl loop's back half (VERDICT r01 item 6).

    ``vertices`` is the PREVIOUS epoch's ``(url, vid)`` dictionary: urls
    already in it keep their vid verbatim (``dictionary.extend_urls``),
    so per-vertex state from the previous epoch — ranks, components,
    checkpoint epochs — remains valid against the new Graph, which is
    what makes :func:`linkgraph.pagerank` warm-starts
    (``init_ranks=prev.state``) correct.  New urls get dense ids above
    the previous max.  With ``vertices=None`` a fresh dictionary is
    built (cold start, identical to the batch front end).

    Scale shape: compaction is one window over the log's (src_url,
    warc_ts, capture) triples + one equi-join; the dictionary extension
    shuffles only the NEW urls; Graph.from_edges re-keys the |E| edge
    set once — everything incremental-sized except the final edge
    layout, which any graph rebuild pays.
    """
    from linkgraph.dictionary import (
        edges_from_url_pairs,
        encode_urls,
        extend_urls,
    )
    from linkgraph.graph import Graph

    pairs = compact_link_log(link_log)
    urls = pairs.selectExpr("src_url AS url").unionAll(
        pairs.selectExpr("dst_url AS url")
    )
    verts = (
        encode_urls(urls) if vertices is None else extend_urls(vertices, urls)
    )
    edges = edges_from_url_pairs(pairs, verts)
    return Graph.from_edges(edges, num_partitions=num_partitions), verts


def windowed_link_rates(
    pages_stream: DataFrame,
    window_duration: str = "1 hour",
    watermark: str = "2 hours",
) -> DataFrame:
    """Event-time windowed crawl monitoring: links extracted per window.

    Watermark on ``warc_ts`` bounds aggregation state; captures arriving
    later than ``watermark`` past the max seen event time are dropped
    from this aggregate (the link log itself is append-only and keeps
    them).  Returns ``(window, pages, links)``.
    """
    extracted = extract_pages(pages_stream)
    return (
        extracted.withWatermark("warc_ts", watermark)
        .groupBy(F.window("warc_ts", window_duration).alias("window"))
        .agg(
            F.count("*").alias("pages"),
            F.sum(F.size("links")).alias("links"),
        )
    )


def snapshot_diff(old_edges: DataFrame, new_edges: DataFrame) -> DataFrame:
    """Edge-level churn between two crawl epochs: 1 row ``(n_old, n_new,
    n_added, n_removed, n_common, jaccard)``.

    The companion diagnostic to the incremental loop
    (:func:`graph_from_link_log`): before warm-starting PageRank on a
    new epoch, the churn rate tells you whether a warm start is even
    worth it (jaccard → 1: few iterations expected; jaccard → 0: cold
    start, recrawl storm, or an extraction regression upstream).

    One full-outer equi-join on the (src, dst) key — each side shuffles
    once on the same key — and a single 6-counter aggregate that rides
    the join output without further exchange.  Both inputs are deduped
    first so counts are set semantics (a recrawl emitting the same link
    twice is not churn).
    """
    o = (
        old_edges.select("src", "dst")
        .dropDuplicates(["src", "dst"])
        .withColumn("_o", F.lit(1))
    )
    n = (
        new_edges.select("src", "dst")
        .dropDuplicates(["src", "dst"])
        .withColumn("_n", F.lit(1))
    )
    j = o.join(n, ["src", "dst"], "full_outer")
    n_old = F.sum(F.coalesce("_o", F.lit(0)))
    n_new = F.sum(F.coalesce("_n", F.lit(0)))
    n_common = F.sum(
        F.when(F.col("_o").isNotNull() & F.col("_n").isNotNull(), 1).otherwise(0)
    )
    return j.agg(
        n_old.cast("long").alias("n_old"),
        n_new.cast("long").alias("n_new"),
        F.sum(F.when(F.col("_o").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_added"),
        F.sum(F.when(F.col("_n").isNull(), 1).otherwise(0))
        .cast("long")
        .alias("n_removed"),
        n_common.cast("long").alias("n_common"),
        F.round(
            n_common.cast("double") / (n_old + n_new - n_common), 6
        ).alias("jaccard"),
    )


def _first_seen_horizon_step(pdf, last, max_ns, horizon_ns):
    """One shard × one micro-batch of the horizon-bounded first-seen
    state transition (pure pandas — unit-tested for the state bound in
    tests/test_streaming.py without a streaming harness).

    ``last`` maps content hash → last-sighting epoch-ns; ``max_ns`` is
    the shard's max event time so far.  Returns ``(fresh_rows,
    new_last, new_max_ns)`` where new_last only retains hashes sighted
    within ``horizon_ns`` of the new max — the state bound.
    """
    import pandas as pd  # local: Arrow path only

    pdf = pdf.sort_values(["warc_ts", "capture", "url"])
    ts_ns = pdf["warc_ts"].astype("datetime64[ns]").astype("int64")
    max_ns = max(max_ns, int(ts_ns.max()))
    cut = max_ns - horizon_ns
    # evict hashes last sighted before the horizon — the state bound;
    # a post-eviction duplicate re-emits by design
    last = {h: t for h, t in last.items() if t >= cut}
    fresh = pdf[~pdf["capture"].isin(last.keys())]
    fresh = fresh.drop_duplicates(subset=["capture"], keep="first")
    fresh_set = {int(c) for c in fresh["capture"]}
    # every sighting refreshes its clock (sliding TTL), using the
    # batch's LAST capture time per hash
    latest = ts_ns.groupby(pdf["capture"]).max()
    for h, t in latest.items():
        h = int(h)
        if h in last or h in fresh_set:
            last[h] = max(int(t), last.get(h, 0))
    return fresh, last, max_ns


def stream_first_seen(
    pages_stream: DataFrame,
    num_shards: int = 64,
    horizon: str | None = None,
) -> DataFrame:
    """Stateful streaming exact-dedup: emit only the FIRST capture of
    each distinct html content across all micro-batches —
    ``(url, warc_ts, capture)`` — via ``applyInPandasWithState``.

    The in-stream complement to batch :func:`compact_link_log`: a
    crawl frontier often re-fetches byte-identical pages (mirrors,
    canonical redirects, unchanged recrawls); dropping them AT INGEST
    avoids paying extraction + log append for content already seen.
    Content identity = ``xxhash64(html)`` (the same discriminator the
    batch snapshot dedup uses).

    State design: groups are hash SHARDS (``capture % num_shards``),
    not per-content keys — per-key state would create one state row per
    distinct document, the worst shape for the state store's per-key
    overhead; a shard holds one array of 8-byte hashes.  Within a batch
    the winner per content is deterministic: min ``(warc_ts, capture,
    url)``.

    ``horizon`` (e.g. ``"30 days"``) bounds the state: each shard also
    stores a last-sighting event time per hash plus the shard's max
    event time seen, and every batch EVICTS hashes not sighted within
    ``horizon`` of that max — state size becomes ∝ distinct content
    within the horizon instead of all-time (the round-5 answer to the
    r4 NoTimeout growth note; tests/test_streaming.py pins both the
    in-horizon drop and the bounded size).  Semantics shift with it,
    deliberately: a duplicate arriving AFTER the horizon re-emits as a
    fresh first-seen ("seen within 30 days", the recrawl-dedup policy),
    and every sighting — emitted or dropped — refreshes its hash's
    clock (sliding TTL).  Eviction keys off EVENT time per shard, so a
    stalled shard evicts nothing rather than guessing from processing
    time; ``GroupStateTimeout`` stays NoTimeout in both modes because
    shards receive steady traffic — a per-shard activity timeout would
    never fire, which is why the horizon is enforced by explicit
    eviction instead.  ``horizon=None`` keeps the exact all-time
    behavior (state = the honest 8 B/doc floor any exact first-seen
    filter pays).

    Flink/Kafka-Streams users: this is the keyed-state dedup operator;
    Spark's version just batches per micro-batch trigger.
    """
    import pandas as pd  # local: Arrow path only
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    hashed = (
        pages_stream.withColumn("capture", F.xxhash64("html"))
        .withColumn(
            "shard", F.pmod(F.col("capture"), F.lit(num_shards)).cast("int")
        )
        .select("shard", "url", "warc_ts", "capture")
    )

    def dedup(key, pdfs, state: GroupState):
        seen = set(state.get[0]) if state.exists else set()
        # concat the group's batch slice before picking winners so the
        # within-batch winner is order-independent (min, not first-arrival)
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            pdf = pd.concat(frames, ignore_index=True)
            pdf = pdf.sort_values(["warc_ts", "capture", "url"])
            pdf = pdf[~pdf["capture"].isin(seen)]
            pdf = pdf.drop_duplicates(subset=["capture"], keep="first")
            if len(pdf):
                seen.update(int(c) for c in pdf["capture"])
                state.update((sorted(seen),))
                yield pdf[["url", "warc_ts", "capture"]]

    if horizon is None:
        return hashed.groupBy("shard").applyInPandasWithState(
            dedup,
            outputStructType="url string, warc_ts timestamp, capture long",
            stateStructType="seen array<long>",
            outputMode="append",
            timeoutConf=GroupStateTimeout.NoTimeout,
        )

    horizon_ns = int(pd.Timedelta(horizon).value)  # nanoseconds
    if horizon_ns <= 0:
        raise ValueError(f"horizon must be a positive duration, got {horizon!r}")

    def dedup_horizon(key, pdfs, state: GroupState):
        if state.exists:
            hashes, stamps, max_ns = state.get
            last = dict(zip(hashes, stamps))
        else:
            last, max_ns = {}, 0
        frames = [pdf for pdf in pdfs if len(pdf)]
        if frames:
            pdf = pd.concat(frames, ignore_index=True)
            fresh, last, max_ns = _first_seen_horizon_step(
                pdf, last, max_ns, horizon_ns
            )
            items = sorted(last.items())
            state.update((
                [h for h, _ in items],
                [t for _, t in items],
                max_ns,
            ))
            if len(fresh):
                yield fresh[["url", "warc_ts", "capture"]]

    return hashed.groupBy("shard").applyInPandasWithState(
        dedup_horizon,
        outputStructType="url string, warc_ts timestamp, capture long",
        stateStructType="seen array<long>, stamps array<long>, maxns long",
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stream_session_stats(
    events_stream: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "1 hour",
    user_col: str = "user_id",
    ts_col: str = "ts",
    value_col: str = "value",
) -> DataFrame:
    """Streaming sessionization with SESSION WINDOWS: per (user,
    session) aggregates ``(user_id, session, n, value_sum)`` where
    ``session`` is the merged event-time window.

    The streaming complement to batch
    :func:`linkgraph.events.session_stats`: ``F.session_window`` gives
    Structured Streaming's native gap-merged dynamic windows — state
    merges adjacent windows as events arrive and the WATERMARK both
    bounds state AND finalizes sessions (a session closes only once the
    watermark passes its end + gap, the correctness condition for
    emitting in append mode).  Boundary semantics differ from the batch
    operator by design: ``session_window`` starts a new session at
    gap ≥ duration, the batch rule at gap > duration — parity is
    asserted against a BATCH ``session_window`` aggregation
    (micro-batch vs batch execution of the same construct), not against
    the lag+cumsum form.
    """
    return (
        events_stream.withWatermark(ts_col, watermark)
        .groupBy(
            F.col(user_col),
            F.session_window(F.col(ts_col), gap).alias("session"),
        )
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum(value_col).alias("value_sum"),
        )
    )
