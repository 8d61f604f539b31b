"""Event-log analytics: gap-based sessionization.

A crawl/serving stack emits per-user event logs (fetch logs, query
logs, interaction streams — the driver's ``events`` table shape:
``(event_id, ts, user_id, event_type, value, props)``).  The canonical
batch primitive over such a log is **sessionization**: split each
user's timeline into sessions wherever the inter-event gap exceeds a
threshold, then aggregate per session.  Upstream essentials has no
event-log surface (graph-kernel library — SURVEY.md §2.5 "Reference:
none"); this is an engine-side extension for the training-data
pipeline (session-level corpora, per-session quality stats).

Physical shape (the part that must survive 100 TB):

- ONE shuffle total.  The lag/cumulative-sum window partitions by
  ``user_id``; the follow-up per-session aggregation groups by
  ``(user_id, session_seq)`` — a SUPERSET of the window's partitioning
  key, so ``HashPartitioning(user_id)`` already satisfies the agg's
  required distribution and Catalyst inserts no second exchange
  (asserted in tests/test_plans.py).
- Gap comparison runs on integer MICROSECONDS (``unix_micros``), not
  float epoch seconds — exact arithmetic, replayed bit-identically by
  the DuckDB twin's ``epoch_us`` (linkgraph/queries.py SESSIONIZE_SQL).
- Ties (equal ``ts``) order by ``event_id`` — a total order, so the
  session split is replay-stable at any parallelism.  Tied events can
  never open a new session regardless of tie order (gap 0 ≤ any
  threshold), so the tie-break affects nothing but determinism of the
  cumulative numbering.

Skew: a bot user with 10⁹ events makes one huge window partition.
Sessionization is order-dependent within a user, so the window itself
cannot be salted without a second pass; the guard is upstream (bot/user
event caps in ingest).  The per-session AGGREGATION, however, is
map-side combined as usual.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

DEFAULT_GAP_SECONDS = 1800


def sessionize(
    events: DataFrame,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
) -> DataFrame:
    """Tag each event with its session number: input columns plus
    ``session_seq`` (1-based per user, in ``(ts, order_col)`` order).

    A session break happens strictly AFTER a gap > ``gap_seconds``
    (the classic 30-minute web-analytics rule by default).
    """
    w = Window.partitionBy(user_col).orderBy(ts_col, order_col)
    # cast covers TIMESTAMP_NTZ inputs (unix_micros requires TIMESTAMP);
    # callers pin the session timezone to UTC (queries._load), making
    # the NTZ→TZ cast a bit-identity on the stored microseconds
    us = F.unix_micros(F.col(ts_col).cast("timestamp"))
    gap_us = int(gap_seconds) * 1_000_000
    new_session = (
        F.lag(us).over(w).isNull() | ((us - F.lag(us).over(w)) > gap_us)
    ).cast("long")
    return events.withColumn(
        "session_seq",
        F.sum(new_session).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
        ),
    )


def session_stats(
    events: DataFrame,
    gap_seconds: int = DEFAULT_GAP_SECONDS,
    user_col: str = "user_id",
    ts_col: str = "ts",
    order_col: str = "event_id",
    value_col: str = "value",
) -> DataFrame:
    """Per-session rollup: ``(user_id, session_seq, n, start_ts,
    end_ts, value_sum)`` — one row per session.

    Exchange-free on top of :func:`sessionize`'s window shuffle: the
    groupBy key ``(user, session_seq)`` is clustered by the window's
    ``HashPartitioning(user)`` already.
    """
    tagged = sessionize(events, gap_seconds, user_col, ts_col, order_col)
    return tagged.groupBy(user_col, "session_seq").agg(
        F.count(F.lit(1)).alias("n"),
        F.min(ts_col).alias("start_ts"),
        F.max(ts_col).alias("end_ts"),
        F.sum(value_col).alias("value_sum"),
    )
