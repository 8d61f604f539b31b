"""Sessionization semantics (linkgraph/events.py)."""

from __future__ import annotations

import datetime as dt

from linkgraph.events import session_stats, sessionize


def _events(spark, rows):
    return spark.createDataFrame(
        rows, "event_id long, ts timestamp, user_id long, value double"
    )


T0 = dt.datetime(2024, 1, 1, 12, 0, 0)


def _t(seconds, micros=0):
    return T0 + dt.timedelta(seconds=seconds, microseconds=micros)


def test_gap_boundary_is_strict(spark):
    """gap == threshold stays in-session; threshold + 1µs splits."""
    rows = [
        (1, _t(0), 7, 1.0),
        (2, _t(1800), 7, 1.0),          # exactly 30min later → same session
        (3, _t(3600, 1), 7, 1.0),       # 1800s + 1µs after event 2 → new
    ]
    got = {
        r.event_id: r.session_seq
        for r in sessionize(_events(spark, rows), gap_seconds=1800).collect()
    }
    assert got == {1: 1, 2: 1, 3: 2}


def test_sessions_are_per_user_and_ordered(spark):
    rows = [
        (1, _t(0), 1, 1.0),
        (2, _t(100), 1, 2.0),
        (3, _t(10_000), 1, 4.0),   # >30min gap → session 2 for user 1
        (4, _t(50), 2, 8.0),       # other user: independent numbering
    ]
    stats = {
        (r.user_id, r.session_seq): (r.n, r.value_sum)
        for r in session_stats(_events(spark, rows), gap_seconds=1800).collect()
    }
    assert stats == {
        (1, 1): (2, 3.0),
        (1, 2): (1, 4.0),
        (2, 1): (1, 8.0),
    }


def test_tied_timestamps_never_split(spark):
    rows = [
        (10, _t(0), 3, 1.0),
        (11, _t(0), 3, 1.0),
        (12, _t(0), 3, 1.0),
    ]
    out = sessionize(_events(spark, rows), gap_seconds=1).collect()
    assert {r.session_seq for r in out} == {1}


def test_session_stats_single_exchange(spark):
    """The per-session agg must reuse the window's
    HashPartitioning(user_id): exactly ONE Exchange in the whole plan."""
    df = _events(spark, [(1, _t(0), 1, 1.0), (2, _t(9999), 1, 1.0)])
    plan = session_stats(df)._jdf.queryExecution().executedPlan().toString()
    assert plan.count("Exchange") == 1, plan


def test_sessionize_parallelism_invariant(spark):
    rows = [
        (i, _t(i * 1200), i % 5, float(i)) for i in range(200)
    ]
    df = _events(spark, rows)
    a = sessionize(df.repartition(1), gap_seconds=1800).collect()
    b = sessionize(df.repartition(16), gap_seconds=1800).collect()
    assert sorted((r.event_id, r.session_seq) for r in a) == sorted(
        (r.event_id, r.session_seq) for r in b
    )
