"""Crawl-epoch evidence for warm starts — the fail-loud append-only guard.

Why this module exists: the warm-start family's correctness arguments
(cc.py ``init_labels``, coreness.py ``init_bound``, sssp.py
``init_dists``, bfs.py ``init_depths``) are all UPPER-BOUND /
monotone-relaxation arguments that hold only when edges were ADDED
between the epoch that produced the init and the graph being warmed.
But the production increment source — :func:`linkgraph.streaming.
link_log_compact` — is latest-wins: a recrawled page whose links
changed REMOVES edges, and feeding a post-removal graph plus the
previous epoch's state into a warm start silently converges to a wrong
answer (a stale CC label can bridge split components; a stale distance
can undercut a now-longer path).  Until round 5 that precondition lived
only in docstrings; this module converts it into an enforced contract:

- every warm entry point requires EVIDENCE — either ``prev_edges`` (the
  epoch's edge set, diffed here via :func:`linkgraph.streaming.
  snapshot_diff`; any removed edge raises :class:`EpochRemovalError`)
  or an explicit ``assume_append_only=True`` (the caller owns the
  argument — e.g. the increment came from an append-only log, or a
  coreness bound that is valid by a different theorem);
- neither → ``ValueError`` at call time, before any cluster work.

Cost: one (src, dst) full-outer join + 1-row aggregate over the TWO
edge sets — at 10^12 documents that is one co-keyed shuffle of the edge
tables, orders cheaper than the wrong-answer recompute it prevents, and
it shares physics with the :func:`snapshot_diff` churn check operators
teams already run before deciding warm-vs-cold.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


class EpochRemovalError(ValueError):
    """Raised when a warm start's ``prev_edges`` evidence shows edges
    were REMOVED since the epoch that produced the init state."""


def check_append_only(
    prev_edges: DataFrame, new_edges: DataFrame, what: str = "warm start"
) -> int:
    """Verify ``new_edges`` ⊇ ``prev_edges`` on the (src, dst) key.

    Returns the removed-edge count (always 0 on success); raises
    :class:`EpochRemovalError` when any epoch edge is absent from the
    new graph.  Set semantics (both sides deduped by snapshot_diff), so
    recrawl duplicates are not churn.
    """
    from linkgraph.streaming import snapshot_diff

    row = snapshot_diff(prev_edges, new_edges).collect()[0]
    removed = int(row["n_removed"])
    if removed > 0:
        raise EpochRemovalError(
            f"{what}: {removed} edge(s) present in the previous epoch are "
            f"missing from the current graph (epoch: {row['n_old']} edges, "
            f"now: {row['n_new']}, jaccard {row['jaccard']}).  The warm-"
            "start upper-bound argument does not survive removals — a "
            "stale label/distance can silently bridge split components or "
            "undercut a now-longer path.  Rebuild cold on this epoch, or "
            "pass assume_append_only=True ONLY if you have an independent "
            "validity argument for the init."
        )
    return removed


def require_warm_evidence(
    init_name: str,
    new_edges: DataFrame,
    prev_edges: DataFrame | None,
    assume_append_only: bool,
    what: str,
) -> None:
    """The warm-start gate shared by cc/coreness/sssp/bfs.

    ``prev_edges`` given → run :func:`check_append_only` (explicit
    evidence always wins, even alongside the flag); else the caller must
    assert ``assume_append_only=True``; else fail before any Spark job.
    """
    if prev_edges is not None:
        check_append_only(prev_edges, new_edges, what=what)
    elif not assume_append_only:
        raise ValueError(
            f"{what}: {init_name} requires epoch evidence — pass "
            "prev_edges=<the epoch's (src, dst) edges> to verify the "
            "append-only precondition (removals raise EpochRemovalError), "
            "or assume_append_only=True to assert it yourself.  "
            "latest-wins link_log_compact DOES remove edges when a "
            "recrawled page's links change; see linkgraph/epoch.py."
        )
