"""Physical-plan inspection helpers (scale-property assertions).

The engine's 100 TB story rests on plan properties Catalyst must uphold
every superstep — exactly one live shuffle, no broadcast of |V|-sized
sides, persisted edges reused, map-side partial aggregation.  These
helpers make those properties assertable in tests and in
``tools/explain_plans.py`` (which writes the human-readable evidence to
BENCH/PLANS.md).
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def formatted_plan(df: DataFrame) -> str:
    """``EXPLAIN FORMATTED`` text for a DataFrame's physical plan."""
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def live_tree(plan: str) -> str:
    """The physical-plan TREE with cached subtrees removed.

    Formatted explain prints each InMemoryTableScan's child plan (the
    plan that materialized the cache) — those operators, including their
    Exchanges, run once at cache build, not per query.  For "this query
    shuffles exactly N times" assertions, keep only the live operators:
    drop every line nested deeper than an InMemoryTableScan.
    """
    lines = plan.split("== Physical Plan ==", 1)[1].splitlines()
    out: list[str] = []
    skip_deeper_than: int | None = None
    for line in lines:
        if not line.strip():
            if out:
                break  # end of tree section (details follow)
            continue  # leading blank after the header
        # tree prefix is 3-char groups: "   ", ":  ", ":- ", or "+- "
        indent = re.match(r"^(?:[ :] {2}|[+:]- )*", line).end()
        if skip_deeper_than is not None:
            if indent > skip_deeper_than:
                continue
            skip_deeper_than = None
        out.append(line)
        if "InMemoryTableScan" in line:
            skip_deeper_than = indent
    return "\n".join(out)


def assert_superstep_plan(df: DataFrame, max_exchanges: int = 1) -> str:
    """Assert a superstep-output DataFrame's plan has the scale shape.

    Returns the live tree (for messages/diagnostics).  Fails if the plan
    re-introduces extra shuffles or broadcasts a per-vertex side — the
    two regressions that silently destroy N→4N scaling.
    """
    live = live_tree(formatted_plan(df))
    n_ex = len(re.findall(r"\bExchange\b", live))
    assert n_ex <= max_exchanges, (
        f"superstep plan has {n_ex} live shuffles (max {max_exchanges}):\n{live}"
    )
    assert "BroadcastHashJoin" not in live, (
        f"superstep plan broadcasts a per-vertex side:\n{live}"
    )
    return live
