"""uniquify — frontier dedup (reference O5, SURVEY.md §2.1).

Reference: exact or best-effort ``unique`` over the frontier
[ref: include/gunrock/framework/operators/uniquify/uniquify.hxx —
UNVERIFIED].  Best-effort mode exists because exact dedup costs a shuffle
and idempotent downstream ops tolerate duplicates — same trade-off holds
in Spark, so both modes are kept.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def uniquify(frontier: DataFrame, cols: list[str] | None = None, exact: bool = True) -> DataFrame:
    if not exact:
        return frontier  # best-effort: correctness-neutral for idempotent ops
    return frontier.dropDuplicates(cols or ["vid"])
