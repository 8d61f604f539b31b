"""filter — frontier compaction (reference O2, SURVEY.md §2.1).

Reference variants [ref: include/gunrock/framework/operators/filter/*.hxx —
UNVERIFIED]:

- ``compact``   → materialize only passing items: ``df.where(pred)``;
- ``predicated``→ same, predicate evaluated per item (identical in Spark);
- ``bypass``    → mark-only, no compaction: keep a boolean column instead of
  filtering (bitmap-frontier mode — avoids a repartition when the frontier
  is near-full);
- ``remove``    → drop passing items: ``df.where(~pred)``.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def filter_frontier(
    frontier: DataFrame,
    pred: Column,
    variant: str = "compact",
    flag_col: str = "active",
) -> DataFrame:
    if variant in ("compact", "predicated"):
        return frontier.where(pred)
    if variant == "remove":
        return frontier.where(~pred)
    if variant == "bypass":
        return frontier.withColumn(flag_col, pred)
    raise ValueError(f"unknown filter variant: {variant!r}")
