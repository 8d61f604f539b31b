"""SpGEMM — sparse matrix × sparse matrix (reference A14,
[ref: include/gunrock/algorithms/spgemm.hxx — UNVERIFIED]; SURVEY.md §2.3
A14: "join on inner dim + groupBy(row,col).sum").

A sparse matrix is an edge-style DataFrame ``(row, col, val)``; the
product C = A·B is the classic dataflow::

    C(i,k) = Σ_j A(i,j)·B(j,k)
           = A ⋈ B on (A.col = B.row)  →  groupBy(i,k).sum(va·vb)

Catalyst handles the join strategy (broadcast when one side is small —
the inner-product fast path); the output aggregation gets map-side
partial combine for free.  Hot inner-dimension keys (hub columns) are
the join-skew case AQE's skew-join handles; the OUTPUT key (i,k) is
near-unique so the groupBy does not need salting.

``square_counts(graph)`` specializes C = A² over the unweighted adjacency
(val ≡ 1): C(i,k) = number of length-2 paths i→·→k — the wedge-count
matrix that triangle counting closes (A4 shares this shape).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph


def spgemm(
    a: DataFrame,
    b: DataFrame,
    row: str = "row",
    col: str = "col",
    val: str = "val",
) -> DataFrame:
    """C = A·B over COO DataFrames → ``(row, col, val)`` (nonzeros only)."""
    left = a.select(
        F.col(row).alias("row"), F.col(col).alias("_j"), F.col(val).alias("_va")
    )
    right = b.select(
        F.col(row).alias("_j"), F.col(col).alias("col"), F.col(val).alias("_vb")
    )
    return (
        left.join(right, "_j")
        .groupBy("row", "col")
        .agg(F.sum(F.col("_va") * F.col("_vb")).alias("val"))
    )


def square_counts(graph: Graph) -> DataFrame:
    """A² of the unweighted adjacency: ``(row, col, paths2)`` —
    the number of directed length-2 paths row→·→col (nonzeros only)."""
    a = graph.edges.select(
        F.col("src").alias("row"), F.col("dst").alias("col"), F.lit(1).alias("val")
    )
    return spgemm(a, a).select(
        "row", "col", F.col("val").cast("long").alias("paths2")
    )
