"""Generalized SpMV — y = A·x over an edge-weighted sparse matrix
(reference A13, [ref: include/gunrock/algorithms/spmv.hxx — UNVERIFIED];
SURVEY.md §2.3).

The PageRank superstep core (linkgraph/csr.py) is the UNWEIGHTED
specialization of this primitive with the Arrow CSR kernels; this module
is the weighted general form, expressed as the idiomatic O4 mapping
(SURVEY.md §2.1): gather join on the row index + map-side-combined hash
aggregation of ``weight · x`` per output row.  At scale the join streams
on the persisted hash(src, P) edge layout when ``x`` is co-partitioned
on vid — the same exchange-free shape every superstep gather uses.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def spmv(
    edges: DataFrame,
    x: DataFrame,
    weight_col: str = "weight",
    x_col: str = "x",
) -> DataFrame:
    """``y(dst) = Σ_{(src,dst)∈E} weight(src,dst) · x(src)`` → ``(vid, y)``.

    ``edges`` is COO ``(src, dst, <weight_col>)`` (rows of A); ``x`` is
    ``(vid, <x_col>)`` and must cover every edge origin (missing origins
    contribute nothing — inner gather, matching a sparse vector).
    Output contains exactly the destinations with ≥1 covered in-edge;
    dense callers left-join + coalesce(0), like the PageRank round.
    """
    gathered = edges.join(
        x.select(F.col("vid").alias("src"), F.col(x_col).alias("_x")).hint(
            "merge"
        ),
        "src",
    )
    return gathered.groupBy(F.col("dst").alias("vid")).agg(
        F.sum(F.col(weight_col) * F.col("_x")).alias("y")
    )
