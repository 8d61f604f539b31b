"""Deterministic graph sampling: hash-Bernoulli edge sampling and the
induced subgraph helper.

Reference: none — upstream essentials benchmarks on full graphs; this
is the standard first tool for running expensive analytics on a bounded
slice of a 10^12-document crawl (edge sampling preserves degree
distribution shape in expectation; Leskovec & Faloutsos, *Sampling from
large graphs*, KDD 2006).

Determinism / oracle replay: the coin for edge (s, d) is the first 8
hex chars of ``md5(s || ':' || d || ':' || salt)`` — the same
engine-portable integer-hash idiom the ANF sketches use — so the SAME
edges are kept at any parallelism, on resume, and in the DuckDB twin.
Never ``rand()``: a per-task RNG resamples differently under AQE
re-planning, speculative retries, or a different partition count.

Scale shape: a pure filter — no shuffle, no driver round-trip; pushes
into the scan where the edge source is Parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph


def edge_sample(
    graph: Graph, percent: int = 10, salt: int = 0
) -> DataFrame:
    """Keep ~``percent``% of edges by a deterministic md5 coin.

    Returns the sampled ``(src, dst)`` DataFrame.  ``percent`` is an
    integer 0–100 (the coin compares an integer residue, so both
    engines agree exactly — no float threshold).
    """
    if not 0 <= percent <= 100:
        raise ValueError(f"percent must be in [0, 100], got {percent}")
    coin = (
        F.conv(
            F.substring(
                F.md5(
                    F.concat_ws(
                        ":",
                        F.col("src").cast("string"),
                        F.col("dst").cast("string"),
                        F.lit(str(salt)),
                    )
                ),
                1,
                8,
            ),
            16,
            10,
        ).cast("long")
        % 100
    )
    return graph.edges.where(coin < F.lit(percent)).select("src", "dst")


def sampled_graph(
    graph: Graph, percent: int = 10, salt: int = 0
) -> Graph:
    """Edge-sampled :class:`Graph` (vertex set = endpoints of surviving
    edges), ready for any engine primitive."""
    return Graph.from_edges(
        edge_sample(graph, percent, salt),
        num_partitions=graph.num_partitions,
    )
