"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship: documents@sf0.001 → synthetic pages (html
wrapping each doc + deterministic hrefs) → extraction front end
(byte-identical text invariant) → url dictionary → edge DataFrame →
PageRank to 1e-6 → top-20 ranked urls.

``queries()`` / ``oracle_sql()`` — the operator catalog from SURVEY.md §2
with DuckDB twins; see linkgraph/queries.py.  All entries carry an
oracle: the LSH/IVF entries run portable deterministic variants
(arithmetic Rademacher planes / pivot quantizer) whose sequential-fold
float ops the SQL twin replays bit-identically, while the seeded-RNG
production variants (Gaussian planes, k-means centroids) stay pinned by
tests/test_ann.py (recall, full-probe == exact).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    from linkgraph.algorithms.pagerank import pagerank
    from linkgraph.dictionary import edges_from_url_pairs, encode_urls
    from linkgraph.extract import pages_to_edge_urls
    from linkgraph.graph import Graph
    from linkgraph.queries import synthesize_pages

    sf_dir = "/root/testdata/sf0.001"
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    docs.createOrReplaceTempView("documents")

    # Deterministic pages (linkgraph.queries.synthesize_pages): html
    # wraps each doc's text plus one <a href> per derived edge (the
    # arithmetic rule EDGE_SQL, so the extracted graph is independently
    # re-derivable — the same seam the `extract_edges` catalog entry
    # hash-checks against DuckDB).
    pages = synthesize_pages(spark)
    pairs = pages_to_edge_urls(pages)
    urls = pairs.selectExpr("src_url as url").unionAll(
        pairs.selectExpr("dst_url as url")
    )
    verts = encode_urls(urls)
    edges = edges_from_url_pairs(pairs, verts)
    g = Graph.from_edges(edges)
    res = pagerank(g, tol=1e-6, max_iters=100)
    return (
        res.state.join(verts, "vid")
        .select("url", F.round("rank", 6).alias("rank6"))
        .orderBy(F.desc("rank6"), F.asc("url"))
        .limit(20)
    )


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    from linkgraph.queries import QUERIES

    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    from linkgraph.queries import ORACLES

    return dict(ORACLES)
