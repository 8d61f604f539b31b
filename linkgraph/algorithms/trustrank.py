"""TrustRank and link-spam mass estimation.

Public-knowledge formulation (Gyöngyi, Garcia-Molina, Pedersen,
"Combating Web Spam with TrustRank", VLDB 2004; Gyöngyi et al., "Link
Spam Detection Based on Mass Estimation", VLDB 2006):

- **TrustRank** is PageRank with the teleport (and dangling restart)
  vector restricted to a human-vetted trusted seed set — trust flows
  out of the seeds along links and attenuates with distance.  That is
  EXACTLY :func:`linkgraph.algorithms.ppr.personalized_pagerank`; the
  alias here exists so callers find the web-spam vocabulary.
- **Spam mass** of page v estimates the fraction of v's PageRank
  contributed by spam: ``m(v) = (p(v) − t(v)) / p(v)`` where p is
  ordinary PageRank and t is TrustRank over the same graph with the
  same α.  Pages whose rank comes mostly from outside the trusted
  region (link farms) have mass → 1; pages reachable from the trusted
  core have mass near 0 (can be < 0 when trust concentrates — the
  standard estimator is reported as-is, thresholding is the caller's
  policy decision).

Physical shape: two independent superstep chains (each the PageRank
one-live-shuffle contract) + ONE final |V| merge join — there is no
per-iteration coupling between the chains, so at 10^12 documents the
two runs schedule back-to-back (or concurrently via operators/batch)
and the only new cost is the final co-partitioned join.  Seed sets are
driver-side lists (human-vetted by definition — the TrustRank paper's
oracle budget is a few hundred pages).
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph
from linkgraph.algorithms.pagerank import pagerank
from linkgraph.algorithms.ppr import personalized_pagerank
from linkgraph.superstep import CheckpointManager, IterationResult


def trustrank(
    graph: Graph,
    seeds: Sequence[int],
    alpha: float = 0.85,
    tol: float = 1e-6,
    max_iters: int = 100,
    checkpoint: CheckpointManager | None = None,
    **kwargs,
) -> IterationResult:
    """PageRank with teleport restricted to the trusted ``seeds`` —
    an alias of :func:`personalized_pagerank` under the web-spam name."""
    return personalized_pagerank(
        graph,
        seeds,
        alpha=alpha,
        tol=tol,
        max_iters=max_iters,
        checkpoint=checkpoint,
        **kwargs,
    )


def spam_mass(
    graph: Graph,
    seeds: Sequence[int],
    alpha: float = 0.85,
    tol: float = 0.0,
    max_iters: int = 10,
    checkpoint: CheckpointManager | None = None,
) -> DataFrame:
    """Relative spam mass per page: ``(vid, rank, trust, mass)``.

    ``rank`` = ordinary PageRank, ``trust`` = TrustRank from ``seeds``
    (same α, same iteration budget so the two estimates are comparable),
    ``mass = (rank − trust)/rank`` (0 for rank = 0).  With ``tol=0`` and
    a fixed ``max_iters`` the output is iteration-deterministic and
    DuckDB-replayable (queries._spam_mass_sql)."""
    pr = pagerank(
        graph, alpha=alpha, tol=tol, max_iters=max_iters, checkpoint=checkpoint
    ).state.select("vid", "rank")
    tr = trustrank(
        graph, seeds, alpha=alpha, tol=tol, max_iters=max_iters
    ).state.select("vid", F.col("rank").alias("trust"))
    mass = F.when(
        F.col("rank") > 0,
        (F.col("rank") - F.col("trust")) / F.col("rank"),
    ).otherwise(F.lit(0.0))
    return pr.join(tr, "vid").select(
        "vid", "rank", "trust", mass.alias("mass")
    )
