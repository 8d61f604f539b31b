"""linkgraph — a from-scratch PySpark-native distributed link-graph engine.

Re-expresses the query surface of the reference (bkj/essentials, a fork of
the public gunrock/essentials GPU graph-analytics library — see SURVEY.md §0
for provenance; the reference mount was empty, so semantics derive from
SURVEY.md + BASELINE.json) as idiomatic Spark DataFrame programs:

- data model: canonical ``edges(src: long, dst: long)`` DataFrame
  (reference: COO/CSR views of ``graph_t``) + per-vertex state DataFrames
  (reference: ``problem_t`` device arrays);
- dataflow operators (reference ``operators::{advance,filter,parallel_for,
  neighborreduce,uniquify}``) in :mod:`linkgraph.operators`;
- algorithm primitives PageRank / connected components / label propagation /
  triangle count (reference ``algorithms/{pr,tc}.hxx`` + fork-side CC/LP) in
  :mod:`linkgraph.algorithms`;
- the superstep runtime (reference ``framework/enactor.hxx``) with
  checkpoint/resume + per-iteration metrics in :mod:`linkgraph.superstep`;
- web-corpus front end (pages → text/links → dictionary-encoded edges) in
  :mod:`linkgraph.extract` / :mod:`linkgraph.dictionary`;
- training-data pipeline operators (dedup, similarity, text quality) in
  :mod:`linkgraph.textops`.

Everything is DataFrame + vectorized Arrow/pandas UDFs; no RDDs, no
per-row Python on hot paths.
"""

def _register_self_pickle_by_value() -> None:
    """Ship linkgraph functions BY VALUE inside UDF closures.

    cloudpickle serializes module-level functions by reference
    (module + qualname), which breaks executors that don't have the
    package on PYTHONPATH (plain ``python script.py`` without
    ``spark-submit --py-files``).  Registering the package for by-value
    pickling makes every closure self-contained (~KB per task — noise).
    With ``--py-files`` this is merely redundant, never wrong.
    """
    try:
        from pyspark import cloudpickle  # type: ignore[attr-defined]
    except ImportError:  # pragma: no cover
        try:
            from pyspark.serializers import cloudpickle  # type: ignore
        except ImportError:
            return
    import sys

    reg = getattr(cloudpickle, "register_pickle_by_value", None)
    if reg is None:  # pragma: no cover
        return
    pkg = sys.modules[__name__]
    reg(pkg)
    # submodules register themselves as they are imported below
    import linkgraph.csr
    import linkgraph.extract
    import linkgraph.dictionary
    import linkgraph.superstep
    import linkgraph.textops.dedup
    import linkgraph.textops.quality
    import linkgraph.textops.ann
    import linkgraph.textops.multimodal

    for name, mod in list(sys.modules.items()):
        if name.startswith("linkgraph"):
            try:
                reg(mod)
            except Exception:  # pragma: no cover
                pass


_register_self_pickle_by_value()

from linkgraph.graph import Graph
from linkgraph.algorithms.pagerank import pagerank
from linkgraph.algorithms.cc import connected_components
from linkgraph.algorithms.labelprop import label_propagation
from linkgraph.algorithms.triangles import triangle_count, triangle_counts_per_vertex
from linkgraph.algorithms.bfs import bfs, multi_source_bfs
from linkgraph.algorithms.sssp import sssp, delta_stepping
from linkgraph.algorithms.ppr import personalized_pagerank
from linkgraph.algorithms.hits import hits
from linkgraph.algorithms.kcore import k_core
from linkgraph.algorithms.coloring import jpl_coloring
from linkgraph.algorithms.spgemm import spgemm, square_counts
from linkgraph.algorithms.bc import betweenness_centrality
from linkgraph.algorithms.mst import minimum_spanning_forest
from linkgraph.algorithms.geolocation import geolocate
from linkgraph.algorithms.katz import katz
from linkgraph.algorithms.anf import anf, effective_diameter, harmonic_centrality
from linkgraph.algorithms.trustrank import trustrank, spam_mass
from linkgraph.algorithms.walks import random_walks
from linkgraph.algorithms.opic import opic, crawl_priorities
from linkgraph.algorithms.matching import maximal_matching, matched_pairs
from linkgraph.algorithms.coreness import coreness
from linkgraph.algorithms.scc import (
    strongly_connected_components,
    bowtie_decomposition,
    condensation_levels,
)
from linkgraph.algorithms.salsa import salsa
from linkgraph.algorithms.eigen import eigenvector_centrality
from linkgraph.algorithms.ktruss import k_truss, trussness
from linkgraph.algorithms.graphstats import (
    reciprocity,
    degree_assortativity,
    clustering_coefficients,
    global_clustering,
    bipartite_components,
    powerlaw_alpha,
)
from linkgraph.algorithms.triangles import triad_census
from linkgraph.algorithms.bfs import landmark_bfs, estimate_distance_upper
from linkgraph.algorithms.triangles import butterfly_count
from linkgraph.algorithms.ppr import ppr_push
from linkgraph.extract import (
    resolve_redirects,
    robots_allowed,
    host_url_cardinality,
    anchor_entropy,
)
from linkgraph.algorithms.opic import allocate_crawl_budget
from linkgraph.events import sessionize, session_stats
from linkgraph.epoch import EpochRemovalError, check_append_only

__all__ = [
    "Graph",
    "pagerank",
    "connected_components",
    "label_propagation",
    "triangle_count",
    "triangle_counts_per_vertex",
    "bfs",
    "multi_source_bfs",
    "sssp",
    "delta_stepping",
    "personalized_pagerank",
    "hits",
    "k_core",
    "jpl_coloring",
    "spgemm",
    "square_counts",
    "betweenness_centrality",
    "minimum_spanning_forest",
    "geolocate",
    "katz",
    "anf",
    "effective_diameter",
    "harmonic_centrality",
    "trustrank",
    "spam_mass",
    "random_walks",
    "opic",
    "crawl_priorities",
    "maximal_matching",
    "matched_pairs",
    "coreness",
    "strongly_connected_components",
    "bowtie_decomposition",
    "salsa",
    "eigenvector_centrality",
    "k_truss",
    "trussness",
    "reciprocity",
    "degree_assortativity",
    "clustering_coefficients",
    "global_clustering",
    "condensation_levels",
    "bipartite_components",
    "powerlaw_alpha",
    "triad_census",
    "landmark_bfs",
    "estimate_distance_upper",
    "resolve_redirects",
    "robots_allowed",
    "sessionize",
    "session_stats",
    "EpochRemovalError",
    "check_append_only",
    "butterfly_count",
    "ppr_push",
    "host_url_cardinality",
    "anchor_entropy",
    "allocate_crawl_budget",
]

__version__ = "0.1.0"
