"""One-off crawl-scale timings for the round-2 graph additions
(Louvain move phase, link prediction, HyperBall closeness, community
quality) — the same treatment BENCH/NOTES.md gives the core
primitives.  Results print as one JSON line for pasting into
BENCH/NOTES.md; not part of the per-round bench.py protocol (these are
characterization numbers, not the driver's scaling criterion).

Input: the SAME deterministic synthetic crawl bench.py measures
(fixtures.synthetic_crawl, seed=42 — $LINKGRAPH_EXTRAS_EDGES target
edges, default 10^7) at local[$SPARK_GRAFT_CPUS].  Passing an sf_dir
argument instead benches the (much smaller) documents-derived graph of
that directory — useful for a quick smoke, NOT a crawl-scale number.

Usage: python tools/bench_graph_extras.py [sf_dir]
"""

from __future__ import annotations

import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else None

    from linkgraph.algorithms.anf import closeness_centrality
    from linkgraph.algorithms.community import (
        community_conductance,
        modularity,
        modularity_lp,
    )
    from linkgraph.algorithms.linkpred import link_prediction
    from linkgraph.queries import build_graph
    from linkgraph.session import get_spark

    spark = get_spark(
        master=f"local[{CPUS}]",
        app_name="linkgraph-bench-graph-extras",
        shuffle_partitions=CPUS * 2,
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")
    if sf_dir is not None:
        g = build_graph(spark, sf_dir, num_partitions=CPUS * 2)
    else:
        from bench import WORK_DIR, build_crawl_parquet
        from linkgraph.graph import Graph

        os.makedirs(WORK_DIR, exist_ok=True)
        target = int(os.environ.get("LINKGRAPH_EXTRAS_EDGES", "10000000"))
        pq_path = os.path.join(WORK_DIR, f"extras_edges_{target}.parquet")
        if not os.path.exists(pq_path):
            build_crawl_parquet(pq_path, target)
        g = Graph.from_edges(
            spark.read.parquet(pq_path), num_partitions=CPUS * 2
        )
    res: dict = {
        "sf_dir": sf_dir or "synthetic_crawl",
        "edges": g.num_edges,
        "vertices": g.num_vertices,
        "cores": CPUS,
    }
    # materialize the shared views OUTSIDE the timings (every op would
    # otherwise pay the one-time symmetrize/degree build)
    g.symmetrized_edges.count()
    g.degrees.count()
    g.canonical_edges.count()

    def timed(name, fn):
        t0 = time.perf_counter()
        out = fn()
        res[name + "_s"] = round(time.perf_counter() - t0, 2)
        res[name + "_rows"] = out
        print(f"{name}: {res[name + '_s']} s ({out})", flush=True)

    lv_state = {}

    def run_louvain():
        r = modularity_lp(g, max_iters=4)
        lv_state["labels"] = r.state.select("vid", "label")
        return r.state.count()

    timed("louvain_lp4", run_louvain)
    timed(
        "modularity_of_louvain",
        lambda: modularity(g, lv_state["labels"]).collect()[0]["modularity"],
    )
    timed(
        "conductance_top20",
        lambda: community_conductance(g, lv_state["labels"], top_k=20).count(),
    )
    timed(
        "link_prediction_top50",
        lambda: link_prediction(g, top_k=50, max_degree=64).count(),
    )
    timed(
        "closeness_k8",
        lambda: closeness_centrality(g, k=8, max_iters=32).count(),
    )

    from linkgraph.algorithms.graphstats import (
        bipartite_components,
        powerlaw_alpha,
    )
    from linkgraph.algorithms.triangles import triad_census

    timed(
        "triad_census",
        lambda: triad_census(g).collect()[0]["n_triangles"],
    )
    timed("bipartite_components", lambda: bipartite_components(g).count())
    timed(
        "powerlaw_alpha",
        lambda: powerlaw_alpha(g, xmin=2).collect()[0]["alpha"],
    )

    from linkgraph.algorithms.ktruss import trussness

    timed("trussness", lambda: trussness(g).count())

    from linkgraph.algorithms.bfs import landmark_bfs

    timed(
        "landmark_bfs_k4",
        lambda: landmark_bfs(g, [0, 7, 13, 101], directed=False).count(),
    )

    # redirect-chain resolution at crawl scale: a functional graph over
    # |V| ids where 1/3 of ids redirect to a strictly smaller id — the
    # same shape as the catalog's REDIRECTS_SQL, with chains up to
    # hundreds of hops at 10^7 ids (log-round pointer doubling's case)
    from pyspark.sql import functions as F2

    from linkgraph.extract import resolve_redirects

    n_ids = g.num_vertices
    redirects = (
        spark.range(n_ids)
        .where((F2.col("id") % 3 == 1) & (F2.col("id") >= 11))
        .select(
            F2.col("id").alias("src"),
            (F2.col("id") - 1 - (F2.col("id") % 10)).alias("dst"),
        )
    )
    timed(
        "resolve_redirects",
        lambda: resolve_redirects(redirects).where("resolved").count(),
    )

    from linkgraph.algorithms.triangles import butterfly_count

    timed(
        "butterflies_cap64",
        lambda: butterfly_count(g, max_out_degree=64).collect()[0][
            "n_butterflies"
        ],
    )

    from linkgraph.algorithms.ppr import ppr_push

    timed(
        "ppr_push_eps1e-4",
        lambda: ppr_push(g, 0, alpha=0.15, eps=1e-4, max_rounds=100).count(),
    )
    print(json.dumps(res))
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
