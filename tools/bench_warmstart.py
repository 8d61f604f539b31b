"""Warm-start family at bench scale — one-off NOTES.md numbers.

The round-4 warm starts (sssp ``init_dists``, multi_source_bfs
``init_depths``, cc ``init_labels``) are pytest-proven on fixtures and
catalog-hash-checked at sf scale; this measures the thing they exist
for — fewer rounds / less wall on an epoch increment — at the bench's
10⁷-edge crawl:

- epoch 1 = the crawl MINUS a deterministic 2% of edges
  ((src·31 + dst) % 50 == 0 dropped) — the "previous" graph;
- epoch 2 = the full crawl; each algorithm runs COLD on epoch 2 and
  WARM seeded from its converged epoch-1 state;
- prints per-algorithm (cold_rounds, warm_rounds, cold_wall_s,
  warm_wall_s) and asserts the warm fixpoint equals the cold one
  (count + spot hash) before reporting.

Usage: python tools/bench_warmstart.py [edges_parquet] [cores]
"""

from __future__ import annotations

import hashlib
import json
import os
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def _hash_state(df, cols) -> str:
    rows = sorted(tuple(r) for r in df.select(*cols).collect())
    return hashlib.md5(str(rows).encode()).hexdigest()


def main() -> int:
    edges_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/tmp/linkgraph_bench/crawl_10000000.parquet"
    )
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    from pyspark.sql import functions as F

    from linkgraph.session import get_spark
    from linkgraph.graph import Graph
    from linkgraph.algorithms.cc import connected_components
    from linkgraph.algorithms.sssp import sssp
    from linkgraph.algorithms.bfs import multi_source_bfs

    spark = get_spark(
        master=f"local[{cores}]",
        app_name="linkgraph-warmstart-bench",
        shuffle_partitions=cores * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")
    full_edges = spark.read.parquet(edges_path)
    g2 = Graph.from_edges(full_edges, num_partitions=cores * 2)
    g2.num_edges
    g1 = Graph.from_edges(
        full_edges.where((F.col("src") * 31 + F.col("dst")) % 50 != 0),
        num_partitions=cores * 2,
    )
    g1.num_edges
    report: dict = {"edges_path": edges_path, "cores": cores,
                    "epoch1_edges": g1.num_edges,
                    "epoch2_edges": g2.num_edges}

    def timed(fn):
        t0 = time.perf_counter()
        out = fn()
        return out, round(time.perf_counter() - t0, 2)

    # ---- connected components --------------------------------------
    prev, _ = timed(lambda: connected_components(g1))
    cold, cw = timed(lambda: connected_components(g2))
    warm, ww = timed(
        lambda: connected_components(
            g2, init_labels=prev.state, assume_append_only=True
        )
    )
    assert warm.state.count() == cold.state.count()
    assert _hash_state(warm.state, ["vid", "comp"]) == _hash_state(
        cold.state, ["vid", "comp"]
    ), "cc warm != cold"
    report["cc"] = {
        "cold_rounds": cold.iterations, "warm_rounds": warm.iterations,
        "cold_wall_s": cw, "warm_wall_s": ww,
    }
    sys.stderr.write(f"cc: {report['cc']}\n")

    # ---- SSSP (unit weights) ---------------------------------------
    delta = full_edges.where((F.col("src") * 31 + F.col("dst")) % 50 == 0)
    prev, _ = timed(lambda: sssp(g1, 0))
    cold, cw = timed(lambda: sssp(g2, 0))
    warm, ww = timed(
        lambda: sssp(g2, 0, init_dists=prev.state, assume_append_only=True)
    )
    assert warm.state.count() == cold.state.count()
    ch = _hash_state(cold.state, ["vid", "dist"])
    assert _hash_state(warm.state, ["vid", "dist"]) == ch, "sssp warm != cold"
    wd, wdw = timed(
        lambda: sssp(
            g2, 0, init_dists=prev.state, delta_edges=delta,
            assume_append_only=True,
        )
    )
    assert _hash_state(wd.state, ["vid", "dist"]) == ch, "sssp delta != cold"
    report["sssp"] = {
        "cold_rounds": cold.iterations, "warm_rounds": warm.iterations,
        "cold_wall_s": cw, "warm_wall_s": ww,
        "warm_delta_rounds": wd.iterations, "warm_delta_wall_s": wdw,
    }
    sys.stderr.write(f"sssp: {report['sssp']}\n")

    # ---- nearest-source BFS ----------------------------------------
    seeds = spark.createDataFrame([(0,)], "vid long")
    prev, _ = timed(lambda: multi_source_bfs(g1, seeds))
    cold, cw = timed(lambda: multi_source_bfs(g2, seeds))
    warm, ww = timed(
        lambda: multi_source_bfs(
            g2, seeds,
            init_depths=prev.state.where(F.col("depth").isNotNull()),
            assume_append_only=True,
        )
    )
    ch = _hash_state(cold.state.where(F.col("depth").isNotNull()),
                     ["vid", "depth"])
    wh = _hash_state(warm.state.where(F.col("depth").isNotNull()),
                     ["vid", "depth"])
    assert ch == wh, "bfs warm != cold"
    wd, wdw = timed(
        lambda: multi_source_bfs(
            g2, seeds,
            init_depths=prev.state.where(F.col("depth").isNotNull()),
            assume_append_only=True,
            delta_edges=delta,
        )
    )
    assert _hash_state(
        wd.state.where(F.col("depth").isNotNull()), ["vid", "depth"]
    ) == ch, "bfs delta != cold"
    report["bfs"] = {
        "cold_rounds": cold.iterations, "warm_rounds": warm.iterations,
        "cold_wall_s": cw, "warm_wall_s": ww,
        "warm_delta_rounds": wd.iterations, "warm_delta_wall_s": wdw,
    }
    sys.stderr.write(f"bfs: {report['bfs']}\n")

    # ---- epoch guard cost (round 5) --------------------------------
    # the price of the fail-loud append-only contract: one full-outer
    # (src,dst) join + 1-row agg over both epochs' edge sets
    from linkgraph.epoch import check_append_only

    _, gw = timed(lambda: check_append_only(g1.edges, g2.edges))
    report["epoch_guard_check_s"] = gw
    sys.stderr.write(f"epoch guard (1e7-edge diff): {gw}s\n")

    # ---- power-family warm restarts (round 5) ----------------------
    # katz/eigen: epoch-1 converged state seeds epoch 2; unique-fixpoint
    # contraction arguments — fewer rounds to the same tolerance
    from linkgraph.algorithms.katz import katz
    from linkgraph.algorithms.eigen import eigenvector_centrality

    prev, _ = timed(lambda: katz(g1, tol=1e-9, max_iters=60))
    cold, cw = timed(lambda: katz(g2, tol=1e-9, max_iters=60))
    warm, ww = timed(
        lambda: katz(g2, tol=1e-9, max_iters=60, init_scores=prev.state)
    )
    assert cold.converged and warm.converged
    report["katz"] = {
        "cold_rounds": cold.iterations, "warm_rounds": warm.iterations,
        "cold_wall_s": cw, "warm_wall_s": ww,
    }
    sys.stderr.write(f"katz: {report['katz']}\n")

    prev, _ = timed(lambda: eigenvector_centrality(g1, tol=1e-6, max_iters=80))
    cold, cw = timed(lambda: eigenvector_centrality(g2, tol=1e-6, max_iters=80))
    warm, ww = timed(
        lambda: eigenvector_centrality(
            g2, tol=1e-6, max_iters=80, init_scores=prev.state
        )
    )
    report["eigen"] = {
        "cold_rounds": cold.iterations, "warm_rounds": warm.iterations,
        "cold_wall_s": cw, "warm_wall_s": ww,
        "cold_converged": cold.converged, "warm_converged": warm.converged,
    }
    sys.stderr.write(f"eigen: {report['eigen']}\n")

    print(json.dumps(report, indent=1))
    return 0


if __name__ == "__main__":
    sys.exit(main())
