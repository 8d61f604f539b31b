"""Benchmark harness (driver contract + BASELINE.md protocol).

Main mode: runs the benchmark suite at TWO parallelism levels —
``local[8]`` and ``local[N]`` (N = $SPARK_GRAFT_CPUS, default 32) — in
subprocesses (one JVM each), computes PageRank throughput
(traversed-edges/sec over fixed supersteps) at both, the N→4N scaling
efficiency proxy, CC/TC wall-clock, writes ``BENCH/BASELINE.md`` and
prints ONE JSON line.

The graph is the deterministic synthetic web crawl (seed=42, Zipf
out-degrees + hub skew + dangling pages — FIXTURES.md F1) sized by
$LINKGRAPH_BENCH_EDGES (default 10M edges, per the ≥10^7-edge protocol),
materialized once to Parquet so both levels read identical bytes.  The
sf-dir documents-derived graph is also timed (ties the run to
$SPARK_GRAFT_SF_DIR).

Level mode (internal): ``python bench.py --level <cores>`` times the
suite on one SparkSession and prints a JSON dict of seconds.
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
CPUS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
# Scaling measurement graph: large enough that per-superstep parallel
# compute dominates the ~1s fixed driver/scheduling cost per iteration
# (at 10^7 edges the fixed cost caps measurable speedup at ~1.5×
# regardless of how well the plan scales; at 10^8 the parallel fraction
# is >90% and the N→4N criterion actually measures the engine).
TARGET_EDGES = int(os.environ.get("LINKGRAPH_BENCH_EDGES", "100000000"))
# Extras (converged PR / CC / TC / sf-graph) run once at the high level on
# a smaller graph — they are operator-coverage timings, not the scaling
# criterion.
EXTRAS_EDGES = int(os.environ.get("LINKGRAPH_EXTRAS_EDGES", "10000000"))
FIXED_ITERS = int(os.environ.get("LINKGRAPH_BENCH_ITERS", "10"))
WORK_DIR = os.environ.get("LINKGRAPH_BENCH_DIR", "/tmp/linkgraph_bench")
REPO = os.path.dirname(os.path.abspath(__file__))


def _sf_from_dir(d: str) -> float:
    base = os.path.basename(d.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return 0.0


def build_crawl_parquet(path: str, target_edges: int) -> int:
    """Deterministic crawl edge table → parquet; returns raw edge count."""
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    sys.path.insert(0, REPO)
    from linkgraph.fixtures import synthetic_crawl

    n_pages = max(1000, target_edges // 3)
    edges = synthetic_crawl(n_pages, seed=42)
    rng = np.random.default_rng(43)
    if len(edges) < target_edges:
        m = target_edges - len(edges)
        src = rng.integers(0, n_pages, size=m)
        dst = rng.integers(0, n_pages, size=m)
        keep = src != dst
        extra = np.stack([src[keep], dst[keep]], axis=1)
        edges = np.concatenate([edges, extra])
    tbl = pa.table(
        {
            "src": pa.array(edges[:, 0], type=pa.int64()),
            "dst": pa.array(edges[:, 1], type=pa.int64()),
        }
    )
    pq.write_table(tbl, path, row_group_size=2_000_000)
    return len(edges)


def run_level(
    cores: int, edges_path: str, include_extras: bool, extras_path: str | None = None
) -> dict:
    sys.path.insert(0, REPO)
    from linkgraph.session import get_spark
    from linkgraph.graph import Graph
    from linkgraph.algorithms.pagerank import pagerank
    from linkgraph.algorithms.cc import connected_components
    from linkgraph.algorithms.triangles import triangle_count

    out: dict = {"cores": cores}
    # IDENTICAL job at every parallelism level: partition count is fixed
    # to 2× the HIGH level's cores, so the low level runs the same tasks
    # in more waves (the N→4N executor experiment on a real cluster keeps
    # the dataset partitioning fixed and adds executors — same here).
    parts = CPUS * 2
    spark = get_spark(
        master=f"local[{cores}]",
        app_name=f"linkgraph-bench-{cores}",
        shuffle_partitions=parts,
        extra_conf={"spark.driver.memory": "48g"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    t0 = time.perf_counter()
    g = Graph.from_edges(spark.read.parquet(edges_path), num_partitions=parts)
    e, v = g.num_edges, g.num_vertices
    out["graph_build_s"] = round(time.perf_counter() - t0, 2)
    out["edges"], out["vertices"] = e, v

    # warm-up: 2 supersteps (JIT, cache fill) — untimed
    pagerank(g, tol=0.0, max_iters=2)

    t0 = time.perf_counter()
    pagerank(g, tol=0.0, max_iters=FIXED_ITERS)
    dt = time.perf_counter() - t0
    out["pr_fixed_s"] = round(dt, 2)
    out["pr_fixed_iters"] = FIXED_ITERS
    out["edges_per_sec"] = round(FIXED_ITERS * e / dt, 0)

    if include_extras:
        gx = g
        if extras_path is not None and extras_path != edges_path:
            g.unpersist()
            gx = Graph.from_edges(
                spark.read.parquet(extras_path), num_partitions=cores * 2
            )
            out["extras_edges"] = gx.num_edges

        t0 = time.perf_counter()
        res = pagerank(gx, tol=1e-6, max_iters=100)
        out["pr_converged_s"] = round(time.perf_counter() - t0, 2)
        out["pr_converged_iters"] = res.iterations

        t0 = time.perf_counter()
        pagerank(gx, tol=0.0, max_iters=FIXED_ITERS, strategy="spmv")
        out["pr_spmv_fixed_s"] = round(time.perf_counter() - t0, 2)

        t0 = time.perf_counter()
        cc = connected_components(gx)
        out["cc_s"] = round(time.perf_counter() - t0, 2)
        out["cc_iters"] = cc.iterations

        t0 = time.perf_counter()
        out["triangles"] = triangle_count(gx)
        out["tc_s"] = round(time.perf_counter() - t0, 2)

        # sf-dir documents-derived graph (ties bench to SPARK_GRAFT_SF_DIR)
        from linkgraph.queries import build_graph

        t0 = time.perf_counter()
        gs = build_graph(spark, SF_DIR)
        pagerank(gs, tol=1e-6, max_iters=50)
        out["pr_sfgraph_s"] = round(time.perf_counter() - t0, 2)

    spark.stop()
    return out


def main() -> int:
    if "--level" in sys.argv:
        i = sys.argv.index("--level")
        cores = int(sys.argv[i + 1])
        edges_path = sys.argv[sys.argv.index("--edges-path") + 1]
        extras = "--extras" in sys.argv
        extras_path = None
        if "--extras-path" in sys.argv:
            extras_path = sys.argv[sys.argv.index("--extras-path") + 1]
        print(
            "LEVELJSON:"
            + json.dumps(run_level(cores, edges_path, extras, extras_path))
        )
        return 0

    os.makedirs(WORK_DIR, exist_ok=True)
    os.makedirs(os.path.join(REPO, "BENCH"), exist_ok=True)
    edges_path = os.path.join(WORK_DIR, f"crawl_{TARGET_EDGES}.parquet")
    if not os.path.exists(edges_path):
        build_crawl_parquet(edges_path, TARGET_EDGES)
    extras_path = os.path.join(WORK_DIR, f"crawl_{EXTRAS_EDGES}.parquet")
    if not os.path.exists(extras_path):
        build_crawl_parquet(extras_path, EXTRAS_EDGES)

    low_cores = int(os.environ.get("LINKGRAPH_BENCH_LOW_CORES", "8"))
    levels = {}
    for cores, extras in ((low_cores, False), (CPUS, True)):
        cmd = [
            sys.executable, os.path.abspath(__file__),
            "--level", str(cores), "--edges-path", edges_path,
            "--extras-path", extras_path,
        ] + (["--extras"] if extras else [])
        r = subprocess.run(
            cmd, capture_output=True, text=True, cwd=REPO,
            env=dict(os.environ, PYTHONPATH=REPO), timeout=5400,
        )
        line = next(
            (l for l in r.stdout.splitlines() if l.startswith("LEVELJSON:")),
            None,
        )
        if line is None:
            sys.stderr.write(r.stdout[-2000:] + "\n" + r.stderr[-4000:])
            return 1
        levels[cores] = json.loads(line[len("LEVELJSON:"):])

    lo, hi = levels[low_cores], levels[CPUS]
    core_ratio = CPUS / low_cores
    speedup = lo["pr_fixed_s"] / hi["pr_fixed_s"]
    efficiency = round(speedup / core_ratio, 3)

    queries = {
        f"pagerank_{FIXED_ITERS}iter_local{low_cores}": lo["pr_fixed_s"],
        f"pagerank_{FIXED_ITERS}iter_local{CPUS}": hi["pr_fixed_s"],
        f"pagerank_converged_local{CPUS}": hi.get("pr_converged_s"),
        f"pagerank_spmv_{FIXED_ITERS}iter_local{CPUS}": hi.get("pr_spmv_fixed_s"),
        f"cc_local{CPUS}": hi.get("cc_s"),
        f"triangles_local{CPUS}": hi.get("tc_s"),
        f"pagerank_sfgraph_local{CPUS}": hi.get("pr_sfgraph_s"),
    }
    result = {
        "metric": "pagerank_10iter_wall_local%d" % CPUS,
        "value": hi["pr_fixed_s"],
        "unit": "sec",
        "queries": {k: v for k, v in queries.items() if v is not None},
        "sf": _sf_from_dir(SF_DIR),
        "edges": hi["edges"],
        "vertices": hi["vertices"],
        "edges_per_sec_low": lo["edges_per_sec"],
        "edges_per_sec_high": hi["edges_per_sec"],
        "low_cores": low_cores,
        "high_cores": CPUS,
        "scaling_efficiency": efficiency,
        "pr_converged_iters": hi.get("pr_converged_iters"),
        "triangles": hi.get("triangles"),
    }

    md = f"""# BENCH/BASELINE.md — measured numbers (deterministic crawl, seed=42)

Scaling input: synthetic web crawl, {hi['edges']:,} edges /
{hi['vertices']:,} vertices (Zipf out-degrees, hub skew, 5% dangling —
FIXTURES.md F1), identical Parquet bytes fed to both levels; partition
count fixed at 2×{CPUS} for BOTH levels (same job, more/fewer cores —
the N→4N executor experiment).  AQE on, Arrow on.  PageRank α=0.85,
probability form.  Extras graph: {hi.get('extras_edges', hi['edges']):,} edges.

| metric | local[{low_cores}] | local[{CPUS}] |
|---|---|---|
| PageRank {FIXED_ITERS} supersteps wall (s) | {lo['pr_fixed_s']} | {hi['pr_fixed_s']} |
| traversed edges/sec | {lo['edges_per_sec']:,.0f} | {hi['edges_per_sec']:,.0f} |
| graph build (s) | {lo['graph_build_s']} | {hi['graph_build_s']} |

**Scaling efficiency ({low_cores}→{CPUS} cores, {core_ratio:.0f}×):**
speedup {speedup:.2f} / {core_ratio:.0f} = **{efficiency}** (criterion ≥ 0.8 — two-parallelism-level
proxy for the N→4N executor rule, per driver instruction).

local[{CPUS}] extras:
- PageRank to tol 1e-6: {hi.get('pr_converged_s')} s, {hi.get('pr_converged_iters')} iterations
- PageRank SpMV strategy, {FIXED_ITERS} supersteps: {hi.get('pr_spmv_fixed_s')} s
- Connected components (hash-min, {hi.get('cc_iters')} iters): {hi.get('cc_s')} s
- Triangle count ({hi.get('triangles'):,} triangles): {hi.get('tc_s')} s
- sf-graph ({SF_DIR}) PageRank to 1e-6: {hi.get('pr_sfgraph_s')} s
"""
    with open(os.path.join(REPO, "BENCH", "BASELINE.md"), "w") as f:
        f.write(md)

    print(json.dumps(result))
    return 0


if __name__ == "__main__":
    sys.exit(main())
