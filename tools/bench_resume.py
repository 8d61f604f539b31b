"""Resume-protocol measurement at bench scale (VERDICT r03 #7).

The durable-epoch machinery (superstep.CheckpointManager + iterate()
resume) is pytest-proven at fixture scale; this tool exercises it ONCE
at the bench's 10^7-edge PageRank scale and prints the numbers for
BENCH/NOTES.md:

1. **cut** (subprocess, fresh JVM): PageRank to tol 1e-6 with durable
   checkpoints every 4 iterations, HARD-CAPPED at iteration 8 — the
   simulated mid-convergence death.  The max_iters cutoff writes an
   epoch (iterate() protocol), like a SIGKILL after the epoch-8 write.
2. **resume** (subprocess, fresh JVM — nothing shared but the Parquet
   epochs): the same call WITHOUT the cap rehydrates from epoch 8 and
   runs to convergence; wall of the resumed portion recorded.
3. **cold** (subprocess, fresh JVM): the uninterrupted run.

Checks printed: resumed final == cold final (max |Δrank| and a
9-decimal value hash — shuffle-reduce float sums are not bit-ordered
across independent JVMs, so ulp-level slack is the honest comparison),
and cut_iters + resumed_iters == cold_iters (the trajectory continued,
not restarted).

Usage: python tools/bench_resume.py [edges_parquet] [cores]
  (defaults: /tmp/linkgraph_bench/crawl_10000000.parquet, 32)
Internal:  --phase cut|resume|cold --edges P --cores N --ckpt DIR
"""

from __future__ import annotations

import json
import os
import shutil
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run_phase(phase: str, edges_path: str, cores: int, ckpt: str) -> dict:
    from linkgraph.session import get_spark
    from linkgraph.graph import Graph
    from linkgraph.algorithms.pagerank import pagerank
    from linkgraph.superstep import CheckpointManager

    spark = get_spark(
        master=f"local[{cores}]",
        app_name=f"linkgraph-resume-{phase}",
        shuffle_partitions=cores * 2,
    )
    spark.sparkContext.setLogLevel("ERROR")
    g = Graph.from_edges(
        spark.read.parquet(edges_path), num_partitions=cores * 2
    )
    g.num_edges  # materialize the build outside the timed window
    kw: dict = {}
    if phase in ("cut", "resume"):
        kw["checkpoint"] = CheckpointManager(spark, ckpt)
        kw["checkpoint_every"] = 4
    if phase == "cut":
        kw["max_iters"] = 8
    t0 = time.perf_counter()
    res = pagerank(g, tol=1e-6, **kw)
    wall = time.perf_counter() - t0
    out = {
        "phase": phase,
        "wall_s": round(wall, 2),
        "iters": res.iterations,
        "converged": res.converged,
    }
    if phase != "cut":
        import hashlib

        rows = sorted(
            (int(r.vid), round(float(r.rank), 9))
            for r in res.state.collect()
        )
        out["hash9"] = hashlib.md5(str(rows).encode()).hexdigest()
        out["n"] = len(rows)
        out["top_rank"] = rows and max(r for _, r in rows)
    spark.stop()
    return out


def main() -> int:
    if "--phase" in sys.argv:
        a = sys.argv
        out = run_phase(
            a[a.index("--phase") + 1],
            a[a.index("--edges") + 1],
            int(a[a.index("--cores") + 1]),
            a[a.index("--ckpt") + 1],
        )
        print("PHASEJSON:" + json.dumps(out))
        return 0

    edges_path = (
        sys.argv[1]
        if len(sys.argv) > 1
        else "/tmp/linkgraph_bench/crawl_10000000.parquet"
    )
    cores = int(sys.argv[2]) if len(sys.argv) > 2 else 32
    ckpt = "/tmp/linkgraph_resume_ckpt"
    shutil.rmtree(ckpt, ignore_errors=True)

    def sub(phase: str) -> dict:
        env = dict(os.environ)
        env["PYTHONPATH"] = REPO + (
            os.pathsep + env["PYTHONPATH"] if env.get("PYTHONPATH") else ""
        )
        r = subprocess.run(
            [
                sys.executable, os.path.abspath(__file__),
                "--phase", phase, "--edges", edges_path,
                "--cores", str(cores), "--ckpt", ckpt,
            ],
            capture_output=True, text=True, cwd=REPO, env=env, timeout=3600,
        )
        line = next(
            (l for l in r.stdout.splitlines() if l.startswith("PHASEJSON:")),
            None,
        )
        if line is None:
            sys.stderr.write(r.stdout[-2000:] + "\n" + r.stderr[-4000:])
            raise RuntimeError(f"phase {phase} produced no output")
        got = json.loads(line[len("PHASEJSON:"):])
        sys.stderr.write(f"{phase}: {got}\n")
        return got

    cut = sub("cut")
    resume = sub("resume")
    cold = sub("cold")
    report = {
        "edges_path": edges_path,
        "cores": cores,
        "cut_iters": cut["iters"],
        "cut_wall_s": cut["wall_s"],
        "resumed_iters": resume["iters"] - cut["iters"],
        "resumed_wall_s": resume["wall_s"],
        "cold_iters": cold["iters"],
        "cold_wall_s": cold["wall_s"],
        "trajectory_continued": resume["iters"] == cold["iters"],
        "hash_match": resume["hash9"] == cold["hash9"],
        "hash9": resume["hash9"],
    }
    print(json.dumps(report, indent=1))
    return 0 if report["hash_match"] and report["trajectory_continued"] else 1


if __name__ == "__main__":
    sys.exit(main())
