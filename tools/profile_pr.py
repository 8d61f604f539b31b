"""Profile PageRank supersteps at bench scale — per-iteration walls + plan.

Usage: python tools/profile_pr.py [cores] [iters] [edges_parquet] [--explain]
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F

from linkgraph.session import get_spark
from linkgraph.graph import Graph
from linkgraph.algorithms.pagerank import pagerank

_flags = [a for a in sys.argv[1:] if a.startswith("--")]
_pos = [a for a in sys.argv[1:] if not a.startswith("--")]
cores = int(_pos[0]) if len(_pos) > 0 else 32
iters = int(_pos[1]) if len(_pos) > 1 else 6
path = _pos[2] if len(_pos) > 2 else "/tmp/linkgraph_bench/crawl_10000000.parquet"

spark = get_spark(master=f"local[{cores}]", shuffle_partitions=64,
                  extra_conf={"spark.driver.memory": "48g"})
spark.sparkContext.setLogLevel("ERROR")

t0 = time.perf_counter()
g = Graph.from_edges(spark.read.parquet(path), num_partitions=64)
n, e = g.num_vertices, g.num_edges
print(f"PROF build+count: {time.perf_counter()-t0:.2f}s  V={n} E={e}", flush=True)

t0 = time.perf_counter()
res = pagerank(g, tol=0.0, max_iters=iters)
dt = time.perf_counter() - t0
for h in res.history:
    print(f"PROF iter {h['iter']}: {h['wall_ms']/1000:.2f}s", flush=True)
print(f"PROF total {iters} iters: {dt:.2f}s  edges/s={iters*e/dt:,.0f}", flush=True)

if "--explain" in _flags:
    from linkgraph.operators.neighbor_reduce import neighbor_reduce
    state = res.state.join(g.out_degrees, "vid", "left")
    # one more superstep's plan against a co-partitioned persisted state
    st = state.repartition(64, "vid").sortWithinPartitions("vid").persist()
    st.count()
    contrib = st.where(F.col("outdeg").isNotNull()).select(
        "vid", (F.col("rank") / F.col("outdeg")).alias("contrib"))
    sums = neighbor_reduce(g.edges, contrib, F.col("contrib"), op="sum", out="msum")
    new = st.join(sums, "vid", "left")
    new.explain("formatted")
spark.stop()
