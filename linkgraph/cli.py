"""spark-submit entry point (BASELINE.json:6: "launched via spark-submit
--py-files on multi-executor clusters").

Usage::

    # cluster: ship the package (tools/build_pyfiles_zip.py) + a two-line
    # launcher app.py = "from linkgraph.cli import main; main()"
    # (spark-submit takes a script file, not -m):
    spark-submit --master spark://... --py-files dist/linkgraph.zip app.py \\
        pagerank --edges s3://bucket/edges.parquet --out /tmp/ranks \\
        --checkpoint-dir /tmp/ck --tol 1e-6

    # local:
    python -m linkgraph.cli pipeline --pages pages.parquet --out /tmp/out

Subcommands: pagerank | cc | labelprop | triangles | ppr | hits | bfs |
sssp | kcore | coloring | mst | bc | geo | pipeline (pages → edges → all
four mandated primitives) | ingest (incremental streaming drain of new
page snapshots into the append-only link log, exactly-once; --compact
also writes latest-wins url pairs).  Reads/writes Parquet; Iceberg tables work
transparently when the catalog is configured on the session
(``--table catalog.db.pages`` style paths via ``spark.read.table``).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _load(spark, path: str):
    # A catalog table name (`db.pages`, `catalog.db.pages`) is dotted but
    # never contains a path separator; anything with a "/" or a scheme is
    # a filesystem path even when it contains dots (e.g. a dated directory
    # like /data/crawl-2024.06/edges).  A SINGLE-part name (`pages`, the
    # current database's table) is ambiguous with a relative dir — resolve
    # it through the catalog first so configured tables win.
    if "://" not in path and "/" not in path and not path.endswith(".parquet"):
        if "." in path:
            return spark.read.table(path)  # Iceberg/catalog table name
        from pyspark.errors import AnalysisException

        try:
            is_table = spark.catalog.tableExists(path)
        except AnalysisException:
            # not a resolvable table identifier → treat as a path; any
            # OTHER failure (unreachable metastore etc.) must propagate,
            # not silently demote a table read to a same-named local dir
            is_table = False
        if is_table:
            return spark.read.table(path)
    return spark.read.parquet(path)


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="linkgraph")
    ap.add_argument(
        "command",
        choices=[
            "pagerank", "cc", "labelprop", "triangles", "pipeline",
            "ppr", "hits", "bfs", "sssp", "kcore", "coloring", "mst", "bc",
            "geo", "ingest", "query",
        ],
    )
    ap.add_argument("--name", default=None,
                    help="query: catalog entry name (python -c 'from "
                         "linkgraph.queries import QUERIES; "
                         "print(sorted(QUERIES))' lists them)")
    ap.add_argument("--sf-dir", default=None,
                    help="query: directory holding the parquet tables "
                         "the entry reads (documents/embeddings/...)")
    ap.add_argument("--compact", action="store_true",
                    help="ingest: also write latest-wins compacted url "
                         "pairs to <out>/pairs.parquet after the drain")
    ap.add_argument("--locations", default=None,
                    help="geo: parquet/table (vid, lat, lon); default = "
                         "deterministic seeds on every 10th vid")
    ap.add_argument("--source", type=int, default=0, help="bfs/sssp/bc source vid")
    ap.add_argument("--direction", default="optimized",
                    choices=["forward", "pull", "optimized"],
                    help="bfs traversal: push-only, pull-only, or the "
                         "per-round push/pull switch (CLI default; the "
                         "library bfs() defaults to forward — identical "
                         "output either way)")
    ap.add_argument("--seeds", default="0", help="ppr comma-separated seed vids")
    ap.add_argument("--k", type=int, default=3, help="kcore k")
    ap.add_argument("--weight-col", default=None, help="mst/sssp weight column")
    ap.add_argument("--edges", help="edges parquet/table (src,dst)")
    ap.add_argument("--pages", help="pages parquet/table (url,warc_ts,html,text,lang)")
    ap.add_argument("--out", required=True)
    ap.add_argument("--checkpoint-dir", default=None)
    ap.add_argument("--checkpoint-every", type=int, default=5)
    ap.add_argument("--tol", type=float, default=1e-6)
    ap.add_argument("--alpha", type=float, default=0.85)
    ap.add_argument("--max-iters", type=int, default=100)
    ap.add_argument("--partitions", type=int, default=None)
    ap.add_argument("--strategy", default="join", choices=["join", "spmv"])
    args = ap.parse_args(argv)

    from pyspark.sql import SparkSession

    from linkgraph import (
        Graph,
        connected_components,
        label_propagation,
        pagerank,
        triangle_counts_per_vertex,
    )
    from linkgraph.superstep import CheckpointManager

    spark = SparkSession.builder.appName(f"linkgraph-{args.command}").getOrCreate()
    if args.partitions is not None:
        # Graph.from_edges contract: the graph's partition count MUST
        # equal spark.sql.shuffle.partitions, or every superstep join
        # re-exchanges one |E|-sized side (graph.py docstring; guarded by
        # tests/test_plans.py).  Align the session before building.
        spark.conf.set("spark.sql.shuffle.partitions", str(args.partitions))
    ck = (
        CheckpointManager(spark, args.checkpoint_dir)
        if args.checkpoint_dir
        else None
    )

    if args.command == "query":
        # every catalog entry — graph primitive, dedup pass, ANN, corpus
        # stat — callable by name; the same seam the driver gate runs
        from linkgraph.queries import QUERIES

        if not args.name or args.name not in QUERIES:
            ap.error(
                "query requires --name, one of: " + ", ".join(sorted(QUERIES))
            )
        if not args.sf_dir:
            ap.error("query requires --sf-dir")
        t0 = time.perf_counter()
        df = QUERIES[args.name](spark, args.sf_dir)
        df.write.mode("overwrite").parquet(args.out)
        print(json.dumps({
            "query": args.name,
            "rows": spark.read.parquet(args.out).count(),
            "wall_s": round(time.perf_counter() - t0, 2),
        }))
        return 0

    if args.command == "ingest":
        if not args.pages:
            ap.error("ingest requires --pages (a directory of page-snapshot parquet)")
        if not args.checkpoint_dir:
            ap.error("ingest requires --checkpoint-dir (exactly-once stream state)")
        from linkgraph.streaming import LINK_LOG_SCHEMA, compact_link_log, run_ingest

        log_dir = f"{args.out}/link_log.parquet"
        t0 = time.perf_counter()
        run_ingest(spark, args.pages, log_dir, args.checkpoint_dir)
        stats = {"wall_s": round(time.perf_counter() - t0, 2)}
        try:
            log = spark.read.schema(LINK_LOG_SCHEMA).parquet(log_dir)
            stats["link_log_rows"] = log.count()
        except Exception:
            # a drain that found no input files never creates the sink
            # path — that is a valid empty ingest, not an error
            log = None
            stats["link_log_rows"] = 0
        if args.compact:
            # an empty drain still (re)writes pairs.parquet — the output
            # contract downstream readers rely on, and latest-wins
            # semantics: no log rows means no surviving pairs, so a stale
            # pairs.parquet from an earlier run must not outlive this one
            src = log if log is not None else spark.createDataFrame(
                [], LINK_LOG_SCHEMA
            )
            compact_link_log(src).write.mode("overwrite").parquet(
                f"{args.out}/pairs.parquet"
            )
            stats["compacted_pairs"] = spark.read.parquet(
                f"{args.out}/pairs.parquet"
            ).count()
        print(json.dumps(stats))
        return 0

    if args.command == "pipeline":
        if not args.pages:
            ap.error("pipeline requires --pages")
        from linkgraph.dictionary import edges_from_url_pairs, encode_urls
        from linkgraph.extract import pages_to_edge_urls

        pages = _load(spark, args.pages)
        # persist: the extraction chain (latest-snapshot window + Arrow
        # parse + explode + distinct) is the dominant front-end cost and
        # feeds BOTH the url dictionary and the edge builder — without
        # the pin it executes twice
        pairs = pages_to_edge_urls(pages).persist()
        urls = pairs.selectExpr("src_url as url").unionAll(
            pairs.selectExpr("dst_url as url")
        )
        verts = encode_urls(urls, num_partitions=args.partitions)
        verts.write.mode("overwrite").parquet(f"{args.out}/vertices.parquet")
        edges = edges_from_url_pairs(pairs, verts)
        edges.write.mode("overwrite").parquet(f"{args.out}/edges.parquet")
        pairs.unpersist()
        g = Graph.from_edges(
            spark.read.parquet(f"{args.out}/edges.parquet"),
            num_partitions=args.partitions,
        )
        t0 = time.perf_counter()
        pr = pagerank(g, alpha=args.alpha, tol=args.tol, max_iters=args.max_iters,
                      strategy=args.strategy, checkpoint=ck,
                      checkpoint_every=args.checkpoint_every)
        pr.state.write.mode("overwrite").parquet(f"{args.out}/pagerank.parquet")
        cc = connected_components(g)
        cc.state.write.mode("overwrite").parquet(f"{args.out}/components.parquet")
        lp = label_propagation(g)
        lp.state.write.mode("overwrite").parquet(f"{args.out}/labels.parquet")
        tc = triangle_counts_per_vertex(g)
        tc.write.mode("overwrite").parquet(f"{args.out}/triangles.parquet")
        print(json.dumps({
            "pages": pages.count(), "vertices": g.num_vertices,
            "edges": g.num_edges, "pr_iters": pr.iterations,
            "cc_iters": cc.iterations, "lp_iters": lp.iterations,
            "wall_s": round(time.perf_counter() - t0, 2),
        }))
        return 0

    if not args.edges:
        ap.error(f"{args.command} requires --edges")
    if args.command == "mst":
        # MST runs on the raw (possibly multigraph) edge rows, not a
        # deduped Graph — skip the Graph build (an |E| repartition +
        # dropDuplicates it would never use) and report the stats of the
        # edge set the algorithm actually consumed
        from pyspark.sql import functions as F

        from linkgraph.algorithms.mst import minimum_spanning_forest

        e = _load(spark, args.edges)
        if args.weight_col is None:
            e = e.withColumn(
                "weight",
                (F.col("src") * 1000000 + F.col("dst")).cast("double"),
            )
            wcol = "weight"
        else:
            wcol = args.weight_col
        t0 = time.perf_counter()
        forest = minimum_spanning_forest(e, weight_col=wcol)
        forest.write.mode("overwrite").parquet(args.out)
        n_vert = (
            e.select(F.col("src").alias("vid"))
            .unionAll(e.select(F.col("dst").alias("vid")))
            .distinct()
            .count()
        )
        print(json.dumps({
            "command": "mst", "vertices": n_vert, "edges": e.count(),
            "iterations": 1, "converged": True,
            "wall_s": round(time.perf_counter() - t0, 2),
        }))
        return 0
    g = Graph.from_edges(_load(spark, args.edges), num_partitions=args.partitions)
    t0 = time.perf_counter()
    if args.command == "pagerank":
        res = pagerank(g, alpha=args.alpha, tol=args.tol,
                       max_iters=args.max_iters, strategy=args.strategy,
                       checkpoint=ck, checkpoint_every=args.checkpoint_every)
        out_df, iters, conv = res.state, res.iterations, res.converged
    elif args.command == "cc":
        res = connected_components(g, max_iters=args.max_iters, checkpoint=ck,
                                   checkpoint_every=args.checkpoint_every)
        out_df, iters, conv = res.state, res.iterations, res.converged
    elif args.command == "labelprop":
        res = label_propagation(g, max_iters=args.max_iters, checkpoint=ck,
                                checkpoint_every=args.checkpoint_every)
        out_df, iters, conv = res.state, res.iterations, res.converged
    elif args.command == "ppr":
        from linkgraph.algorithms.ppr import personalized_pagerank

        seeds = [int(x) for x in args.seeds.split(",") if x != ""]
        res = personalized_pagerank(g, seeds, alpha=args.alpha, tol=args.tol,
                                    max_iters=args.max_iters, checkpoint=ck,
                                    checkpoint_every=args.checkpoint_every)
        out_df, iters, conv = res.state, res.iterations, res.converged
    elif args.command == "hits":
        from linkgraph.algorithms.hits import hits

        res = hits(g, tol=args.tol, max_iters=args.max_iters, checkpoint=ck,
                   checkpoint_every=args.checkpoint_every)
        out_df, iters, conv = res.state, res.iterations, res.converged
    elif args.command == "bfs":
        from linkgraph.algorithms.bfs import bfs

        res = bfs(g, args.source, max_iters=args.max_iters,
                  direction=args.direction, checkpoint=ck,
                  checkpoint_every=args.checkpoint_every)
        out_df, iters, conv = res.state, res.iterations, res.converged
    elif args.command == "sssp":
        from linkgraph.algorithms.sssp import sssp

        res = sssp(g, args.source, weight_col=args.weight_col,
                   max_iters=args.max_iters, checkpoint=ck,
                   checkpoint_every=args.checkpoint_every)
        out_df, iters, conv = res.state, res.iterations, res.converged
    elif args.command == "kcore":
        from linkgraph.algorithms.kcore import k_core

        res = k_core(g, args.k, max_iters=args.max_iters)
        out_df, iters, conv = res.state, res.iterations, res.converged
    elif args.command == "coloring":
        from linkgraph.algorithms.coloring import jpl_coloring

        res = jpl_coloring(g, max_iters=args.max_iters)
        out_df, iters, conv = res.state, res.iterations, res.converged
    elif args.command == "bc":
        from linkgraph.algorithms.bc import betweenness_centrality

        out_df, iters, conv = betweenness_centrality(g, [args.source]), 1, True
    elif args.command == "geo":
        from pyspark.sql import functions as F

        from linkgraph.algorithms.geolocation import geolocate

        if args.locations:
            locs = _load(spark, args.locations)
        else:
            locs = g.vertices.where(F.col("vid") % 10 == 0).select(
                "vid",
                ((F.col("vid") % 180) - 90).cast("double").alias("lat"),
                ((F.col("vid") % 360) - 180).cast("double").alias("lon"),
            )
        res = geolocate(g, locs, max_iters=args.max_iters, checkpoint=ck,
                        checkpoint_every=args.checkpoint_every)
        out_df, iters, conv = res.state, res.iterations, res.converged
    else:  # triangles
        out_df, iters, conv = triangle_counts_per_vertex(g), 1, True
    out_df.write.mode("overwrite").parquet(args.out)
    print(json.dumps({
        "command": args.command, "vertices": g.num_vertices,
        "edges": g.num_edges, "iterations": iters, "converged": conv,
        "wall_s": round(time.perf_counter() - t0, 2),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
