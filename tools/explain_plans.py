"""Capture and assert the engine's physical plans → BENCH/PLANS.md.

The scale story (SURVEY.md §4) rests on specific physical properties that
`.explain("formatted")` makes visible.  This tool captures the plans on a
small synthetic crawl and ASSERTS the load-bearing ones, so a regression
that silently re-introduces a per-superstep exchange fails loudly:

1. **PageRank superstep**: exactly ONE shuffle (the message reduce by
   dst).  The gather join reads the persisted hash(src, P) edges and the
   checkpointed hash(vid, P) state with NO Exchange on either side, as a
   sort-free SortMergeJoin; the state-merge join likewise.
2. **Parquet scan pushdown**: a filtered 2-column projection reaches the
   scan as PushedFilters + a pruned ReadSchema (Catalyst, free).
3. **Triangle count**: the canonical-edges self-join reuses one persisted
   InMemoryRelation; the existence check is a left-semi join.

Usage: python tools/explain_plans.py  (writes BENCH/PLANS.md)
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from linkgraph.plans import formatted_plan as formatted, live_tree  # noqa: E402  (one implementation shared with tests/test_plans.py — the Exchange counts asserted by pytest and written to BENCH/PLANS.md cannot drift)


def main() -> int:
    from linkgraph.fixtures import synthetic_crawl
    from linkgraph.graph import Graph
    from linkgraph.session import get_spark
    from linkgraph.superstep import _aqe_disabled, strip_origin_stats

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    edges_np = synthetic_crawl(5000, seed=42)
    edges = spark.createDataFrame(
        [(int(s), int(d)) for s, d in edges_np], "src long, dst long"
    )
    g = Graph.from_edges(edges, num_partitions=8)
    n = g.num_vertices

    sections: list[tuple[str, str, str]] = []

    # -- 1. one PageRank superstep, exactly as iterate() plans it ---------
    init = g.vertices.select("vid", F.lit(1.0 / n).alias("rank")).join(
        g.out_degrees, "vid", "left"
    )
    def leaf(df):
        """The iterate() checkpoint-leaf recipe (hash(vid, 8) + sorted +
        eager localCheckpoint + stats strip) — ONE definition shared by
        every section so this tool cannot drift from the protocol it
        certifies."""
        return strip_origin_stats(
            df.repartition(8, "vid")
            .sortWithinPartitions("vid")
            .localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
        )

    from linkgraph.algorithms.pagerank import pagerank_round

    with _aqe_disabled(spark):
        state = leaf(init)
        # the PRODUCTION round body (not a replica — pagerank.py
        # regressions fail this tool the same way they fail
        # tests/test_plans.py)
        superstep = pagerank_round(g, state, alpha=0.85, n=n, dangling=0.0)
        plan = formatted(superstep)

    live = live_tree(plan)
    n_exchange = len(re.findall(r"\bExchange\b", live))
    assert n_exchange == 1, f"superstep must have exactly 1 live shuffle, got {n_exchange}:\n{live}"
    assert "SortMergeJoin" in live, live
    assert "BroadcastHashJoin" not in live, "state side must never broadcast"
    # the persisted edges appear as an InMemoryTableScan, not a re-shuffle
    assert "InMemoryTableScan" in live, live
    # map-side partial aggregation before the one exchange
    assert len(re.findall(r"HashAggregate", live)) >= 2, live
    sections.append((
        "PageRank superstep (the per-iteration job)",
        "Exactly ONE Exchange — the message reduce by destination.  Both "
        "|V|-sized join inputs (checkpointed state leaf, persisted edges) "
        "stream into SortMergeJoins with no Exchange and no re-Sort: the "
        "state is a LogicalRDD that advertises hash(vid, 8) + ordering, "
        "the edges an InMemoryTableScan persisted hash(src, 8) + sorted.  "
        "HashAggregate appears twice around the Exchange = map-side "
        "partial + final reduce (a 10^8-in-link hub page enters the "
        "shuffle as ≤1 row per map partition).  Live operator tree first "
        "(cached-build subtrees under InMemoryTableScan pruned — they run "
        "once at graph build, not per superstep); full formatted plan "
        "below.",
        "LIVE TREE (per-superstep work):\n" + live + "\n\nFULL PLAN:\n" + plan,
    ))

    # -- 2. parquet scan: pushdown + pruning ------------------------------
    sf = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.001")
    docs = spark.read.parquet(f"{sf}/documents.parquet")
    q = docs.where(F.col("lang") == "en").select("doc_id", "lang")
    plan2 = formatted(q)
    assert "PushedFilters: [" in plan2 and "IsNotNull(lang)" in plan2, plan2
    assert re.search(r"ReadSchema: struct<doc_id:\w+,lang:string>", plan2), plan2
    sections.append((
        "Parquet scan (filter + 2-column projection)",
        "The lang filter reaches the scan as PushedFilters and ReadSchema "
        "is pruned to exactly the two selected columns — at 100 TB the "
        "scan reads two columns' pages, not the documents table.",
        plan2,
    ))

    # -- 3. triangle count core -------------------------------------------
    ce = g.canonical_edges
    e1, e2, e3 = ce.alias("e1"), ce.alias("e2"), ce.alias("e3")
    wedges = e1.join(e2, F.col("e1.dst") == F.col("e2.src"))
    tri = wedges.join(
        e3,
        (F.col("e1.src") == F.col("e3.src")) & (F.col("e2.dst") == F.col("e3.dst")),
        "left_semi",
    )
    plan3 = formatted(tri)
    live3 = live_tree(plan3)
    assert "LeftSemi" in live3, live3
    assert live3.count("InMemoryTableScan") >= 3, live3
    sections.append((
        "Triangle count (wedge join + existence semi-join)",
        "All three inputs are the SAME persisted canonical (src<dst) edge "
        "relation (three InMemoryTableScans, one materialization).  The "
        "closing edge check is a LeftSemi join — existence only, no "
        "payload duplication.",
        plan3,
    ))

    # -- 4. ANN scale path: LSH near-dup candidate generation ---------------
    import numpy as np

    from linkgraph.textops.ann import embedding_near_duplicates, ivf_cosine_topk

    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((200, 16)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    plan4 = formatted(embedding_near_duplicates(emb, dim=16, threshold=0.8))
    assert "CartesianProduct" not in plan4, plan4
    assert "BroadcastNestedLoopJoin" not in plan4, plan4
    assert re.search(r"SortMergeJoin|ShuffledHashJoin|BroadcastHashJoin", plan4), plan4
    queries_df = emb.where("vec_id < 3").selectExpr("vec_id as query_id", "embedding")
    plan5 = formatted(ivf_cosine_topk(emb, queries_df, dim=16, k=5, n_cells=8, nprobe=2))
    assert "CartesianProduct" not in plan5, plan5
    assert "BroadcastNestedLoopJoin" not in plan5, plan5
    sections.append((
        "ANN scale paths (LSH near-dup + IVF top-k candidate generation)",
        "Candidates come from hash-key equi-joins on (table, bucket) / "
        "cell — never an all-pairs nested-loop pass.  At corpus scale the "
        "join is a plain shuffle on the bucket key; the quadratic work is "
        "confined to within-bucket pairs.  Asserted: no CartesianProduct, "
        "no BroadcastNestedLoopJoin in either plan (the exact baselines "
        "use a deliberate broadcast cross-join and are the correctness "
        "twins, not the scale path).",
        "LSH NEAR-DUP PLAN:\n" + plan4 + "\n\nIVF TOP-K PLAN:\n" + plan5,
    ))

    # -- 5. k-core delta-peel round ----------------------------------------
    from linkgraph.algorithms.kcore import peel_round

    sym = g.symmetrized_edges
    with _aqe_disabled(spark):
        kstate = leaf(
            sym.groupBy(F.col("src").alias("vid")).agg(
                F.count(F.lit(1)).alias("deg")
            )
        )
        # the PRODUCTION round body (not a replica)
        kround = peel_round(sym, kstate, k=3)
        plan6 = formatted(kround)
    live6 = live_tree(plan6)
    n_ex6 = len(re.findall(r"\bExchange\b", live6))
    assert n_ex6 <= 2, f"k-core round must shuffle only delta-sized sides, got {n_ex6}:\n{live6}"
    assert "BroadcastHashJoin" not in live6, live6
    sections.append((
        "k-core delta-peel round (per-iteration job)",
        "Per round only the REMOVED set and its decrement counts shuffle "
        "(two small Exchanges); the symmetrized |E| relation streams "
        "exchange-free out of its persisted hash(src, 8) + sorted layout "
        "into the pending semi-join, and the |V| state leaf streams into "
        "the merge join.  No vertex set is ever broadcast — a near-|V| "
        "pending set in round 1 would otherwise serialize through the "
        "driver every round.  Shuffled bytes are proportional to the "
        "round's removals, not |E|.",
        "LIVE TREE (per-round work):\n" + live6 + "\n\nFULL PLAN:\n" + plan6,
    ))

    # -- 6. HITS reversed-view (CSC) gather --------------------------------
    with _aqe_disabled(spark):
        hstate = leaf(g.vertices.select("vid", F.lit(1.0).alias("auth")))
        gathered = g.reversed_edges.join(
            hstate.withColumnRenamed("vid", "src").hint("merge"), "src"
        )
        plan7 = formatted(gathered)
    live7 = live_tree(plan7)
    assert len(re.findall(r"\bExchange\b", live7)) == 0, live7
    sections.append((
        "HITS hub gather over the persisted reversed view (CSC analog)",
        "The reversed edge view is re-laid-out hash(src, 8) + sorted ONCE "
        "at first use and persisted (the reference keeps a CSC view next "
        "to CSR) — the per-superstep hub gather then plans with ZERO "
        "Exchanges.  A bare column-swap view would keep the original src "
        "partitioning and re-shuffle + re-sort the full |E| set inside "
        "every iteration's plan.",
        "LIVE TREE (per-superstep gather):\n" + live7 + "\n\nFULL PLAN:\n" + plan7,
    ))

    # -- 7. direction-optimized BFS pull round -----------------------------
    from linkgraph.algorithms.bfs import pull_round

    with _aqe_disabled(spark):
        bstate = leaf(g.vertices.select("vid", F.lit(0).alias("depth")))
        pulled = pull_round(g, g.reversed_edges, bstate, bstate.select("vid"))
        plan8 = formatted(pulled)
    live8 = live_tree(plan8)
    assert "BroadcastHashJoin" not in live8, live8
    assert "BroadcastNestedLoopJoin" not in live8, live8
    assert len(re.findall(r"\bExchange\b", live8)) <= 4, live8
    sections.append((
        "Direction-optimized BFS: backward (pull) round",
        "In the dense middle rounds the frontier and unvisited sets are "
        "|V|-scale — both semi-joins carry merge hints and the plan has "
        "NO broadcast join (a driver-built |V| broadcast per round was "
        "the measured 10x pathology in PageRank).  The unvisited "
        "semi-join streams on the persisted hash(src) reversed view "
        "without an |E| Exchange; the remaining shuffles are the "
        "anti-join re-key and the dst re-key of the in-edge candidates "
        "— a set that is small exactly in the regime where the Beamer "
        "heuristic chooses pull.",
        "LIVE TREE (per-round work):\n" + live8 + "\n\nFULL PLAN:\n" + plan8,
    ))

    # -- 8. ANF multi-register sketch round ---------------------------------
    from linkgraph.algorithms.anf import _fm_init_col, anf_round

    with _aqe_disabled(spark):
        astate = leaf(
            g.vertices.select(
                "vid",
                *[_fm_init_col(F.col("vid"), j).alias(f"sk{j}") for j in range(4)],
            )
        )
        # the PRODUCTION round body (not a replica)
        plan9 = formatted(anf_round(g, astate, k=4))
    live9 = live_tree(plan9)
    n_ex9 = len(re.findall(r"\bExchange\b", live9))
    assert n_ex9 == 1, f"ANF round must have exactly 1 live shuffle, got {n_ex9}:\n{live9}"
    assert "BroadcastHashJoin" not in live9, live9
    assert len(re.findall(r"HashAggregate", live9)) >= 2, live9
    sections.append((
        "ANF sketch superstep (k FM registers, one round)",
        "All k bit_or register unions ride ONE exchange-free gather join "
        "and ONE shuffle-reduce by destination (neighbor_reduce_multi) — "
        "k registers cost the same exchange count as PageRank's single "
        "rank column.  bit_or is decomposable, so HashAggregate appears "
        "as map-side partial + final reduce: a 10^8-in-link hub enters "
        "the shuffle as ≤1 partially-OR'd row per map partition.",
        "LIVE TREE (per-round work):\n" + live9 + "\n\nFULL PLAN:\n" + plan9,
    ))

    # -- 9. Louvain move-phase round ----------------------------------------
    from linkgraph.algorithms.community import louvain_round

    with _aqe_disabled(spark):
        lstate = leaf(g.vertices.select("vid", F.col("vid").alias("label")))
        plan10 = formatted(louvain_round(g, lstate, m2=2 * g.num_edges, parity=0))
    live10 = live_tree(plan10)
    assert "BroadcastNestedLoopJoin" not in live10, live10
    assert "CartesianProduct" not in live10, live10
    # volumes agg + (dst,label) gather agg + (vid,label) move agg +
    # label-keyed score join + winner agg — all map-side-combined hash
    # aggs; no |V| set broadcast anywhere
    assert len(re.findall(r"HashAggregate", live10)) >= 6, live10
    assert "BroadcastHashJoin" not in live10, live10
    sections.append((
        "Louvain move phase (modularity-gain LP, one round)",
        "Every aggregation is a partial+final HashAggregate: community "
        "volumes (|V|→|C|), the neighbor-label gather keyed (dst, label) "
        "— the composite key spreads hub destinations across reducers — "
        "the per-(vid, candidate) move table, and the struct-max winner. "
        "The |V|-sized state/degree sides carry merge hints (never "
        "broadcast), and the only |E|-scale shuffle is the gather's "
        "(dst, label) reduce.  The argmax key is pure BIGINT, so the "
        "plan contains no float comparison anywhere.",
        "LIVE TREE (per-round work):\n" + live10 + "\n\nFULL PLAN:\n" + plan10,
    ))

    # -- 10. link prediction wedge kernel -----------------------------------
    from linkgraph.algorithms.linkpred import link_prediction

    plan11 = formatted(link_prediction(g, top_k=50, max_degree=64))
    live11 = live_tree(plan11)
    assert "CartesianProduct" not in plan11, plan11
    assert "BroadcastNestedLoopJoin" not in plan11, plan11
    # the pair agg must be partial+final (hot (a,b) pairs combine map-side)
    assert len(re.findall(r"HashAggregate", live11)) >= 2, live11
    sections.append((
        "Link prediction (capped wedge self-join + anti-join)",
        "The adjacency self-join is an equi-join on the wedge CENTER "
        "(never a cross product); the center set is degree-capped "
        "BEFORE the join, bounding wedge output at |V|·cap² regardless "
        "of hub degree.  The (a, b) score aggregation is partial+final, "
        "and existing edges leave via a left-anti equi-join on the "
        "canonical edge set.  TakeOrderedAndProject caps the result at "
        "top-k without a global sort materialization.",
        "LIVE TREE:\n" + live11 + "\n\nFULL PLAN:\n" + plan11,
    ))

    # -- 11. directed triangle census ---------------------------------------
    from linkgraph.algorithms.triangles import triad_census

    plan12 = formatted(triad_census(g))
    live12 = live_tree(plan12)
    assert "CartesianProduct" not in plan12, plan12
    assert "BroadcastNestedLoopJoin" not in plan12, plan12
    sections.append((
        "Directed triangle census (oriented kernel + direction-bit joins)",
        "Triangle enumeration is the SAME degree-ordered oriented wedge "
        "kernel as triangle_count (O(√|E|) oriented out-degree bound), "
        "so the census inherits its hub-safety; classification adds "
        "three equi-joins of the triangle rows against the canonical "
        "(u, v, f, b) direction-bit table — every join pair-keyed, no "
        "cross product anywhere — and one final 3-counter aggregate.",
        "LIVE TREE:\n" + live12 + "\n\nFULL PLAN:\n" + plan12,
    ))

    # -- 12. condensation level-propagation round ---------------------------
    from linkgraph.algorithms.scc import condensation_levels

    with _aqe_disabled(spark):
        plan13 = formatted(condensation_levels(g))
    live13 = live_tree(plan13)
    assert "CartesianProduct" not in live13, live13
    assert "BroadcastNestedLoopJoin" not in live13, live13
    sections.append((
        "Condensation DAG layering (longest-path fixpoint)",
        "The condensation edge set is built once (two |E| label joins + "
        "dedup, localCheckpointed); each level round is one equi-join of "
        "the component-sized state against it plus a map-side-combined "
        "max aggregation — the same monotone-propagation superstep as "
        "hash-min CC with max(level) in place of min(label).  State is "
        "|components|-sized, typically orders of magnitude below |V| on "
        "a web crawl.",
        "LIVE TREE (final round):\n" + live13 + "\n\nFULL PLAN:\n" + plan13,
    ))

    # -- 13. forward-push PPR round (sparse touched-only state) -------------
    from linkgraph.algorithms.ppr import ppr_push

    with _aqe_disabled(spark):
        plan14 = formatted(ppr_push(g, 0, rounds=1))
    live14 = live_tree(plan14)
    assert "CartesianProduct" not in live14, live14
    assert "BatchEvalPython" not in plan14, plan14
    sections.append((
        "Forward-push PPR round (sparse state)",
        "One push round: the frontier filter is a no-shuffle predicate "
        "over the (touched-only) state leaf; the gather joins the "
        "persisted hash(src) edges; the incoming-mass reduce is a "
        "partial+final HashAggregate; the state update is a full-outer "
        "merge of two SPARSE sides plus a broadcast 1-row dangling "
        "aggregate.  Nothing in the round touches |V| rows — work is "
        "proportional to residual mass moved, the ACL push guarantee.",
        "LIVE TREE:\n" + live14 + "\n\nFULL PLAN:\n" + plan14,
    ))

    # -- 14. butterfly census (capped wedge self-join) ----------------------
    from linkgraph.algorithms.triangles import butterfly_count

    plan15 = formatted(butterfly_count(g, max_out_degree=64))
    live15 = live_tree(plan15)
    assert "CartesianProduct" not in plan15, plan15
    assert "BroadcastNestedLoopJoin" not in plan15, plan15
    sections.append((
        "Butterfly census (capped source wedges)",
        "Wedges come from a self-equi-join of the out-degree-capped "
        "adjacency on the source key (the link_prediction kernel "
        "centered on sources): cost Σ outdeg² is bounded at |V|·cap² "
        "by construction.  Both the co-citation count and the final "
        "2-counter census are partial+final aggregates.",
        "LIVE TREE:\n" + live15 + "\n\nFULL PLAN:\n" + plan15,
    ))

    # -- 15. walk edge index (no-window Arrow pass) --------------------------
    from linkgraph.algorithms.walks import indexed_edges, node2vec_walks

    plan16 = formatted(indexed_edges(g))
    live16 = live_tree(plan16)
    assert "Window" not in live16, plan16
    assert "Exchange" not in live16, plan16
    assert "MapInArrow" in live16, plan16
    sections.append((
        "Walk edge index (Arrow cumulative-run pass, no Window)",
        "The (src, idx, dst) index is ONE narrow MapInArrow over the "
        "persisted CSR layout (hash(src) partitioning clusters each "
        "source's run; the within-partition (src, dst) sort makes idx a "
        "vectorized cumulative counter).  No Exchange, no Window: the "
        "former row_number-over-partitionBy(src) build gave the largest "
        "hub a task sized by ITS degree — this pass is |E|/P per task "
        "regardless of hub degree.",
        "LIVE TREE:\n" + live16 + "\n\nFULL PLAN:\n" + plan16,
    ))

    # -- 16. node2vec rejection step ----------------------------------------
    plan17 = formatted(node2vec_walks(g, num_steps=2, p=2.0, q=0.5))
    assert "CartesianProduct" not in plan17, plan17
    assert "BroadcastNestedLoopJoin" not in plan17, plan17
    sections.append((
        "node2vec step (deterministic rejection sampling)",
        "Each second-order step is: fixed attempts-explode over the "
        "frontier (bounded fan-out), a (src, idx) equi-join probing the "
        "candidate, one edge-existence equi-join on (prev, candidate) "
        "classifying it, a fixed-point int64 acceptance filter, and a "
        "struct-min argmin per walker.  No cartesian/nested-loop "
        "anywhere; per-step cost is attempts·|frontier| rows regardless "
        "of hub degree — exact weighted choice would pay degree·|frontier|.",
        "FULL PLAN (final state):\n" + plan17,
    ))

    # -- 17. epoch guard diff (warm-start append-only evidence) -------------
    from linkgraph.streaming import snapshot_diff

    old_edges = g.edges.where((F.col("src") + F.col("dst")) % 5 != 0)
    plan18 = formatted(snapshot_diff(old_edges, g.edges))
    live18 = live_tree(plan18)
    assert "CartesianProduct" not in plan18, plan18
    assert "BroadcastNestedLoopJoin" not in plan18, plan18
    # two side re-keys into the full-outer SMJ + the single-row final agg
    n_ex18 = len(re.findall(r"\bExchange\b", live18))
    assert n_ex18 <= 4, f"guard diff must be one co-keyed join pass, got {n_ex18}:\n{live18}"
    assert "SortMergeJoin FullOuter" in live18, live18
    sections.append((
        "Epoch guard / snapshot diff (warm-start append-only evidence)",
        "The round-5 fail-loud warm-start contract costs ONE co-keyed "
        "(src, dst) full-outer SortMergeJoin — each epoch's edge set "
        "shuffles once on the same key — and a 6-counter aggregate "
        "riding the join output (map-side partial + 1-row final).  At "
        "10^12 documents that is two edge-table shuffles total, orders "
        "cheaper than the silently-wrong warm recompute it prevents; "
        "asserted: no cartesian, no nested-loop, bounded exchanges.",
        "LIVE TREE:\n" + live18 + "\n\nFULL PLAN:\n" + plan18,
    ))

    out = ["# BENCH/PLANS.md — physical-plan evidence (asserted, not aspirational)\n"]
    out.append(
        "Generated by `python tools/explain_plans.py` on a 5,000-page "
        "synthetic crawl at local[8]/8 partitions.  Every property below "
        "is ASSERTED by the tool — a regression that re-introduces a "
        "per-superstep shuffle or un-prunes a scan fails this script.\n"
    )
    for title, commentary, p in sections:
        out.append(f"\n## {title}\n\n{commentary}\n\n```\n{p.strip()}\n```\n")
    path = os.path.join(repo, "BENCH", "PLANS.md")
    with open(path, "w") as f:
        f.write("".join(out))
    print(f"wrote {path} (all plan assertions passed)")
    spark.stop()
    return 0


if __name__ == "__main__":
    sys.exit(main())
