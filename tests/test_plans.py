"""Physical-plan regression tests (SURVEY.md §4: the scale contract).

These don't test values — they test that Catalyst plans the superstep the
way the 100 TB design requires: one live shuffle per superstep, both
|V|-sized join inputs streamed (never broadcast), persisted edges reused,
parquet scans pruned.  A change that silently re-introduces a
per-superstep exchange fails here at fixture scale.
"""

from __future__ import annotations

import re

import pytest
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

from linkgraph.graph import Graph
from linkgraph.plans import assert_superstep_plan, formatted_plan, live_tree
from linkgraph.superstep import strip_origin_stats


@pytest.fixture(scope="module")
def plan_graph(spark):
    """Graph partitioned to EXACTLY spark.sql.shuffle.partitions.

    The exchange-free-superstep contract (graph.py docstring) requires
    the graph's partition count to match the session's shuffle
    partitions — Graph.from_edges' default.  A mismatched count (e.g. a
    4-partition graph on an 8-shuffle-partition session) makes Catalyst
    re-exchange one side of every superstep join.
    """
    from linkgraph.fixtures import chesapeake_edges
    from tests.conftest import edges_df

    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    return Graph.from_edges(
        edges_df(spark, chesapeake_edges()), num_partitions=parts
    )


def _state_leaf(spark, g, parts):
    n = g.num_vertices
    init = (
        g.vertices.select("vid", F.lit(1.0 / n).alias("rank"))
        .join(g.out_degrees, "vid", "left")
        .repartition(parts, "vid")
        .sortWithinPartitions("vid")
    )
    return strip_origin_stats(
        init.localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
    )


def test_pagerank_superstep_single_live_shuffle(spark, plan_graph):
    g = plan_graph
    parts = g.num_partitions
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        from linkgraph.algorithms.pagerank import pagerank_round

        state = _state_leaf(spark, g, parts)
        # the PRODUCTION round body (not a replica — a regression inside
        # pagerank.py must fail this test)
        superstep = pagerank_round(
            g, state, alpha=0.85, n=g.num_vertices, dangling=0.0
        )
        live = assert_superstep_plan(superstep, max_exchanges=1)
        # the one Exchange is the message reduce, wrapped by partial+final
        # hash aggregation (map-side combine = the hub-skew bound)
        assert len(re.findall(r"HashAggregate", live)) >= 2, live
        # both joins stream: sort-merge against the persisted edges cache
        assert "SortMergeJoin" in live, live
        assert "InMemoryTableScan" in live, live
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_gather_join_is_exchange_free_on_edges(spark, plan_graph):
    """The |E|-sized edges side must never re-shuffle for the gather."""
    g = plan_graph
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        state = _state_leaf(spark, g, g.num_partitions)
        contrib = state.select("vid", F.col("rank").alias("contrib"))
        gathered = g.edges.join(
            contrib.withColumnRenamed("vid", "src").hint("merge"), "src"
        )
        live = live_tree(formatted_plan(gathered))
        assert len(re.findall(r"\bExchange\b", live)) == 0, live
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_parquet_scan_pushdown(spark, sf_dir):
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    q = docs.where(F.col("lang") == "en").select("doc_id", "lang")
    plan = formatted_plan(q)
    assert "PushedFilters: [" in plan and "IsNotNull(lang)" in plan, plan
    assert re.search(r"ReadSchema: struct<doc_id:\w+,lang:string>", plan), plan


def test_ann_scale_paths_have_no_allpairs_join(spark):
    """LSH and IVF candidate generation must be equi-joins on bucket/cell
    keys — never a cartesian/nested-loop pass over corpus×corpus (the
    exact baselines use one deliberately; the scale paths must not)."""
    import numpy as np

    from linkgraph.textops.ann import ivf_cosine_topk, lsh_cosine_topk

    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    queries = emb.where("vec_id < 3").selectExpr(
        "vec_id as query_id", "embedding"
    )
    for df in (
        lsh_cosine_topk(emb, queries, dim=8, k=5),
        ivf_cosine_topk(emb, queries, dim=8, k=5, n_cells=4, nprobe=2),
    ):
        plan = formatted_plan(df)
        assert "CartesianProduct" not in plan, plan
        assert "BroadcastNestedLoopJoin" not in plan, plan


def test_portable_ann_scale_paths_plans(spark):
    """The portable (DuckDB-oracle) ANN variants keep the same scale
    shape: LSH arith candidates come from a bucket equi-join with no
    nested-loop anywhere; IVF pivot may broadcast-cross the n_cells-row
    pivot side (linear, |N|·n_cells — the quantizer evaluation) but its
    candidate generation must be a cell-key equi-join, never
    corpus×corpus."""
    import numpy as np

    from linkgraph.textops.ann import ivf_pivot_topk, lsh_cosine_topk

    rng = np.random.default_rng(2)
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    queries = emb.where("vec_id < 3").selectExpr(
        "vec_id as query_id", "embedding"
    )
    plan = formatted_plan(lsh_cosine_topk(emb, queries, dim=8, k=5, planes="arith"))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan

    plan = formatted_plan(ivf_pivot_topk(emb, queries, k=5, n_cells=4, nprobe=2))
    assert "CartesianProduct" not in plan, plan
    # quantizer cross-joins are against the broadcast pivot side only:
    # every BNLJ in the plan must build a BroadcastExchange (tiny side),
    # and the candidate join on `cell` must be a real equi-join
    # formatted plans list each node twice (tree + detail section):
    # 2 quantizer cross-joins → at most 4 string occurrences
    assert plan.count("BroadcastNestedLoopJoin") <= 4, plan
    # the candidate join must be a real equi-join ON the cell key: the
    # formatted detail section prints hash/merge join keys as
    # "Left keys [1]: [cell#NNN L]" — assert a join keyed on cell exists
    # (a substring match of 'cell' anywhere in the plan proves nothing)
    assert re.search(r"keys \[\d+\]: \[cell#", plan), plan


def test_neardup_lsh_plan_has_no_allpairs_join(spark):
    import numpy as np

    from linkgraph.textops.ann import embedding_near_duplicates

    rng = np.random.default_rng(1)
    vecs = rng.standard_normal((50, 8)).astype(np.float32)
    emb = spark.createDataFrame(
        [(i, v.tolist()) for i, v in enumerate(vecs)],
        "vec_id long, embedding array<float>",
    )
    plan = formatted_plan(
        embedding_near_duplicates(emb, dim=8, threshold=0.8)
    )
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_kcore_round_plan_no_edge_exchange_no_broadcast(spark, plan_graph):
    """Delta-peel round: the symmetrized |E| side must plan exchange-free
    (its persisted hash(src, P) layout feeds the pending semi-join), and
    no vertex set may be broadcast (a near-|V| pending set in round 1
    would serialize through the driver every round)."""
    g = plan_graph
    parts = g.num_partitions
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        sym = g.symmetrized_edges
        state = strip_origin_stats(
            sym.groupBy(F.col("src").alias("vid"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .repartition(parts, "vid")
            .sortWithinPartitions("vid")
            .localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
        )
        from linkgraph.algorithms.kcore import peel_round

        # the PRODUCTION round body (not a replica)
        out = peel_round(sym, state, k=3)
        live = live_tree(formatted_plan(out))
        # live shuffles: pending→hash(src) and the dec aggregation; the
        # |E| sym scan and the |V| state leaf stream exchange-free
        assert len(re.findall(r"\bExchange\b", live)) <= 2, live
        assert "BroadcastHashJoin" not in live, live
        assert "SortMergeJoin" in live, live
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_coloring_round_plan_no_edge_exchange_no_broadcast(spark, plan_graph):
    """JPL round: uncolored-src semi-join reuses the persisted edge
    layout; the dst restriction happens on the aggregated |V|-sized
    nbr_max (merge-joined), never by re-shuffling |E| by dst or
    broadcasting a near-|V| uncolored set."""
    from linkgraph.algorithms.coloring import color_round

    g = plan_graph
    parts = g.num_partitions
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        sym = g.symmetrized_edges
        state = strip_origin_stats(
            g.vertices.select("vid", F.lit(None).cast("int").alias("color"))
            .repartition(parts, "vid")
            .sortWithinPartitions("vid")
            .localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
        )
        # the PRODUCTION round body (not a replica)
        out = color_round(sym, state, round_no=0)
        live = live_tree(formatted_plan(out))
        assert len(re.findall(r"\bExchange\b", live)) <= 2, live
        assert "BroadcastHashJoin" not in live, live
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_bc_backward_round_streams_edges_no_broadcast(spark, plan_graph):
    """Brandes backward round: the gather is keyed on SRC so the
    persisted hash(src) symmetrized-edge layout streams exchange-free
    (a dst-keyed join would re-exchange |E| every one of the D backward
    rounds); the depth-slice side must never broadcast (at crawl scale a
    mid-BFS depth slice is |V|-scale).  Live shuffles: the depth-slice
    re-key into the merge join plus the dst-keyed dependency reduce."""
    from linkgraph.algorithms.bc import brandes_backward_round

    g = plan_graph
    parts = g.num_partitions
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        sym = g.symmetrized_edges
        state = strip_origin_stats(
            g.vertices.select(
                "vid",
                F.lit(1).alias("depth"),
                F.lit(1.0).alias("sigma"),
                F.lit(0.0).alias("dep"),
            )
            .repartition(parts, "vid")
            .sortWithinPartitions("vid")
            .localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
        )
        # the PRODUCTION round body (not a replica)
        out = brandes_backward_round(sym, state, d=0)
        live = live_tree(formatted_plan(out))
        assert "BroadcastHashJoin" not in live, live
        assert "BroadcastNestedLoopJoin" not in live, live
        assert "SortMergeJoin" in live, live
        # the |E| sym cache streams; depth-slice re-key + dep reduce are
        # the only live exchanges (both ≤|V|/message-scale, never |E|)
        assert len(re.findall(r"\bExchange\b", live)) <= 2, live
        assert "InMemoryTableScan" in live, live
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_hits_reversed_view_gather_is_exchange_free(spark, plan_graph):
    """The persisted reversed view (CSC analog) must feed the hub gather
    without re-shuffling |E| — a bare column-swap view would keep the
    ORIGINAL src partitioning and exchange every superstep."""
    g = plan_graph
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        state = _state_leaf(spark, g, g.num_partitions)
        contrib = state.select("vid", F.col("rank").alias("auth"))
        gathered = g.reversed_edges.join(
            contrib.withColumnRenamed("vid", "src").hint("merge"), "src"
        )
        live = live_tree(formatted_plan(gathered))
        assert len(re.findall(r"\bExchange\b", live)) == 0, live
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_spmv_join_mode_plan_single_live_shuffle(spark, plan_graph):
    """SpMV join mode: exchange-free gather into the Arrow combine stage,
    then exactly ONE live shuffle (the final reduce by destination)."""
    g = plan_graph
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        from linkgraph.csr import spmv_contrib_sums

        state = _state_leaf(spark, g, g.num_partitions)
        contrib = state.select("vid", F.col("rank").alias("contrib"))
        sums = spmv_contrib_sums(g, contrib, mode="join")
        live = assert_superstep_plan(sums, max_exchanges=1)
        # the Python stage is the Arrow map (per-partition scatter-combine)
        assert "MapInArrow" in live, live
        # gather streams from the persisted edge cache, no re-sort of it
        assert "InMemoryTableScan" in live, live
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_spmv_broadcast_mode_plan_no_join_no_edge_shuffle(spark, plan_graph):
    """SpMV broadcast mode: the CSC-block kernel streams the persisted
    destination-sorted view with NO join at all — the only live shuffle
    is the final ≤|V|-row reduce."""
    g = plan_graph
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        from linkgraph.csr import spmv_contrib_sums

        state = _state_leaf(spark, g, g.num_partitions)
        contrib = state.select("vid", F.col("rank").alias("contrib"))
        sums = spmv_contrib_sums(g, contrib, mode="broadcast")
        live = assert_superstep_plan(sums, max_exchanges=1)
        assert "MapInArrow" in live, live
        assert "Join" not in live, live  # no gather join of any kind
        assert "InMemoryTableScan" in live, live  # reversed_edges cache
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_bfs_pull_round_streams_both_vertex_sides(spark, plan_graph):
    """Direction-optimized BFS pull round: the frontier and unvisited
    sides are |V|-scale in the pull regime — the plan must stream them
    (merge semi/anti joins), never build driver-side broadcasts, and the
    persisted reversed-edge layout must feed the src-keyed semi-join
    without re-shuffling |E|."""
    from linkgraph.algorithms.bfs import pull_round

    g = plan_graph
    parts = g.num_partitions
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        rev = g.reversed_edges
        state = strip_origin_stats(
            g.vertices.select("vid", F.lit(0).alias("depth"))
            .repartition(parts, "vid")
            .sortWithinPartitions("vid")
            .localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
        )
        frontier = state.select("vid")
        # the PRODUCTION round body (not a replica)
        out = pull_round(g, rev, state, frontier)
        live = live_tree(formatted_plan(out))
        assert "BroadcastHashJoin" not in live, live
        assert "BroadcastNestedLoopJoin" not in live, live
        # rev is persisted hash(src): the unvisited semi-join streams on
        # it without an |E| exchange.  The remaining live exchanges are
        # the anti-join re-key (|V|) and the dst re-key of the in-edge
        # CANDIDATES — the latter is edge-scale in-edges-of-unvisited,
        # small exactly in the regime where the heuristic picks pull
        assert len(re.findall(r"\bExchange\b", live)) <= 4, live
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_jaccard_verify_plan_is_pair_driven(spark):
    """LSH verify stage: candidate expansion must be equi-joins on the
    pair/doc/shingle keys — never a cartesian or nested-loop product
    (the whole point of verify-after-LSH is to avoid all-pairs)."""
    from linkgraph.textops.dedup import jaccard_verify

    docs = spark.createDataFrame(
        [(i, f"w{i} common tokens shared by all docs {i}") for i in range(8)],
        "doc_id long, text string",
    )
    pairs = spark.createDataFrame(
        [(0, 1), (2, 3)], "a long, b long"
    )
    plan = formatted_plan(jaccard_verify(docs, pairs))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_katz_round_plan_single_live_shuffle(spark, plan_graph):
    """Katz superstep keeps the PageRank contract: exchange-free gather
    on the persisted edges, one live shuffle (the dst reduce), both
    |V| sides streamed."""
    from linkgraph.algorithms.katz import katz_round
    from linkgraph.superstep import strip_origin_stats

    g = plan_graph
    parts = g.num_partitions
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        state = strip_origin_stats(
            g.vertices.select("vid", F.lit(1.0).alias("score"))
            .repartition(parts, "vid")
            .sortWithinPartitions("vid")
            .localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
        )
        out = katz_round(g, state, alpha=0.05, beta=1.0)
        live = assert_superstep_plan(out, max_exchanges=1)
        assert "SortMergeJoin" in live, live
        assert "BroadcastHashJoin" not in live, live
        assert "InMemoryTableScan" in live, live
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_walk_step_plan_is_keyed_probe(spark, plan_graph):
    """Random-walk step: the neighbor pick must be an equi-join on the
    (src, idx) key of the persisted edge index — never a cartesian or
    per-neighbor expansion filtered afterwards."""
    from linkgraph.algorithms.walks import indexed_edges, walk_choice

    g = plan_graph
    idx = indexed_edges(g).select(
        F.col("src").alias("_isrc"),
        F.col("idx").alias("_idx"),
        F.col("dst").alias("_idst"),
    )
    frontier = g.vertices.select(
        F.col("vid").alias("walk_id"), F.col("vid").alias("vid")
    )
    with_deg = frontier.join(
        g.out_degrees.withColumnRenamed("vid", "_dv"),
        frontier["vid"] == F.col("_dv"),
    ).select(
        "walk_id",
        "vid",
        walk_choice(F.col("walk_id"), 1, F.col("outdeg"), 0).alias("_choice"),
    )
    nxt = with_deg.join(
        idx,
        (with_deg["vid"] == idx["_isrc"]) & (with_deg["_choice"] == idx["_idx"]),
    )
    plan = formatted_plan(nxt)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert re.search(r"keys \[\d+\]: \[", plan), plan


def test_anf_round_plan_single_live_shuffle(spark, plan_graph):
    """ANF sketch superstep keeps the PageRank contract with k registers:
    ONE gather join (exchange-free on the persisted edges), ONE live
    shuffle carrying ALL k bit_or reductions (neighbor_reduce_multi),
    map-side partial aggregation before it, no broadcast."""
    import re

    from linkgraph.algorithms.anf import _fm_init_col, anf_round
    from linkgraph.superstep import strip_origin_stats

    g = plan_graph
    parts = g.num_partitions
    k = 4
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        state = strip_origin_stats(
            g.vertices.select(
                "vid",
                *[_fm_init_col(F.col("vid"), j).alias(f"sk{j}") for j in range(k)],
            )
            .repartition(parts, "vid")
            .sortWithinPartitions("vid")
            .localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
        )
        out = anf_round(g, state, k=k)
        live = assert_superstep_plan(out, max_exchanges=1)
        assert "SortMergeJoin" in live, live
        assert "BroadcastHashJoin" not in live, live
        # partial + final hash aggregation around the single exchange:
        # a hub destination enters the shuffle as <=1 row per map partition
        assert len(re.findall(r"HashAggregate", live)) >= 2, live
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_louvain_round_plan_no_broadcast_all_partial_aggs(spark, plan_graph):
    """Louvain move phase: no |V| side ever broadcasts, no cross
    product, and every aggregation (volumes, gather, move table,
    winner) is partial+final hash agg — hub destinations combine
    map-side under the (dst, label) composite key."""
    import re

    from linkgraph.algorithms.community import louvain_round
    from linkgraph.superstep import strip_origin_stats

    g = plan_graph
    parts = g.num_partitions
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        state = strip_origin_stats(
            g.vertices.select("vid", F.col("vid").alias("label"))
            .repartition(parts, "vid")
            .sortWithinPartitions("vid")
            .localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
        )
        out = louvain_round(g, state, m2=2 * g.num_edges, parity=0)
        live = live_tree(formatted_plan(out))
        assert "BroadcastHashJoin" not in live, live
        assert "BroadcastNestedLoopJoin" not in live, live
        assert "CartesianProduct" not in live, live
        assert len(re.findall(r"HashAggregate", live)) >= 6, live
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_link_prediction_plan_is_equijoin_wedges(spark, plan_graph):
    """Link prediction: wedge generation is an equi-join on the capped
    center key (no cross product / BNLJ) and the pair scores
    aggregate partial+final; the top-k is TakeOrderedAndProject, not a
    global sort materialization."""
    import re

    from linkgraph.algorithms.linkpred import link_prediction

    out = link_prediction(plan_graph, top_k=50, max_degree=64)
    plan = formatted_plan(out)
    live = live_tree(plan)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "TakeOrderedAndProject" in plan, plan
    assert len(re.findall(r"HashAggregate", live)) >= 2, live


def test_mis_round_plan_no_edge_exchange_no_broadcast(spark, plan_graph):
    """Luby MIS round: same contract as the JPL round for the gather
    (undecided-src semi-join on the persisted layout, dst restricted
    after the |V|-sized aggregation) PLUS the winner-neighborhood
    semi-join, which must also stream the persisted edge layout rather
    than re-shuffle |E|.  Budget: the nbr_max shuffle, the removed-set
    distinct, and the state merge joins — no |E|-sized Exchange, no
    broadcast of a near-|V| set."""
    from linkgraph.algorithms.mis import mis_round

    g = plan_graph
    parts = g.num_partitions
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        sym = g.symmetrized_edges
        state = strip_origin_stats(
            g.vertices.select("vid", F.lit(None).cast("int").alias("status"))
            .repartition(parts, "vid")
            .sortWithinPartitions("vid")
            .localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
        )
        # the PRODUCTION round body (not a replica)
        out = mis_round(sym, state, round_no=0)
        live = live_tree(formatted_plan(out))
        assert "BroadcastHashJoin" not in live, live
        # gather agg + removed distinct + (at most) merge-side sorts:
        # the edge relation itself must never appear under an Exchange
        assert len(re.findall(r"\bExchange\b", live)) <= 4, live
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_triad_census_plan_no_cartesian_no_nested_loop(spark, plan_graph):
    """Direction classification must stay pair-keyed equi-joins: no
    BroadcastNestedLoopJoin / CartesianProduct anywhere, and the final
    count is a single partial+final aggregate."""
    from linkgraph.algorithms.triangles import triad_census

    plan = formatted_plan(triad_census(plan_graph))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_pii_and_c4_plans_zero_exchange(spark):
    """The corpus-hygiene scans are scan-bound: a single projection over
    the input with NO Exchange and NO Python evaluation."""
    from linkgraph.textops.corpus import c4_filters
    from linkgraph.textops.quality import pii_scan

    df = spark.createDataFrame(
        [(0, "a b c."), (1, "x@y.io")], "doc_id long, text string"
    )
    for out in (pii_scan(df), c4_filters(df)):
        live = live_tree(formatted_plan(out))
        assert "Exchange" not in live, live
        assert "Python" not in live, live  # no BatchEvalPython/ArrowEval


def test_condensation_round_comp_sized_state(spark, plan_graph):
    """The level-propagation round must not broadcast the component
    state (it is |V|-sized in the worst case) and must keep the gather
    an equi-join + partial-agg pair."""
    from linkgraph.algorithms.scc import condensation_levels

    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        out = condensation_levels(plan_graph)
        live = live_tree(formatted_plan(out))
        assert "CartesianProduct" not in live, live
        assert "BroadcastNestedLoopJoin" not in live, live
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_textop_entries_prune_parquet_scan(spark):
    """The scan-bound corpus passes must read ONLY (doc_id, text) from
    the documents parquet — an entry that drags html/lang/warc_ts into
    the scan multiplies 100 TB of IO for nothing."""
    from linkgraph.queries import QUERIES

    for name in ("pii_scan", "c4_filters", "encoding_hygiene", "bpe_pieces"):
        df = QUERIES[name](spark, "/root/testdata/sf0.001")
        plan = formatted_plan(df)
        scans = [ln for ln in plan.splitlines() if "ReadSchema" in ln]
        assert scans, (name, plan)
        for ln in scans:
            assert "doc_id" in ln and "text" in ln, (name, ln)
            assert "lang" not in ln and "warc_ts" not in ln, (name, ln)


def test_trussness_round_plan_no_cartesian(spark, plan_graph):
    """Truss h-operator: corner-table joins are pair-keyed equi-joins;
    no cartesian/nested-loop anywhere in the decomposition plan."""
    from linkgraph.algorithms.ktruss import trussness

    plan = formatted_plan(trussness(plan_graph, max_iters=2))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_opic_round_plan_single_live_shuffle(spark, plan_graph):
    """OPIC step = PageRank's gather/reduce plus a broadcast 1-ROW
    dangling aggregate — the |V|-sized sides must never broadcast."""
    from linkgraph.algorithms.opic import opic_round

    g = plan_graph
    parts = g.num_partitions
    prev = spark.conf.get("spark.sql.adaptive.enabled")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        state = strip_origin_stats(
            g.vertices.select(
                "vid",
                F.lit(1.0 / g.num_vertices).alias("cash"),
                F.lit(0.0).alias("hist"),
            )
            .join(g.out_degrees, "vid", "left")
            .repartition(parts, "vid")
            .sortWithinPartitions("vid")
            .localCheckpoint(eager=True, storageLevel=StorageLevel.MEMORY_AND_DISK)
        )
        out = opic_round(g, state, g.num_vertices)
        live = live_tree(formatted_plan(out))
        # the only broadcast allowed is the 1-row dangling aggregate
        # (its cross join plans as a broadcast nested loop of ONE row —
        # by design); the |V|-sized state/sums sides must not broadcast
        assert live.count("BroadcastExchange") <= 1, live
        assert "CartesianProduct" not in live, live
        assert "BroadcastHashJoin" not in live, live
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", prev)


def test_butterfly_plan_is_capped_equijoin_wedges(spark, plan_graph):
    """Wedge generation must be an equi-join on the capped source key —
    no cartesian/nested-loop join — and both aggregations partial."""
    from linkgraph.algorithms.triangles import butterfly_count

    plan = formatted_plan(butterfly_count(plan_graph))
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    assert "partial_count" in plan or "partial" in plan, plan


def test_redirect_doubling_round_is_single_self_join(spark):
    """One pointer-doubling round = one equi-join of the state against
    itself; no cartesian, no Python."""
    from linkgraph.extract import resolve_redirects

    mapping = spark.createDataFrame(
        [(i, i - 1) for i in range(1, 40)], "src long, dst long"
    )
    plan = formatted_plan(resolve_redirects(mapping, max_rounds=1))
    assert "CartesianProduct" not in plan, plan
    assert "BatchEvalPython" not in plan and "ArrowEval" not in plan, plan


def test_hll_plan_two_partial_aggs_no_url_shuffle_of_bodies(spark):
    """The HLL sketch must reach the reducer as (host, bucket, rank)
    rows via partial aggregation — both groupBys map-side combined, no
    Window, no Python."""
    from linkgraph.extract import host_url_cardinality

    urls = spark.createDataFrame(
        [(f"https://h{i%5}.x/p/{i}", f"h{i%5}.x") for i in range(50)],
        "url string, host string",
    )
    plan = formatted_plan(host_url_cardinality(urls))
    assert "Window" not in plan, plan
    assert "BatchEvalPython" not in plan, plan
    # partial+final for the register max and the per-host fold
    assert plan.count("HashAggregate") >= 4, plan


def test_mirror_hosts_cap_is_two_pass_before_collect_set(spark):
    """mirror_host_pairs' boilerplate guard (ADVICE r02): the cap must be
    enforced by a COUNT pass + left_semi BEFORE the collect_set, so no
    aggregation buffer ever builds an over-cap host array.  Plan shape:
    a LeftSemi join, and ≥2 aggregate pairs (count, then collect_set)."""
    from linkgraph.textops.dedup import mirror_host_pairs

    docs = spark.createDataFrame(
        [(i, f"body {i % 7}", f"h{i % 11}.x") for i in range(60)],
        "doc_id long, text string, host string",
    )
    plan = formatted_plan(mirror_host_pairs(docs, max_hosts_per_fp=5))
    assert "LeftSemi" in plan, plan
    # capped path still never goes all-pairs
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_indexed_edges_plan_no_window_no_shuffle(spark, plan_graph):
    """The walk edge-index build must be a narrow Arrow pass over the
    persisted CSR layout — no Window (hub-sized single task straggler)
    and no Exchange (the layout already clusters each src's run)."""
    from linkgraph.algorithms.walks import indexed_edges

    plan = formatted_plan(indexed_edges(plan_graph))
    live = live_tree(plan)
    assert "Window" not in live, plan
    assert "Exchange" not in live, plan
    assert "MapInArrow" in live, plan


def test_node2vec_step_plan_is_bounded_probe(spark, plan_graph):
    """node2vec rejection step: candidate generation must be the fixed
    attempts-explode + (src, idx) equi-join + one edge-existence
    equi-join — never a cartesian/nested-loop product and never a
    per-neighbor expansion (the whole point of rejection sampling)."""
    from linkgraph.algorithms.walks import node2vec_walks

    plan_df = node2vec_walks(plan_graph, num_steps=2, p=2.0, q=0.5)
    plan = formatted_plan(plan_df)
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
