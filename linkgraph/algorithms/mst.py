"""Minimum spanning forest — distributed Borůvka (reference A12,
[ref: include/gunrock/algorithms/mst.hxx — UNVERIFIED]; SURVEY.md §2.3
A12: "per-component min-edge agg + hash-min merge").

Classic Borůvka rounds over an undirected weighted edge DataFrame
``(src, dst, weight)``:

1. **cross edges**: join component labels onto both endpoints; keep edges
   whose endpoints lie in different components (two |V|-side joins into
   the persisted edge set);
2. **min edge per component**: every component picks its lightest
   incident cross edge — ``groupBy(comp).min(struct(weight, src, dst))``,
   the total order (weight, src, dst) making selection deterministic
   under ties (ties ⇒ *a* minimum spanning forest; unique when weights
   are distinct);
3. **contract**: the selected edges form a pseudo-forest over component
   labels; merge the components it connects.  The merge graph has at most
   one edge per component and HALVES every round, so after the first
   round or two it is tiny relative to the graph: below
   ``driver_contract_threshold`` edges it is collected and contracted
   with a union-find on the driver (one pass, exact); above it, hash-min
   label propagation with pointer jumping runs distributed — the
   web-scale path for the first rounds of a 10^12-vertex crawl;
4. repeat until no cross edges remain.

O(log V) outer rounds; every round's per-vertex relabel is a
co-partitioned merge join, and the contraction loop runs on a graph that
shrinks geometrically, so the heavy joins always stream the persisted
|E| side exactly once per round.

**Planner hazard (measured, PySpark 4.1): checkpoint stats compounding.**
``localCheckpoint`` re-roots the plan as a ``LogicalRDD`` that PRESERVES
the origin plan's estimated ``sizeInBytes``.  An iterative loop whose
round k+1 plan joins round-k checkpoint leaves therefore *multiplies*
the estimates round over round — the BigInteger's digit count doubles
per iteration, and after ~25 iterations Catalyst's size-only stats
visitor (consulted by broadcast/runtime-filter rules on every plan)
spends minutes in million-digit Toom-Cook multiplication: the job looks
hung while the driver burns one core in ``BigInteger.multiply``.
:func:`_fresh_leaf` breaks the feedback loop by re-wrapping each
checkpointed RDD in a stats-free ``LogicalRDD`` leaf, so every
generation re-plans from the default size estimate instead of the
previous generation's inflated one.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.superstep import _free_checkpoint_blocks, strip_origin_stats

#: Merge graphs at or below this many edges are contracted on the driver
#: (two longs per edge → ≤ ~64 MB collected at the default).  Above it —
#: only ever the first round or two of a truly huge graph — contraction
#: runs distributed.
DRIVER_CONTRACT_THRESHOLD = 2_000_000


def _fresh_leaf(df: DataFrame) -> DataFrame:
    """Eagerly materialize ``df`` and return it as a stats-free plan leaf.

    ``localCheckpoint(eager=True)`` does the materialization;
    :func:`linkgraph.superstep.strip_origin_stats` then drops the
    checkpoint's preserved ``originStats`` (same RDD, no data movement),
    preventing the exponential sizeInBytes compounding described in the
    module docstring.
    """
    return strip_origin_stats(df.localCheckpoint(eager=True))


def _contract_driver(merge_edges: list[tuple[int, int]]) -> list[tuple[int, int]]:
    """Union-find over the collected merge edges → ``(comp, new_comp)``
    rows mapping every touched component to the MIN label of its merge
    tree (the same fixpoint the distributed hash-min reaches)."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        while parent.setdefault(x, x) != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in merge_edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[ra] = rb
    groups: dict[int, int] = {}
    for x in parent:
        r = find(x)
        m = groups.get(r)
        if m is None or x < m:
            groups[r] = x
    return [(x, groups[find(x)]) for x in parent]


def _contract_distributed(sym: DataFrame) -> DataFrame:
    """Hash-min label propagation WITH pointer jumping each round, to
    fixpoint, on the (symmetrized) merge graph — the web-scale path.

    Jumping alone is not enough: a node whose own id is smaller than all
    its neighbors' ids keeps pointing at itself even when its tree's
    minimum lies further away — propagation along edges is what moves
    the minimum, jumping only shortcuts it."""
    lab = _fresh_leaf(
        sym.select(F.col("a").alias("comp"))
        .dropDuplicates(["comp"])
        .select("comp", F.col("comp").alias("new_comp"))
    )
    while True:
        min_in = (
            sym.join(lab.select(F.col("comp").alias("a"), "new_comp"), "a")
            .groupBy(F.col("b").alias("comp"))
            .agg(F.min("new_comp").alias("_min_in"))
        )
        stepped = lab.join(min_in, "comp", "left").select(
            "comp",
            F.least("new_comp", F.coalesce("_min_in", "new_comp")).alias(
                "new_comp"
            ),
        )
        jumped = _fresh_leaf(
            stepped.join(
                stepped.select(
                    F.col("comp").alias("new_comp"), F.col("new_comp").alias("_g")
                ),
                "new_comp",
                "left",
            )
            .select(
                "comp",
                F.least("new_comp", F.coalesce("_g", "new_comp")).alias("new_comp"),
            )
        )
        changed = (
            jumped.join(
                lab.select("comp", F.col("new_comp").alias("_old")), "comp"
            )
            .where(F.col("new_comp") != F.col("_old"))
            .count()
        )
        # free the superseded generation's checkpoint blocks — the same
        # block-pileup discipline the Boruvka main loop applies (leaving
        # them to the ContextCleaner measured 10-50× wall spikes in the
        # superstep runtime).
        _free_checkpoint_blocks(lab)
        lab = jumped
        if changed == 0:
            return lab


def _contract(merges: DataFrame, n_merges: int) -> DataFrame:
    """Resolve the selected merge edges ``(ca, cb)`` to final labels:
    ``(comp, new_comp)`` mapping every touched component to the min label
    of its merge-tree."""
    spark = merges.sparkSession
    if n_merges <= DRIVER_CONTRACT_THRESHOLD:
        pairs = [(r["ca"], r["cb"]) for r in merges.collect()]
        return spark.createDataFrame(
            _contract_driver(pairs), "comp long, new_comp long"
        )
    sym = _fresh_leaf(
        merges.select(F.col("ca").alias("a"), F.col("cb").alias("b"))
        .unionAll(merges.select(F.col("cb").alias("a"), F.col("ca").alias("b")))
        .dropDuplicates(["a", "b"])
    )
    mapping = _contract_distributed(sym)
    _free_checkpoint_blocks(sym)  # mapping is an independent fresh leaf
    return mapping


def minimum_spanning_forest(
    edges: DataFrame,
    weight_col: str = "weight",
    max_rounds: int = 64,
) -> DataFrame:
    """MSF of the undirected weighted graph → ``(src, dst, weight)``.

    ``edges`` is interpreted undirected; reversed/duplicate rows are
    normalized to one canonical ``src < dst`` row keeping the MINIMUM
    weight (multigraph collapse).  Output has |V| − #components rows.
    """
    e = _fresh_leaf(
        edges.select(
            F.least("src", "dst").alias("src"),
            F.greatest("src", "dst").alias("dst"),
            F.col(weight_col).cast("double").alias("weight"),
        )
        .where(F.col("src") != F.col("dst"))
        .groupBy("src", "dst")
        .agg(F.min("weight").alias("weight"))
    )
    spark = e.sparkSession
    comp = _fresh_leaf(
        e.select(F.col("src").alias("vid"))
        .unionAll(e.select(F.col("dst").alias("vid")))
        .dropDuplicates(["vid"])
        .select("vid", F.col("vid").alias("comp"))
    )
    chosen: DataFrame | None = None
    for _ in range(max_rounds):
        labeled = (
            e.join(
                comp.select(F.col("vid").alias("src"), F.col("comp").alias("cs")),
                "src",
            )
            .join(
                comp.select(F.col("vid").alias("dst"), F.col("comp").alias("cd")),
                "dst",
            )
            .where(F.col("cs") != F.col("cd"))
        )
        # min incident cross edge per component, deterministic total order
        pick = F.struct("weight", "src", "dst", "cs", "cd")
        incident = labeled.select(F.col("cs").alias("c"), pick.alias("e")).unionAll(
            labeled.select(F.col("cd").alias("c"), pick.alias("e"))
        )
        sel = _fresh_leaf(
            incident.groupBy("c")
            .agg(F.min("e").alias("e"))
            .select("e.weight", "e.src", "e.dst", "e.cs", "e.cd")
            .dropDuplicates(["src", "dst"])
        )
        n_sel = sel.count()
        if n_sel == 0:
            _free_checkpoint_blocks(sel)
            break
        picked = sel.select("src", "dst", "weight")
        prev_chosen = chosen
        chosen = _fresh_leaf(picked if chosen is None else chosen.unionAll(picked))
        if prev_chosen is not None:
            _free_checkpoint_blocks(prev_chosen)
        mapping = _contract(
            sel.select(F.col("cs").alias("ca"), F.col("cd").alias("cb")), n_sel
        )
        prev_comp = comp
        comp = _fresh_leaf(
            comp.join(mapping, "comp", "left")
            .select("vid", F.coalesce("new_comp", "comp").alias("comp"))
        )
        _free_checkpoint_blocks(prev_comp)
        _free_checkpoint_blocks(sel)
        _free_checkpoint_blocks(mapping)  # no-op on the driver-path DF
    _free_checkpoint_blocks(e)
    _free_checkpoint_blocks(comp)
    if chosen is None:
        return spark.createDataFrame([], "src long, dst long, weight double")
    return chosen
