"""Graph container: the engine's analog of the reference ``graph_t``.

Reference (SURVEY.md §1.1, [ref: include/gunrock/graph/graph.hxx —
UNVERIFIED]): a multi-view container over CSR/CSC/COO device arrays with
``get_number_of_vertices/edges``, neighbor access, degree access.

Here: a thin wrapper around a **canonical edge DataFrame**
``edges(src: long, dst: long)`` that is

- normalized (self-loops dropped, duplicates removed — matching the mtx
  loader / ``graph::build`` behavior, SURVEY.md §2.2 I1/I4),
- hash-partitioned on ``src`` with a fixed partition count and sorted
  within partitions by (src, dst) — the DataFrame analog of the reference's
  CSR layout.  Hash (not range) partitioning is deliberate: Catalyst
  recognizes the persisted ``HashPartitioning(src, P)`` as compatible with
  the per-superstep gather join's required distribution, so the big edges
  side is **never re-shuffled across iterations** — only the small
  per-vertex state moves.  This is the property that makes the superstep
  scale: shuffle bytes per iteration ∝ |V|, not |E|.
- persisted MEMORY_AND_DISK (reference: graph stays on device across
  iterations; spill-to-disk replaces device-memory pressure).

Derived views (degrees, symmetrized, canonical orientation) are computed
once and cached — they are the analogs of the reference's CSC/COO views.
"""

from __future__ import annotations

from functools import cached_property

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel


class Graph:
    """Directed graph over a canonical edge DataFrame.

    Construct via :meth:`from_edges`; do not call ``__init__`` directly
    unless ``edges`` is already normalized and partitioned.
    """

    def __init__(self, edges: DataFrame, num_partitions: int):
        self.edges = edges
        self.num_partitions = num_partitions
        self._persisted: list[DataFrame] = []

    # -- construction ------------------------------------------------------

    @classmethod
    def from_edges(
        cls,
        edges: DataFrame,
        num_partitions: int | None = None,
        dedupe: bool = True,
        drop_self_loops: bool = True,
        persist: bool = True,
    ) -> "Graph":
        """Normalize a raw (src, dst) DataFrame into a canonical Graph.

        Reference analog: ``csr_t::from_coo`` + ``graph::build`` (sort +
        dedupe + offsets — SURVEY.md §2.2 I3/I4).

        ``num_partitions`` defaults to — and for exchange-free supersteps
        MUST equal — the session's ``spark.sql.shuffle.partitions``: the
        superstep runtime's state leaves and every step-output exchange
        use that count, so a graph partitioned differently forces
        Catalyst to re-exchange one side of every superstep join
        (tests/test_plans.py guards the matched case).
        """
        spark = edges.sparkSession
        if num_partitions is None:
            num_partitions = int(spark.conf.get("spark.sql.shuffle.partitions"))
        e = edges.select(
            F.col("src").cast("long").alias("src"),
            F.col("dst").cast("long").alias("dst"),
        )
        if drop_self_loops:
            e = e.where(F.col("src") != F.col("dst"))
        # Order matters: repartition FIRST, then dropDuplicates, then the
        # narrow sort.  HashPartitioning(src) satisfies the distinct's
        # ClusteredDistribution([src, dst]) (src ⊆ keys — every copy of an
        # edge shares its src), so Catalyst plans the dedupe as a hash
        # aggregate over the already-partitioned data with NO second
        # exchange, and the output keeps hash(src, P).  The old
        # dropDuplicates-then-repartition order cost two full |E| shuffles
        # — the dominant graph-build cost at 10^8 edges.
        e = e.repartition(num_partitions, "src")
        if dedupe:
            e = e.dropDuplicates(["src", "dst"])
        e = e.sortWithinPartitions("src", "dst")
        g = cls(e, num_partitions)
        if persist:
            g.edges = g.edges.persist(StorageLevel.MEMORY_AND_DISK)
            g._persisted.append(g.edges)
        return g

    @property
    def spark(self) -> SparkSession:
        return self.edges.sparkSession

    # -- stats (reference: get_number_of_vertices/edges) -------------------

    @cached_property
    def num_edges(self) -> int:
        return self.edges.count()

    @cached_property
    def num_vertices(self) -> int:
        return self.vertices.count()

    @cached_property
    def max_vid(self) -> int:
        """Largest vertex id (dense dictionary ids ⇒ ≈ num_vertices − 1)."""
        row = self.edges.agg(
            F.greatest(F.max("src"), F.max("dst")).alias("m")
        ).collect()[0]
        return int(row["m"]) if row["m"] is not None else -1

    @cached_property
    def vertices(self) -> DataFrame:
        """All vertex ids appearing as src or dst: ``(vid: long)``."""
        v = (
            self.edges.select(F.col("src").alias("vid"))
            .unionAll(self.edges.select(F.col("dst").alias("vid")))
            .dropDuplicates(["vid"])
            .repartition(self.num_partitions, "vid")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        self._persisted.append(v)
        return v

    @cached_property
    def out_degrees(self) -> DataFrame:
        """``(vid: long, outdeg: long)`` — only vertices with outdeg > 0.

        Reference analog: ``get_number_of_neighbors(v)`` over the CSR view.
        Partial (map-side) aggregation is automatic; the result is |V|-sized
        and persisted for reuse across all supersteps.
        """
        d = (
            self.edges.groupBy(F.col("src").alias("vid"))
            .agg(F.count(F.lit(1)).alias("outdeg"))
            .repartition(self.num_partitions, "vid")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        self._persisted.append(d)
        return d

    @cached_property
    def in_degrees(self) -> DataFrame:
        """``(vid, indeg)`` — only vertices with indeg > 0; laid out
        hash(vid, P) like :attr:`out_degrees` so vid-keyed merge joins
        against it stream exchange-free."""
        d = (
            self.edges.groupBy(F.col("dst").alias("vid"))
            .agg(F.count(F.lit(1)).alias("indeg"))
            .repartition(self.num_partitions, "vid")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        self._persisted.append(d)
        return d

    @cached_property
    def degrees(self) -> DataFrame:
        """Undirected degree over the symmetrized edge set: ``(vid, deg)``."""
        d = (
            self.symmetrized_edges.groupBy(F.col("src").alias("vid"))
            .agg(F.count(F.lit(1)).alias("deg"))
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        self._persisted.append(d)
        return d

    # -- derived views (reference: CSC view / symmetrize-on-load) ----------

    @cached_property
    def symmetrized_edges(self) -> DataFrame:
        """Undirected view: union of (src,dst) and (dst,src), deduped.

        Reference analog: the mtx loader's ``symmetric`` header handling
        (SURVEY.md §2.2 I1).  Used by CC / LP / TC, which are defined on the
        undirected graph.
        """
        # repartition → distinct → narrow sort: one 2|E| shuffle (see
        # from_edges — hash(src, P) satisfies the distinct's distribution)
        e = (
            self.edges.unionAll(
                self.edges.select(
                    F.col("dst").alias("src"), F.col("src").alias("dst")
                )
            )
            .repartition(self.num_partitions, "src")
            .dropDuplicates(["src", "dst"])
            .sortWithinPartitions("src", "dst")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        self._persisted.append(e)
        return e

    @cached_property
    def reversed_edges(self) -> DataFrame:
        """Reversed view ``(src=old dst, dst=old src)``, re-laid-out as
        hash(src, P) + sorted — the reference's CSC view kept next to CSR
        [ref: include/gunrock/graph/csc.hxx — UNVERIFIED].

        A bare ``select`` swap keeps the persisted HashPartitioning on the
        ORIGINAL src (now named dst), so every dst-keyed gather over it
        would re-shuffle + re-sort the full |E| set inside each superstep
        plan; building the view once here makes those gathers
        exchange-free (used by HITS' hub gather)."""
        e = (
            self.edges.select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
            .repartition(self.num_partitions, "src")
            .sortWithinPartitions("src", "dst")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        self._persisted.append(e)
        return e

    @cached_property
    def canonical_edges(self) -> DataFrame:
        """DAG orientation src < dst of the undirected edge set.

        Used by triangle counting (each undirected edge appears exactly
        once, oriented low→high id — SURVEY.md §2.3 A4).
        """
        # repartition → distinct: one shuffle (see from_edges)
        e = (
            self.edges.select(
                F.least("src", "dst").alias("src"),
                F.greatest("src", "dst").alias("dst"),
            )
            .repartition(self.num_partitions, "src")
            .dropDuplicates(["src", "dst"])
            .sortWithinPartitions("src", "dst")
            .persist(StorageLevel.MEMORY_AND_DISK)
        )
        self._persisted.append(e)
        return e

    def symmetrized(self) -> "Graph":
        """A Graph over the symmetrized edge set.

        The child SHARES the parent's persisted symmetrized DataFrame as
        its edge set — and its own ``symmetrized_edges`` view is
        pre-seeded to that same DataFrame (an already-symmetric edge set
        is its own symmetrization), so no algorithm run on the child
        redoes the 2|E| union+dedupe.  Lifetime caveat: the shared DF is
        registered in the PARENT's persisted list, so
        ``parent.unpersist()`` drops the child's edge cache too; views
        the child derives itself (vertices, degrees, ...) are its own.
        """
        g = Graph(self.symmetrized_edges, self.num_partitions)
        g.__dict__["symmetrized_edges"] = self.symmetrized_edges
        return g

    # -- snapshot (reference: result/graph sink, SURVEY.md §2.2 I6) --------

    def save_bucketed(self, table: str, path: str | None = None) -> None:
        """Persist the canonical edges as a bucketed + sorted table.

        ``bucketBy(P, src)`` writes the SAME distribution the superstep
        gather join requires (``HashPartitioning(src, P)``), and the
        edges are already partitioned that way, so each writer task emits
        exactly its own bucket — no shuffle on write.  A later session
        (:meth:`load_bucketed`) then rebuilds the Graph with **zero
        re-shuffle of the edge table**: at 10^9+ edges this turns restart
        cost from a full |E| exchange into a metadata read.
        """
        w = (
            self.edges.write.mode("overwrite")
            .bucketBy(self.num_partitions, "src")
            .sortBy("src", "dst")
        )
        if path is not None:
            w = w.option("path", path)
        w.format("parquet").saveAsTable(table)

    @classmethod
    def load_bucketed(
        cls,
        spark: SparkSession,
        table: str,
        persist: bool = True,
        strict: bool = True,
    ) -> "Graph":
        """Rebuild a Graph from a :meth:`save_bucketed` table — no shuffle.

        The bucketed scan advertises ``HashPartitioning(src, P)`` (with
        ``spark.sql.sources.bucketing.enabled``, on by default), so the
        canonical layout comes back for free; edges were normalized
        before saving, so no dedupe pass either.

        The loading session's ``spark.sql.shuffle.partitions`` SHOULD
        equal the table's bucket count (the Graph contract from
        :meth:`from_edges`): on mismatch the state side of every
        superstep join would re-exchange a full |E|-scale side each
        iteration — the exact regression the bucketed snapshot exists to
        avoid.  ``strict=True`` (the default, for iterate()-bound loads)
        raises on mismatch; ``strict=False`` is the read-only/ad-hoc
        escape hatch (ADVICE r01): it warns and builds the Graph at the
        TABLE's bucket count, which is still exchange-free for the
        graph's own derived views — only a superstep runtime using the
        session width would re-exchange, and such callers should stay
        strict.
        """
        desc = spark.sql(f"DESCRIBE FORMATTED {table}").collect()
        n_buckets = None
        for r in desc:
            if r.col_name.strip() == "Num Buckets":
                n_buckets = int(r.data_type.strip())
        if n_buckets is None:
            raise ValueError(f"{table} is not a bucketed table")
        session_parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
        if session_parts != n_buckets:
            msg = (
                f"bucketed table {table} has {n_buckets} buckets but "
                f"spark.sql.shuffle.partitions={session_parts}; the "
                "exchange-free superstep contract requires them equal — "
                "set the session's shuffle partitions to the bucket "
                "count before load_bucketed, or rebuild the snapshot"
            )
            if strict:
                raise ValueError(msg)
            import warnings

            warnings.warn(
                msg + " (strict=False: loading at the table's bucket "
                "count; superstep joins against session-width state "
                "will re-exchange)",
                stacklevel=2,
            )
        # The bucketed scan restores HashPartitioning(src, P) but NOT the
        # sort half of the canonical layout (Spark ignores bucket-file
        # sort order on scan by default); re-sort within partitions —
        # narrow, one-time — so merge joins stay Sort-free per superstep.
        e = spark.table(table).sortWithinPartitions("src", "dst")
        g = cls(e, n_buckets)
        if persist:
            g.edges = g.edges.persist(StorageLevel.MEMORY_AND_DISK)
            g._persisted.append(g.edges)
        return g

    # -- lifecycle ---------------------------------------------------------

    def unpersist(self) -> None:
        for df in self._persisted:
            df.unpersist()
        self._persisted.clear()
