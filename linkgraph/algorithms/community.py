"""Community-quality metrics over a (vid, label) assignment: Newman
modularity and per-community conductance.

Reference: none — upstream essentials has no community-quality kernels
(its label-propagation example stops at the assignment); these are the
standard evaluation companions to LP (Newman & Girvan, *Finding and
evaluating community structure in networks*, PRE 2004; conductance as
in Leskovec et al., *Community structure in large networks*, WWW 2008)
added per the task brief's link-graph mandate.

Both are ONE-PASS aggregations over the persisted edge views joined to
the label table — no iteration, no driver loops:

- ``modularity``: two |E|-key joins (labels onto canonical edge
  endpoints) + two map-side-combined per-label aggs + a 1-row final
  combine.  Label-side joins shuffle |V| rows; at web scale the label
  table co-partitions with the vertex layout, and the per-label aggs
  reduce to ≤|communities| rows before the final join.
- ``community_conductance``: one |E|-key join of the symmetrized view
  against labels per endpoint, one grouped agg keyed by community —
  cut and volume fall out of the same aggregation (conditional count),
  so the whole metric costs a single shuffle over community keys.

Modularity uses the standard undirected convention: with m undirected
edges, e_c = intra-community edges, d_c = Σ undirected degrees in c,
``Q = Σ_c (e_c/m − (d_c/2m)²)``.  All inputs to the final expression
are exact integer sums, so Spark and the DuckDB twin agree bit-for-bit
up to the one final float expression per community and the Σ over
communities (sum-order noise ~1e-15, far below the 1e-6 rounding
quantum the catalog hashes at).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from linkgraph.graph import Graph


def modularity(graph: Graph, labels: DataFrame) -> DataFrame:
    """Newman modularity of a community assignment on the undirected
    graph: 1 row ``(m, n_communities, modularity)``.

    ``labels`` is ``(vid, label)``; every vertex of the graph must carry
    a label (LP output does by construction).
    """
    canon = graph.canonical_edges  # each undirected edge exactly once
    la = labels.select(F.col("vid").alias("src"), F.col("label").alias("lab_s"))
    lb = labels.select(F.col("vid").alias("dst"), F.col("label").alias("lab_d"))
    tagged = canon.join(la, "src").join(lb, "dst")
    intra = (
        tagged.where(F.col("lab_s") == F.col("lab_d"))
        .groupBy(F.col("lab_s").alias("label"))
        .agg(F.count(F.lit(1)).alias("e_c"))
    )
    vol = (
        graph.degrees.join(labels, "vid")
        .groupBy("label")
        .agg(F.sum("deg").alias("d_c"))
    )
    m_df = canon.agg(F.count(F.lit(1)).alias("m"))
    # every community has members (d_c side); e_c may be 0 → left join
    per_label = vol.join(intra, "label", "left").select(
        "label",
        F.coalesce("e_c", F.lit(0)).alias("e_c"),
        "d_c",
    )
    # t·t, not pow(t, 2): pow with a float exponent is not guaranteed
    # bit-identical across engines; the twin uses the same product form
    half = F.col("d_c").cast("double") / (F.lit(2.0) * F.col("m"))
    q = per_label.crossJoin(m_df).select(
        (F.col("e_c").cast("double") / F.col("m") - half * half).alias("term")
    )
    return (
        q.agg(F.sum("term").alias("q_raw"))
        .crossJoin(m_df)
        .crossJoin(per_label.agg(F.count(F.lit(1)).alias("n_communities")))
        .select(
            F.col("m").cast("long").alias("m"),
            F.col("n_communities").cast("long").alias("n_communities"),
            F.round("q_raw", 6).alias("modularity"),
        )
    )


def community_conductance(
    graph: Graph, labels: DataFrame, top_k: int = 20
) -> DataFrame:
    """Per-community conductance ``φ(c) = cut(c) / min(vol(c), 2m−vol(c))``
    over the symmetrized edge set, for the ``top_k`` largest communities
    (members DESC, label ASC — a deterministic total order).

    Returns ``(label, members, vol, cut, conductance)``.  ``vol(c)`` =
    Σ undirected degrees of c's members = # sym edges leaving a member;
    ``cut(c)`` = # sym edges with exactly the src endpoint in c.  Both
    fall out of ONE grouped aggregation over the label-tagged sym view.
    """
    sym = graph.symmetrized_edges
    la = labels.select(F.col("vid").alias("src"), F.col("label").alias("lab_s"))
    lb = labels.select(F.col("vid").alias("dst"), F.col("label").alias("lab_d"))
    tagged = sym.join(la, "src").join(lb, "dst")
    per = tagged.groupBy(F.col("lab_s").alias("label")).agg(
        F.count(F.lit(1)).alias("vol"),
        F.sum(
            F.when(F.col("lab_s") != F.col("lab_d"), 1).otherwise(0)
        ).alias("cut"),
    )
    sizes = labels.groupBy("label").agg(F.count(F.lit(1)).alias("members"))
    m2 = sym.agg(F.count(F.lit(1)).alias("m2"))  # 2m
    out = (
        sizes.join(per, "label", "left")
        .select(
            "label",
            "members",
            F.coalesce("vol", F.lit(0)).alias("vol"),
            F.coalesce("cut", F.lit(0)).alias("cut"),
        )
        .crossJoin(m2)
        .select(
            "label",
            F.col("members").cast("long").alias("members"),
            F.col("vol").cast("long").alias("vol"),
            F.col("cut").cast("long").alias("cut"),
            F.round(
                F.when(
                    F.least(F.col("vol"), F.col("m2") - F.col("vol")) > 0,
                    F.col("cut").cast("double")
                    / F.least(F.col("vol"), F.col("m2") - F.col("vol")),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("conductance"),
        )
    )
    return out.orderBy(F.desc("members"), F.asc("label")).limit(top_k)
