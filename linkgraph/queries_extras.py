"""Later catalog domains: condensation/PII/C4, sessionization,
mirror hosts, redirects, landmarks, butterflies, push-PPR, robots,
Zipf, HLL, crawl budget, anchor entropy, mixture planning, dedup
accounting.  Split from the flat queries.py (VERDICT r03 #8);
linkgraph.queries re-exports everything.
"""

from __future__ import annotations

import threading
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from linkgraph.textops.quality import (
    BPE_PIECE_RE,
    PII_EMAIL_RE,
    PII_IPV4_RE,
    PII_PHONE_RE,
)

from linkgraph.queries_base import (
    DOCS2_SQL,
    EDGE_SQL,
    SYM_SQL,
    _load,
    build_edges_df,
    build_graph,
)
from linkgraph.queries_sqlgen import (
    _CORPUS_TOKS,
    _SCC_BASE_SQL,
    _sssp_unrolled_sql,
)
from linkgraph.queries_core import (
    _docs2,
    _thinned_graph,
    _weighted_graph,
)


# ---------------------------------------------------------------------------
# Condensation layering / power-law fit / PII scan / C4 filters
# ---------------------------------------------------------------------------

# Longest-path layering of the SCC condensation DAG (same thinned graph
# and mutual-reachability base as the `scc` entry): level(c) = max path
# length from any source component, computed by the recursive walk.
CONDENSATION_SQL = f"""
WITH RECURSIVE {EDGE_SQL.strip()},
{_SCC_BASE_SQL.strip()},
cedges AS (
  SELECT DISTINCT a.scc AS src, b.scc AS dst
  FROM te e JOIN sccs a ON a.vid = e.src JOIN sccs b ON b.vid = e.dst
  WHERE a.scc <> b.scc
),
comps AS (SELECT scc, COUNT(*) AS n_vertices FROM sccs GROUP BY scc),
paths(c, d) AS (
  SELECT scc, 0 FROM comps WHERE scc NOT IN (SELECT dst FROM cedges)
  UNION
  SELECT e.dst, p.d + 1 FROM paths p JOIN cedges e ON e.src = p.c
),
levels AS (SELECT c AS scc, MAX(d) AS level FROM paths GROUP BY c)
SELECT l.scc, CAST(l.level AS BIGINT) AS level,
       CAST(c.n_vertices AS BIGINT) AS n_vertices
FROM levels l JOIN comps c USING (scc) ORDER BY l.scc
"""

# Clauset-Shalizi-Newman continuous-MLE alpha over in-degrees >= xmin=2
# (in-degree = count over the DISTINCT derived edges, same as the
# engine's Graph.in_degrees).
POWERLAW_SQL = f"""
WITH {EDGE_SQL.strip()},
indegs AS (SELECT dst AS vid, COUNT(*) AS indeg FROM edges GROUP BY dst),
tail AS (SELECT indeg FROM indegs WHERE indeg >= 2)
SELECT CAST(2 AS BIGINT) AS xmin,
       CAST(COUNT(*) AS BIGINT) AS n_tail,
       ROUND(1.0 + COUNT(*) / SUM(ln(indeg / 1.5)), 6) AS alpha
FROM tail
"""

# Deterministic PII/C4 enrichment of the word-soup documents fixture,
# written ONCE and executed verbatim by BOTH engines (spark.sql and the
# DuckDB oracle CTE) — legal because it contains no backslash: Spark SQL
# string literals process backslash escapes, DuckDB standard strings do
# not, so a shared fragment must stay escape-free.  Regex-bearing
# expressions live separately (Python API on Spark / oracle-only SQL on
# DuckDB).
PII_DOCS_SQL = """
SELECT doc_id,
  text
  || CASE WHEN doc_id % 5 = 0 THEN ' contact user' || CAST(doc_id AS STRING) || '@example.com now.' ELSE '' END
  || CASE WHEN doc_id % 7 = 0 THEN ' host 10.' || CAST(doc_id % 256 AS STRING) || '.0.1 up.' ELSE '' END
  || CASE WHEN doc_id % 11 = 0 THEN ' call 555-' || lpad(CAST(doc_id % 1000 AS STRING), 3, '0') || '-' || lpad(CAST(doc_id % 10000 AS STRING), 4, '0') || '.' ELSE '' END
  AS text
FROM documents
"""

C4_DOCS_SQL = """
SELECT doc_id,
  replace(text, ' line ', '.' || chr(10))
  || CASE WHEN doc_id % 13 = 0 THEN ' lorem ipsum dolor sit.' ELSE '' END
  || CASE WHEN doc_id % 17 = 0 THEN ' {var}' ELSE '' END
  AS text
FROM documents
"""

# NOT an f-string: the regexes carry braces and backslashes.  Patterns
# are duplicated from textops.quality.PII_*_RE via interpolation below
# so the engine and oracle cannot drift.
PII_SQL = (
    "WITH docs AS (" + PII_DOCS_SQL.strip() + ")\n"
    "SELECT doc_id,\n"
    "  CAST(len(regexp_extract_all(text, '" + PII_EMAIL_RE + "')) AS BIGINT) AS n_emails,\n"
    "  CAST(len(regexp_extract_all(text, '" + PII_IPV4_RE + "')) AS BIGINT) AS n_ipv4,\n"
    "  CAST(len(regexp_extract_all(text, '" + PII_PHONE_RE + "')) AS BIGINT) AS n_phones,\n"
    "  CAST(len(regexp_extract_all(text, '" + PII_EMAIL_RE + "'))\n"
    "     + len(regexp_extract_all(text, '" + PII_IPV4_RE + "'))\n"
    "     + len(regexp_extract_all(text, '" + PII_PHONE_RE + "')) > 0 AS INT) AS has_pii\n"
    "FROM docs ORDER BY doc_id"
)

_C4_KEPT = (
    "list_filter(string_split(text, chr(10)), "
    "x -> len(regexp_extract_all(x, '\\S+')) >= 5 "
    "AND regexp_matches(x, '[.!?\"]\\s*$'))"
)
C4_SQL = (
    "WITH docs AS (" + C4_DOCS_SQL.strip() + ")\n"
    "SELECT doc_id,\n"
    "  CAST(len(string_split(text, chr(10))) AS BIGINT) AS n_lines,\n"
    "  CAST(len(" + _C4_KEPT + ") AS BIGINT) AS n_kept_lines,\n"
    "  CAST(len(regexp_extract_all(text, '[.!?]')) AS BIGINT) AS n_sentences,\n"
    "  CAST(contains(lower(text), 'lorem ipsum') AS INT) AS has_lorem_ipsum,\n"
    "  CAST(contains(text, '{') AS INT) AS has_curly_brace,\n"
    "  CAST(len(regexp_extract_all(text, '[.!?]')) >= 3\n"
    "       AND NOT contains(lower(text), 'lorem ipsum')\n"
    "       AND NOT contains(text, '{') AS INT) AS keep\n"
    "FROM docs ORDER BY doc_id"
)


# Directed triangle census: canonical direction-bit pairs + the x<y<z
# triple join; flag products mirror the engine's pattern expressions.
TRIAD_SQL = f"""
WITH {EDGE_SQL.strip()},
pairs AS (
  SELECT LEAST(src, dst) AS u, GREATEST(src, dst) AS v,
         MAX(CASE WHEN src < dst THEN 1 ELSE 0 END) AS f,
         MAX(CASE WHEN src > dst THEN 1 ELSE 0 END) AS b
  FROM edges WHERE src <> dst GROUP BY 1, 2
),
tri AS (
  SELECT p1.f AS fxy, p1.b AS bxy, p2.f AS fxz, p2.b AS bxz,
         p3.f AS fyz, p3.b AS byz
  FROM pairs p1
  JOIN pairs p2 ON p2.u = p1.u AND p2.v > p1.v
  JOIN pairs p3 ON p3.u = p1.v AND p3.v = p2.v
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_triangles,
       CAST(COALESCE(SUM(fxy*fyz*bxz + bxy*byz*fxz), 0) AS BIGINT) AS n_cyclic,
       CAST(COALESCE(SUM(fxy*fyz*fxz + fxz*byz*fxy + bxy*fxz*fyz
                       + fyz*bxz*bxy + bxz*fxy*byz + byz*bxy*bxz), 0) AS BIGINT) AS n_transitive
FROM tri
"""

# Bipartiteness: hash-min components over sym + multi-source BFS depths
# from every component root + parity-conflict edge count per component.
# d < 64 caps the walk like BFS_SQL (sym walks alternate forever without
# a bound; true depths on the crawl are far below it).
BIPARTITE_SQL = f"""
WITH RECURSIVE {EDGE_SQL.strip()},
{SYM_SQL.strip()},
reach(vid, m) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.m FROM reach r JOIN sym e ON e.src = r.vid
),
comps AS (SELECT vid, MIN(m) AS comp FROM reach GROUP BY vid),
roots AS (SELECT DISTINCT comp FROM comps),
walk(vid, d) AS (
  SELECT comp, 0 FROM roots
  UNION
  SELECT e.dst, w.d + 1 FROM walk w JOIN sym e ON e.src = w.vid
  WHERE w.d < 64
),
depth AS (SELECT vid, MIN(d) AS d FROM walk GROUP BY vid),
und AS (SELECT src, dst FROM sym WHERE src < dst),
conf AS (
  SELECT c.comp,
         COUNT(*) FILTER (WHERE (a.d + b.d) % 2 = 0) AS n_conflict
  FROM und u
  JOIN depth a ON a.vid = u.src
  JOIN depth b ON b.vid = u.dst
  JOIN comps c ON c.vid = u.src
  GROUP BY c.comp
)
SELECT s.comp, CAST(s.n AS BIGINT) AS n_vertices,
       CAST(COALESCE(f.n_conflict, 0) AS BIGINT) AS n_conflict_edges,
       CAST(COALESCE(f.n_conflict, 0) = 0 AS INT) AS is_bipartite
FROM (SELECT comp, COUNT(*) AS n FROM comps GROUP BY comp) s
LEFT JOIN conf f ON f.comp = s.comp
ORDER BY s.comp
"""


# Hygiene enrichment: literal U+FFFD / mojibake digraphs embedded as
# UTF-8 characters in the SQL TEXT (both parsers take unicode literals
# verbatim — no chr() games, whose >255 semantics differ between
# engines), control chars via chr(7)/chr(31) (identical below 256).
HYGIENE_DOCS_SQL = (
    "SELECT doc_id, text"
    " || CASE WHEN doc_id % 4 = 0 THEN ' bad \ufffd\ufffd mark' ELSE '' END"
    " || CASE WHEN doc_id % 6 = 0 THEN ' ctl' || chr(7) || chr(31) ELSE '' END"
    " || CASE WHEN doc_id % 9 = 0 THEN ' caf\u00c3\u00a9 v\u00c3\u00a9' ELSE '' END"
    " AS text FROM documents"
)

HYGIENE_SQL = (
    "WITH docs AS (" + HYGIENE_DOCS_SQL + ")\n"
    "SELECT doc_id,\n"
    "  CAST(len(regexp_extract_all(text, '\\x{FFFD}')) AS BIGINT) AS n_replacement,\n"
    "  CAST(len(regexp_extract_all(text, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]')) AS BIGINT) AS n_control,\n"
    "  CAST(len(regexp_extract_all(text, '[\\x{C2}\\x{C3}][\\x{80}-\\x{BF}]')) AS BIGINT) AS n_mojibake,\n"
    "  ROUND(CASE WHEN length(text) > 0 THEN\n"
    "    CAST(length(regexp_replace(text, '[^\\x00-\\x7F]', '', 'g')) AS DOUBLE) / length(text)\n"
    "    ELSE 1.0 END, 6) AS ascii_ratio,\n"
    "  CAST(len(regexp_extract_all(text, '\\x{FFFD}'))\n"
    "     + len(regexp_extract_all(text, '[\\x00-\\x08\\x0B\\x0C\\x0E-\\x1F]'))\n"
    "     + len(regexp_extract_all(text, '[\\x{C2}\\x{C3}][\\x{80}-\\x{BF}]')) = 0 AS INT) AS clean\n"
    "FROM docs ORDER BY doc_id"
)


def _opic_unrolled_sql(iters: int = 8) -> str:
    """Synchronous OPIC unroll (twin of algorithms/opic.py): cash moves
    along out-links in equal shares each step, history banks the moved
    cash, dangling cash redistributes uniformly; importance =
    (hist + cash) / (iters + 1)."""
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        "odeg AS MATERIALIZED (SELECT src AS vid, COUNT(*) AS od FROM edges GROUP BY src),",
        "c0 AS MATERIALIZED (SELECT doc_id AS vid, 1.0 / nn.n AS cash, 0.0 AS hist FROM documents CROSS JOIN nn),",
    ]
    for i in range(1, iters + 1):
        prev = f"c{i - 1}"
        parts.append(
            f"""dang{i} AS (
  SELECT COALESCE(SUM(c.cash), 0.0) AS d FROM {prev} c
  LEFT JOIN odeg ON odeg.vid = c.vid WHERE odeg.vid IS NULL
),
c{i} AS MATERIALIZED (
  SELECT v.vid,
         COALESCE(s.m, 0.0) + dd.d / nn.n AS cash,
         v.hist + v.cash AS hist
  FROM {prev} v CROSS JOIN nn CROSS JOIN dang{i} dd
  LEFT JOIN (
    SELECT e.dst AS vid, SUM(c.cash / odeg.od) AS m
    FROM edges e JOIN {prev} c ON c.vid = e.src
    JOIN odeg ON odeg.vid = e.src
    GROUP BY e.dst
  ) s ON s.vid = v.vid
),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT vid, ROUND((hist + cash) / {iters + 1}.0, 6) AS importance6 "
        f"FROM c{iters} ORDER BY vid"
    )
    return "\n".join(parts)


# Distance-to-nearest-trusted-seed (directed, seeds = every 100th vid):
# capped multi-source walk, the same d<64 bound as BFS_SQL.
SEED_DISTANCE_SQL = f"""
WITH RECURSIVE {EDGE_SQL.strip()},
seeds AS (SELECT doc_id AS vid FROM documents WHERE doc_id % 100 = 0),
walk(vid, d) AS (
  SELECT vid, 0 FROM seeds
  UNION
  SELECT e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.vid
  WHERE w.d < 64
)
SELECT d.doc_id AS vid, CAST(MIN(w.d) AS BIGINT) AS depth
FROM documents d LEFT JOIN walk w ON w.vid = d.doc_id
GROUP BY d.doc_id ORDER BY vid
"""


def q_seed_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hop distance to the nearest trusted seed (bfs.py
    multi_source_bfs) — the TrustRank-companion locality feature: pages
    far from every seed are where link spam lives."""
    from linkgraph.algorithms.bfs import multi_source_bfs

    g = build_graph(spark, sf_dir)
    seeds = g.vertices.where(F.col("vid") % 100 == 0)
    return multi_source_bfs(g, seeds, directed=True).state.orderBy("vid")


def q_opic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """OPIC crawl priorities (algorithms/opic.py crawl_priorities) —
    8 synchronous cash-flow steps over the derived graph."""
    from linkgraph.algorithms.opic import crawl_priorities

    return crawl_priorities(build_graph(spark, sf_dir), iters=8).select(
        "vid", F.round("importance", 6).alias("importance6")
    )


def q_opic_warm(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Warm-started OPIC (opic.py ``init_state``): 5 cold + 3 warm
    cash-flow steps ≡ 8 cold steps (memoryless state, simplex rescale
    divides by a Σ within fp-ulps of 1 — absorbed by the 6-decimal
    rounding).  Oracle = the same ``opic8`` unrolled twin; importance is
    the paper's (hist + cash)/(iters + 1) over the TOTAL 8 steps."""
    from linkgraph.algorithms.opic import opic

    g = build_graph(spark, sf_dir)
    head = opic(g, iters=5)
    res = opic(g, iters=3, init_state=head.state)
    return res.state.select(
        "vid",
        F.round((F.col("hist") + F.col("cash")) / F.lit(9.0), 6).alias(
            "importance6"
        ),
    )


def _recency_pagerank_unrolled_sql(iters: int = 10, alpha: float = 0.85) -> str:
    """Recency-weighted power iteration over the full vertex graph,
    unrolled.  Twin of ``q_recency_pagerank``: each source page gets a
    synthetic capture warc_ts = 2024-01-01 + (doc_id % 365) days; edge
    weight = 1 / (1 + age_days/30) aged against 2025-01-01 (computed
    with real date arithmetic on BOTH engines — exact integer day
    counts, so the weight doubles are bit-identical); walk probability
    w/Σ_out w; dangling mass redistributed uniformly (same probability
    form as the engine's PageRank)."""
    w_expr = (
        "1.0 / (1.0 + date_diff('day', "
        "TIMESTAMP '2024-01-01' + INTERVAL (e.src % 365) DAY, "
        "TIMESTAMP '2025-01-01') / 30.0)"
    )
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        # EDGE_SQL already defines nn (= COUNT(*) FROM documents) — reuse
        f"we AS MATERIALIZED (SELECT e.src, e.dst, {w_expr} AS w FROM edges e),",
        "wdeg AS MATERIALIZED (SELECT src AS vid, SUM(w) AS wsum FROM we GROUP BY src),",
        "p0 AS MATERIALIZED (SELECT doc_id AS vid, 1.0 / nn.n AS r FROM documents CROSS JOIN nn),",
    ]
    for i in range(1, iters + 1):
        prev = f"p{i - 1}"
        parts.append(
            f"""dang{i} AS (
  SELECT COALESCE(SUM(p.r), 0.0) AS d FROM {prev} p
  LEFT JOIN wdeg ON wdeg.vid = p.vid WHERE wdeg.vid IS NULL
),
p{i} AS MATERIALIZED (
  SELECT v.vid,
         {1 - alpha} / nn.n + {alpha} * (COALESCE(s.m, 0.0) + dd.d / nn.n) AS r
  FROM {prev} v CROSS JOIN nn CROSS JOIN dang{i} dd
  LEFT JOIN (
    SELECT we.dst AS vid, SUM(p.r * we.w / wdeg.wsum) AS m
    FROM we JOIN {prev} p ON p.vid = we.src JOIN wdeg ON wdeg.vid = we.src
    GROUP BY we.dst
  ) s ON s.vid = v.vid
),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT vid, ROUND(r, 6) AS rank6 FROM p{iters} ORDER BY vid"
    )
    return "\n".join(parts)


def q_recency_pagerank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Freshness-weighted PageRank: the crawl's warc_ts drives the walk
    (a link from a recently captured page carries more weight — the
    standard freshness prior of production web ranking).  Capture times
    are synthesized deterministically (warc_ts = 2024-01-01 +
    doc_id%365 days) so the DuckDB twin unrolls the same weighted power
    iteration with REAL date arithmetic on both sides."""
    from linkgraph.algorithms.pagerank import pagerank
    from linkgraph.graph import Graph

    e = build_edges_df(spark, sf_dir)
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    warc_ts = F.expr(
        "timestampadd(DAY, CAST(src % 365 AS INT), TIMESTAMP '2024-01-01')"
    )
    age_days = F.datediff(
        F.lit("2025-01-01").cast("date"), warc_ts.cast("date")
    )
    w = F.lit(1.0) / (F.lit(1.0) + age_days.cast("double") / F.lit(30.0))
    we = (
        e.select("src", "dst", w.alias("w"))
        .repartition(parts, "src")
        .sortWithinPartitions("src", "dst")
    )
    g = Graph(we, parts)
    res = pagerank(g, alpha=0.85, tol=0.0, max_iters=10, weight_col="w")
    return res.state.select("vid", F.round("rank", 6).alias("rank6"))


# Snapshot churn: epoch B = thinned epoch A plus a deterministic batch
# of reversed links from every 11th source (so added/removed/common are
# all non-trivially non-zero).
SNAPSHOT_DIFF_SQL = f"""
WITH {EDGE_SQL.strip()},
newe AS (
  SELECT DISTINCT src, dst FROM (
    SELECT src, dst FROM edges WHERE src % 5 <> 0
    UNION ALL
    SELECT dst AS src, src AS dst FROM edges WHERE src % 11 = 0
  ) u
),
o AS (SELECT src, dst, 1 AS _o FROM edges),
n AS (SELECT src, dst, 1 AS _n FROM newe),
j AS (
  SELECT COALESCE(o._o, 0) AS _o, COALESCE(n._n, 0) AS _n
  FROM o FULL OUTER JOIN n ON o.src = n.src AND o.dst = n.dst
)
SELECT CAST(SUM(_o) AS BIGINT) AS n_old,
       CAST(SUM(_n) AS BIGINT) AS n_new,
       CAST(SUM(CASE WHEN _o = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_added,
       CAST(SUM(CASE WHEN _n = 0 THEN 1 ELSE 0 END) AS BIGINT) AS n_removed,
       CAST(SUM(_o * _n) AS BIGINT) AS n_common,
       ROUND(CAST(SUM(_o * _n) AS DOUBLE)
             / (SUM(_o) + SUM(_n) - SUM(_o * _n)), 6) AS jaccard
FROM j
"""


# Host-keyed C4-enriched documents (same arithmetic host mapping as
# HOST_PAIRS_SQL; same shared enrichment as the c4_filters entry).
HOST_QUALITY_DOCS_SQL = (
    "SELECT doc_id, 'site' || CAST(doc_id % 20 AS STRING) || '.example' AS host, text "
    "FROM (" + C4_DOCS_SQL.strip() + ") t"
)

_HQ_KEEP = (
    "CAST(len(regexp_extract_all(text, '[.!?]')) >= 3\n"
    "     AND NOT contains(lower(text), 'lorem ipsum')\n"
    "     AND NOT contains(text, '{') AS INT)"
)
HOST_QUALITY_SQL = (
    "WITH docs AS (" + HOST_QUALITY_DOCS_SQL + "),\n"
    "per_doc AS (\n"
    "  SELECT doc_id, host,\n"
    "    " + _HQ_KEEP + " AS keep,\n"
    "    len(regexp_extract_all(text, '\\S+')) AS n_tokens,\n"
    "    md5(text) AS h\n"
    "  FROM docs\n"
    "),\n"
    "dups AS (\n"
    "  SELECT doc_id FROM per_doc\n"
    "  WHERE h IN (SELECT h FROM per_doc GROUP BY h HAVING COUNT(*) >= 2)\n"
    ")\n"
    "SELECT host,\n"
    "  CAST(COUNT(*) AS BIGINT) AS n_docs,\n"
    "  CAST(SUM(keep) AS BIGINT) AS n_keep,\n"
    "  ROUND(CAST(SUM(keep) AS DOUBLE) / COUNT(*), 6) AS keep_rate,\n"
    "  ROUND(AVG(CAST(n_tokens AS DOUBLE)), 6) AS avg_tokens,\n"
    "  CAST(SUM(CASE WHEN d.doc_id IS NOT NULL THEN 1 ELSE 0 END) AS BIGINT) AS n_dup_docs\n"
    "FROM per_doc p LEFT JOIN dups d USING (doc_id)\n"
    "GROUP BY host ORDER BY host"
)


# Contraction/punct enrichment so the BPE-vs-whitespace gap is
# non-trivial.  Shared verbatim by both engines: escape-free except the
# '' doubled quote, which Spark SQL and DuckDB both take as a literal
# apostrophe.
BPE_DOCS_SQL = (
    "SELECT doc_id, text ||"
    " CASE WHEN doc_id % 3 = 0 THEN ' don''t it''s we''ll (42).' ELSE '' END"
    " AS text FROM documents"
)

# Oracle built by interpolating the ENGINE's pattern constant (quotes
# doubled for the SQL literal) — the two sides cannot drift.
_BPE_CNT = (
    "len(regexp_extract_all(text, '"
    + BPE_PIECE_RE.replace("'", "''")
    + "'))"
)
_WORD_CNT = r"len(regexp_extract_all(text, '\S+'))"
BPE_PIECES_SQL = (
    "WITH docs AS (" + BPE_DOCS_SQL + ")\n"
    "SELECT doc_id,\n"
    f"  CAST({_BPE_CNT} AS BIGINT) AS n_pieces,\n"
    f"  CAST({_WORD_CNT} AS BIGINT) AS n_words,\n"
    f"  ROUND(CASE WHEN {_WORD_CNT} > 0 THEN\n"
    f"    CAST({_BPE_CNT} AS DOUBLE) / {_WORD_CNT} ELSE 0.0 END, 6) AS pieces_per_word,\n"
    f"  ROUND(CASE WHEN {_BPE_CNT} > 0 THEN\n"
    f"    CAST(length(text) AS DOUBLE) / {_BPE_CNT} ELSE 0.0 END, 6) AS chars_per_piece\n"
    "FROM docs ORDER BY doc_id"
)


def q_bpe_pieces(spark: SparkSession, sf_dir: str) -> DataFrame:
    """BPE-ish piece accounting (textops/quality.py bpe_piece_stats)
    over contraction-enriched documents."""
    from linkgraph.textops.quality import bpe_piece_stats

    _load(spark, sf_dir, "documents")
    return bpe_piece_stats(spark.sql(BPE_DOCS_SQL))


def q_host_quality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host curation rollup (textops/corpus.py host_rollup) over the
    C4-enriched, host-keyed documents."""
    from linkgraph.textops.corpus import host_rollup

    _load(spark, sf_dir, "documents")
    return host_rollup(spark.sql(HOST_QUALITY_DOCS_SQL))


def q_snapshot_diff(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Crawl-epoch edge churn (streaming.py snapshot_diff) between the
    derived edges and a deterministically perturbed second epoch."""
    from linkgraph.streaming import snapshot_diff

    e = build_edges_df(spark, sf_dir)
    new = (
        e.where(F.col("src") % 5 != 0)
        .unionAll(
            e.where(F.col("src") % 11 == 0).select(
                F.col("dst").alias("src"), F.col("src").alias("dst")
            )
        )
        .dropDuplicates(["src", "dst"])
    )
    return snapshot_diff(e, new)


def q_hygiene(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Encoding-hygiene scan (textops/quality.py encoding_hygiene) over
    documents enriched with deterministic decode-failure artifacts."""
    from linkgraph.textops.quality import encoding_hygiene

    _load(spark, sf_dir, "documents")
    return encoding_hygiene(spark.sql(HYGIENE_DOCS_SQL))


def q_triad_census(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Directed triangle census (algorithms/triangles.py triad_census)."""
    from linkgraph.algorithms.triangles import triad_census

    return triad_census(build_graph(spark, sf_dir))


def q_bipartite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-component bipartiteness (graphstats.py bipartite_components)."""
    from linkgraph.algorithms.graphstats import bipartite_components

    return bipartite_components(build_graph(spark, sf_dir))


def q_condensation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCC condensation DAG layering (algorithms/scc.py
    condensation_levels) on the same thinned graph as the scc entry."""
    from linkgraph.algorithms.scc import condensation_levels

    return condensation_levels(_thinned_graph(spark, sf_dir))


def q_powerlaw(spark: SparkSession, sf_dir: str) -> DataFrame:
    """In-degree power-law MLE (algorithms/graphstats.py powerlaw_alpha)."""
    from linkgraph.algorithms.graphstats import powerlaw_alpha

    return powerlaw_alpha(build_graph(spark, sf_dir), xmin=2)


def q_pii(spark: SparkSession, sf_dir: str) -> DataFrame:
    """PII indicator scan (textops/quality.py pii_scan) over documents
    deterministically enriched with synthetic emails/IPs/phones (the
    shared PII_DOCS_SQL fragment) so counts are non-trivially non-zero."""
    from linkgraph.textops.quality import pii_scan

    _load(spark, sf_dir, "documents")
    return pii_scan(spark.sql(PII_DOCS_SQL))


def q_c4_filters(spark: SparkSession, sf_dir: str) -> DataFrame:
    """C4 line/page heuristics (textops/corpus.py c4_filters) over
    documents rewritten into multi-line pages (shared C4_DOCS_SQL)."""
    from linkgraph.textops.corpus import c4_filters

    _load(spark, sf_dir, "documents")
    return c4_filters(spark.sql(C4_DOCS_SQL))


# ---------------------------------------------------------------------------
# sessionization (events), mirror hosts, redirect resolution, landmark index
# ---------------------------------------------------------------------------

# gap-based sessionization twin (linkgraph/events.py session_stats):
# the gap compare is integer MICROSECONDS on both sides (unix_micros /
# epoch_us) — exact arithmetic, no float-epoch boundary flakiness.
# 6-hour gap: the driver events table's inter-event gaps have p10≈1.1h
# and median≈7.3h per user, so 6h yields a real mix of multi-event and
# singleton sessions (30min would make nearly every event a session).
SESSIONIZE_GAP_S = 21600

SESSIONIZE_SQL = f"""
WITH lagd AS (
  SELECT user_id, event_id, ts, value,
         LAG(ts) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_ts
  FROM events
),
flagged AS (
  SELECT user_id, event_id, ts, value,
         CASE WHEN prev_ts IS NULL
                   OR epoch_us(ts) - epoch_us(prev_ts) > {SESSIONIZE_GAP_S * 1_000_000}
              THEN 1 ELSE 0 END AS new_s
  FROM lagd
),
tagged AS (
  SELECT user_id, ts, value,
         SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                          ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM flagged
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq,
       CAST(COUNT(*) AS BIGINT) AS n,
       MIN(ts) AS start_ts, MAX(ts) AS end_ts,
       ROUND(SUM(value), 4) AS value_sum4
FROM tagged GROUP BY user_id, session_seq ORDER BY user_id, session_seq
"""


def q_sessionize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gap-based sessionization of the events log (events.py
    session_stats): ONE shuffle — the per-session agg reuses the
    sessionizing window's HashPartitioning(user_id)."""
    from linkgraph.events import session_stats

    _load(spark, sf_dir, "events")
    return session_stats(
        spark.table("events"), gap_seconds=SESSIONIZE_GAP_S
    ).select(
        "user_id",
        "session_seq",
        "n",
        "start_ts",
        "end_ts",
        F.round("value_sum", 4).alias("value_sum4"),
    )


# mirror-host detection twin (textops/dedup.py mirror_host_pairs) over
# the docs2 duplicated corpus; hosts synthesized as doc_id % 53 (53 is
# coprime-ish with the +1000000 dup offset — 1000000 % 53 = 49 — so a
# duplicate copy always lands on a DIFFERENT host than its original,
# which is exactly the mirror signal).
MIRROR_HOSTS_SQL = f"""
WITH {DOCS2_SQL.strip()},
fh AS (
  SELECT DISTINCT md5(text) AS fp,
         'h' || CAST(doc_id % 53 AS VARCHAR) AS host
  FROM docs2
),
ok AS (
  SELECT fp FROM fh GROUP BY fp HAVING COUNT(*) BETWEEN 2 AND 20
),
p AS (
  SELECT x.host AS host_a, y.host AS host_b
  FROM fh x JOIN fh y ON x.fp = y.fp AND x.host < y.host
  JOIN ok ON ok.fp = x.fp
)
SELECT host_a, host_b, CAST(COUNT(*) AS BIGINT) AS shared
FROM p GROUP BY host_a, host_b
ORDER BY host_a, host_b
"""


def q_mirror_hosts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mirror-site detection: host pairs sharing exact-content
    fingerprints (dedup.py mirror_host_pairs — md5-groupBy, capped
    host-set pair expansion, never corpus-quadratic)."""
    from linkgraph.textops.dedup import mirror_host_pairs

    docs = _docs2(spark, sf_dir).withColumn(
        "host", F.concat(F.lit("h"), (F.col("doc_id") % 53).cast("string"))
    )
    return mirror_host_pairs(docs, min_shared=1)


# redirect-chain synthesis: every doc_id ≡ 1 (mod 3) with doc_id ≥ 11
# redirects to a STRICTLY SMALLER id (acyclic by construction; chains
# arise when the target is itself ≡ 1 mod 3).  Shared fragment so the
# engine and the oracle derive byte-identical mappings.
REDIRECTS_SQL = """
redirects AS (
  SELECT CAST(doc_id AS BIGINT) AS src,
         CAST(doc_id - 1 - (doc_id % 10) AS BIGINT) AS dst
  FROM documents WHERE doc_id % 3 = 1 AND doc_id >= 11
)
"""

# recursive single-step walk twin of the engine's pointer DOUBLING
# (extract.py resolve_redirects): the walk follows one hop per level
# until the pointer leaves the redirect key set; the final row per src
# (max d) is the resolved target and d is the true chain length — the
# same (target, hops) the log-round doubling reports.
REDIRECT_RESOLVE_SQL = f"""
WITH RECURSIVE {REDIRECTS_SQL.strip()},
walk(src, cur, d) AS (
  SELECT src, dst, 1 FROM redirects
  UNION ALL
  SELECT w.src, r.dst, w.d + 1
  FROM walk w JOIN redirects r ON r.src = w.cur
  WHERE w.d < 64
),
fin AS (
  SELECT src, cur, d,
         ROW_NUMBER() OVER (PARTITION BY src ORDER BY d DESC) AS rn
  FROM walk
)
SELECT src AS vid, cur AS target, CAST(d AS BIGINT) AS hops
FROM fin WHERE rn = 1 ORDER BY vid
"""


def q_redirect_resolve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Redirect/canonical chain collapse by pointer doubling
    (extract.py resolve_redirects) — ⌈log₂ chain length⌉ self-join
    rounds over a constant-size (src, ptr) state."""
    from linkgraph.extract import resolve_redirects

    _load(spark, sf_dir, "documents")
    redirects = spark.sql(
        f"WITH {REDIRECTS_SQL.strip()} SELECT src, dst FROM redirects"
    )
    res = resolve_redirects(redirects)
    return res.where(F.col("resolved")).select(
        F.col("src").alias("vid"), "target", "hops"
    )


# landmark distance index twin (algorithms/bfs.py landmark_bfs): capped
# multi-landmark recursive walk over the symmetrized graph, min depth
# per (landmark, vid).  All four landmark ids exist at every sf (the
# driver documents table has 500 rows at each scale).
LANDMARK_SQL = f"""
WITH RECURSIVE {EDGE_SQL.strip()}, {SYM_SQL.strip()},
lms AS (SELECT CAST(doc_id AS BIGINT) AS lm FROM documents
        WHERE doc_id IN (0, 7, 13, 101)),
walk(lm, vid, d) AS (
  SELECT lm, lm, 0 FROM lms
  UNION
  SELECT w.lm, e.dst, w.d + 1
  FROM walk w JOIN sym e ON e.src = w.vid WHERE w.d < 64
)
SELECT lm AS landmark, vid, CAST(MIN(d) AS BIGINT) AS depth
FROM walk GROUP BY lm, vid ORDER BY landmark, vid
"""

LANDMARKS = (0, 7, 13, 101)


def q_landmark_distances(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Landmark distance index (bfs.py landmark_bfs): exact hop
    distances from 4 landmarks in ONE root-keyed BFS fixpoint — job
    count = eccentricity, independent of |landmarks|."""
    from linkgraph.algorithms.bfs import landmark_bfs

    g = build_graph(spark, sf_dir)
    return landmark_bfs(g, LANDMARKS, directed=False).select(
        "landmark", "vid", "depth"
    )


# ---------------------------------------------------------------------------
# butterflies (link-farm census), push-PPR, robots filter, token Zipf
# ---------------------------------------------------------------------------

# butterfly census twin (algorithms/triangles.py butterfly_count):
# identical out-degree cap (2..64) on the wedge center, integer
# division — the hash is exact, not approximate.
BUTTERFLIES_SQL = f"""
WITH {EDGE_SQL.strip()},
od AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
cap AS (SELECT src FROM od WHERE od BETWEEN 2 AND 64),
e2 AS (SELECT e.src, e.dst FROM edges e JOIN cap USING (src)),
w AS (
  SELECT x.dst AS d1, y.dst AS d2, COUNT(*) AS c
  FROM e2 x JOIN e2 y ON x.src = y.src AND x.dst < y.dst
  GROUP BY x.dst, y.dst
  HAVING COUNT(*) >= 2
)
SELECT CAST(COUNT(*) AS BIGINT) AS n_copairs,
       CAST(COALESCE(SUM((c * (c - 1)) // 2), 0) AS BIGINT) AS n_butterflies
FROM w
"""


def q_butterflies(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Butterfly ((2,2)-biclique) census — the link-farm density
    signal (triangles.py butterfly_count, hub-safe capped wedges)."""
    from linkgraph.algorithms.triangles import butterfly_count

    return butterfly_count(build_graph(spark, sf_dir), max_out_degree=64)


def _ppr_push_unrolled_sql(
    rounds: int, alpha: float, eps: float, src: int
) -> str:
    """Twin of algorithms/ppr.py ppr_push with ``rounds`` pinned: the
    same synchronous push rounds unrolled as CTEs.  The frontier test
    compares ROUND(r, 12) > eps·max(od,1) exactly as the engine does
    (quantized threshold — see ppr_push docstring), and every merge
    arm (settle α·r, zero pushed residuals, add incoming pushes,
    restart dangling mass at the source) is replayed with the same
    COALESCE structure, so the touched sets evolve identically."""
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        "od AS MATERIALIZED (SELECT src AS vid, COUNT(*) AS od FROM edges GROUP BY src),",
        f"s0 AS MATERIALIZED (SELECT CAST({src} AS BIGINT) AS vid, 0.0 AS p, 1.0 AS r),",
    ]
    for i in range(1, rounds + 1):
        prev = f"s{i - 1}"
        parts.append(
            f"""f{i} AS MATERIALIZED (
  SELECT s.vid, s.p, s.r, COALESCE(o.od, 0) AS od,
         (ROUND(s.r, 12) > {eps} * GREATEST(COALESCE(o.od, 0), 1)) AS push
  FROM {prev} s LEFT JOIN od o ON o.vid = s.vid
),
push{i} AS (
  SELECT e.dst AS vid, SUM({1 - alpha} * f.r / f.od) AS m
  FROM f{i} f JOIN edges e ON e.src = f.vid
  WHERE f.push AND f.od > 0 GROUP BY e.dst
),
dang{i} AS (
  SELECT COALESCE(SUM(r), 0.0) AS d FROM f{i} WHERE push AND od = 0
),
s{i} AS MATERIALIZED (
  SELECT COALESCE(f.vid, pu.vid) AS vid,
         COALESCE(f.p, 0.0)
           + CASE WHEN COALESCE(f.push, FALSE) THEN {alpha} * f.r ELSE 0.0 END AS p,
         CASE WHEN COALESCE(f.push, FALSE) THEN 0.0 ELSE COALESCE(f.r, 0.0) END
           + COALESCE(pu.m, 0.0)
           + CASE WHEN COALESCE(f.vid, pu.vid) = {src}
                  THEN {1 - alpha} * d.d ELSE 0.0 END AS r
  FROM f{i} f FULL OUTER JOIN push{i} pu ON pu.vid = f.vid CROSS JOIN dang{i} d
),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT vid, ROUND(p, 6) AS p6, ROUND(r, 6) AS r6 "
        f"FROM s{rounds} ORDER BY vid"
    )
    return "\n".join(parts)


def q_ppr_push(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-push PPR from vertex 0, 6 synchronous rounds (ppr.py
    ppr_push) — the work-proportional-to-mass-moved local algorithm;
    state covers TOUCHED vertices only."""
    from linkgraph.algorithms.ppr import ppr_push

    g = build_graph(spark, sf_dir)
    return (
        ppr_push(g, 0, alpha=0.15, eps=1e-4, rounds=6)
        .select(
            "vid",
            F.round("p", 6).alias("p6"),
            F.round("r", 6).alias("r6"),
        )
        .orderBy("vid")
    )


# robots synthesis shared by engine and twin: 53 hosts; even hosts
# disallow /p/ wholesale; hosts ≡ 0 (mod 3) carry BOTH an Allow and a
# Disallow for the LONGER prefix /p/1 (longest-match override + the
# RFC 9309 allow-wins-ties rule, both exercised); /private/ never
# matches (noise rule on every host).
ROBOTS_HOSTS_SQL = """
hosts AS (
  SELECT DISTINCT 'h' || CAST(doc_id % 53 AS STRING) || '.example' AS host,
         doc_id % 53 AS hid
  FROM documents
),
rules AS (
  SELECT host, '/p/' AS path_prefix, FALSE AS allow FROM hosts WHERE hid % 2 = 0
  UNION ALL
  SELECT host, '/p/1' AS path_prefix, TRUE AS allow FROM hosts WHERE hid % 3 = 0
  UNION ALL
  SELECT host, '/p/1' AS path_prefix, FALSE AS allow FROM hosts WHERE hid % 3 = 0
  UNION ALL
  SELECT host, '/private/' AS path_prefix, FALSE AS allow FROM hosts
),
urls AS (
  SELECT 'https://h' || CAST(doc_id % 53 AS STRING) || '.example/p/'
           || CAST(doc_id AS STRING) AS url,
         'h' || CAST(doc_id % 53 AS STRING) || '.example' AS host,
         '/p/' || CAST(doc_id AS STRING) AS path
  FROM documents
)
"""

ROBOTS_SQL = f"""
WITH {ROBOTS_HOSTS_SQL.strip()},
m AS (
  SELECT u.url, r.path_prefix, r.allow,
         ROW_NUMBER() OVER (
           PARTITION BY u.url
           ORDER BY length(r.path_prefix) DESC, CAST(r.allow AS INT) DESC
         ) AS rn
  FROM urls u
  JOIN rules r ON r.host = u.host AND starts_with(u.path, r.path_prefix)
)
SELECT u.url, COALESCE(m.allow, TRUE) AS allowed,
       m.path_prefix AS matched_prefix
FROM urls u LEFT JOIN m ON m.url = u.url AND m.rn = 1
ORDER BY u.url
"""


def q_robots_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFC 9309 longest-match robots filtering (extract.py
    robots_allowed) over synthesized per-host rule groups."""
    from linkgraph.extract import robots_allowed

    _load(spark, sf_dir, "documents")
    rules = spark.sql(
        f"WITH {ROBOTS_HOSTS_SQL.strip()} "
        "SELECT host, path_prefix, allow FROM rules"
    )
    urls = spark.sql(
        f"WITH {ROBOTS_HOSTS_SQL.strip()} SELECT url FROM urls"
    )
    return robots_allowed(urls, rules).orderBy("url")


# token-frequency Zipf exponent twin (textops/corpus.py
# token_zipf_alpha over the raw documents table, xmin=2)
TOKEN_ZIPF_SQL = f"""
WITH toks AS (
  SELECT unnest({_CORPUS_TOKS}) AS term FROM documents
),
tf AS (SELECT term, COUNT(*) AS tf FROM toks GROUP BY term),
vocab AS (SELECT COUNT(*) AS v FROM tf)
SELECT CAST(2 AS BIGINT) AS xmin,
       CAST(v AS BIGINT) AS n_vocab,
       CAST(COUNT(*) AS BIGINT) AS n_tail,
       ROUND(1.0 + COUNT(*) / SUM(ln(tf / 1.5)), 6) AS alpha
FROM tf CROSS JOIN vocab WHERE tf >= 2 GROUP BY v
"""


def q_token_zipf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corpus term-frequency Zipf exponent (corpus.py
    token_zipf_alpha) — the one-number vocabulary-health check."""
    from linkgraph.textops.corpus import token_zipf_alpha

    _load(spark, sf_dir, "documents")
    return token_zipf_alpha(spark.table("documents"), xmin=2)


# ---------------------------------------------------------------------------
# HLL host cardinality, crawl-budget allocation, anchor entropy
# ---------------------------------------------------------------------------


def _hll_twin_sql() -> str:
    """Twin of extract.host_url_cardinality over the robots urls (plus
    an ``*all*`` union row so BOTH estimator branches run: per-host
    groups take the linear-counting small-range branch, the global
    group the raw-HLL branch).  Registers replay bit-for-bit (md5 hex
    CAST + integer CASEs); the branch compares the ROUNDED raw
    estimate exactly as the engine does; αm² is the engine's PYTHON
    float product repr'd, not re-derived in SQL (0.709*64*64 evaluated
    left-associatively is one ulp off 0.709*4096)."""
    from linkgraph.extract import (
        _HLL_ALPHA_64,
        _hll_pow2neg_sql,
        _hll_rank_sql,
    )

    am2 = repr(_HLL_ALPHA_64 * 64.0 * 64.0)
    rank = _hll_rank_sql("(h // 64)")
    p2 = _hll_pow2neg_sql("m_reg")
    raw = f"{am2} / (occ_sum + (64.0 - occupied))"
    return f"""
WITH {ROBOTS_HOSTS_SQL.strip()},
u2 AS (
  SELECT url, host FROM urls
  UNION ALL
  SELECT url, '*all*' AS host FROM urls
),
hx AS (
  SELECT host, CAST(concat('0x', substr(md5(url), 1, 8)) AS BIGINT) AS h
  FROM u2
),
regs AS (
  SELECT host, h % 64 AS bucket, MAX({rank}) AS m_reg
  FROM hx GROUP BY host, h % 64
),
ph AS (
  SELECT host, COUNT(*) AS occupied, SUM({p2}) AS occ_sum
  FROM regs GROUP BY host
)
SELECT host, CAST(occupied AS BIGINT) AS occupied,
       ROUND(CASE WHEN ROUND({raw}, 6) <= 160.0 AND (64.0 - occupied) > 0
                  THEN 64.0 * ln(64.0 / (64.0 - occupied))
                  ELSE {raw} END, 4) AS est4
FROM ph ORDER BY host
"""


def q_host_url_hll(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-host distinct-URL cardinality via the portable deterministic
    HLL sketch (extract.py host_url_cardinality) — plus a global
    ``*all*`` group so both estimator branches are value-hash-gated."""
    from linkgraph.extract import host_url_cardinality

    _load(spark, sf_dir, "documents")
    urls = spark.sql(
        f"WITH {ROBOTS_HOSTS_SQL.strip()} SELECT url, host FROM urls"
    )
    u2 = urls.unionAll(urls.select("url", F.lit("*all*").alias("host")))
    return host_url_cardinality(u2).select(
        "host", "occupied", F.round("est", 4).alias("est4")
    ).orderBy("host")


HOST_WEIGHTS_SQL = """
hw AS (
  SELECT 'h' || CAST(doc_id % 53 AS STRING) AS host,
         CAST(COUNT(*) AS DOUBLE) AS n
  FROM documents GROUP BY doc_id % 53
)
"""

CRAWL_BUDGET_SQL = f"""
WITH {HOST_WEIGHTS_SQL.strip()},
t AS (SELECT SUM(n) AS t FROM hw),
b AS (
  SELECT host, FLOOR(n * 777.0 / t.t) AS base,
         n * 777.0 / t.t - FLOOR(n * 777.0 / t.t) AS frac
  FROM hw CROSS JOIN t
),
u AS (SELECT SUM(base) AS used FROM b),
r AS (
  SELECT host, ROW_NUMBER() OVER (ORDER BY frac DESC, host ASC) AS rk FROM b
)
SELECT b.host AS host,
       CAST(b.base + CASE WHEN r.rk <= 777 - u.used THEN 1 ELSE 0 END
            AS BIGINT) AS slots
FROM b JOIN r ON r.host = b.host CROSS JOIN u ORDER BY b.host
"""


def q_crawl_budget(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder fetch-slot allocation (opic.py
    allocate_crawl_budget): 777 slots across the 53 synthetic hosts
    proportional to page count — Σslots = 777 exactly."""
    from linkgraph.algorithms.opic import allocate_crawl_budget

    _load(spark, sf_dir, "documents")
    hw = spark.sql(
        f"WITH {HOST_WEIGHTS_SQL.strip()} SELECT host, n FROM hw"
    )
    return allocate_crawl_budget(
        hw, 777, key_col="host", weight_col="n"
    ).orderBy("host")


# ONE definition of the arithmetic anchor-count relation (shared by
# the engine entry and the DuckDB twin — the anchor rule is
# load-bearing for oracle parity, so it must not exist as drift-prone
# copies; same rule as anchor_index's synthesized pages)
ANCHOR_COUNTS_SQL = """
SELECT e.dst AS target_id,
       'a' || CAST((e.src + e.dst) % 7 AS STRING) AS anchor,
       CAST(COUNT(*) AS DOUBLE) AS n
FROM edges e GROUP BY e.dst, (e.src + e.dst) % 7
"""

ANCHOR_ENTROPY_SQL = f"""
WITH {EDGE_SQL.strip()},
c AS ({ANCHOR_COUNTS_SQL.strip()})
SELECT target_id, CAST(COUNT(*) AS BIGINT) AS n_anchors,
       CAST(SUM(n) AS BIGINT) AS n_links,
       ROUND(ln(SUM(n)) - SUM(n * ln(n)) / SUM(n), 4) AS entropy4
FROM c GROUP BY target_id ORDER BY target_id
"""


def q_anchor_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-target anchor-text entropy (extract.py anchor_entropy) —
    the anchor-stuffing spam signal, over the same arithmetic anchor
    rule the `anchor_index` entry byte-gates through the real
    extractor."""
    from linkgraph.extract import anchor_entropy

    _load(spark, sf_dir, "documents")
    counts = spark.sql(
        f"WITH {EDGE_SQL.strip()} {ANCHOR_COUNTS_SQL.strip()}"
    )
    return (
        anchor_entropy(counts, target_col="target_id")
        .select(
            "target_id",
            "n_anchors",
            "n_links",
            F.round("entropy", 4).alias("entropy4"),
        )
        .orderBy("target_id")
    )


# ---------------------------------------------------------------------------
# training-mixture planning and dedup token accounting
# ---------------------------------------------------------------------------

# per-source weight = 1 + (index % 3); budget 30,000 tokens over a
# supply of ~1,250 tokens/source, so the plan mixes capped (deficit)
# and fractional-rate sources.  Targets (w/39·30000 ≈ 769/1538/2308)
# sit nowhere near the integer supplies, so the deficit compare has no
# float-boundary risk.
MIXTURE_BUDGET = 30_000

MIXTURE_SQL = f"""
WITH t AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(len({_CORPUS_TOKS})) AS BIGINT) AS tokens,
         1.0 + CAST(substr(source, 4) AS INT) % 3 AS w
  FROM documents GROUP BY source
),
s AS (SELECT SUM(w) AS ws FROM t)
SELECT source, n_docs, tokens,
       ROUND(LEAST(1.0, w / ws * {MIXTURE_BUDGET}.0 / tokens), 6) AS rate6,
       ROUND(LEAST(1.0, w / ws * {MIXTURE_BUDGET}.0 / tokens) * tokens, 6)
         AS kept6,
       (w / ws * {MIXTURE_BUDGET}.0 > tokens) AS deficit
FROM t CROSS JOIN s ORDER BY source
"""


def q_mixture_plan(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-mixture sampling plan (corpus.py mixture_plan): token
    targets ∝ per-source weights under a global budget, deficit
    sources surfaced."""
    from linkgraph.textops.corpus import mixture_plan

    _load(spark, sf_dir, "documents")
    docs = spark.table("documents")
    sources = sorted(
        r.source for r in docs.select("source").distinct().collect()
    )
    weights = {s: 1.0 + int(s[3:]) % 3 for s in sources}
    return (
        mixture_plan(docs, weights, MIXTURE_BUDGET)
        .select(
            "source",
            "n_docs",
            "tokens",
            F.round("rate", 6).alias("rate6"),
            F.round("kept_tokens", 6).alias("kept6"),
            "deficit",
        )
        .orderBy("source")
    )


# docs2 with the source column carried through (dup copies keep their
# original's source, so each source shows ~10% duplicate token mass)
DOCS2SRC_SQL = """
d2 AS (
  SELECT doc_id, text, source FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text, source
  FROM documents WHERE doc_id % 10 = 0
)
"""

DEDUP_SAVINGS_SQL = f"""
WITH {DOCS2SRC_SQL.strip()},
g AS (
  SELECT doc_id, source, len({_CORPUS_TOKS}) AS nt,
         MIN(doc_id) OVER (PARTITION BY md5(text)) AS gid
  FROM d2
)
SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
       CAST(SUM(nt) AS BIGINT) AS tokens,
       CAST(SUM(CASE WHEN doc_id <> gid THEN 1 ELSE 0 END) AS BIGINT)
         AS dup_docs,
       CAST(SUM(CASE WHEN doc_id <> gid THEN nt ELSE 0 END) AS BIGINT)
         AS dup_tokens,
       ROUND(CASE WHEN SUM(nt) > 0 THEN
             CAST(SUM(CASE WHEN doc_id <> gid THEN nt ELSE 0 END) AS DOUBLE)
             / SUM(nt) ELSE 0.0 END, 6) AS savings
FROM g GROUP BY source ORDER BY source
"""


def q_dedup_savings(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-dedup token accounting (corpus.py
    dedup_token_savings) over the duplicated docs2 corpus."""
    from linkgraph.textops.corpus import dedup_token_savings

    _load(spark, sf_dir, "documents")
    d2 = spark.sql(
        f"WITH {DOCS2SRC_SQL.strip()} SELECT doc_id, text, source FROM d2"
    )
    return dedup_token_savings(d2).orderBy("source")


def _sssp_converged_sql(rounds: int = 24) -> str:
    """Converged-distance twin for ``q_delta_sssp``: Bellman-Ford
    unrolled past the graph's weighted-hop diameter (extra rounds are
    idempotent — min-fold fixpoint), so it equals ANY exact SSSP
    algorithm's output; the engine side runs Δ-stepping, whose
    bucket/light/heavy schedule the oracle need not replay because the
    OUTPUT is algorithm-independent (convergence asserted in
    tests/test_traversal.py)."""
    return _sssp_unrolled_sql(rounds)


def q_delta_sssp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Δ-stepping SSSP (sssp.py delta_stepping, Δ=4 so the 1..10
    weights split into real light/heavy classes) run to settlement —
    same weights as `sssp7`, exact converged distances."""
    from linkgraph.algorithms.sssp import delta_stepping

    res = delta_stepping(
        _weighted_graph(spark, sf_dir), 0, delta=4.0, weight_col="w"
    )
    return res.state.select("vid", F.round("dist", 6).alias("dist6"))
