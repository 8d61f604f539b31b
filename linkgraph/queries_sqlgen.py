"""Oracle SQL builders (DuckDB dialect where the Spark/DuckDB
shared subset is not enough) — graph-algorithm unrolls, dedup/ANN/
corpus twins.  Split from the flat queries.py (VERDICT r03 #8); the
public surface is unchanged: linkgraph.queries re-exports everything.
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
    CANON_SQL,
    DOCS2_SQL,
    EDGE_SQL,
    EDGE_WEIGHT_SQL,
    EMB2_SQL,
    SYM_SQL,
    build_graph,
)



# ---------------------------------------------------------------------------
# oracle SQL builders (DuckDB dialect where the shared subset isn't enough)
# ---------------------------------------------------------------------------


def _pagerank_unrolled_sql(iters: int = 10, alpha: float = 0.85) -> str:
    """Power iteration unrolled as chained CTEs (no dangling vertices by
    construction: every doc has outdeg ≥ 1 under EDGE_SQL)."""
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        # MATERIALIZED: DuckDB expands plain CTEs once PER REFERENCE; an
        # unrolled power iteration references each level 2x, making the
        # expansion (and parquet opens) exponential in iters without it.
        "e2 AS MATERIALIZED (SELECT src, dst FROM edges),",
        "deg AS MATERIALIZED (SELECT src AS vid, COUNT(*) AS outdeg FROM e2 GROUP BY src),",
        "p0 AS MATERIALIZED (SELECT d.doc_id AS vid, 1.0 / nn.n AS r FROM documents d CROSS JOIN nn),",
    ]
    for i in range(1, iters + 1):
        prev = f"p{i - 1}"
        parts.append(
            f"""p{i} AS MATERIALIZED (
  SELECT v.vid, {1 - alpha} / nn.n + {alpha} * COALESCE(s.m, 0.0) AS r
  FROM {prev} v CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS vid, SUM({prev}.r / deg.outdeg) AS m
    FROM e2 e JOIN {prev} ON {prev}.vid = e.src JOIN deg ON deg.vid = e.src
    GROUP BY e.dst
  ) s ON s.vid = v.vid
),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT vid, ROUND(r, 6) AS rank6 FROM p{iters} ORDER BY vid"
    )
    return "\n".join(parts)


def _katz_unrolled_sql(iters: int = 8, alpha: float = 0.05, beta: float = 1.0) -> str:
    """Twin of ``q_katz``: K chained ``x' = α·Aᵀx + β`` rounds."""
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        "e2 AS MATERIALIZED (SELECT src, dst FROM edges),",
        f"k0 AS MATERIALIZED (SELECT d.doc_id AS vid, CAST({beta} AS DOUBLE) AS x FROM documents d),",
    ]
    for i in range(1, iters + 1):
        prev = f"k{i - 1}"
        parts.append(
            f"""k{i} AS MATERIALIZED (
  SELECT v.vid, {beta} + {alpha} * COALESCE(s.m, 0.0) AS x
  FROM {prev} v
  LEFT JOIN (
    SELECT e.dst AS vid, SUM({prev}.x) AS m
    FROM e2 e JOIN {prev} ON {prev}.vid = e.src
    GROUP BY e.dst
  ) s ON s.vid = v.vid
),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT vid, ROUND(x, 6) AS katz6 FROM k{iters} ORDER BY vid")
    return "\n".join(parts)


def _anf_rank_sql(k: int) -> str:
    """``rsum`` expression over sk0..sk{k-1}: Σ_j lowest-zero-bit rank,
    via the same exact 2^m mod 37 CASE as anf.rank_sum_col (no log2 —
    see anf.py module doc)."""
    from linkgraph.algorithms.anf import _POW2_MOD37

    whens = " ".join(f"WHEN {res} THEN {m}" for res, m in _POW2_MOD37.items())
    return " + ".join(
        f"(CASE (xor(sk{j} | (sk{j} + 1), sk{j}) % 37) {whens} END)"
        for j in range(k)
    )


def _anf_cte_parts(iters: int, k: int) -> list[str]:
    """Shared CTE chain for the ANF twins: a0 = md5-derived init bit
    (``h & -h``), a{i} = bit_or union over in-edges of a{i-1}."""

    def init(j: int) -> str:
        h = (
            f"CAST(concat('0x', substr(md5('{j}:' || "
            f"CAST(v.vid AS VARCHAR)), 1, 8)) AS BIGINT)"
        )
        return (
            f"(CASE WHEN {h} = 0 THEN CAST({1 << 31} AS BIGINT) "
            f"ELSE {h} & (-{h}) END) AS sk{j}"
        )

    inits = ",\n         ".join(init(j) for j in range(k))
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        "e2 AS MATERIALIZED (SELECT src, dst FROM edges),",
        f"""a0 AS MATERIALIZED (
  SELECT v.vid,
         {inits}
  FROM (SELECT d.doc_id AS vid FROM documents d) v
),""",
    ]
    news = ",\n         ".join(
        f"v.sk{j} | COALESCE(s.m{j}, 0) AS sk{j}" for j in range(k)
    )
    ors = ", ".join(f"bit_or(p.sk{j}) AS m{j}" for j in range(k))
    for i in range(1, iters + 1):
        prev = f"a{i - 1}"
        parts.append(
            f"""a{i} AS MATERIALIZED (
  SELECT v.vid,
         {news}
  FROM {prev} v
  LEFT JOIN (
    SELECT e.dst AS vid, {ors}
    FROM e2 e JOIN {prev} p ON p.vid = e.src
    GROUP BY e.dst
  ) s ON s.vid = v.vid
),"""
        )
    return parts


def _anf_unrolled_sql(iters: int = 4, k: int = 4) -> str:
    """Twin of ``q_anf4`` (algorithms/anf.py): FM sketch propagation
    unrolled — same md5-derived init bit (``h & -h``), same per-round
    ``bit_or`` union over in-edges, same exact ``2^m mod 37`` rank CASE
    (no floats anywhere; see anf.py module doc for why log2 is avoided)."""
    parts = _anf_cte_parts(iters, k)
    parts[-1] = parts[-1].rstrip(",")
    sks = ", ".join(f"sk{j}" for j in range(k))
    parts.append(
        f"SELECT vid, {sks}, CAST({_anf_rank_sql(k)} AS INT) AS rsum "
        f"FROM a{iters} ORDER BY vid"
    )
    return "\n".join(parts)


def _harmonic_unrolled_sql(iters: int = 8, k: int = 4) -> str:
    """Twin of ``q_harmonic8`` (anf.harmonic_centrality): the same
    sketch CTE chain, a per-round rsum level, then the HyperBall
    accumulation ``Σ_t (n̂_t − n̂_{t−1})/t`` summed LEFT-ASSOCIATIVELY
    from 0.0 — the exact float-op order of the engine's per-round
    ``hc += Δ/t`` — with the estimate decomposed as exact 2^⌊rsum/k⌋
    (integer CASE) × literal 2^((rsum mod k)/k) / φ, never a fractional
    pow (1-ulp pow differences across engines would break the hash
    match; see anf.ball_estimate_col)."""
    from linkgraph.algorithms.anf import _POW2_FLOAT, FM_PHI, frac_pow2_consts

    parts = _anf_cte_parts(iters, k)
    rsum = _anf_rank_sql(k)
    for i in range(0, iters + 1):
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT vid, CAST({rsum} AS INT) "
            f"AS rsum FROM a{i}),"
        )
    parts[-1] = parts[-1].rstrip(",")

    # literals go through CAST(... AS DOUBLE): DuckDB parses a bare
    # 17-digit decimal literal as DECIMAL and overflows the CASE
    # multiplication; the cast is the correctly-rounded nearest double —
    # the identical bits Spark's F.lit(float) carries
    def dbl(v: float) -> str:
        return f"CAST({v!r} AS DOUBLE)"

    pw = " ".join(f"WHEN {m} THEN {dbl(v)}" for m, v in _POW2_FLOAT.items())
    qw = " ".join(
        f"WHEN {j} THEN {dbl(v)}" for j, v in enumerate(frac_pow2_consts(k))
    )

    def est(tbl: str) -> str:
        rs = f"{tbl}.rsum"
        whole = f"CAST(({rs} - ({rs} % {k})) / {k} AS INT)"
        return (
            f"(CASE {whole} {pw} END) * (CASE ({rs} % {k}) {qw} END) "
            f"/ {dbl(FM_PHI)}"
        )

    hc = dbl(0.0)
    for t in range(1, iters + 1):
        hc = f"({hc} + (({est(f'r{t}')}) - ({est(f'r{t - 1}')})) / {dbl(float(t))})"
    joins = " ".join(
        f"JOIN r{i} ON r{i}.vid = r0.vid" for i in range(1, iters + 1)
    )
    parts.append(
        f"SELECT r0.vid, ROUND({hc}, 6) AS harmonic6 "
        f"FROM r0 {joins} ORDER BY r0.vid"
    )
    return "\n".join(parts)


def _closeness_unrolled_sql(iters: int = 8, k: int = 4) -> str:
    """Twin of ``q_closeness8`` (anf.closeness_centrality): the same
    sketch CTE chain as the harmonic twin, with the sum-of-distances
    fold ``sd = Σ_t (n̂_t − n̂_{t−1})·t`` (left-associative from 0.0 —
    the engine's per-round ``sd += Δ·t`` float-op order) and
    ``closeness = (n̂_T − n̂_0) / sd`` (0 when sd ≤ 0)."""
    from linkgraph.algorithms.anf import _POW2_FLOAT, FM_PHI, frac_pow2_consts

    parts = _anf_cte_parts(iters, k)
    rsum = _anf_rank_sql(k)
    for i in range(0, iters + 1):
        parts.append(
            f"r{i} AS MATERIALIZED (SELECT vid, CAST({rsum} AS INT) "
            f"AS rsum FROM a{i}),"
        )
    parts[-1] = parts[-1].rstrip(",")

    def dbl(v: float) -> str:
        return f"CAST({v!r} AS DOUBLE)"

    pw = " ".join(f"WHEN {m} THEN {dbl(v)}" for m, v in _POW2_FLOAT.items())
    qw = " ".join(
        f"WHEN {j} THEN {dbl(v)}" for j, v in enumerate(frac_pow2_consts(k))
    )

    def est(tbl: str) -> str:
        rs = f"{tbl}.rsum"
        whole = f"CAST(({rs} - ({rs} % {k})) / {k} AS INT)"
        return (
            f"(CASE {whole} {pw} END) * (CASE ({rs} % {k}) {qw} END) "
            f"/ {dbl(FM_PHI)}"
        )

    sd = dbl(0.0)
    for t in range(1, iters + 1):
        sd = f"({sd} + (({est(f'r{t}')}) - ({est(f'r{t - 1}')})) * {dbl(float(t))})"
    reached = f"(({est(f'r{iters}')}) - ({est('r0')}))"
    joins = " ".join(
        f"JOIN r{i} ON r{i}.vid = r0.vid" for i in range(1, iters + 1)
    )
    parts.append(
        f"SELECT r0.vid, ROUND(CASE WHEN {sd} > {dbl(0.0)} "
        f"THEN {reached} / {sd} ELSE {dbl(0.0)} END, 6) AS closeness6 "
        f"FROM r0 {joins} ORDER BY r0.vid"
    )
    return "\n".join(parts)


def _random_walks_unrolled_sql(steps: int = 5, seed: int = 0) -> str:
    """Twin of ``q_random_walks``: same edge index (dense dst-rank per
    src), same multiplicative-hash neighbor pick, one CTE per step;
    walks truncate at dangling vertices via the inner join."""
    from linkgraph.algorithms.walks import WALK_A1, WALK_A2, WALK_P

    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        "ie AS MATERIALIZED (SELECT src, ROW_NUMBER() OVER "
        "(PARTITION BY src ORDER BY dst) - 1 AS idx, dst FROM edges),",
        "deg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),",
        "w0 AS MATERIALIZED (SELECT d.doc_id AS walk_id, d.doc_id AS vid "
        "FROM documents d WHERE d.doc_id % 10 = 0),",
    ]
    for t in range(1, steps + 1):
        parts.append(
            f"""w{t} AS MATERIALIZED (
  SELECT w.walk_id, ie.dst AS vid
  FROM w{t - 1} w
  JOIN deg ON deg.src = w.vid
  JOIN ie ON ie.src = w.vid
         AND ie.idx = ((w.walk_id * {WALK_A1} + {t * WALK_A2 + seed}) % {WALK_P}) % deg.outdeg
),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    selects = " UNION ALL ".join(
        f"SELECT walk_id, CAST({t} AS INT) AS step, vid FROM w{t}"
        for t in range(steps + 1)
    )
    parts.append(selects + " ORDER BY walk_id, step")
    return "\n".join(parts)


def _node2vec_walks_unrolled_sql(
    steps: int = 4,
    p: float = 4.0,
    q: float = 0.25,
    seed: int = 0,
    attempts: int = 4,
) -> str:
    """Twin of ``q_node2vec_walks``: replays the deterministic rejection
    sampler bit-for-bit — same edge index, same int64 hash choices, same
    fixed-point acceptance test, same first-accepted-else-attempt-0 pick
    (arg_min over the shifted attempt key)."""
    from linkgraph.algorithms.walks import (
        WALK_A1,
        WALK_A2,
        WALK_A3,
        WALK_P,
        _n2v_weights,
    )

    wp, w1, wq, wmax = _n2v_weights(p, q)
    att_vals = ",".join(f"({a})" for a in range(attempts))
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        "ie AS MATERIALIZED (SELECT src, ROW_NUMBER() OVER "
        "(PARTITION BY src ORDER BY dst) - 1 AS idx, dst FROM edges),",
        "deg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),",
        f"att AS (SELECT a FROM (VALUES {att_vals}) AS t(a)),",
        "w0 AS MATERIALIZED (SELECT d.doc_id AS walk_id, d.doc_id AS prev, "
        "d.doc_id AS vid FROM documents d WHERE d.doc_id % 20 = 0),",
        # step 1: uniform first-order pick (no previous vertex yet)
        f"""w1 AS MATERIALIZED (
  SELECT w.walk_id, w.vid AS prev, ie.dst AS vid
  FROM w0 w
  JOIN deg ON deg.src = w.vid
  JOIN ie ON ie.src = w.vid
         AND ie.idx = ((w.walk_id * {WALK_A1} + {WALK_A2 + seed}) % {WALK_P}) % deg.outdeg
),""",
    ]
    for t in range(2, steps + 1):
        parts.append(
            f"""c{t} AS (
  SELECT w.walk_id, w.vid, a.a, ie.dst AS cand,
         CASE WHEN ie.dst = w.prev THEN {wp}
              WHEN e2.src IS NOT NULL THEN {w1}
              ELSE {wq} END AS wgt
  FROM w{t - 1} w
  JOIN deg ON deg.src = w.vid
  CROSS JOIN att a
  JOIN ie ON ie.src = w.vid
         AND ie.idx = ((w.walk_id * {WALK_A1} + a.a * {WALK_A3} + {t * WALK_A2 + seed}) % {WALK_P}) % deg.outdeg
  LEFT JOIN edges e2 ON e2.src = w.prev AND e2.dst = ie.dst
),
w{t} AS MATERIALIZED (
  SELECT walk_id, vid AS prev,
         arg_min(cand, CASE WHEN ((walk_id * {WALK_A2} + a * {WALK_A3} + {t * WALK_A1 + seed}) % {WALK_P}) % {wmax} < wgt
                            THEN a ELSE a + {attempts} END) AS vid
  FROM c{t} GROUP BY walk_id, vid
),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    selects = " UNION ALL ".join(
        f"SELECT walk_id, CAST({t} AS INT) AS step, vid FROM w{t}"
        for t in range(steps + 1)
    )
    parts.append(selects + " ORDER BY walk_id, step")
    return "\n".join(parts)


def _weighted_walks_unrolled_sql(
    steps: int = 4, seed: int = 0, attempts: int = 4
) -> str:
    """Twin of ``q_weighted_walks``: same synthesized integer weights
    (1 + (src·7 + dst·13) mod 5), same integer acceptance thresholds
    ⌊w·SCALE/wmax⌋, same hash draws and arg_min first-accepted pick."""
    from linkgraph.algorithms.walks import (
        N2V_SCALE,
        WALK_A1,
        WALK_A2,
        WALK_A3,
        WALK_P,
    )

    att_vals = ",".join(f"({a})" for a in range(attempts))
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        "ie AS (SELECT src, ROW_NUMBER() OVER "
        "(PARTITION BY src ORDER BY dst) - 1 AS idx, dst FROM edges),",
        "wt AS (SELECT src, dst, CAST(1 + (src * 7 + dst * 13) % 5 AS BIGINT) AS w FROM edges),",
        f"""iw AS MATERIALIZED (
  SELECT ie.src, ie.idx, ie.dst,
         (wt.w * {N2V_SCALE}) // MAX(wt.w) OVER (PARTITION BY ie.src) AS thr
  FROM ie JOIN wt ON wt.src = ie.src AND wt.dst = ie.dst
),""",
        "deg AS MATERIALIZED (SELECT src, COUNT(*) AS outdeg FROM edges GROUP BY src),",
        f"att AS (SELECT a FROM (VALUES {att_vals}) AS t(a)),",
        "w0 AS MATERIALIZED (SELECT d.doc_id AS walk_id, d.doc_id AS vid "
        "FROM documents d WHERE d.doc_id % 20 = 0),",
    ]
    for t in range(1, steps + 1):
        parts.append(
            f"""c{t} AS (
  SELECT w.walk_id, w.vid, a.a, iw.dst AS cand, iw.thr
  FROM w{t - 1} w
  JOIN deg ON deg.src = w.vid
  CROSS JOIN att a
  JOIN iw ON iw.src = w.vid
         AND iw.idx = ((w.walk_id * {WALK_A1} + a.a * {WALK_A3} + {t * WALK_A2 + seed}) % {WALK_P}) % deg.outdeg
),
w{t} AS MATERIALIZED (
  SELECT walk_id,
         arg_min(cand, CASE WHEN ((walk_id * {WALK_A2} + a * {WALK_A3} + {t * WALK_A1 + seed}) % {WALK_P}) % {N2V_SCALE} < thr
                            THEN a ELSE a + {attempts} END) AS vid
  FROM c{t} GROUP BY walk_id, vid
),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    selects = " UNION ALL ".join(
        f"SELECT walk_id, CAST({t} AS INT) AS step, vid FROM w{t}"
        for t in range(steps + 1)
    )
    parts.append(selects + " ORDER BY walk_id, step")
    return "\n".join(parts)


def _host_pagerank_unrolled_sql(iters: int = 10, alpha: float = 0.85) -> str:
    """Weighted power iteration over the host rollup, unrolled.

    Twin of ``q_host_pagerank``: host vid = doc_id % 20, edge weight =
    inter-host link count, walk probability w/Σ_out w, dangling hosts'
    mass redistributed uniformly each iteration (same probability form
    as the engine's unweighted PageRank)."""
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        "he AS MATERIALIZED (SELECT src % 20 AS src, dst % 20 AS dst, "
        "CAST(COUNT(*) AS DOUBLE) AS w FROM edges "
        "WHERE src % 20 <> dst % 20 GROUP BY src % 20, dst % 20),",
        "hv AS MATERIALIZED (SELECT DISTINCT v FROM "
        "(SELECT src AS v FROM he UNION ALL SELECT dst AS v FROM he) u),",
        "hn AS (SELECT COUNT(*) AS n FROM hv),",
        "wdeg AS MATERIALIZED (SELECT src AS vid, SUM(w) AS wsum FROM he GROUP BY src),",
        "p0 AS MATERIALIZED (SELECT hv.v AS vid, 1.0 / hn.n AS r FROM hv CROSS JOIN hn),",
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
         {1 - alpha} / hn.n + {alpha} * (COALESCE(s.m, 0.0) + dd.d / hn.n) AS r
  FROM {prev} v CROSS JOIN hn CROSS JOIN dang{i} dd
  LEFT JOIN (
    SELECT he.dst AS vid, SUM(p.r * he.w / wdeg.wsum) AS m
    FROM he JOIN {prev} p ON p.vid = he.src JOIN wdeg ON wdeg.vid = he.src
    GROUP BY he.dst
  ) s ON s.vid = v.vid
),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT vid AS host_id, ROUND(r, 6) AS rank6 FROM p{iters} ORDER BY host_id"
    )
    return "\n".join(parts)


def _labelprop_cte_parts(iters: int = 3) -> list[str]:
    """Shared CTE chain for the LP twin and the community-quality twins
    (modularity / conductance score the SAME l{iters} assignment the
    ``labelprop3`` entry pins).  Every part keeps its trailing comma;
    consumers strip the last one before the final SELECT."""
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        SYM_SQL.strip() + ",",
        "s2 AS MATERIALIZED (SELECT src, dst FROM sym),",
        "l0 AS MATERIALIZED (SELECT doc_id AS vid, doc_id AS lab FROM documents),",
    ]
    for i in range(1, iters + 1):
        prev = f"l{i - 1}"
        parts.append(
            f"""l{i} AS MATERIALIZED (
  SELECT v.vid, COALESCE(b.lab, v.lab) AS lab
  FROM {prev} v LEFT JOIN (
    SELECT vid, lab FROM (
      SELECT c.vid, c.lab,
             ROW_NUMBER() OVER (PARTITION BY c.vid ORDER BY c.cnt DESC, c.lab ASC) AS rn
      FROM (
        SELECT e.dst AS vid, {prev}.lab AS lab, COUNT(*) AS cnt
        FROM s2 e JOIN {prev} ON {prev}.vid = e.src
        GROUP BY e.dst, {prev}.lab
      ) c
    ) rr WHERE rn = 1
  ) b ON b.vid = v.vid
),"""
        )
    return parts


def _labelprop_unrolled_sql(iters: int = 3) -> str:
    parts = _labelprop_cte_parts(iters)
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT vid, lab AS label FROM l{iters} ORDER BY vid")
    return "\n".join(parts)


def _lp_round_sql(name: str, prev: str, edges_cte: str) -> str:
    """One synchronous LP round as a CTE: mode of neighbor labels over
    ``edges_cte``, tie-break (cnt DESC, lab ASC), keep-own on isolated
    vertices — the exact round body of ``_labelprop_cte_parts``, with
    the edge table parameterized for the warm-start twin's two phases."""
    return f"""{name} AS MATERIALIZED (
  SELECT v.vid, COALESCE(b.lab, v.lab) AS lab
  FROM {prev} v LEFT JOIN (
    SELECT vid, lab FROM (
      SELECT c.vid, c.lab,
             ROW_NUMBER() OVER (PARTITION BY c.vid ORDER BY c.cnt DESC, c.lab ASC) AS rn
      FROM (
        SELECT e.dst AS vid, {prev}.lab AS lab, COUNT(*) AS cnt
        FROM {edges_cte} e JOIN {prev} ON {prev}.vid = e.src
        GROUP BY e.dst, {prev}.lab
      ) c
    ) rr WHERE rn = 1
  ) b ON b.vid = v.vid
),"""


def _labelprop_warm_sql(sub_iters: int = 2, iters: int = 3) -> str:
    """Twin of ``q_labelprop_warm``: LP's fixpoint is INIT-DEPENDENT
    (labelprop.py docstring), so the oracle replays the exact two-phase
    trajectory — ``sub_iters`` synchronous rounds over the
    (src+dst)%5≠0 edge subset (symmetric predicate, so filtering the
    symmetrized view equals symmetrizing the filtered edges — the
    engine's construction), then the full-graph run seeded from those
    labels (vertices outside the subset seed label = vid)."""
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        SYM_SQL.strip() + ",",
        "s2 AS MATERIALIZED (SELECT src, dst FROM sym),",
        "ssub AS MATERIALIZED "
        "(SELECT src, dst FROM sym WHERE (src + dst) % 5 <> 0),",
        "w0 AS MATERIALIZED "
        "(SELECT DISTINCT src AS vid, src AS lab FROM ssub),",
    ]
    for i in range(1, sub_iters + 1):
        parts.append(_lp_round_sql(f"w{i}", f"w{i - 1}", "ssub"))
    parts.append(
        f"""l0 AS MATERIALIZED (
  SELECT d.doc_id AS vid, COALESCE(w.lab, d.doc_id) AS lab
  FROM documents d LEFT JOIN w{sub_iters} w ON w.vid = d.doc_id
),"""
    )
    for i in range(1, iters + 1):
        parts.append(_lp_round_sql(f"l{i}", f"l{i - 1}", "s2"))
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT vid, lab AS label FROM l{iters} ORDER BY vid")
    return "\n".join(parts)


def _modularity_sql(iters: int = 3) -> str:
    """Twin of ``q_modularity``: Newman modularity of the l{iters} LP
    assignment.  All aggregation inputs are exact integer sums; the one
    float expression per community and the final Σ are replayed in the
    same shape as the engine (t·t, not POWER — pow(x, 2.0) is not
    guaranteed bit-identical across engines)."""
    parts = _labelprop_cte_parts(iters)
    parts.append(CANON_SQL.strip() + ",")
    parts.append(
        f"""labs AS (SELECT vid, lab AS label FROM l{iters}),
sdeg AS (SELECT src AS vid, COUNT(*) AS deg FROM sym GROUP BY src),
mm AS (SELECT CAST(COUNT(*) AS BIGINT) AS m FROM canon),
intra AS (
  SELECT la.label, CAST(COUNT(*) AS BIGINT) AS e_c
  FROM canon c
  JOIN labs la ON la.vid = c.a
  JOIN labs lb ON lb.vid = c.b
  WHERE la.label = lb.label
  GROUP BY la.label
),
vol AS (
  SELECT l.label, CAST(SUM(d.deg) AS BIGINT) AS d_c
  FROM labs l JOIN sdeg d ON d.vid = l.vid
  GROUP BY l.label
),
terms AS (
  SELECT CAST(COALESCE(i.e_c, 0) AS DOUBLE) / mm.m
         - (CAST(v.d_c AS DOUBLE) / (2.0 * mm.m))
           * (CAST(v.d_c AS DOUBLE) / (2.0 * mm.m)) AS term
  FROM vol v LEFT JOIN intra i ON i.label = v.label CROSS JOIN mm
)"""
    )
    parts.append(
        "SELECT mm.m AS m, "
        "(SELECT CAST(COUNT(*) AS BIGINT) FROM vol) AS n_communities, "
        "ROUND(SUM(term), 6) AS modularity "
        "FROM terms CROSS JOIN mm GROUP BY mm.m"
    )
    return "\n".join(parts)


def _conductance_sql(iters: int = 3, top_k: int = 20) -> str:
    """Twin of ``q_community_conductance``: cut / min(vol, 2m−vol) per
    community of the l{iters} LP assignment, top_k by (members DESC,
    label ASC)."""
    parts = _labelprop_cte_parts(iters)
    parts.append(
        f"""labs AS (SELECT vid, lab AS label FROM l{iters}),
tagged AS (
  SELECT la.label AS lab_s, lb.label AS lab_d
  FROM sym e
  JOIN labs la ON la.vid = e.src
  JOIN labs lb ON lb.vid = e.dst
),
per AS (
  SELECT lab_s AS label, CAST(COUNT(*) AS BIGINT) AS vol,
         CAST(SUM(CASE WHEN lab_s <> lab_d THEN 1 ELSE 0 END) AS BIGINT) AS cut
  FROM tagged GROUP BY lab_s
),
sizes AS (SELECT label, CAST(COUNT(*) AS BIGINT) AS members FROM labs GROUP BY label),
m2 AS (SELECT CAST(COUNT(*) AS BIGINT) AS m2 FROM sym)"""
    )
    parts.append(
        """SELECT s.label, s.members,
       CAST(COALESCE(p.vol, 0) AS BIGINT) AS vol,
       CAST(COALESCE(p.cut, 0) AS BIGINT) AS cut,
       ROUND(CASE WHEN LEAST(COALESCE(p.vol, 0), m2.m2 - COALESCE(p.vol, 0)) > 0
             THEN CAST(COALESCE(p.cut, 0) AS DOUBLE)
                  / LEAST(COALESCE(p.vol, 0), m2.m2 - COALESCE(p.vol, 0))
             ELSE 0.0 END, 6) AS conductance
FROM sizes s LEFT JOIN per p ON p.label = s.label CROSS JOIN m2
ORDER BY s.members DESC, s.label ASC LIMIT """
        + str(top_k)
    )
    return "\n".join(parts)


def _louvain_unrolled_sql(iters: int = 4) -> str:
    """Twin of ``q_louvain_lp4`` (community.modularity_lp): synchronous
    modularity-gain label propagation unrolled, with the engine's
    parity move schedule (round t moves only vids with
    ``vid % 2 = (t−1) % 2`` — breaks the synchronous swap oscillation).
    The argmax key ``2m·k − deg·(dc − [c = cur]·deg)`` is pure BIGINT —
    no float enters any comparison, so the per-vertex winner is
    bit-exact."""
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        SYM_SQL.strip() + ",",
        "s2 AS MATERIALIZED (SELECT src, dst FROM sym),",
        "sdeg AS MATERIALIZED (SELECT src AS vid, CAST(COUNT(*) AS BIGINT)"
        " AS deg FROM sym GROUP BY src),",
        "m2t AS (SELECT CAST(SUM(deg) AS BIGINT) AS m2 FROM sdeg),",
        "l0 AS MATERIALIZED (SELECT doc_id AS vid, doc_id AS lab FROM documents),",
    ]
    for i in range(1, iters + 1):
        prev = f"l{i - 1}"
        parts.append(
            f"""vol{i} AS MATERIALIZED (
  SELECT l.lab AS c, CAST(SUM(d.deg) AS BIGINT) AS dc
  FROM {prev} l JOIN sdeg d ON d.vid = l.vid GROUP BY l.lab
),
cand{i} AS MATERIALIZED (
  SELECT x.vid, x.c, MAX(x.k) AS k FROM (
    SELECT e.dst AS vid, l.lab AS c, CAST(COUNT(*) AS BIGINT) AS k
    FROM s2 e JOIN {prev} l ON l.vid = e.src GROUP BY e.dst, l.lab
    UNION ALL
    SELECT vid, lab AS c, CAST(0 AS BIGINT) AS k FROM {prev}
  ) x GROUP BY x.vid, x.c
),
l{i} AS MATERIALIZED (
  SELECT cur0.vid,
         CASE WHEN cur0.vid % 2 = {(i - 1) % 2} THEN w.lab ELSE cur0.lab END AS lab
  FROM {prev} cur0 LEFT JOIN (
    SELECT vid, c AS lab FROM (
      SELECT a.vid, a.c,
             ROW_NUMBER() OVER (PARTITION BY a.vid ORDER BY
               (mm.m2 * a.k
                - dv.deg * (v.dc - CASE WHEN a.c = cur.lab THEN dv.deg ELSE 0 END)) DESC,
               a.c ASC) AS rn
      FROM cand{i} a
      JOIN vol{i} v ON v.c = a.c
      JOIN sdeg dv ON dv.vid = a.vid
      JOIN {prev} cur ON cur.vid = a.vid
      CROSS JOIN m2t mm
    ) z WHERE rn = 1
  ) w ON w.vid = cur0.vid
),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT vid, lab AS label FROM l{iters} ORDER BY vid")
    return "\n".join(parts)


def _ppr_unrolled_sql(
    iters: int = 10, alpha: float = 0.85, seeds: tuple[int, ...] = (0, 1, 2)
) -> str:
    """Personalized PR unrolled (teleport uniform over seeds; the derived
    graph has no dangling vertices, so no dangling term)."""
    seed_list = ", ".join(str(s) for s in seeds)
    t = f"(CASE WHEN vid IN ({seed_list}) THEN 1.0/{len(seeds)} ELSE 0.0 END)"
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        "e2 AS MATERIALIZED (SELECT src, dst FROM edges),",
        "verts AS MATERIALIZED (SELECT DISTINCT vid FROM (SELECT src AS vid FROM e2 UNION ALL SELECT dst FROM e2) t),",
        "deg AS MATERIALIZED (SELECT src AS vid, COUNT(*) AS outdeg FROM e2 GROUP BY src),",
        f"p0 AS MATERIALIZED (SELECT vid, {t} AS r FROM verts),",
    ]
    for i in range(1, iters + 1):
        prev = f"p{i - 1}"
        parts.append(
            f"""p{i} AS MATERIALIZED (
  SELECT v.vid, {1 - alpha} * {t.replace('vid', 'v.vid')} + {alpha} * COALESCE(s.m, 0.0) AS r
  FROM verts v LEFT JOIN (
    SELECT e.dst AS vid, SUM({prev}.r / deg.outdeg) AS m
    FROM e2 e JOIN {prev} ON {prev}.vid = e.src JOIN deg ON deg.vid = e.src
    GROUP BY e.dst
  ) s ON s.vid = v.vid
),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT vid, ROUND(r, 6) AS rank6 FROM p{iters} ORDER BY vid")
    return "\n".join(parts)


def _spam_mass_sql(
    iters: int = 10,
    alpha: float = 0.85,
    seed_mod: int = 100,
    seed_cap: int = 64,
) -> str:
    """Twin of ``q_spam_mass`` (algorithms/trustrank.py): the ordinary
    power iteration AND the trust-restricted one unrolled side by side
    (same α, same rounds, same no-dangling derived graph), then the
    Gyöngyi mass estimator (p − t)/p joined per vertex."""
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        "e2 AS MATERIALIZED (SELECT src, dst FROM edges),",
        "deg AS MATERIALIZED (SELECT src AS vid, COUNT(*) AS outdeg FROM e2 GROUP BY src),",
        f"seeds AS MATERIALIZED (SELECT d.doc_id AS vid FROM documents d "
        f"WHERE d.doc_id % {seed_mod} = 0 ORDER BY d.doc_id LIMIT {seed_cap}),",
        "ns AS (SELECT COUNT(*) AS k FROM seeds),",
        "p0 AS MATERIALIZED (SELECT d.doc_id AS vid, 1.0 / nn.n AS r "
        "FROM documents d CROSS JOIN nn),",
        "t0 AS MATERIALIZED (SELECT d.doc_id AS vid, CASE WHEN d.doc_id IN "
        "(SELECT vid FROM seeds) THEN 1.0 / ns.k ELSE 0.0 END AS r "
        "FROM documents d CROSS JOIN ns),",
    ]
    tele = (
        "(CASE WHEN v.vid IN (SELECT vid FROM seeds) THEN 1.0 / ns.k "
        "ELSE 0.0 END)"
    )
    for i in range(1, iters + 1):
        pp, tp = f"p{i - 1}", f"t{i - 1}"
        parts.append(
            f"""p{i} AS MATERIALIZED (
  SELECT v.vid, {1 - alpha} / nn.n + {alpha} * COALESCE(s.m, 0.0) AS r
  FROM {pp} v CROSS JOIN nn
  LEFT JOIN (
    SELECT e.dst AS vid, SUM({pp}.r / deg.outdeg) AS m
    FROM e2 e JOIN {pp} ON {pp}.vid = e.src JOIN deg ON deg.vid = e.src
    GROUP BY e.dst
  ) s ON s.vid = v.vid
),
t{i} AS MATERIALIZED (
  SELECT v.vid, {1 - alpha} * {tele} + {alpha} * COALESCE(s.m, 0.0) AS r
  FROM {tp} v CROSS JOIN ns
  LEFT JOIN (
    SELECT e.dst AS vid, SUM({tp}.r / deg.outdeg) AS m
    FROM e2 e JOIN {tp} ON {tp}.vid = e.src JOIN deg ON deg.vid = e.src
    GROUP BY e.dst
  ) s ON s.vid = v.vid
),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"""SELECT p.vid, ROUND(p.r, 6) AS rank6, ROUND(t.r, 6) AS trust6,
       ROUND(CASE WHEN p.r > 0 THEN (p.r - t.r) / p.r ELSE 0.0 END, 6) AS mass6
FROM p{iters} p JOIN t{iters} t ON t.vid = p.vid ORDER BY p.vid"""
    )
    return "\n".join(parts)


def _hits_unrolled_sql(iters: int = 5) -> str:
    """HITS unrolled: auth from old hubs, L2-normalize, hubs from new
    auths, L2-normalize — the exact engine/oracle ordering."""
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        "e2 AS MATERIALIZED (SELECT src, dst FROM edges),",
        "verts AS MATERIALIZED (SELECT DISTINCT vid FROM (SELECT src AS vid FROM e2 UNION ALL SELECT dst FROM e2) t),",
        "h0 AS MATERIALIZED (SELECT vid, 1.0 AS h FROM verts),",
    ]
    for i in range(1, iters + 1):
        hp = f"h{i - 1}"
        parts.append(
            f"""ar{i} AS MATERIALIZED (
  SELECT v.vid, COALESCE(s.x, 0.0) AS a FROM verts v LEFT JOIN (
    SELECT e.dst AS vid, SUM({hp}.h) AS x FROM e2 e JOIN {hp} ON {hp}.vid = e.src GROUP BY e.dst
  ) s ON s.vid = v.vid
),
an{i} AS MATERIALIZED (SELECT sqrt(SUM(a * a)) AS n FROM ar{i}),
a{i} AS MATERIALIZED (SELECT vid, CASE WHEN n > 0 THEN a / n ELSE a END AS a FROM ar{i} CROSS JOIN an{i}),
hr{i} AS MATERIALIZED (
  SELECT v.vid, COALESCE(s.x, 0.0) AS h FROM verts v LEFT JOIN (
    SELECT e.src AS vid, SUM(a{i}.a) AS x FROM e2 e JOIN a{i} ON a{i}.vid = e.dst GROUP BY e.src
  ) s ON s.vid = v.vid
),
hn{i} AS MATERIALIZED (SELECT sqrt(SUM(h * h)) AS n FROM hr{i}),
h{i} AS MATERIALIZED (SELECT vid, CASE WHEN n > 0 THEN h / n ELSE h END AS h FROM hr{i} CROSS JOIN hn{i}),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT h{iters}.vid, ROUND(h{iters}.h, 6) AS hub6, ROUND(a{iters}.a, 6) AS auth6 "
        f"FROM h{iters} JOIN a{iters} ON a{iters}.vid = h{iters}.vid ORDER BY h{iters}.vid"
    )
    return "\n".join(parts)


def _eigen_unrolled_sql(iters: int = 6) -> str:
    """Eigenvector-centrality power iteration unrolled (algorithms/
    eigen.py): gather-sum from in-neighbors, L2 normalize, repeat."""
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        "e2 AS MATERIALIZED (SELECT src, dst FROM edges),",
        "verts AS MATERIALIZED (SELECT DISTINCT vid FROM (SELECT src AS vid FROM e2 UNION ALL SELECT dst FROM e2) t),",
        "x0 AS MATERIALIZED (SELECT vid, 1.0 AS x FROM verts),",
    ]
    for i in range(1, iters + 1):
        xp = f"x{i - 1}"
        parts.append(
            f"""r{i} AS MATERIALIZED (
  SELECT v.vid, COALESCE(s.x, 0.0) AS x FROM verts v LEFT JOIN (
    SELECT e.dst AS vid, SUM({xp}.x) AS x FROM e2 e JOIN {xp} ON {xp}.vid = e.src GROUP BY e.dst
  ) s ON s.vid = v.vid
),
n{i} AS MATERIALIZED (SELECT sqrt(SUM(x * x)) AS n FROM r{i}),
x{i} AS MATERIALIZED (SELECT vid, CASE WHEN n > 0 THEN x / n ELSE x END AS x FROM r{i} CROSS JOIN n{i}),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT vid, ROUND(x, 6) AS score6 FROM x{iters} ORDER BY vid"
    )
    return "\n".join(parts)


def _salsa_unrolled_sql(iters: int = 5) -> str:
    """SALSA unrolled (Lempel & Moran): HITS with row/column-stochastic
    weights and L1 norms — auth from old hubs via h·(1/outdeg), then
    hubs from new auths via a·(1/indeg), exactly the engine's folded
    edge-weight form (algorithms/salsa.py) so the float ops replay."""
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        "e2 AS MATERIALIZED (SELECT src, dst FROM edges),",
        "verts AS MATERIALIZED (SELECT DISTINCT vid FROM (SELECT src AS vid FROM e2 UNION ALL SELECT dst FROM e2) t),",
        "nv AS MATERIALIZED (SELECT COUNT(*) AS n FROM verts),",
        "od AS MATERIALIZED (SELECT src AS vid, 1.0 / COUNT(*) AS w FROM e2 GROUP BY src),",
        "idg AS MATERIALIZED (SELECT dst AS vid, 1.0 / COUNT(*) AS w FROM e2 GROUP BY dst),",
        "h0 AS MATERIALIZED (SELECT vid, 1.0 / nv.n AS h FROM verts CROSS JOIN nv),",
    ]
    for i in range(1, iters + 1):
        hp = f"h{i - 1}"
        parts.append(
            f"""ar{i} AS MATERIALIZED (
  SELECT v.vid, COALESCE(s.x, 0.0) AS a FROM verts v LEFT JOIN (
    SELECT e.dst AS vid, SUM({hp}.h * od.w) AS x FROM e2 e
    JOIN {hp} ON {hp}.vid = e.src JOIN od ON od.vid = e.src GROUP BY e.dst
  ) s ON s.vid = v.vid
),
an{i} AS MATERIALIZED (SELECT SUM(a) AS n FROM ar{i}),
a{i} AS MATERIALIZED (SELECT vid, CASE WHEN n > 0 THEN a / n ELSE a END AS a FROM ar{i} CROSS JOIN an{i}),
hr{i} AS MATERIALIZED (
  SELECT v.vid, COALESCE(s.x, 0.0) AS h FROM verts v LEFT JOIN (
    SELECT e.src AS vid, SUM(a{i}.a * idg.w) AS x FROM e2 e
    JOIN a{i} ON a{i}.vid = e.dst JOIN idg ON idg.vid = e.dst GROUP BY e.src
  ) s ON s.vid = v.vid
),
hn{i} AS MATERIALIZED (SELECT SUM(h) AS n FROM hr{i}),
h{i} AS MATERIALIZED (SELECT vid, CASE WHEN n > 0 THEN h / n ELSE h END AS h FROM hr{i} CROSS JOIN hn{i}),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT h{iters}.vid, ROUND(h{iters}.h, 6) AS hub6, ROUND(a{iters}.a, 6) AS auth6 "
        f"FROM h{iters} JOIN a{iters} ON a{iters}.vid = h{iters}.vid ORDER BY h{iters}.vid"
    )
    return "\n".join(parts)


def _ktruss_peel_sql(k: int = 3, rounds: int = 4) -> str:
    """k-truss fixed-round partial peel twin (truss_peel_rounds):
    ``rounds`` support filters then one final support recomputation.
    Naive x<y<z triangle enumeration — support counts are a set-level
    quantity, so the engine's degree-ordered kernel matches exactly."""
    thr = k - 2

    def tri_sup(i: int, src: str) -> str:
        return f"""t{i} AS (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM {src} e1
  JOIN {src} e2 ON e2.a = e1.b
  JOIN {src} e3 ON e3.a = e1.a AND e3.b = e2.b
),
s{i} AS (
  SELECT a, b, COUNT(*) AS sup FROM (
    SELECT x AS a, y AS b FROM t{i}
    UNION ALL SELECT y, z FROM t{i}
    UNION ALL SELECT x, z FROM t{i}
  ) u GROUP BY a, b
)"""

    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        CANON_SQL.strip() + ",",
        "c0 AS MATERIALIZED (SELECT a, b FROM canon),",
    ]
    for i in range(1, rounds + 1):
        parts.append(tri_sup(i, f"c{i - 1}") + ",")
        parts.append(
            f"c{i} AS MATERIALIZED (SELECT c.a, c.b FROM c{i - 1} c "
            f"JOIN s{i} s ON s.a = c.a AND s.b = c.b WHERE s.sup >= {thr}),"
        )
    parts.append(tri_sup(rounds + 1, f"c{rounds}"))
    parts.append(
        f"SELECT c.a, c.b, CAST(COALESCE(s.sup, 0) AS BIGINT) AS support "
        f"FROM c{rounds} c LEFT JOIN s{rounds + 1} s ON s.a = c.a AND s.b = c.b "
        f"ORDER BY c.a, c.b"
    )
    return "\n".join(parts)


def _trussness_sql(rounds: int = 16) -> str:
    """Full truss-decomposition twin (trussness): the edge h-operator
    unrolled ``rounds`` times from the support upper bound.  The
    operator is monotone non-increasing and idempotent past the
    fixpoint (same argument as _coreness_sql), so any unroll ≥ the
    fixture's convergence depth matches the engine's
    converge-or-max_iters run exactly.  Naive x<y<z triangle
    enumeration, ONCE (the h-operator iterates values over the fixed
    triangle structure — the corner table is built a single time, as in
    the engine)."""
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        CANON_SQL.strip() + ",",
        """tri AS MATERIALIZED (
  SELECT e1.a AS x, e1.b AS y, e2.b AS z FROM canon e1
  JOIN canon e2 ON e2.a = e1.b
  JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b
),""",
        """corners AS MATERIALIZED (
  SELECT x AS a, y AS b, x AS oa1, z AS ob1, y AS oa2, z AS ob2 FROM tri
  UNION ALL
  SELECT x AS a, z AS b, x AS oa1, y AS ob1, y AS oa2, z AS ob2 FROM tri
  UNION ALL
  SELECT y AS a, z AS b, x AS oa1, y AS ob1, x AS oa2, z AS ob2 FROM tri
),""",
        """s0 AS MATERIALIZED (
  SELECT c.a, c.b, COALESCE(sup.n, 0) AS s FROM canon c
  LEFT JOIN (SELECT a, b, COUNT(*) AS n FROM corners GROUP BY a, b) sup
  ON sup.a = c.a AND sup.b = c.b
),""",
    ]
    for i in range(1, rounds + 1):
        prev = f"s{i - 1}"
        parts.append(
            f"""v{i} AS (
  SELECT c.a, c.b, LEAST(x1.s, x2.s) AS val
  FROM corners c
  JOIN {prev} x1 ON x1.a = c.oa1 AND x1.b = c.ob1
  JOIN {prev} x2 ON x2.a = c.oa2 AND x2.b = c.ob2
),
h{i} AS (
  SELECT a, b, MAX(LEAST(val, rn)) AS h FROM (
    SELECT a, b, val,
           ROW_NUMBER() OVER (PARTITION BY a, b ORDER BY val DESC) AS rn
    FROM v{i}
  ) t GROUP BY a, b
),
s{i} AS MATERIALIZED (
  SELECT p.a, p.b, LEAST(p.s, COALESCE(h.h, p.s)) AS s
  FROM {prev} p LEFT JOIN h{i} h ON h.a = p.a AND h.b = p.b
),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT a, b, CAST(s + 2 AS BIGINT) AS trussness "
        f"FROM s{rounds} ORDER BY a, b"
    )
    return "\n".join(parts)


def _matching_sql(rounds: int = 24, seed: int = 42) -> str:
    """Maximal-matching twin (algorithms/matching.py): the local-max
    edge-selection rounds unrolled with the SAME md5 edge priority the
    engine uses, so the trajectory replays exactly.  Rounds are
    idempotent once no active edge remains, so any unroll ≥ the
    fixture's convergence depth matches the engine fixpoint."""
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        CANON_SQL.strip() + ",",
        "m0 AS MATERIALIZED (SELECT doc_id AS vid, CAST(NULL AS BIGINT) AS mate FROM documents),",
    ]
    for i in range(1, rounds + 1):
        prev = f"m{i - 1}"
        parts.append(
            f"""un{i} AS (SELECT vid FROM {prev} WHERE mate IS NULL),
ae{i} AS MATERIALIZED (
  SELECT c.a, c.b,
         md5(CAST(c.a AS VARCHAR) || ':' || CAST(c.b AS VARCHAR) || ':{seed}') AS p
  FROM canon c
  JOIN un{i} x ON x.vid = c.a
  JOIN un{i} y ON y.vid = c.b
),
vm{i} AS (
  SELECT vid, MAX(p) AS vp FROM (
    SELECT a AS vid, p FROM ae{i} UNION ALL SELECT b AS vid, p FROM ae{i}
  ) u GROUP BY vid
),
w{i} AS (
  SELECT e.a, e.b FROM ae{i} e
  JOIN vm{i} x ON x.vid = e.a AND x.vp = e.p
  JOIN vm{i} y ON y.vid = e.b AND y.vp = e.p
),
m{i} AS MATERIALIZED (
  SELECT m.vid, COALESCE(m.mate, nm.nm) AS mate
  FROM {prev} m LEFT JOIN (
    SELECT a AS vid, b AS nm FROM w{i} UNION ALL SELECT b AS vid, a AS nm FROM w{i}
  ) nm ON nm.vid = m.vid
),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT vid AS a, CAST(mate AS BIGINT) AS b FROM m{rounds} "
        f"WHERE mate IS NOT NULL AND vid < mate ORDER BY a, b"
    )
    return "\n".join(parts)


def q_matching(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximal matching (algorithms/matching.py matched_pairs) over the
    derived graph; DuckDB twin unrolls the same md5-priority rounds."""
    from linkgraph.algorithms.matching import matched_pairs

    return matched_pairs(build_graph(spark, sf_dir), seed=42)


def _kcore_peel_sql(k: int = 3, rounds: int = 8) -> str:
    """Fixed-round peel (deterministic partial peel, twin of
    k_core_peel_rounds — both sides run exactly ``rounds`` rounds)."""
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        SYM_SQL.strip() + ",",
        "s2 AS MATERIALIZED (SELECT src, dst FROM sym),",
        f"a0 AS MATERIALIZED (SELECT src AS vid, COUNT(*) AS deg FROM s2 GROUP BY src HAVING COUNT(*) >= {k}),",
    ]
    for i in range(1, rounds + 1):
        prev = f"a{i - 1}"
        parts.append(
            f"""a{i} AS MATERIALIZED (
  SELECT e.src AS vid, COUNT(*) AS deg FROM s2 e
  JOIN {prev} x ON x.vid = e.src JOIN {prev} y ON y.vid = e.dst
  GROUP BY e.src HAVING COUNT(*) >= {k}
),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT vid, CAST(deg AS BIGINT) AS deg FROM a{rounds} ORDER BY vid"
    )
    return "\n".join(parts)


def _coreness_sql(rounds: int = 56) -> str:
    """H-operator coreness unrolled (twin of algorithms.coreness).

    One round = gather neighbor estimates over the symmetric edge set,
    h-index per vertex as ``MAX(LEAST(val, ROW_NUMBER() DESC))``, merge
    ``LEAST(old, h)``.  The operator is monotone non-increasing and
    idempotent at its fixpoint (== the coreness vector, Lü et al.), so a
    fixed unroll ≥ the engine's convergence count reproduces the
    converge-or-max_iters run exactly — measured 27 rounds at
    sf0.001/sf0.01, unrolled 2×.
    """
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        SYM_SQL.strip() + ",",
        "s2 AS MATERIALIZED (SELECT src, dst FROM sym),",
        "c0 AS MATERIALIZED (SELECT src AS vid, COUNT(*) AS c FROM s2 GROUP BY src),",
    ]
    for i in range(1, rounds + 1):
        prev = f"c{i - 1}"
        parts.append(
            f"""c{i} AS MATERIALIZED (
  SELECT v.vid, LEAST(v.c, COALESCE(h.h, v.c)) AS c
  FROM {prev} v LEFT JOIN (
    SELECT vid, MAX(LEAST(val, rn)) AS h FROM (
      SELECT e.src AS vid, p.c AS val,
             ROW_NUMBER() OVER (PARTITION BY e.src ORDER BY p.c DESC) AS rn
      FROM s2 e JOIN {prev} p ON p.vid = e.dst
    ) r GROUP BY vid
  ) h ON h.vid = v.vid
),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT vid, CAST(c AS BIGINT) AS coreness FROM c{rounds} ORDER BY vid"
    )
    return "\n".join(parts)


def _geolocation_unrolled_sql(rounds: int = 20) -> str:
    """Unrolled spatial-median spread (twin of ``q_geolocation``).

    The engine's update is ``coalesce(old, median-of-located-neighbors)``
    — located vertices never change, so past the fixpoint every further
    round is a no-op and a fixed ``rounds``-round unroll equals the
    engine's converge-or-max_iters run (both capped at the same count).
    Medians are DuckDB ``quantile_cont(·, 0.5)`` = Spark ``percentile``
    (linear interpolation at (n-1)·p); inputs are integer-valued doubles
    so every interpolated value is an exact dyadic double on both sides.
    """
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        SYM_SQL.strip() + ",",
        "verts AS MATERIALIZED (SELECT DISTINCT src AS vid FROM "
        "(SELECT src FROM sym UNION ALL SELECT dst FROM sym) v),",
        "g0 AS MATERIALIZED (SELECT vid, "
        "CASE WHEN vid % 10 = 0 THEN CAST((vid % 180) - 90 AS DOUBLE) END AS lat, "
        "CASE WHEN vid % 10 = 0 THEN CAST((vid % 360) - 180 AS DOUBLE) END AS lon "
        "FROM verts),",
    ]
    for i in range(1, rounds + 1):
        prev = f"g{i - 1}"
        parts.append(
            f"""g{i} AS MATERIALIZED (
  SELECT s.vid,
         COALESCE(s.lat, e.elat) AS lat,
         COALESCE(s.lon, e.elon) AS lon
  FROM {prev} s LEFT JOIN (
    SELECT m.dst AS vid,
           quantile_cont(p.lat, 0.5) AS elat,
           quantile_cont(p.lon, 0.5) AS elon
    FROM sym m JOIN {prev} p ON p.vid = m.src AND p.lat IS NOT NULL
    GROUP BY m.dst
  ) e ON e.vid = s.vid
),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        f"SELECT vid, ROUND(lat, 6) AS lat, ROUND(lon, 6) AS lon "
        f"FROM g{rounds} WHERE lat IS NOT NULL ORDER BY vid"
    )
    return "\n".join(parts)


def _lsh_fold_ctes(source: str, planes: int, bits: int) -> str:
    """Shared CTE block: Rademacher-sign dot folds → bucket keys → norms
    over ``source`` (a CTE named ``base`` with (vec_id, v: DOUBLE[])).

    Every float op is a sequential left fold seeded with 0.0 —
    bit-identical to the engine's ``aggregate(zip_with(...), 0.0, +)``
    (linkgraph.textops.ann.lsh_bucket_ids_portable), so signs, buckets
    and cosines can never diverge between engines.
    """
    return f"""dots AS MATERIALIZED (
  SELECT vec_id, p.j,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(range(1, len(v) + 1), i ->
             CASE WHEN ((p.j * 1000003 + (i - 1)) * 2654435761) % 4294967296 < 2147483648
                  THEN v[i] ELSE -v[i] END)),
           (a, b) -> a + b) AS dot
  FROM {source} CROSS JOIN (SELECT unnest(range(0, {planes})) AS j) p
),
bkt AS MATERIALIZED (
  SELECT vec_id, j // {bits} AS tbl,
         SUM(CASE WHEN dot > 0 THEN 1 << (j % {bits}) ELSE 0 END) AS bucket
  FROM dots GROUP BY 1, 2
),
normv AS MATERIALIZED (
  SELECT vec_id, v,
         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm
  FROM {source}
)"""


LSH_ANN_SQL = f"""
WITH base AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
{_lsh_fold_ctes('base', 32, 8)},
cand AS (
  SELECT DISTINCT q.vec_id AS query_id, c.vec_id
  FROM bkt q JOIN bkt c ON q.tbl = c.tbl AND q.bucket = c.bucket
  WHERE q.vec_id < 5 AND q.vec_id <> c.vec_id
),
scored AS (
  SELECT cand.query_id, cand.vec_id,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i])),
           (a, b) -> a + b) / (q.nrm * c.nrm) AS cosine
  FROM cand JOIN normv q ON q.vec_id = cand.query_id
            JOIN normv c ON c.vec_id = cand.vec_id
)
SELECT query_id, vec_id, ROUND(cosine, 6) AS cosine6, rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
) t WHERE rank <= 10 ORDER BY query_id, rank
"""

NEARDUP_LSH_SQL = f"""
WITH {EMB2_SQL.strip()},
base AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM emb2
),
{_lsh_fold_ctes('base', 60, 10)},
cand AS (
  SELECT DISTINCT l.vec_id AS a, r.vec_id AS b
  FROM bkt l JOIN bkt r ON l.tbl = r.tbl AND l.bucket = r.bucket
  WHERE l.vec_id < r.vec_id
)
SELECT a, b, ROUND(cosine, 5) AS cosine5 FROM (
  SELECT cand.a, cand.b,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(range(1, len(x.v) + 1), i -> x.v[i] * y.v[i])),
           (a2, b2) -> a2 + b2) / (x.nrm * y.nrm) AS cosine
  FROM cand JOIN normv x ON x.vec_id = cand.a
            JOIN normv y ON y.vec_id = cand.b
) s WHERE cosine >= 0.45 ORDER BY a, b
"""


IVF_ANN_SQL = """
WITH base AS MATERIALIZED (
  SELECT vec_id, list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
  FROM embeddings
),
normv AS MATERIALIZED (
  SELECT vec_id, v,
         sqrt(list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(v, x -> x * x)), (a, b) -> a + b)) AS nrm
  FROM base
),
piv AS MATERIALIZED (
  SELECT ROW_NUMBER() OVER (ORDER BY vec_id) - 1 AS cell, v AS pv, nrm AS pnrm
  FROM (SELECT * FROM normv ORDER BY vec_id LIMIT 8)
),
sims AS MATERIALIZED (
  SELECT n.vec_id, p.cell,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(range(1, len(n.v) + 1), i -> n.v[i] * p.pv[i])),
           (a, b) -> a + b) / (n.nrm * p.pnrm) AS sim
  FROM normv n CROSS JOIN piv p
),
corpus_cell AS (
  SELECT vec_id, cell FROM (
    SELECT vec_id, cell, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY sim DESC, cell) AS r FROM sims
  ) t WHERE r = 1
),
query_cell AS (
  SELECT vec_id AS query_id, cell FROM (
    SELECT vec_id, cell, ROW_NUMBER() OVER (
      PARTITION BY vec_id ORDER BY sim DESC, cell) AS r
    FROM sims WHERE vec_id < 5
  ) t WHERE r <= 2
),
cand AS (
  SELECT DISTINCT q.query_id, c.vec_id
  FROM query_cell q JOIN corpus_cell c USING (cell)
  WHERE q.query_id <> c.vec_id
),
scored AS (
  SELECT cand.query_id, cand.vec_id,
         list_reduce(list_prepend(CAST(0 AS DOUBLE),
           list_transform(range(1, len(q.v) + 1), i -> q.v[i] * c.v[i])),
           (a, b) -> a + b) / (q.nrm * c.nrm) AS cosine
  FROM cand JOIN normv q ON q.vec_id = cand.query_id
            JOIN normv c ON c.vec_id = cand.vec_id
)
SELECT query_id, vec_id, ROUND(cosine, 6) AS cosine6, rank FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY query_id ORDER BY cosine DESC, vec_id) AS rank
  FROM scored
) t WHERE rank <= 10 ORDER BY query_id, rank
"""


def _boruvka_unrolled_sql(rounds: int = 16, jumps: int = 12) -> str:
    """Unrolled Borůvka MSF (twin of ``q_mst``).

    Weights ``min over the directed pair of src·10^6+dst`` are distinct
    per canonical edge ⇒ the MSF is unique, so ANY correct MST algorithm
    yields the engine's exact row set.  Per round: each component picks
    its lightest cross edge (distinct weights make the min-weight join
    unambiguous), then the chosen merge graph is contracted by hash-min
    label propagation with pointer-jumping shortcuts (``jumps``
    hook+shortcut pairs — far beyond the merge graphs' measured
    diameters; labels only ever decrease toward the component min, so
    extra jumps are no-ops).  Components at least halve per round, so
    ``rounds`` ≥ log2(|V|) is exact and later rounds are empty no-ops
    (16 covers 65k components; measured 4s in DuckDB at sf0.1).
    """
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        """w AS MATERIALIZED (
  SELECT LEAST(src, dst) AS src, GREATEST(src, dst) AS dst,
         MIN(CAST(src * 1000000 + dst AS DOUBLE)) AS w
  FROM edges WHERE src <> dst GROUP BY 1, 2
),""",
        "c0 AS MATERIALIZED (SELECT vid, vid AS comp FROM "
        "(SELECT DISTINCT src AS vid FROM "
        "(SELECT src FROM w UNION ALL SELECT dst FROM w) z) v),",
    ]
    for r in range(rounds):
        parts.append(
            f"""x{r} AS MATERIALIZED (
  SELECT e.src, e.dst, e.w, cs.comp AS cs, cd.comp AS cd
  FROM w e JOIN c{r} cs ON cs.vid = e.src JOIN c{r} cd ON cd.vid = e.dst
  WHERE cs.comp <> cd.comp
),
sel{r} AS MATERIALIZED (
  SELECT comp, MIN(w) AS mw FROM (
    SELECT cs AS comp, w FROM x{r} UNION ALL SELECT cd AS comp, w FROM x{r}
  ) u GROUP BY comp
),
ch{r} AS MATERIALIZED (
  SELECT DISTINCT x.src, x.dst, x.w, x.cs, x.cd
  FROM x{r} x JOIN sel{r} s ON x.w = s.mw AND s.comp IN (x.cs, x.cd)
),
ma{r} AS MATERIALIZED (
  SELECT cs AS a, cd AS b FROM ch{r} UNION SELECT cd, cs FROM ch{r}
),
l{r}_0 AS MATERIALIZED (
  SELECT c.comp AS c, LEAST(c.comp, COALESCE(MIN(m.b), c.comp)) AS l
  FROM (SELECT DISTINCT comp FROM c{r}) c LEFT JOIN ma{r} m ON m.a = c.comp
  GROUP BY c.comp
),"""
        )
        for j in range(jumps):
            parts.append(
                f"""l{r}_{j}h AS MATERIALIZED (
  SELECT t.c, LEAST(t.l, COALESCE(MIN(t2.l), t.l)) AS l
  FROM l{r}_{j} t
  LEFT JOIN ma{r} m ON m.a = t.c
  LEFT JOIN l{r}_{j} t2 ON t2.c = m.b
  GROUP BY t.c, t.l
),
l{r}_{j + 1} AS MATERIALIZED (
  SELECT t.c, LEAST(t.l, t2.l) AS l
  FROM l{r}_{j}h t JOIN l{r}_{j}h t2 ON t2.c = t.l
),"""
            )
        parts.append(
            f"""c{r + 1} AS MATERIALIZED (
  SELECT c.vid, lbl.l AS comp FROM c{r} c JOIN l{r}_{jumps} lbl ON lbl.c = c.comp
),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    union = "\nUNION ALL\n".join(
        f"SELECT src, dst, w FROM ch{r}" for r in range(rounds)
    )
    parts.append(
        f"SELECT DISTINCT src, dst, ROUND(w, 2) AS weight2 "
        f"FROM ({union}) allch ORDER BY src, dst"
    )
    return "\n".join(parts)


def _jpl_unrolled_sql(rounds: int = 48) -> str:
    """Unrolled Jones–Plassmann–Luby coloring (twin of ``q_coloring``).

    Priority = (vid·2654435761) mod 2^32 — an odd multiplier, so the
    map is a bijection mod 2^32 and the ordering is injective with no
    tie-break; evaluable identically in Spark SQL and DuckDB.  Each
    round colors the uncolored vertices whose priority strictly exceeds
    every uncolored neighbor's; rounds past the fixpoint are empty
    no-ops, so any ``rounds`` ≥ the actual round count is exact
    (measured 24-25 at sf0.001/0.01/0.1; 48 ≈ 2× margin — the count
    grows slowly, +1 from 500 to 5000 vertices).
    """
    pri = "(%s * 2654435761) %% 4294967296"
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        SYM_SQL.strip() + ",",
        "verts AS MATERIALIZED (SELECT DISTINCT src AS vid FROM "
        "(SELECT src FROM sym UNION ALL SELECT dst FROM sym) z),",
        "u0 AS MATERIALIZED (SELECT vid FROM verts),",
    ]
    for i in range(rounds):
        parts.append(
            f"""w{i} AS MATERIALIZED (
  SELECT u.vid FROM u{i} u
  LEFT JOIN (
    SELECT e.dst AS vid, MAX({pri % 'e.src'}) AS nm
    FROM sym e
    WHERE e.src IN (SELECT vid FROM u{i}) AND e.dst IN (SELECT vid FROM u{i})
    GROUP BY e.dst
  ) n ON n.vid = u.vid
  WHERE n.nm IS NULL OR {pri % 'u.vid'} > n.nm
),
u{i + 1} AS MATERIALIZED (
  SELECT vid FROM u{i} WHERE vid NOT IN (SELECT vid FROM w{i})
),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    union = "\nUNION ALL\n".join(
        f"SELECT vid, CAST({i} AS INT) AS color FROM w{i}" for i in range(rounds)
    )
    parts.append(f"SELECT vid, color FROM ({union}) c ORDER BY vid")
    return "\n".join(parts)


def _luby_mis_sql(rounds: int = 12) -> str:
    """Unrolled Luby maximal independent set (twin of ``q_luby_mis``).

    Same knuth32 injective priority as the JPL twin; each round's
    winners are identical to a JPL round's, and the MIS twist removes
    winners AND their neighbors from the undecided pool, so rounds
    shrink geometrically — measured 5 rounds to fixpoint at
    sf0.001/0.01 (12 = 2× margin; rounds past the fixpoint are empty
    no-ops, so any ``rounds`` ≥ the actual count is exact).
    """
    pri = "(%s * 2654435761) %% 4294967296"
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        SYM_SQL.strip() + ",",
        "verts AS MATERIALIZED (SELECT DISTINCT src AS vid FROM "
        "(SELECT src FROM sym UNION ALL SELECT dst FROM sym) z),",
        "u0 AS MATERIALIZED (SELECT vid FROM verts),",
    ]
    for i in range(rounds):
        parts.append(
            f"""w{i} AS MATERIALIZED (
  SELECT u.vid FROM u{i} u
  LEFT JOIN (
    SELECT e.dst AS vid, MAX({pri % 'e.src'}) AS nm
    FROM sym e
    WHERE e.src IN (SELECT vid FROM u{i}) AND e.dst IN (SELECT vid FROM u{i})
    GROUP BY e.dst
  ) n ON n.vid = u.vid
  WHERE n.nm IS NULL OR {pri % 'u.vid'} > n.nm
),
u{i + 1} AS MATERIALIZED (
  SELECT vid FROM u{i}
  WHERE vid NOT IN (SELECT vid FROM w{i})
    AND vid NOT IN (SELECT e.dst FROM sym e WHERE e.src IN (SELECT vid FROM w{i}))
),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    union = "\nUNION ALL\n".join(
        f"SELECT vid, {i} AS r FROM w{i}" for i in range(rounds)
    )
    parts.append(
        f"SELECT v.vid, CAST(COALESCE(m.r, -1) AS INT) AS status "
        f"FROM verts v LEFT JOIN ({union}) m ON m.vid = v.vid ORDER BY v.vid"
    )
    return "\n".join(parts)


def _brandes_unrolled_sql(levels: int = 8) -> str:
    """Unrolled single-source Brandes from vertex 0 (twin of
    ``q_bc_source0``).

    Forward: ``levels`` level-synchronous BFS rounds accumulating σ
    (exact — σ is integer-valued in doubles); rounds past the source's
    eccentricity are empty no-ops, so any ``levels`` ≥ ecc(0) is exact
    (measured ecc(0) = 4 at sf0.001/0.01/0.1; 8 = 2× margin).  Backward:
    dependency accumulation δ(v) = σ(v)·Σ_w (1+δ(w))/σ(w) by descending
    depth, the same factored form the engine aggregates; empty levels
    are again no-ops.  bc = δ/2 (undirected pair normalization),
    rounded to 6 decimals on both sides.
    """
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        SYM_SQL.strip() + ",",
        "verts AS MATERIALIZED (SELECT DISTINCT src AS vid FROM "
        "(SELECT src FROM sym UNION ALL SELECT dst FROM sym) z),",
        "s0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS vid, "
        "0 AS depth, CAST(1 AS DOUBLE) AS sigma),",
    ]
    for i in range(1, levels + 1):
        parts.append(
            f"""f{i} AS MATERIALIZED (
  SELECT e.dst AS vid, {i} AS depth, SUM(f.sigma) AS sigma
  FROM sym e JOIN s{i - 1} f ON f.vid = e.src AND f.depth = {i - 1}
  WHERE e.dst NOT IN (SELECT vid FROM s{i - 1})
  GROUP BY e.dst
),
s{i} AS MATERIALIZED (SELECT * FROM s{i - 1} UNION ALL SELECT * FROM f{i}),"""
        )
    parts.append(
        f"b{levels} AS MATERIALIZED (SELECT vid, depth, sigma, "
        f"CAST(0 AS DOUBLE) AS dep FROM s{levels}),"
    )
    for d in range(levels - 1, -1, -1):
        parts.append(
            f"""b{d} AS MATERIALIZED (
  SELECT st.vid, st.depth, st.sigma,
         CASE WHEN st.depth = {d} AND c.part IS NOT NULL
              THEN st.sigma * c.part ELSE st.dep END AS dep
  FROM b{d + 1} st LEFT JOIN (
    SELECT e.src AS vid, SUM((1 + u.dep) / u.sigma) AS part
    FROM sym e JOIN b{d + 1} u ON u.vid = e.dst AND u.depth = {d + 1}
    GROUP BY e.src
  ) c ON c.vid = st.vid
),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(
        "SELECT v.vid, ROUND(0.5 * CASE WHEN v.vid = 0 THEN 0 "
        "ELSE COALESCE(b.dep, 0) END, 6) AS bc6 "
        "FROM verts v LEFT JOIN b0 b ON b.vid = v.vid ORDER BY v.vid"
    )
    return "\n".join(parts)


def _brandes_multi_unrolled_sql(
    levels: int = 10, num_sources: int = 4, seed: int = 0
) -> str:
    """Unrolled MULTI-source Brandes (twin of ``q_bc_sampled``): the same
    forward/backward chain as :func:`_brandes_unrolled_sql` with a
    ``root`` column carried through every CTE — the SQL image of the
    engine's batched runner (bc.bc_batched).  Sources are the
    deterministic arithmetic sample ``ORDER BY h(h(vid))``,
    ``h(x) = (x·A + seed) mod P`` (bc.sample_sources — identical
    constants and double application), and the estimator scale
    n/s is applied at the end, so this replays ``bc_sampled(g, s,
    scale=True)`` exactly.  ``levels`` ≥ max eccentricity over sampled
    sources is exact (measured ecc ≤ 4 at sf0.001–0.1; 10 = margin —
    rounds past a root's eccentricity are empty no-ops for that root).
    """
    from linkgraph.algorithms.bc import BC_SAMPLE_A, BC_SAMPLE_P

    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        SYM_SQL.strip() + ",",
        "verts AS MATERIALIZED (SELECT DISTINCT src AS vid FROM "
        "(SELECT src FROM sym UNION ALL SELECT dst FROM sym) z),",
        f"sample AS MATERIALIZED (SELECT vid FROM verts "
        f"ORDER BY (((vid * {BC_SAMPLE_A} + {seed}) % {BC_SAMPLE_P}) "
        f"* {BC_SAMPLE_A} + {seed}) % {BC_SAMPLE_P}, vid "
        f"LIMIT {num_sources}),",
        "s0 AS MATERIALIZED (SELECT vid AS root, vid, 0 AS depth, "
        "CAST(1 AS DOUBLE) AS sigma FROM sample),",
    ]
    for i in range(1, levels + 1):
        parts.append(
            f"""f{i} AS MATERIALIZED (
  SELECT f.root, e.dst AS vid, {i} AS depth, SUM(f.sigma) AS sigma
  FROM sym e JOIN s{i - 1} f ON f.vid = e.src AND f.depth = {i - 1}
  WHERE NOT EXISTS (SELECT 1 FROM s{i - 1} p
                    WHERE p.root = f.root AND p.vid = e.dst)
  GROUP BY f.root, e.dst
),
s{i} AS MATERIALIZED (SELECT * FROM s{i - 1} UNION ALL SELECT * FROM f{i}),"""
        )
    parts.append(
        f"b{levels} AS MATERIALIZED (SELECT root, vid, depth, sigma, "
        f"CAST(0 AS DOUBLE) AS dep FROM s{levels}),"
    )
    for d in range(levels - 1, -1, -1):
        parts.append(
            f"""b{d} AS MATERIALIZED (
  SELECT st.root, st.vid, st.depth, st.sigma,
         CASE WHEN st.depth = {d} AND c.part IS NOT NULL
              THEN st.sigma * c.part ELSE st.dep END AS dep
  FROM b{d + 1} st LEFT JOIN (
    SELECT u.root, e.src AS vid, SUM((1 + u.dep) / u.sigma) AS part
    FROM sym e JOIN b{d + 1} u ON u.vid = e.dst AND u.depth = {d + 1}
    GROUP BY u.root, e.src
  ) c ON c.root = st.root AND c.vid = st.vid
),"""
        )
    parts.append(
        "tot AS MATERIALIZED (SELECT vid, SUM(dep) AS dep FROM b0 "
        "WHERE vid <> root GROUP BY vid),"
        "nrow AS (SELECT CAST(COUNT(*) AS DOUBLE) AS n FROM verts)"
    )
    parts.append(
        f"SELECT v.vid, ROUND((nrow.n / {num_sources}) * 0.5 * "
        "COALESCE(t.dep, 0), 6) AS bc6 "
        "FROM verts v CROSS JOIN nrow LEFT JOIN tot t ON t.vid = v.vid "
        "ORDER BY v.vid"
    )
    return "\n".join(parts)


# Deterministic synthetic multi-capture link log over the derived edges
# (twin input for q_link_log_compact): capture 1 = every edge at T1;
# every src ≡ 0 (mod 3) is recrawled at T2 — with its link set SHIFTED
# ((dst+1) mod n) when src ≢ 0 (mod 9), or with NO links (the NULL
# marker row stream_link_log would emit) when src ≡ 0 (mod 9).  Runs
# verbatim in Spark SQL and DuckDB.
LINK_LOG_SYNTH_SQL = """
recrawl_src AS (SELECT DISTINCT src FROM edges WHERE src % 3 = 0),
link_log AS (
  SELECT src AS src_url, dst AS dst_url,
         CAST('2024-01-01 00:00:00' AS TIMESTAMP) AS warc_ts,
         CAST(1 AS BIGINT) AS capture
  FROM edges
  UNION ALL
  SELECT e.src AS src_url, CAST((e.dst + 1) % nn.n AS BIGINT) AS dst_url,
         CAST('2024-02-01 00:00:00' AS TIMESTAMP) AS warc_ts,
         CAST(2 AS BIGINT) AS capture
  FROM edges e CROSS JOIN nn
  WHERE e.src % 3 = 0 AND e.src % 9 <> 0
  UNION ALL
  SELECT r.src AS src_url, CAST(NULL AS BIGINT) AS dst_url,
         CAST('2024-02-01 00:00:00' AS TIMESTAMP) AS warc_ts,
         CAST(2 AS BIGINT) AS capture
  FROM recrawl_src r WHERE r.src % 9 = 0
)
"""

# latest-wins compaction replayed in SQL (twin of
# streaming.compact_link_log): winning (warc_ts, capture) per src by the
# same total order, join back, drop markers, distinct edges.
LINK_LOG_COMPACT_SQL_TAIL = """
best AS (
  SELECT src_url, warc_ts, capture FROM (
    SELECT src_url, warc_ts, capture,
           ROW_NUMBER() OVER (PARTITION BY src_url
                              ORDER BY warc_ts DESC, capture DESC) AS rn
    FROM (SELECT DISTINCT src_url, warc_ts, capture FROM link_log) z
  ) y WHERE rn = 1
)
SELECT DISTINCT l.src_url AS src, l.dst_url AS dst
FROM link_log l
JOIN best b ON b.src_url = l.src_url AND b.warc_ts = l.warc_ts
           AND b.capture = l.capture
WHERE l.dst_url IS NOT NULL
"""

# Synthetic absolute urls over the derived edges (twin input for
# q_host_graph): 20 hosts by src/dst mod; runs verbatim in both engines.
HOST_PAIRS_SQL = """
pairs AS (
  SELECT CONCAT('https://site', CAST(src % 20 AS STRING),
                '.example/d/', CAST(src AS STRING)) AS src_url,
         CONCAT('https://site', CAST(dst % 20 AS STRING),
                '.example/d/', CAST(dst AS STRING)) AS dst_url
  FROM edges
)
"""

# twin of extract.inlink_host_diversity over the synthetic url pairs:
# two stacked aggregations — per (dst, src_host), then per dst
HOST_DIVERSITY_SQL_TAIL = """
, ph AS (
  SELECT dst_url,
         lower(regexp_extract(src_url, '^https?://([^/?#]+)', 1)) AS src_host
  FROM pairs
),
per AS (SELECT dst_url, src_host, COUNT(*) AS c FROM ph GROUP BY 1, 2)
SELECT dst_url,
  CAST(SUM(c) AS BIGINT) AS inlinks,
  CAST(COUNT(*) AS BIGINT) AS distinct_hosts,
  ROUND(COUNT(*) * 1.0 / SUM(c), 6) AS host_diversity,
  ROUND(MAX(c) * 1.0 / SUM(c), 6) AS top_host_share
FROM per GROUP BY dst_url ORDER BY dst_url
"""

HOST_GRAPH_SQL_TAIL = """
SELECT lower(regexp_extract(src_url, '^https?://([^/?#]+)', 1)) AS src_host,
       lower(regexp_extract(dst_url, '^https?://([^/?#]+)', 1)) AS dst_host,
       CAST(COUNT(*) AS BIGINT) AS weight
FROM pairs
WHERE lower(regexp_extract(src_url, '^https?://([^/?#]+)', 1))
   <> lower(regexp_extract(dst_url, '^https?://([^/?#]+)', 1))
GROUP BY 1, 2
"""


FINGERPRINT_SQL = """
SELECT CAST(doc_id AS BIGINT) AS doc_id,
       CAST(list_reduce(
         list_prepend(CAST(0 AS HUGEINT),
           list_transform(range(1, length(text) + 1),
                          i -> CAST(ord(substr(text, i, 1)) AS HUGEINT))),
         (a, b) -> (a * 131 + b) % 2305843009213693951
       ) AS BIGINT) AS fingerprint
FROM documents
"""
# ^ twin of textops.quality.doc_fingerprint: fold over the text's bytes
#   (code point == byte — the driver corpus is ASCII, asserted in
#   tests/test_catalog.py's sweep by value equality), B=131, P=2^61-1 in
#   HUGEINT so the fold never overflows.  list_prepend(0) seeds the
#   reduce with the engine's h=0 initial accumulator, which also makes
#   the empty-text fold return 0 like the engine.


def _simhash_sql() -> str:
    """Twin of textops.dedup.simhash64 over docs2.

    Token hash = first 8 md5 bytes big-endian == CAST('0x'||first 16 hex
    chars AS UBIGINT); RE2 ``\\s+`` token split matches Python
    ``str.split()`` on this ASCII corpus (no \\v/\\f/unicode spaces in
    the driver data); the final CASE reinterprets the unsigned 64-bit
    fingerprint as the engine's signed int64.
    """
    return (
        "WITH "
        + DOCS2_SQL.strip()
        + r""",
toks AS (
  SELECT doc_id, unnest(list_filter(
    regexp_split_to_array(lower(text), '\s+'), t -> t <> '')) AS tok
  FROM docs2
),
th AS (SELECT doc_id,
              CAST(concat('0x', substr(md5(tok), 1, 16)) AS UBIGINT) AS h
       FROM toks),
bits AS (
  SELECT doc_id, i,
         SUM(CASE WHEN (h >> i) & 1 = 1 THEN 1 ELSE -1 END) AS vote
  FROM th CROSS JOIN (SELECT unnest(range(0, 64)) AS i) g
  GROUP BY doc_id, i
),
fps AS (
  SELECT doc_id,
         SUM(CASE WHEN vote > 0 THEN CAST(CAST(1 AS UBIGINT) << i AS HUGEINT)
                  ELSE CAST(0 AS HUGEINT) END) AS ufp
  FROM bits GROUP BY doc_id
)
SELECT d.doc_id,
       CAST(CASE WHEN COALESCE(f.ufp, 0) >= CAST('9223372036854775808' AS HUGEINT)
                 THEN COALESCE(f.ufp, 0) - CAST('18446744073709551616' AS HUGEINT)
                 ELSE COALESCE(f.ufp, 0) END AS BIGINT) AS simhash
FROM docs2 d LEFT JOIN fps f USING (doc_id)"""
    )


def _sssp_unrolled_sql(rounds: int = 7) -> str:
    """Unrolled Bellman-Ford from source 0 (twin of ``q_sssp7``).

    After round i the engine's frontier-restricted relax holds exactly
    the min distance over paths of ≤ i edges (standard Bellman-Ford
    invariant — a vertex that didn't improve in round j already sent its
    final distance in some earlier round), so both sides run the same
    fixed number of rounds.  Weights are derived from (src, dst) by pure
    integer arithmetic, evaluable identically in Spark SQL and DuckDB.
    """
    parts = [
        "WITH " + EDGE_SQL.strip() + ",",
        "w AS MATERIALIZED (SELECT src, dst, "
        f"CAST({EDGE_WEIGHT_SQL} AS DOUBLE) AS w FROM edges),",
        "d0 AS MATERIALIZED (SELECT CAST(0 AS BIGINT) AS vid, "
        "CAST(0 AS DOUBLE) AS dist),",
    ]
    for i in range(1, rounds + 1):
        prev = f"d{i - 1}"
        parts.append(
            f"""d{i} AS MATERIALIZED (
  SELECT vid, MIN(dist) AS dist FROM (
    SELECT vid, dist FROM {prev}
    UNION ALL
    SELECT e.dst AS vid, p.dist + e.w AS dist FROM w e JOIN {prev} p ON p.vid = e.src
  ) u GROUP BY vid
),"""
        )
    parts[-1] = parts[-1].rstrip(",")
    parts.append(f"SELECT vid, ROUND(dist, 6) AS dist6 FROM d{rounds} ORDER BY vid")
    return "\n".join(parts)


SPMV_WEIGHTED_SQL = f"""
WITH {EDGE_SQL.strip()}
SELECT dst AS vid,
       ROUND(SUM(((src * 3 + dst * 7) % 9 + 1) * ((src % 13) / 4.0)), 6) AS y6
FROM edges GROUP BY dst ORDER BY vid
"""

SPGEMM_SQUARE_SQL = f"""
WITH {EDGE_SQL.strip()}
SELECT a.src AS row, b.dst AS col, CAST(COUNT(*) AS BIGINT) AS paths2
FROM edges a JOIN edges b ON a.dst = b.src
GROUP BY a.src, b.dst ORDER BY row, col
"""

CC_SQL = f"""
WITH RECURSIVE {EDGE_SQL.strip()},
{SYM_SQL.strip()},
reach(vid, m) AS (
  SELECT doc_id, doc_id FROM documents
  UNION
  SELECT e.dst, r.m FROM reach r JOIN sym e ON e.src = r.vid
)
SELECT vid, MIN(m) AS comp FROM reach GROUP BY vid ORDER BY vid
"""

BFS_SQL = f"""
WITH RECURSIVE {EDGE_SQL.strip()},
walk(vid, d) AS (
  SELECT CAST(0 AS BIGINT) AS vid, 0 AS d
  UNION
  SELECT e.dst, w.d + 1 FROM walk w JOIN edges e ON e.src = w.vid
  WHERE w.d < 64
)
SELECT vid, CAST(MIN(d) AS BIGINT) AS depth FROM walk GROUP BY vid ORDER BY vid
"""

# twin of graphstats.double_sweep_diameter: two recursive BFS walks
# over sym, pivot = (max depth, min vid) of sweep 1
DOUBLE_SWEEP_SQL = f"""
WITH RECURSIVE {EDGE_SQL.strip()},
{SYM_SQL.strip()},
walk1(vid, d) AS (
  SELECT CAST(0 AS BIGINT) AS vid, 0 AS d
  UNION
  SELECT e.dst, w.d + 1 FROM walk1 w JOIN sym e ON e.src = w.vid
  WHERE w.d < 64
),
d1 AS (SELECT vid, MIN(d) AS depth FROM walk1 GROUP BY vid),
far AS (SELECT vid, depth FROM d1 ORDER BY depth DESC, vid ASC LIMIT 1),
walk2(vid, d) AS (
  SELECT vid, 0 AS d FROM far
  UNION
  SELECT e.dst, w.d + 1 FROM walk2 w JOIN sym e ON e.src = w.vid
  WHERE w.d < 64
),
d2 AS (SELECT vid, MIN(d) AS depth FROM walk2 GROUP BY vid)
SELECT CAST(0 AS BIGINT) AS start_vid,
       CAST((SELECT depth FROM far) AS BIGINT) AS ecc_start,
       CAST((SELECT vid FROM far) AS BIGINT) AS far_vid,
       CAST((SELECT MAX(depth) FROM d2) AS BIGINT) AS diameter_lb
"""

TRI_TOTAL_SQL = f"""
WITH {EDGE_SQL.strip()},
{CANON_SQL.strip()}
SELECT CAST(COUNT(*) AS BIGINT) AS triangles
FROM canon e1
JOIN canon e2 ON e1.b = e2.a
JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b
"""

TRI_PER_VERTEX_SQL = f"""
WITH {EDGE_SQL.strip()},
{CANON_SQL.strip()},
tris AS (
  SELECT e1.a AS a, e1.b AS b, e2.b AS c
  FROM canon e1
  JOIN canon e2 ON e1.b = e2.a
  JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
  SELECT a AS vid FROM tris UNION ALL SELECT b FROM tris UNION ALL SELECT c FROM tris
),
verts AS (SELECT DISTINCT vid FROM (SELECT src AS vid FROM edges UNION ALL SELECT dst FROM edges) v)
SELECT verts.vid, CAST(COALESCE(cnt.c, 0) AS BIGINT) AS triangles
FROM verts LEFT JOIN (SELECT vid, COUNT(*) AS c FROM corners GROUP BY vid) cnt
ON cnt.vid = verts.vid ORDER BY verts.vid
"""

DEGREES_SQL = f"""
WITH {EDGE_SQL.strip()}
SELECT src AS vid, CAST(COUNT(*) AS BIGINT) AS outdeg FROM edges GROUP BY src ORDER BY vid
"""

# SCC/bow-tie entries run on a deterministically THINNED edge set
# (src % 5 <> 0): the full derived crawl is a single giant SCC (a
# degenerate test — any labeling algorithm that outputs one label
# passes); dropping every 5th source's out-links yields real structure
# at sf0.001 (114 SCCs, largest 387; bow-tie: CORE/OUT/IN/TENDRIL all
# non-empty).  Vertex set = endpoints of the thinned edges, matching
# Graph.vertices on the engine side.
SCC_THIN_PRED = "src % 5 <> 0"
_SCC_BASE_SQL = f"""
te AS (SELECT src, dst FROM edges WHERE {SCC_THIN_PRED}),
tverts AS (SELECT DISTINCT vid FROM (SELECT src AS vid FROM te UNION ALL SELECT dst FROM te) t),
reach(vid, m) AS (
  SELECT vid, vid FROM tverts
  UNION
  SELECT e.dst, r.m FROM reach r JOIN te e ON e.src = r.vid
),
sccs AS (
  SELECT r1.vid, MIN(r1.m) AS scc
  FROM reach r1 JOIN reach r2 ON r2.vid = r1.m AND r2.m = r1.vid
  GROUP BY r1.vid
)
"""

# SCC oracle: algorithm-independent mutual-reachability closure — m and
# vid are in the same SCC iff m reaches vid AND vid reaches m; the SCC
# label is the minimum such m.  Pins the SEMANTICS of the engine's
# coloring/FW-BW multistep (algorithms/scc.py), not its trajectory.
SCC_SQL = f"""
WITH RECURSIVE {EDGE_SQL.strip()},
{_SCC_BASE_SQL.strip()}
SELECT vid, CAST(scc AS BIGINT) AS scc FROM sccs ORDER BY vid
"""

# Bow-tie oracle (Broder et al. regions from the same closure): CORE =
# largest SCC (min-scc tie-break), IN/OUT = backward/forward reach of
# CORE, TUBE/TENDRIL from core-free reachability of IN → / → OUT.
BOWTIE_SQL = f"""
WITH RECURSIVE {EDGE_SQL.strip()},
{_SCC_BASE_SQL.strip()},
core_id AS (
  SELECT scc FROM (SELECT scc, COUNT(*) AS n FROM sccs GROUP BY scc)
  ORDER BY n DESC, scc ASC LIMIT 1
),
core AS (SELECT vid FROM sccs WHERE scc = (SELECT scc FROM core_id)),
fwd AS (SELECT DISTINCT r.vid FROM reach r JOIN core c ON r.m = c.vid),
bwd AS (SELECT DISTINCT r.m AS vid FROM reach r JOIN core c ON r.vid = c.vid),
inr AS (SELECT vid FROM bwd b WHERE NOT EXISTS (SELECT 1 FROM core c WHERE c.vid = b.vid)),
outr AS (SELECT vid FROM fwd f WHERE NOT EXISTS (SELECT 1 FROM core c WHERE c.vid = f.vid)),
nca AS (SELECT vid FROM tverts v WHERE NOT EXISTS (SELECT 1 FROM core c WHERE c.vid = v.vid)),
nce AS (
  SELECT e.src, e.dst FROM te e
  JOIN nca a ON a.vid = e.src JOIN nca b ON b.vid = e.dst
),
reach2(vid, m) AS (
  SELECT vid, vid FROM nca
  UNION
  SELECT e.dst, r.m FROM reach2 r JOIN nce e ON e.src = r.vid
),
from_in AS (SELECT DISTINCT r.vid FROM reach2 r JOIN inr i ON r.m = i.vid),
to_out AS (SELECT DISTINCT r.m AS vid FROM reach2 r JOIN outr o ON r.vid = o.vid)
SELECT v.vid,
  CASE WHEN c.vid IS NOT NULL THEN 'CORE'
       WHEN i.vid IS NOT NULL THEN 'IN'
       WHEN o.vid IS NOT NULL THEN 'OUT'
       WHEN fi.vid IS NOT NULL AND t2.vid IS NOT NULL THEN 'TUBE'
       WHEN fi.vid IS NOT NULL OR t2.vid IS NOT NULL THEN 'TENDRIL'
       ELSE 'DISCONNECTED' END AS region
FROM tverts v
LEFT JOIN core c ON c.vid = v.vid
LEFT JOIN inr i ON i.vid = v.vid
LEFT JOIN outr o ON o.vid = v.vid
LEFT JOIN from_in fi ON fi.vid = v.vid
LEFT JOIN to_out t2 ON t2.vid = v.vid
ORDER BY v.vid
"""

RECIPROCITY_SQL = f"""
WITH {EDGE_SQL.strip()},
r AS (
  SELECT COUNT(*) AS n_reciprocal FROM edges e
  WHERE EXISTS (SELECT 1 FROM edges e2 WHERE e2.src = e.dst AND e2.dst = e.src)
),
n AS (SELECT COUNT(*) AS n_edges FROM edges)
SELECT CAST(n.n_edges AS BIGINT) AS n_edges,
       CAST(r.n_reciprocal AS BIGINT) AS n_reciprocal,
       ROUND(CASE WHEN n.n_edges > 0
             THEN CAST(r.n_reciprocal AS DOUBLE) / n.n_edges
             ELSE 0 END, 6) AS reciprocity
FROM n CROSS JOIN r
"""

ASSORTATIVITY_SQL = f"""
WITH {EDGE_SQL.strip()},
od AS (SELECT src AS vid, COUNT(*) AS d FROM edges GROUP BY src),
idg AS (SELECT dst AS vid, COUNT(*) AS d FROM edges GROUP BY dst),
xy AS (
  SELECT o.d AS x, i.d AS y FROM edges e
  JOIN od o ON o.vid = e.src JOIN idg i ON i.vid = e.dst
),
m AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(x) AS BIGINT) AS sx, CAST(SUM(y) AS BIGINT) AS sy,
         CAST(SUM(x*y) AS BIGINT) AS sxy,
         CAST(SUM(x*x) AS BIGINT) AS sxx, CAST(SUM(y*y) AS BIGINT) AS syy
  FROM xy
)
SELECT n AS n_edges,
       ROUND(CASE WHEN CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE) > 0
             THEN CAST(n*sxy - sx*sy AS DOUBLE)
                  / SQRT(CAST(n*sxx - sx*sx AS DOUBLE) * CAST(n*syy - sy*sy AS DOUBLE))
             ELSE 0 END, 6) AS assortativity
FROM m
"""

CLUSTERING_SQL = f"""
WITH {EDGE_SQL.strip()},
{SYM_SQL.strip()},
{CANON_SQL.strip()},
tris AS (
  SELECT e1.a AS a, e1.b AS b, e2.b AS c
  FROM canon e1
  JOIN canon e2 ON e1.b = e2.a
  JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b
),
corners AS (
  SELECT a AS vid FROM tris UNION ALL SELECT b FROM tris UNION ALL SELECT c FROM tris
),
cnt AS (SELECT vid, COUNT(*) AS c FROM corners GROUP BY vid),
sdeg AS (SELECT src AS vid, COUNT(*) AS deg FROM sym GROUP BY src),
verts AS (SELECT DISTINCT vid FROM (SELECT src AS vid FROM edges UNION ALL SELECT dst FROM edges) v)
SELECT v.vid,
       CAST(COALESCE(d.deg, 0) AS BIGINT) AS deg,
       CAST(COALESCE(cnt.c, 0) AS BIGINT) AS triangles,
       ROUND(CASE WHEN COALESCE(d.deg, 0) >= 2
             THEN CAST(COALESCE(cnt.c, 0) AS DOUBLE) / (d.deg * (d.deg - 1) / 2.0)
             ELSE 0 END, 6) AS lcc
FROM verts v LEFT JOIN sdeg d ON d.vid = v.vid LEFT JOIN cnt ON cnt.vid = v.vid
ORDER BY v.vid
"""

TRANSITIVITY_SQL = f"""
WITH {EDGE_SQL.strip()},
{SYM_SQL.strip()},
{CANON_SQL.strip()},
t AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS triangles
  FROM canon e1
  JOIN canon e2 ON e1.b = e2.a
  JOIN canon e3 ON e3.a = e1.a AND e3.b = e2.b
),
sdeg AS (SELECT src AS vid, COUNT(*) AS deg FROM sym GROUP BY src),
w AS (SELECT CAST(SUM(deg * (deg - 1)) AS BIGINT) // 2 AS wedges FROM sdeg)
SELECT t.triangles, CAST(w.wedges AS BIGINT) AS wedges,
       ROUND(CASE WHEN w.wedges > 0
             THEN 3.0 * t.triangles / w.wedges ELSE 0 END, 6) AS transitivity
FROM t CROSS JOIN w
"""

LINKPRED_SQL = f"""
WITH {EDGE_SQL.strip()},
{SYM_SQL.strip()},
{CANON_SQL.strip()},
sdeg AS (SELECT src AS vid, COUNT(*) AS deg FROM sym GROUP BY src),
centers AS (
  SELECT vid, 1.0 / LN(CAST(deg AS DOUBLE)) AS w
  FROM sdeg WHERE deg >= 2 AND deg <= 64
),
adj AS (
  SELECT s.src AS c, s.dst AS v, ctr.w
  FROM sym s JOIN centers ctr ON ctr.vid = s.src
),
pairs AS (
  SELECT n1.v AS a, n2.v AS b, CAST(COUNT(*) AS BIGINT) AS cn, SUM(n1.w) AS aa
  FROM adj n1 JOIN adj n2 ON n1.c = n2.c AND n1.v < n2.v
  GROUP BY n1.v, n2.v
),
nonedges AS (
  SELECT p.* FROM pairs p
  WHERE NOT EXISTS (SELECT 1 FROM canon e WHERE e.a = p.a AND e.b = p.b)
)
SELECT ne.a, ne.b, ne.cn,
       ROUND(CAST(ne.cn AS DOUBLE) / (da.deg + db.deg - ne.cn), 6) AS jaccard6,
       ROUND(ne.aa, 6) AS aa6
FROM nonedges ne
JOIN sdeg da ON da.vid = ne.a
JOIN sdeg db ON db.vid = ne.b
ORDER BY ne.cn DESC, ne.a ASC, ne.b ASC LIMIT 50
"""

RELATED_PAGES_SQL = f"""
WITH {EDGE_SQL.strip()},
odeg AS (SELECT src, COUNT(*) AS od FROM edges GROUP BY src),
centers AS (SELECT src FROM odeg WHERE od >= 2 AND od <= 64),
e2 AS (SELECT e.src, e.dst FROM edges e JOIN centers c ON c.src = e.src),
pairs AS (
  SELECT a.dst AS q, b.dst AS c, CAST(COUNT(*) AS BIGINT) AS cocite
  FROM e2 a JOIN e2 b ON a.src = b.src AND a.dst <> b.dst
  WHERE a.dst % 50 = 0
  GROUP BY a.dst, b.dst
),
ranked AS (
  SELECT q, c, cocite,
         ROW_NUMBER() OVER (PARTITION BY q ORDER BY cocite DESC, c ASC) AS rn
  FROM pairs
)
SELECT q, c, cocite FROM ranked WHERE rn <= 5
ORDER BY q, cocite DESC, c
"""

EDGE_SAMPLE_SQL = f"""
WITH {EDGE_SQL.strip()}
SELECT src, dst FROM edges
WHERE CAST(concat('0x', substr(md5(
        CAST(src AS STRING) || ':' || CAST(dst AS STRING) || ':0'
      ), 1, 8)) AS BIGINT) % 100 < 10
ORDER BY src, dst
"""

DEGREE_HIST_SQL = f"""
WITH {EDGE_SQL.strip()},
ind AS (SELECT dst AS vid, COUNT(*) AS indeg FROM edges GROUP BY dst)
SELECT CAST(indeg AS BIGINT) AS indeg, CAST(COUNT(*) AS BIGINT) AS n_vertices
FROM ind GROUP BY indeg ORDER BY indeg
"""

EDGE_COUNT_SQL = f"""
WITH {EDGE_SQL.strip()}
SELECT CAST(COUNT(*) AS BIGINT) AS num_edges,
       CAST(COUNT(DISTINCT src) AS BIGINT) AS num_sources
FROM edges
"""

DEDUP_EXACT_SQL = f"""
WITH {DOCS2_SQL.strip()},
h AS (SELECT doc_id, md5(text) AS hh FROM docs2),
g AS (SELECT hh, MIN(doc_id) AS group_id, COUNT(*) AS group_size FROM h GROUP BY hh)
SELECT h.doc_id, CAST(g.group_id AS BIGINT) AS group_id,
       CAST(g.group_size AS BIGINT) AS group_size
FROM h JOIN g ON g.hh = h.hh WHERE g.group_size >= 2 ORDER BY h.doc_id
"""

# DuckDB shingles: 1-based list indexing; i ranges over 1..len-2
_DUCK_SHINGLES = """
toks AS (SELECT doc_id, string_split_regex(lower(trim(text)), '\\s+') AS l FROM docs2),
pos AS (SELECT doc_id, l, unnest(range(1, greatest(len(l) - 1, 1))) AS i FROM toks),
sh AS (
  SELECT DISTINCT doc_id, l[i] || ' ' || l[i+1] || ' ' || l[i+2] AS shingle
  FROM pos
)
"""

MINHASH_SQL = f"""
WITH {DOCS2_SQL.strip()},
{_DUCK_SHINGLES.strip()},
seeds AS (SELECT i AS seed FROM (VALUES (0),(1),(2),(3)) AS t(i))
SELECT sh.doc_id, CAST(seeds.seed AS INT) AS seed,
       MIN(md5(CAST(seeds.seed AS VARCHAR) || ':' || sh.shingle)) AS minhash
FROM sh CROSS JOIN seeds
GROUP BY sh.doc_id, seeds.seed ORDER BY sh.doc_id, seed
"""

JACCARD_SQL = f"""
WITH {DOCS2_SQL.strip()},
{_DUCK_SHINGLES.strip()},
small AS (SELECT * FROM sh WHERE doc_id % 1000000 < 100),
sizes AS (SELECT doc_id, COUNT(*) AS sz FROM small GROUP BY doc_id),
common AS (
  SELECT x.doc_id AS a, y.doc_id AS b, COUNT(*) AS c
  FROM small x JOIN small y ON x.shingle = y.shingle AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
)
SELECT common.a, common.b,
       ROUND(CAST(common.c AS DOUBLE) / (sa.sz + sb.sz - common.c), 6) AS jaccard6
FROM common
JOIN sizes sa ON sa.doc_id = common.a
JOIN sizes sb ON sb.doc_id = common.b
WHERE CAST(common.c AS DOUBLE) / (sa.sz + sb.sz - common.c) >= 0.05
ORDER BY common.a, common.b
"""

DEDUP_CLUSTERS_SQL = f"""
WITH RECURSIVE {DOCS2_SQL.strip()},
{_DUCK_SHINGLES.strip()},
seeds AS (SELECT i AS seed FROM (VALUES (0),(1),(2),(3)) AS t(i)),
sig AS (
  SELECT sh.doc_id, seeds.seed,
         MIN(md5(CAST(seeds.seed AS VARCHAR) || ':' || sh.shingle)) AS minhash
  FROM sh CROSS JOIN seeds GROUP BY sh.doc_id, seeds.seed
),
bands AS (
  SELECT doc_id, seed AS band,
         CAST(seed AS VARCHAR) || '=' || minhash AS band_key
  FROM sig
),
kept AS (
  SELECT b.doc_id, b.band, b.band_key FROM bands b
  JOIN (SELECT band, band_key FROM bands
        GROUP BY band, band_key HAVING COUNT(*) <= 1000) ok
  ON ok.band = b.band AND ok.band_key = b.band_key
),
cand AS (
  SELECT x.doc_id AS a, y.doc_id AS b
  FROM kept x JOIN kept y
    ON x.band = y.band AND x.band_key = y.band_key AND x.doc_id < y.doc_id
  GROUP BY x.doc_id, y.doc_id
),
vsz AS (SELECT doc_id, COUNT(*) AS sz FROM sh GROUP BY doc_id),
comm AS (
  SELECT c.a, c.b, COUNT(*) AS cc
  FROM cand c
  JOIN sh x ON x.doc_id = c.a
  JOIN sh y ON y.doc_id = c.b AND y.shingle = x.shingle
  GROUP BY c.a, c.b
),
near AS (
  SELECT comm.a, comm.b FROM comm
  JOIN vsz sa ON sa.doc_id = comm.a
  JOIN vsz sb ON sb.doc_id = comm.b
  WHERE CAST(cc AS DOUBLE) / (sa.sz + sb.sz - cc) >= 0.5
),
hsh AS (SELECT doc_id, md5(text) AS hh FROM docs2),
grp AS (SELECT hh, MIN(doc_id) AS gid FROM hsh GROUP BY hh HAVING COUNT(*) >= 2),
star AS (
  SELECT grp.gid AS a, hsh.doc_id AS b
  FROM hsh JOIN grp ON grp.hh = hsh.hh WHERE hsh.doc_id <> grp.gid
),
dedges AS (SELECT a, b FROM near UNION SELECT a, b FROM star),
sym AS (
  SELECT a AS v, b AS w FROM dedges UNION SELECT b AS v, a AS w FROM dedges
),
reach AS (
  SELECT v, v AS lbl FROM (SELECT DISTINCT v FROM sym)
  UNION
  SELECT s.w AS v, r.lbl FROM reach r JOIN sym s ON s.v = r.v
),
comp AS (SELECT v, MIN(lbl) AS comp FROM reach GROUP BY v)
SELECT d.doc_id,
       CAST(COALESCE(c.comp, d.doc_id) AS BIGINT) AS cluster_id,
       CAST(CASE WHEN COALESCE(c.comp, d.doc_id) = d.doc_id
            THEN 1 ELSE 0 END AS INT) AS is_canonical
FROM docs2 d LEFT JOIN comp c ON c.v = d.doc_id
ORDER BY d.doc_id
"""

ANCHOR_INDEX_SQL = f"""
WITH {EDGE_SQL.strip()}
SELECT e.dst AS target_id,
       'a' || CAST((e.src + e.dst) % 7 AS VARCHAR) AS anchor,
       COUNT(*) AS n
FROM edges e
GROUP BY e.dst, (e.src + e.dst) % 7
ORDER BY target_id, anchor
"""

TOKEN_STATS_SQL = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
       CAST(length(text) AS BIGINT) AS n_chars,
       ROUND(CASE WHEN len(regexp_extract_all(text, '\\S+')) > 0
             THEN CAST(length(text) AS DOUBLE) / len(regexp_extract_all(text, '\\S+'))
             ELSE 0.0 END, 6) AS avg_token_len6
FROM documents ORDER BY doc_id
"""

QUALITY_SQL = """
SELECT doc_id,
       CAST(len(regexp_extract_all(text, '\\S+')) AS BIGINT) AS n_tokens,
       ROUND(CAST(length(text) - length(regexp_replace(text, '[.,;:!?''"()\\[\\]{}-]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1), 6) AS punct_ratio,
       ROUND(CAST(length(text) - length(regexp_replace(text, '[0-9]', '', 'g')) AS DOUBLE)
             / greatest(length(text), 1), 6) AS digit_ratio
FROM documents ORDER BY doc_id
"""

def _lang_markers() -> dict[str, list[str]]:
    # Single source of truth: the engine's lexicon — a copy here would
    # drift (it did: zh was missing from the oracle until a review pass).
    from linkgraph.textops.quality import LANG_MARKERS

    return LANG_MARKERS


_MARKER_VALUES = ", ".join(
    f"('{lang}', '{w}')"
    for lang, ws in _lang_markers().items()
    for w in ws
)

LANGID_SQL = f"""
WITH markers AS (SELECT lang, word FROM (VALUES {_MARKER_VALUES}) AS m(lang, word)),
toks AS (
  -- CJK-bearing tokens excluded: their hits come from the cjk stream
  -- only (twin of the engine's no-double-count rule)
  SELECT doc_id, word FROM (
    SELECT doc_id, unnest(string_split_regex(lower(trim(text)), '\\s+')) AS word
    FROM documents
  ) WHERE NOT regexp_matches(word, '[一-鿿]')
),
-- twin of the engine's per-character CJK stream (zh markers are single
-- characters that whitespace tokenization can't isolate)
cjk AS (
  SELECT doc_id, unnest(regexp_extract_all(text, '[一-鿿]')) AS word
  FROM documents
),
allw AS (
  SELECT doc_id, word FROM toks UNION ALL SELECT doc_id, word FROM cjk
),
hits AS (
  SELECT doc_id, lang, COUNT(*) AS hits
  FROM allw JOIN markers USING (word) GROUP BY doc_id, lang
),
best AS (
  SELECT doc_id, lang, hits,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY hits DESC, lang ASC) AS rn
  FROM hits
)
SELECT d.doc_id, COALESCE(b.lang, 'und') AS pred_lang,
       CAST(COALESCE(b.hits, 0) AS BIGINT) AS lang_hits
FROM documents d LEFT JOIN (SELECT * FROM best WHERE rn = 1) b USING (doc_id)
ORDER BY d.doc_id
"""

# Shared token expression for the corpus-curation twins: split on single
# spaces, drop empties — the exact twin of textops.corpus._tokens.
_CORPUS_TOKS = "list_filter(string_split(text, ' '), x -> x <> '')"

REPETITION_SQL = f"""
WITH base AS (
  SELECT doc_id, {_CORPUS_TOKS} AS tok, len({_CORPUS_TOKS}) AS n FROM documents
),
bipos AS (SELECT doc_id, tok, UNNEST(generate_series(1, n-1)) AS i FROM base WHERE n >= 2),
bi AS (SELECT doc_id, tok[i] || ' ' || tok[i+1] AS gram FROM bipos),
tripos AS (SELECT doc_id, tok, UNNEST(generate_series(1, n-2)) AS i FROM base WHERE n >= 3),
tri AS (SELECT doc_id, tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] AS gram FROM tripos),
bic AS (SELECT doc_id, MAX(c) AS maxbi FROM (SELECT doc_id, gram, COUNT(*) c FROM bi GROUP BY 1,2) GROUP BY 1),
tric AS (SELECT doc_id, SUM(CASE WHEN c > 1 THEN c ELSE 0 END) AS dup, SUM(c) AS tot
         FROM (SELECT doc_id, gram, COUNT(*) c FROM tri GROUP BY 1,2) GROUP BY 1),
dis AS (SELECT doc_id, len(list_distinct(tok)) AS nd FROM base)
SELECT b.doc_id,
  CAST(b.n AS BIGINT) AS n_tokens,
  ROUND(CASE WHEN b.n > 0 THEN nd * 1.0 / b.n ELSE 0 END, 6) AS distinct_ratio,
  ROUND(COALESCE(maxbi * 2.0 / b.n, 0), 6) AS top_bigram_frac,
  ROUND(COALESCE(dup * 1.0 / tot, 0), 6) AS dup_trigram_frac
FROM base b JOIN dis USING(doc_id) LEFT JOIN bic USING(doc_id) LEFT JOIN tric USING(doc_id)
ORDER BY b.doc_id
"""

# Trigram CTE shared by the boilerplate and contamination twins.
_CORPUS_TRI_SQL = f"""
grams AS (
  SELECT doc_id, tok[i] || ' ' || tok[i+1] || ' ' || tok[i+2] AS gram
  FROM (
    SELECT doc_id, tok, UNNEST(generate_series(1, n-2)) AS i
    FROM (SELECT doc_id, {_CORPUS_TOKS} AS tok, len({_CORPUS_TOKS}) AS n FROM documents)
    WHERE n >= 3
  )
),
totals AS (
  SELECT doc_id, GREATEST(len({_CORPUS_TOKS}) - 2, 0) AS n_ngrams FROM documents
)
"""

BOILERPLATE_SQL = f"""
WITH {_CORPUS_TRI_SQL.strip()},
dfreq AS (
  SELECT gram FROM (SELECT gram, COUNT(DISTINCT doc_id) AS df FROM grams GROUP BY gram)
  WHERE df >= 3
),
matched AS (
  SELECT g.doc_id, COUNT(*) AS n_boiler FROM grams g JOIN dfreq USING(gram) GROUP BY g.doc_id
)
SELECT t.doc_id,
  CAST(t.n_ngrams AS BIGINT) AS n_ngrams,
  ROUND(CASE WHEN t.n_ngrams > 0 THEN COALESCE(m.n_boiler, 0) * 1.0 / t.n_ngrams ELSE 0 END, 6) AS boiler_frac
FROM totals t LEFT JOIN matched m USING(doc_id) ORDER BY t.doc_id
"""

CONTAMINATION_SQL = f"""
WITH {_CORPUS_TRI_SQL.strip()},
bench AS (SELECT DISTINCT gram FROM grams WHERE doc_id % 50 = 0),
matched AS (
  SELECT g.doc_id, COUNT(*) AS n_hit FROM grams g JOIN bench USING(gram) GROUP BY g.doc_id
)
SELECT t.doc_id,
  CAST(t.n_ngrams AS BIGINT) AS n_ngrams,
  ROUND(CASE WHEN t.n_ngrams > 0 THEN COALESCE(m.n_hit, 0) * 1.0 / t.n_ngrams ELSE 0 END, 6) AS contam_frac
FROM totals t LEFT JOIN matched m USING(doc_id) ORDER BY t.doc_id
"""

PARAGRAPH_DEDUP_SQL = f"""
WITH {DOCS2_SQL.strip()},
base AS (SELECT doc_id, {_CORPUS_TOKS} AS tok FROM docs2),
bn AS (SELECT doc_id, tok, len(tok) AS n FROM base),
pp AS (
  SELECT doc_id, tok, UNNEST(generate_series(0, CAST(CEIL(n / 12.0) AS INT) - 1)) AS p
  FROM bn WHERE n > 0
),
paras AS (
  SELECT doc_id, p AS pos,
         array_to_string(list_slice(tok, p * 12 + 1, p * 12 + 12), ' ') AS para
  FROM pp
),
ranked AS (
  SELECT doc_id, pos, para,
         ROW_NUMBER() OVER (PARTITION BY md5(para) ORDER BY doc_id, pos) AS rn
  FROM paras
),
kept AS (SELECT doc_id, pos, para FROM ranked WHERE rn = 1),
agg AS (
  SELECT doc_id, CAST(COUNT(*) AS BIGINT) AS n_kept,
         md5(string_agg(para, ' ' ORDER BY pos)) AS clean_md5
  FROM kept GROUP BY doc_id
),
tot AS (
  SELECT doc_id,
         CAST(CASE WHEN n > 0 THEN CEIL(n / 12.0) ELSE 0 END AS BIGINT) AS n_paras
  FROM bn
)
SELECT t.doc_id, t.n_paras,
       CAST(COALESCE(a.n_kept, 0) AS BIGINT) AS n_kept,
       COALESCE(a.clean_md5, md5('')) AS clean_md5
FROM tot t LEFT JOIN agg a USING(doc_id) ORDER BY t.doc_id
"""

# deterministic messy-URL corpus (shared text — evaluates identically in
# Spark SQL and DuckDB, like EDGE_SQL): mixed-case scheme/host/path,
# default and non-default ports, trailing slashes, fragments
MESSY_URL_SQL = """
murls AS (
  SELECT doc_id,
         'HTTP' || (CASE WHEN doc_id % 2 = 0 THEN 'S' ELSE '' END) ||
         '://ExAmple' || CAST(doc_id % 7 AS STRING) || '.CoM' ||
         (CASE doc_id % 4 WHEN 0 THEN ':80' WHEN 1 THEN ':443'
               WHEN 2 THEN ':8080' ELSE '' END) ||
         '/Path/To/' || CAST(doc_id AS STRING) ||
         (CASE WHEN doc_id % 5 = 0 THEN '/' ELSE '' END) ||
         (CASE WHEN doc_id % 3 = 0
               THEN '#Frag' || CAST(doc_id AS STRING) ELSE '' END) AS url
  FROM documents
)
"""

URL_CANONICAL_SQL = f"""
WITH {MESSY_URL_SQL.strip()},
defrag AS (
  SELECT doc_id, url, regexp_replace(url, '#.*$', '') AS u FROM murls
),
split AS (
  SELECT doc_id, url, u, regexp_extract(u, '^[^/]*//[^/]*', 0) AS head
  FROM defrag
)
SELECT doc_id, url,
       regexp_replace(
         concat(
           regexp_replace(lower(head), ':(80|443)$', ''),
           substr(u, length(head) + 1)
         ),
         '/$', ''
       ) AS canon_url
FROM split ORDER BY doc_id
"""

TFIDF_SQL = f"""
WITH toks AS (
  SELECT doc_id, UNNEST({_CORPUS_TOKS}) AS term FROM documents
),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
nn AS (SELECT COUNT(*) AS n FROM documents),
dfreq AS (SELECT term, COUNT(*) AS df FROM tf GROUP BY term),
scored AS (
  SELECT tf.doc_id, tf.term, ROUND(tf.tf * LN(nn.n * 1.0 / dfreq.df), 6) AS tfidf
  FROM tf JOIN dfreq USING(term) CROSS JOIN nn
),
ranked AS (
  SELECT doc_id, term, tfidf,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY tfidf DESC, term ASC) AS rk
  FROM scored
)
SELECT doc_id, term, tfidf FROM ranked WHERE rk <= 1 ORDER BY doc_id
"""

# twin of textops.corpus.duplicate_spans over docs2, n=12: windows that
# occur ≥2× corpus-wide, interval-union span coverage via LEAD
DUPSPANS_SQL = f"""
WITH {DOCS2_SQL.strip()},
base AS (SELECT doc_id, {_CORPUS_TOKS} AS tok, len({_CORPUS_TOKS}) AS n FROM docs2),
wins AS (
  SELECT doc_id, i - 1 AS pos,
         array_to_string(list_slice(tok, i, i + 11), ' ') AS gram
  FROM (SELECT doc_id, tok, UNNEST(generate_series(1, n - 11)) AS i FROM base WHERE n >= 12)
),
dupg AS (SELECT gram FROM (SELECT gram, COUNT(*) AS c FROM wins GROUP BY gram) WHERE c >= 2),
dupw AS (SELECT w.doc_id, w.pos FROM wins w JOIN dupg USING(gram)),
cov AS (
  SELECT doc_id,
         LEAST(COALESCE(LEAD(pos) OVER (PARTITION BY doc_id ORDER BY pos) - pos, 12), 12) AS cov
  FROM dupw
),
per AS (SELECT doc_id, COUNT(*) AS dup_windows, SUM(cov) AS dup_tokens FROM cov GROUP BY doc_id)
SELECT b.doc_id,
  CAST(b.n AS BIGINT) AS n_tokens,
  CAST(GREATEST(b.n - 11, 0) AS BIGINT) AS n_windows,
  CAST(COALESCE(p.dup_windows, 0) AS BIGINT) AS dup_windows,
  CAST(COALESCE(p.dup_tokens, 0) AS BIGINT) AS dup_tokens,
  ROUND(CASE WHEN b.n > 0 THEN COALESCE(p.dup_tokens, 0) * 1.0 / b.n ELSE 0 END, 6) AS dup_token_frac
FROM base b LEFT JOIN per p USING(doc_id) ORDER BY b.doc_id
"""

# twin of textops.corpus.unigram_surprisal over documents
SURPRISAL_SQL = f"""
WITH toks AS (SELECT doc_id, UNNEST({_CORPUS_TOKS}) AS term FROM documents),
tf AS (SELECT doc_id, term, COUNT(*) AS tf FROM toks GROUP BY 1, 2),
vocab AS (SELECT term, SUM(tf) AS cf FROM tf GROUP BY term),
tot AS (SELECT SUM(cf) AS total FROM vocab),
per AS (
  SELECT tf.doc_id, SUM(tf.tf) AS n_tokens,
         SUM(tf.tf * -LOG2(vocab.cf * 1.0 / tot.total)) / SUM(tf.tf) AS ms
  FROM tf JOIN vocab USING(term) CROSS JOIN tot GROUP BY tf.doc_id
)
SELECT d.doc_id, CAST(COALESCE(p.n_tokens, 0) AS BIGINT) AS n_tokens,
       ROUND(COALESCE(p.ms, 0), 6) AS mean_surprisal
FROM documents d LEFT JOIN per p USING(doc_id) ORDER BY d.doc_id
"""

ANN_SQL = """
WITH q AS (SELECT vec_id AS query_id, CAST(embedding AS DOUBLE[]) AS qv FROM embeddings WHERE vec_id < 5),
c AS (SELECT vec_id, CAST(embedding AS DOUBLE[]) AS cv FROM embeddings)
SELECT q.query_id, c.vec_id,
       ROUND(list_cosine_similarity(q.qv, c.cv), 5) AS cosine5
FROM q CROSS JOIN c
WHERE q.query_id <> c.vec_id
  AND ROUND(list_cosine_similarity(q.qv, c.cv), 5) >= 0.2
ORDER BY q.query_id, c.vec_id
"""

EVENTS_TOP_TYPE_SQL = """
WITH cnt AS (
  SELECT user_id, event_type, COUNT(*) AS cnt FROM events GROUP BY user_id, event_type
),
best AS (
  SELECT user_id, event_type, cnt,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY cnt DESC, event_type ASC) AS rn
  FROM cnt
)
SELECT user_id, event_type AS top_type, CAST(cnt AS BIGINT) AS cnt
FROM best WHERE rn = 1 ORDER BY user_id
"""

EVENTS_LATEST_SQL = """
WITH best AS (
  SELECT user_id, event_id, ts, value,
         ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY ts DESC, event_id DESC) AS rn
  FROM events
)
SELECT user_id, event_id, ts, ROUND(value, 4) AS value4
FROM best WHERE rn = 1 ORDER BY user_id
"""

EVENTS_DAILY_SQL = """
SELECT strftime(ts, '%Y-%m-%d') AS day, event_type,
       CAST(COUNT(*) AS BIGINT) AS n,
       ROUND(SUM(value), 4) AS total_value4
FROM events GROUP BY strftime(ts, '%Y-%m-%d'), event_type ORDER BY day, event_type
"""

EVENTS_JSON_SQL = """
SELECT event_type,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS k_sum,
       CAST(COUNT(*) AS BIGINT) AS n
FROM events GROUP BY event_type ORDER BY event_type
"""

LINEITEM_PRICING_SQL = """
SELECT l_returnflag, l_linestatus,
       ROUND(SUM(l_quantity), 2) AS sum_qty,
       ROUND(SUM(l_extendedprice), 2) AS sum_base_price,
       ROUND(SUM(l_extendedprice * (1 - l_discount)), 2) AS sum_disc_price,
       ROUND(AVG(l_quantity), 6) AS avg_qty,
       CAST(COUNT(*) AS BIGINT) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
GROUP BY l_returnflag, l_linestatus
ORDER BY l_returnflag, l_linestatus
"""
