"""Pages → text + links extraction (reference I5, SURVEY.md §2.2).

The graft's web-corpus front end (BASELINE.json:15): from an Iceberg/
Parquet table of Common-Crawl-style pages ``(url, warc_ts, html, text,
lang)``, derive

- ``extract_text(html)`` — deterministic visible-text extraction with the
  binding per-row invariant **byte-identical extracted text per url**
  (property-tested: idempotent, partitioning/parallelism-independent);
- ``extract_links(html)`` — the page's outgoing hrefs, feeding the edge
  builder.

Both run as ONE vectorized ``mapInArrow`` pass over the corpus (Arrow
batches in, Arrow batches out — no per-row Python dispatch).  The parser
is a small deterministic regex HTML subset parser written for this
engine: pure function of the bytes, no external libraries, so the same
bytes always yield the same text on any executor — that purity IS the
invariant.

Latest-snapshot-per-url dedup (multiple WARC captures of one url) is a
window ``row_number over (partition by url order by warc_ts desc)`` —
SURVEY.md §2.5 date/time row.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

# --- pure extraction functions (shipped by value into UDF closures) -------

_SCRIPT_RE = re.compile(rb"<(script|style)\b[^>]*>.*?</\1>", re.S | re.I)
_COMMENT_RE = re.compile(rb"<!--.*?-->", re.S)
# backreference pins the closing quote to the opening one: an url
# containing the OTHER quote character (e.g. .../o'brien) must not be
# silently truncated at it — a truncated dst_url fails the dictionary
# join and the edge vanishes from the graph.  The second alternative
# accepts the (valid, common) UNQUOTED form `href=/path` — value runs to
# the first whitespace or '>' per the HTML spec; quoted matching is
# attempted first so quoted pages parse exactly as before.
# the lookbehind rejects hyphen/colon/word chars before `href`, so
# attribute names that merely END in href (data-href, ng-href,
# xlink:href — non-navigational templating) cannot emit phantom edges
_HREF_RE = re.compile(
    rb"""<a\b[^>]*?(?<![\w:-])href\s*=\s*(?:(["'])([^<>]*?)\1|([^\s>"'][^\s>]*))""",
    re.I,
)
_TAG_RE = re.compile(rb"<[^>]+>")
_BLOCK_TAG_RE = re.compile(
    rb"</?(p|div|br|li|ul|ol|h[1-6]|tr|table|title|head|body|html)\b[^>]*>", re.I
)
_WS_RE = re.compile(rb"[ \t\r\f\v]+")


def extract_text(html: bytes) -> str:
    """Deterministic visible text of an HTML page.

    Pure function of the bytes: strip script/style/comments, break on
    block tags, drop all tags, collapse whitespace.  The golden-bytes
    tests pin this byte-for-byte (BASELINE.json:15).
    """
    if html is None:
        return ""
    b = _SCRIPT_RE.sub(b"", html)
    b = _COMMENT_RE.sub(b"", b)
    b = _BLOCK_TAG_RE.sub(b"\n", b)
    b = _TAG_RE.sub(b" ", b)
    b = _WS_RE.sub(b" ", b)
    lines = [ln.strip() for ln in b.split(b"\n")]
    # joining only NON-EMPTY stripped lines already guarantees single
    # newlines between segments — no blank-line collapse pass needed
    b = b"\n".join(ln for ln in lines if ln)
    return b.decode("utf-8", errors="replace").strip()


_ATAG_RE = re.compile(rb"<a\b[^>]*", re.I)
# rel value containing the nofollow token (quoted or unquoted form; the
# same quote-backreference grammar as href, so `rel="nofollow ugc"` and
# `rel=nofollow` both match while `relx=` / `data-rel=` cannot)
_REL_NOFOLLOW_RE = re.compile(
    rb"""(?<![\w:-])rel\s*=\s*(?:(["'])[^"'<>]*?\bnofollow\b[^"'<>]*?\1"""
    rb"""|[^\s>"']*\bnofollow\b[^\s>"']*)""",
    re.I,
)
_HREF_IN_TAG_RE = re.compile(
    rb"""(?<![\w:-])href\s*=\s*(?:(["'])([^<>]*?)\1|([^\s>"'][^\s>]*))""",
    re.I,
)


def extract_links(html: bytes, include_nofollow: bool = True) -> list[str]:
    """All href targets of ``<a>`` tags, in document order.

    ``include_nofollow=False`` drops links whose ``<a>`` tag carries a
    ``rel`` value containing the ``nofollow`` token (RFC-style link-spam
    hygiene: nofollow'd links are exactly the ones a site disavows for
    ranking, so a spam-aware PageRank excludes them at extraction).  The
    default keeps every link — the byte-pinned golden-bytes invariant
    covers the default path, and nofollow-aware extraction is a strict
    filter on top (per-tag scan instead of the single-document regex
    pass — ~2× the regex work, same Arrow batch shape).
    """
    if html is None:
        return []
    if include_nofollow:
        return [
            (m.group(2) if m.group(2) is not None else m.group(3)).decode(
                "utf-8", errors="replace"
            )
            for m in _HREF_RE.finditer(html)
        ]
    out = []
    for tag in _ATAG_RE.finditer(html):
        body = tag.group(0)
        if _REL_NOFOLLOW_RE.search(body):
            continue
        m = _HREF_IN_TAG_RE.search(body)
        if m is not None:
            out.append(
                (m.group(2) if m.group(2) is not None else m.group(3)).decode(
                    "utf-8", errors="replace"
                )
            )
    return out


# --- Spark surface --------------------------------------------------------

EXTRACTED_SCHEMA = "url string, warc_ts timestamp, lang string, text string, links array<string>"


def extract_pages(pages: DataFrame, passthrough: tuple[str, ...] = ()) -> DataFrame:
    """One Arrow pass: pages → ``(url, warc_ts, lang, text, links)``.

    ``mapInArrow`` keeps the whole batch in Arrow buffers; the regex
    extraction runs per-row inside the batch loop but with zero
    serialization overhead per row (SURVEY.md §4.7).

    ``passthrough`` names extra input columns to carry through unchanged
    (appended after the extracted columns) — e.g. a capture-identity
    hash computed upstream for streaming compaction.
    """
    # rebind as locals so cloudpickle ships the pure functions by value
    _extract_text, _extract_links = extract_text, extract_links
    extra = tuple(passthrough)
    schema = EXTRACTED_SCHEMA
    if extra:
        fields = {f.name: f for f in pages.schema.fields}
        schema = EXTRACTED_SCHEMA + "".join(
            f", {c} {fields[c].dataType.simpleString()}" for c in extra
        )

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            cols = {n: batch.column(n) for n in batch.schema.names}
            htmls = cols["html"].to_pylist()
            texts = [_extract_text(h) for h in htmls]
            links = [_extract_links(h) for h in htmls]
            yield pa.RecordBatch.from_arrays(
                [
                    cols["url"],
                    cols["warc_ts"],
                    cols["lang"],
                    pa.array(texts, type=pa.string()),
                    pa.array(links, type=pa.list_(pa.string())),
                ]
                + [cols[c] for c in extra],
                names=["url", "warc_ts", "lang", "text", "links", *extra],
            )

    return pages.mapInArrow(run, schema=schema)


def latest_snapshot_per_url(pages: DataFrame) -> DataFrame:
    """Keep only the most recent WARC capture of each url.

    Deterministic under capture-time ties: tie-break on the page bytes'
    hash so re-runs pick the same row.
    """
    w = Window.partitionBy("url").orderBy(
        F.desc("warc_ts"), F.desc(F.xxhash64(F.col("html")))
    )
    return (
        pages.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .drop("_rn")
    )


def pages_to_edge_urls(pages: DataFrame) -> DataFrame:
    """pages → distinct (src_url, dst_url) link pairs.

    Full front-end chain: latest-snapshot dedup → extraction →
    ``explode(links)`` (SURVEY.md §2.5 array row) → self-link drop.
    Join to the vertex dictionary afterwards (linkgraph.dictionary).
    """
    latest = latest_snapshot_per_url(pages)
    extracted = extract_pages(latest)
    return (
        extracted.select(
            F.col("url").alias("src_url"),
            F.explode("links").alias("dst_url"),
        )
        .where(F.col("src_url") != F.col("dst_url"))
        .dropDuplicates(["src_url", "dst_url"])
    )


def host_of(col) -> "F.Column":
    """Host component of an absolute http(s) url, JVM-side.

    ``regexp_extract`` with the simple-subset pattern
    ``^https?://([^/?#]+)`` — identical semantics in Spark and DuckDB
    (the host_graph catalog oracle replays it), lowercased (hostnames
    are case-insensitive, RFC 3986 §3.2.2).  Urls with no match (wrong
    scheme, relative) yield NULL so callers can drop or bucket them.
    """
    h = F.lower(F.regexp_extract(col, r"^https?://([^/?#]+)", 1))
    return F.when(h != "", h)


def canonical_url(col) -> "F.Column":
    """Canonical form of an absolute http(s) url, JVM-side — the
    normalization pass every crawl dedup applies before url-keyed
    joins (RFC 3986 §6 syntax-based normalization, the deterministic
    subset):

    1. strip the fragment (``#...`` — never sent to the server),
    2. lowercase the scheme+authority (case-insensitive per RFC 3986
       §3.1/§3.2.2; the PATH keeps its case — it is case-sensitive),
    3. drop an explicit default port (``:80``/``:443``),
    4. drop one trailing slash.

    Pure ``regexp_extract``/``regexp_replace``/``substring`` column
    ops in the engine-portable regex subset (anchored, no lookaround),
    so the ``url_canonical`` catalog oracle replays it textually in
    DuckDB.  Non-url strings pass through steps 1/3/4 unchanged (the
    authority regex matches empty → nothing is lowercased).
    """
    u = F.regexp_replace(col, "#.*$", "")
    head = F.regexp_extract(u, "^[^/]*//[^/]*", 0)  # scheme://host[:port]
    rest = F.substring(u, F.length(head) + F.lit(1), F.length(u))
    head_norm = F.regexp_replace(F.lower(head), ":(80|443)$", "")
    return F.regexp_replace(F.concat(head_norm, rest), "/$", "")


def host_graph(
    url_pairs: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
    include_self: bool = False,
) -> DataFrame:
    """Page-level link pairs → host-level graph
    ``(src_host, dst_host, weight)``.

    The standard web-graph rollup (Common Crawl publishes exactly this
    artifact next to its page graph): weight = number of page-level
    links between the two hosts.  ``include_self=False`` (default)
    drops intra-host edges — the bulk of raw links are navigation
    within a site and drown inter-host signal.  Unparseable urls (NULL
    host) are dropped.

    Scale shape: one JVM regexp pass + one hash aggregation whose key
    space is |hosts|² ≪ |E| — partial (map-side) aggregation collapses
    each task's repeats before the shuffle, so shuffled volume is
    bounded by distinct host pairs per task, not page-level links.
    """
    pairs = url_pairs.select(
        host_of(F.col(src_col)).alias("src_host"),
        host_of(F.col(dst_col)).alias("dst_host"),
    ).where(F.col("src_host").isNotNull() & F.col("dst_host").isNotNull())
    if not include_self:
        pairs = pairs.where(F.col("src_host") != F.col("dst_host"))
    return pairs.groupBy("src_host", "dst_host").agg(
        F.count(F.lit(1)).alias("weight")
    )


def inlink_host_diversity(
    url_pairs: DataFrame,
    src_col: str = "src_url",
    dst_col: str = "dst_url",
) -> DataFrame:
    """Per-target inlink host-diversity — the classic link-spam signal
    (Gyöngyi & Garcia-Molina, *Web Spam Taxonomy*, 2005: link farms
    concentrate a page's inlinks on few hosts; editorial popularity
    spreads them).  Companion to the propagation-based
    :func:`~linkgraph.algorithms.trustrank.spam_mass` — this is the
    local/structural signal, that one the global one.

    One row per link target: ``(dst_url, inlinks, distinct_hosts,
    host_diversity, top_host_share)`` with ``host_diversity =
    distinct_hosts / inlinks`` (1.0 = every inlink from a different
    host) and ``top_host_share = max inlinks from any single host /
    inlinks`` (→1.0 = one host supplies them all — farm-shaped).
    Unparseable source urls (NULL host) are dropped.

    Scale shape at 10¹²-doc scale: two stacked hash aggregations —
    (dst_url, src_host) first, which map-side combines so a farm host
    throwing 10⁹ links at one target reaches the reducer once per map
    partition, then a per-dst rollup whose group size is bounded by the
    target's DISTINCT host count, not its raw inlink count.  A
    hub-page's row never materializes its inlink list anywhere.
    """
    ph = url_pairs.select(
        F.col(dst_col).alias("dst_url"),
        host_of(F.col(src_col)).alias("src_host"),
    ).where(F.col("src_host").isNotNull())
    per_host = ph.groupBy("dst_url", "src_host").agg(
        F.count(F.lit(1)).alias("c")
    )
    return per_host.groupBy("dst_url").agg(
        F.sum("c").cast("long").alias("inlinks"),
        F.count(F.lit(1)).cast("long").alias("distinct_hosts"),
        F.round(
            F.count(F.lit(1)).cast("double") / F.sum("c"), 6
        ).alias("host_diversity"),
        F.round(F.max("c").cast("double") / F.sum("c"), 6).alias(
            "top_host_share"
        ),
    )


# --- anchor text ------------------------------------------------------------

_ANCHOR_RE = re.compile(rb"<a\b([^>]*)>(.*?)</a\s*>", re.S | re.I)
_HREF_IN_TAG_RE = re.compile(
    rb"""(?<![\w:-])href\s*=\s*(?:(["'])([^<>]*?)\1|([^\s>"'][^\s>]*))""",
    re.I,
)
_ANY_WS_RE = re.compile(rb"\s+")


def extract_anchor_texts(html: bytes) -> list[tuple[str, str]]:
    """``(href, anchor_text)`` pairs of closed ``<a>`` tags, in document
    order.

    Same href grammar as ``extract_links`` (quote-backreference +
    unquoted form, templating-attribute lookbehind), restricted to
    anchors with a matching ``</a>`` so there is text to pair; anchor
    text is the inner content with tags dropped and whitespace
    collapsed — the same cleaning rules as ``extract_text``.  Anchors
    without an ``href`` (name anchors) are skipped.  Pure function of
    the bytes, like the other extractors: the (href, anchor) multiset
    is partition- and parallelism-independent by construction.
    """
    if html is None:
        return []
    out = []
    for m in _ANCHOR_RE.finditer(html):
        href_m = _HREF_IN_TAG_RE.search(m.group(1))
        if href_m is None:
            continue
        href = (
            href_m.group(2) if href_m.group(2) is not None else href_m.group(3)
        ).decode("utf-8", errors="replace")
        inner = _TAG_RE.sub(b" ", m.group(2))
        inner = _ANY_WS_RE.sub(b" ", inner).strip()
        out.append((href, inner.decode("utf-8", errors="replace")))
    return out


ANCHOR_SCHEMA = "url string, href string, anchor string"


def anchor_pages(pages: DataFrame) -> DataFrame:
    """One Arrow pass: pages → flat ``(url, href, anchor)`` rows.

    Emits the exploded pair rows directly from the batch loop (a
    ``mapInArrow`` batch may yield any number of output rows), so no
    separate array column + explode shuffle stage is needed.
    """
    _extract = extract_anchor_texts

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        for batch in batches:
            urls = batch.column("url").to_pylist()
            htmls = batch.column("html").to_pylist()
            u_out, h_out, a_out = [], [], []
            for u, h in zip(urls, htmls):
                for href, anchor in _extract(h):
                    u_out.append(u)
                    h_out.append(href)
                    a_out.append(anchor)
            yield pa.RecordBatch.from_arrays(
                [
                    pa.array(u_out, type=pa.string()),
                    pa.array(h_out, type=pa.string()),
                    pa.array(a_out, type=pa.string()),
                ],
                names=["url", "href", "anchor"],
            )

    return pages.mapInArrow(run, schema=ANCHOR_SCHEMA)


def anchor_index(
    anchors: DataFrame,
    by_host: bool = False,
    top_k: int | None = None,
) -> DataFrame:
    """Inverted anchor-text index: what the web calls each target.

    ``(target, anchor, n)`` — n = number of links carrying that anchor
    text to that target (the classic search-engine ranking/description
    signal).  ``by_host=True`` rolls targets up to their host.
    ``top_k`` keeps only each target's k most common anchors
    (count-desc, anchor-asc tie-break — deterministic), via a window
    rank AFTER the count aggregation, so the window input is already
    collapsed to distinct (target, anchor) rows, never raw links.

    Scale shape: one map-side-combined count aggregation (shuffled
    volume ∝ distinct (target, anchor) pairs per task) + an optional
    |distinct-pairs| window.  Hub targets with millions of distinct
    anchors skew the window's partition; at that regime pre-filter with
    ``HAVING n > 1`` semantics upstream or leave top_k None.
    """
    target = (
        host_of(F.col("href")) if by_host else F.col("href")
    ).alias("target")
    counts = (
        anchors.where(F.col("anchor") != "")
        .select(target, "anchor")
        .where(F.col("target").isNotNull())
        .groupBy("target", "anchor")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    if top_k is None:
        return counts
    w = Window.partitionBy("target").orderBy(
        F.desc("n"), F.asc("anchor")
    )
    return (
        counts.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= top_k)
        .drop("_rk")
    )


def resolve_redirects(
    redirects: DataFrame,
    src_col: str = "src",
    dst_col: str = "dst",
    max_rounds: int = 64,
) -> DataFrame:
    """Collapse redirect/canonical chains by pointer doubling →
    ``(src, target, hops, resolved)``.

    ``redirects`` is a FUNCTIONAL mapping (≤1 outgoing redirect per
    source: HTTP 301/302, ``rel=canonical``, mirror aliases).  A crawl
    stores one hop per page; consumers need the FINAL target —
    following chains one hop per Spark job costs a job per chain link.
    Pointer doubling composes the mapping with itself each round
    (``f ← f∘f``), so a chain of length L resolves in ⌈log₂ L⌉ rounds —
    at web scale (chains of thousands of hops exist in the wild via
    redirect loops-with-tails and URL-rewrite cascades) this is the
    difference between 12 jobs and thousands.

    Per round: ONE self-equi-join of the (src, ptr) state on
    ``ptr == src`` (AQE handles the skew; state size is |redirects|,
    CONSTANT across rounds — nothing accumulates) plus the convergence
    count.  ``hops`` adds through composition (hops_a + hops_b), so the
    output reports true chain length, not round count.

    Cycles (``a→b→a``): a pointer inside a cycle never leaves it, so
    such rows are still un-terminal after ``max_rounds`` and are
    returned with ``resolved = false`` and ``target`` = wherever the
    pointer stopped — the caller's signal to drop the URL (a redirect
    cycle serves no content).  Rows whose chain merely PASSES THROUGH
    long chains resolve normally; ⌈log₂ L⌉ ≤ 64 covers any L that fits
    in memory anywhere.
    """
    from linkgraph.superstep import plain_checkpoint

    state = plain_checkpoint(
        redirects.select(
            F.col(src_col).cast("long").alias("src"),
            F.col(dst_col).cast("long").alias("ptr"),
            F.lit(1).cast("long").alias("hops"),
            F.lit(False).alias("done"),
        )
    )
    for _ in range(max_rounds):
        hop = state.select(
            F.col("src").alias("_k"),
            F.col("ptr").alias("_p"),
            F.col("hops").alias("_h"),
        )
        nxt = plain_checkpoint(
            state.join(hop, state["ptr"] == hop["_k"], "left").select(
                "src",
                F.coalesce("_p", "ptr").alias("ptr"),
                # clamp: a CYCLE row's hop count doubles every round and
                # would overflow BIGINT at round ~63 (ANSI mode raises,
                # killing the job on the exact input the resolved=false
                # contract exists for); 2^40 is far beyond any real
                # chain, and resolved rows stop accumulating at their
                # true length long before the clamp
                F.least(
                    F.col("hops") + F.coalesce("_h", F.lit(0)),
                    F.lit(1 << 40).cast("long"),
                ).alias("hops"),
                # terminal ⇔ the pointer is not itself a redirect source
                (F.col("done") | F.col("_p").isNull()).alias("done"),
            ),
            replaces=state,
        )
        state = nxt
        if state.where(~F.col("done")).isEmpty():
            break
    return state.select(
        "src",
        F.col("ptr").alias("target"),
        "hops",
        F.col("done").alias("resolved"),
    )


def robots_allowed(
    urls: DataFrame,
    rules: DataFrame,
    url_col: str = "url",
) -> DataFrame:
    """Crawl-politeness filter: apply per-host robots rules to a URL
    set → input columns plus ``(allowed, matched_prefix)``.

    ``rules`` has columns ``(host, path_prefix, allow)`` — the parsed
    form of a robots.txt group (one row per Allow/Disallow line for the
    crawler's user-agent; parsing the raw file is a line-split — the
    hard part, implemented here, is the MATCH semantics).  Matching
    follows the public robots exclusion standard (RFC 9309 §2.2.2):
    the rule with the LONGEST matching path prefix wins; on a
    length tie Allow wins; a URL matching no rule is allowed.

    Physical shape at 100 TB: rules tables are small by definition
    (one site's robots group is a few dozen lines; even 10⁸ hosts ×
    ~10 rules is a broadcastable side) — the URL side NEVER shuffles:
    host extraction is a JVM regexp projection, the rule join is
    host-keyed (AQE broadcasts it), the winner pick is a
    map-side-combinable max_by struct aggregation keyed on the url —
    NOT a window (no sort), so a host with 10⁹ crawled URLs costs one
    partial-agg pass, and the per-url group is bounded by |that host's
    rules|.
    """
    path = F.regexp_replace(
        F.col(url_col), r"^[a-zA-Z][a-zA-Z0-9+.-]*://[^/]*", ""
    )
    with_host = urls.withColumn("_host", host_of(F.col(url_col))).withColumn(
        "_path", F.when(path == "", F.lit("/")).otherwise(path)
    )
    r = rules.select(
        F.col("host").alias("_host"),
        F.col("path_prefix").alias("_pfx"),
        F.col("allow").alias("_allow"),
    )
    matched = with_host.join(r, "_host", "left").where(
        F.col("_pfx").isNull() | F.col("_path").startswith(F.col("_pfx"))
    )
    # longest prefix wins, Allow beats Disallow on ties: order by the
    # (length, allow) struct under max_by — a total order per url
    # because a host cannot list the same prefix twice per polarity
    best = matched.groupBy(url_col).agg(
        F.max_by(
            F.struct(
                F.coalesce(F.length("_pfx"), F.lit(-1)).alias("len"),
                F.coalesce(F.col("_allow").cast("int"), F.lit(1)).alias(
                    "allow"
                ),
                F.col("_pfx").alias("pfx"),
            ),
            F.struct(
                F.coalesce(F.length("_pfx"), F.lit(-1)),
                F.coalesce(F.col("_allow").cast("int"), F.lit(1)),
            ),
        ).alias("_best")
    )
    return urls.join(best, url_col, "left").select(
        *urls.columns,
        F.coalesce(F.col("_best.allow") == 1, F.lit(True)).alias("allowed"),
        F.col("_best.pfx").alias("matched_prefix"),
    )


# ---------------------------------------------------------------------------
# HyperLogLog per-host URL cardinality (portable deterministic registers)
# ---------------------------------------------------------------------------

HLL_M = 64  # registers; standard error 1.04/√m ≈ 13%
_HLL_ALPHA_64 = 0.709  # Flajolet et al. 2007 bias constant for m = 64


def _hll_h32_sql(url_expr: str) -> str:
    """32-bit integer from the md5 of the url, Spark-side: ``conv(hex,
    16, 10)`` (Spark's ANSI CAST rejects '0x…' strings).  The DuckDB
    twin derives the IDENTICAL unsigned value with the hex-literal CAST
    the ANF sketches use — 8 hex chars ≤ 2³²−1, no sign wraparound on
    either path."""
    return f"CAST(conv(substr(md5({url_expr}), 1, 8), 16, 10) AS BIGINT)"


def _hll_rank_sql(w_expr: str) -> str:
    """Leading-zero rank of the 26-bit sub-hash ``w`` (1-based; w = 0 →
    27): an exact integer CASE over power-of-two thresholds — float
    log2 at a power-of-two boundary is 1 ulp from flipping the
    register, the same reason anf.py's rank uses the mod-37 CASE."""
    arms = " ".join(
        f"WHEN {w_expr} >= {1 << (25 - i)} THEN {i + 1}" for i in range(26)
    )
    return f"(CASE {arms} ELSE 27 END)"


def _hll_pow2neg_sql(m_expr: str) -> str:
    """2^(−M) for register value M in 1..27 as exact double literals
    (negative powers of two are exactly representable; a pow() call
    would be a cross-engine 1-ulp risk)."""
    arms = " ".join(f"WHEN {m_expr} = {r} THEN {2.0 ** -r!r}" for r in range(1, 28))
    return f"(CASE {arms} ELSE 1.0 END)"


def host_url_cardinality(
    urls: DataFrame, url_col: str = "url", host_col: str = "host"
) -> DataFrame:
    """Approximate DISTINCT-URL count per host via a deterministic
    HyperLogLog sketch (Flajolet, Fusy, Gandouet & Meunier, AofA 2007 —
    public method): ``(host, occupied, est)``.  ``host_col`` names the
    grouping key (the output keeps the caller's column name), matching
    the parameterized-key convention of the rest of the extract surface.

    The crawl-dashboard cardinality op: "how many unique URLs has each
    host contributed" over a 10¹²-row fetch log, without a
    count-distinct shuffle of the URLs themselves.  Spark's built-in
    ``approx_count_distinct`` is the same sketch family but its
    register layout is engine-private; this implementation's registers
    are md5-derived integer arithmetic (portable SQL subset), so the
    driver's DuckDB gate replays the ESTIMATE bit-for-bit — determinism
    you can hash-check, which approx_count_distinct cannot give.

    Physical shape: one (host, bucket) max-aggregation — map-side
    combined, so a host with 10⁹ log rows sends ≤ m=64 register rows
    per map partition — then a per-host fold over ≤ 64 registers.
    Nothing heavier than the hash of each URL ever shuffles.

    Estimator: αm·m²/Σ 2^(−M_j) with the standard small-range
    correction (linear counting ``m·ln(m/V)`` when the raw estimate is
    ≤ 2.5m and empty registers remain).  The branch compares the
    ROUNDED raw estimate (6 decimals) so float-sum ulps cannot flip
    the branch between engines.
    """
    h = F.expr(_hll_h32_sql(url_col))
    regs = (
        urls.select(
            F.col(host_col).alias("host"),
            (h % HLL_M).alias("bucket"),
            F.expr(_hll_rank_sql(f"({_hll_h32_sql(url_col)} div {HLL_M})")).alias(
                "rank"
            ),
        )
        .groupBy("host", "bucket")
        .agg(F.max("rank").alias("m_reg"))
    )
    per_host = regs.groupBy("host").agg(
        F.count(F.lit(1)).alias("occupied"),
        F.sum(F.expr(_hll_pow2neg_sql("m_reg"))).alias("_occ_sum"),
    )
    m = float(HLL_M)
    denom = F.col("_occ_sum") + (F.lit(m) - F.col("occupied"))
    raw = F.lit(_HLL_ALPHA_64 * m * m) / denom
    zeros = F.lit(m) - F.col("occupied")
    est = F.when(
        (F.round(raw, 6) <= F.lit(2.5 * m)) & (zeros > 0),
        F.lit(m) * F.log(F.lit(m) / zeros),
    ).otherwise(raw)
    return per_host.select(
        F.col("host").alias(host_col),
        F.col("occupied").cast("long").alias("occupied"),
        est.alias("est"),
    )


def anchor_entropy(counts: DataFrame, target_col: str = "target") -> DataFrame:
    """Per-target Shannon entropy of the inbound anchor-text
    distribution → ``(target, n_anchors, n_links, entropy)``.

    The classic anchor-spam signal: organically linked pages accumulate
    DIVERSE anchor texts (navigational, topical, url-as-anchor), so
    entropy grows with inlink count; a page whose thousands of inlinks
    all carry one exact-match phrase (entropy ≈ 0 at high n_links) is
    the anchor-stuffing signature (cf. the anchor-text spam analyses
    following Ntoulas et al., *Detecting spam web pages through content
    analysis*, WWW 2006 — public method).

    Input is an anchor-count table (:func:`anchor_index` output
    ``(target, anchor, n)``); entropy per target over the count
    distribution is computed as ``ln(N) − Σ n·ln(n) / N`` — one
    map-side-combinable aggregation over the (already aggregated)
    counts; group size is bounded by the target's distinct-anchor
    count, never its raw inlink count.
    """
    nd = F.col("n").cast("double")
    return counts.groupBy(target_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_anchors"),
        F.sum("n").cast("long").alias("n_links"),
        (
            F.log(F.sum(nd))
            - F.sum(nd * F.log(nd)) / F.sum(nd)
        ).alias("entropy"),
    )
