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
                (F.col("hops") + F.coalesce("_h", F.lit(0))).alias("hops"),
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
