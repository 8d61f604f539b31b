"""Deterministic synthetic fixtures (FIXTURES.md; SURVEY.md §5.2).

All generators are seeded (seed=42 convention, TESTDATA.md:4) and pure
NumPy/stdlib — no external data, no network.  They produce:

- chesapeake-style small graph (39 vertices / 170 undirected edges — the
  shape of the reference's canonical ``datasets/chesapeake.mtx``);
- adversarial micro-graphs (FIXTURES.md F4) with hand-derivable outputs;
- synthetic web crawls with Zipf out-degrees, hub pages and dangling
  pages (FIXTURES.md F1 degree spec) at any scale;
- a pages corpus (url, warc_ts, html, text, lang) whose hrefs ARE the
  ground-truth edge list, so extraction is exactly checkable.
"""

from __future__ import annotations

import datetime as _dt

import numpy as np

SEED = 42
LANGS = ["en", "es", "de", "fr", "zh"]


# ---------------------------------------------------------------------------
# chesapeake-style canonical small graph (FIXTURES.md F3)
# ---------------------------------------------------------------------------

def chesapeake_edges(seed: int = SEED) -> list[tuple[int, int]]:
    """170 distinct undirected edges over 39 vertices, connected.

    Deterministic stand-in for the reference's ``datasets/chesapeake.mtx``
    (39 vertices / 170 undirected edges) — the mount was empty, so the
    literal file could not be copied (SURVEY.md §0); shape matches.
    Returns directed pairs (u, v) with u > v, 0-indexed (the mtx
    convention is 1-indexed lower-triangular; loaders symmetrize).
    """
    rng = np.random.default_rng(seed)
    n, m = 39, 170
    edges: set[tuple[int, int]] = set()
    # spanning path first → connected
    perm = rng.permutation(n)
    for i in range(n - 1):
        u, v = int(perm[i]), int(perm[i + 1])
        edges.add((max(u, v), min(u, v)))
    while len(edges) < m:
        u = int(rng.integers(0, n))
        v = int(rng.integers(0, n))
        if u == v:
            continue
        edges.add((max(u, v), min(u, v)))
    return sorted(edges)


def chesapeake_mtx(seed: int = SEED) -> str:
    """MatrixMarket serialization (1-indexed, pattern symmetric)."""
    edges = chesapeake_edges(seed)
    lines = [
        "%%MatrixMarket matrix coordinate pattern symmetric",
        f"39 39 {len(edges)}",
    ]
    lines += [f"{u + 1} {v + 1}" for u, v in edges]
    return "\n".join(lines) + "\n"


# ---------------------------------------------------------------------------
# adversarial micro-graphs (FIXTURES.md F4)
# ---------------------------------------------------------------------------

MICRO_GRAPHS: dict[str, list[tuple[int, int]]] = {
    "empty": [],
    "self_loop": [(0, 0)],
    "dup_edges": [(0, 1), (0, 1), (1, 0)],
    "star_hub": [(i, 0) for i in range(1, 1001)],
    "two_cliques": (
        [(i, j) for i in range(5) for j in range(5) if i < j]
        + [(i, j) for i in range(5, 9) for j in range(5, 9) if i < j]
    ),
    "chain": [(i, i + 1) for i in range(9)],
    "dangling_pair": [(0, 1)],
}


# ---------------------------------------------------------------------------
# synthetic web crawl (FIXTURES.md F1 degree spec)
# ---------------------------------------------------------------------------

def synthetic_crawl(
    n_pages: int,
    seed: int = SEED,
    dmax: int | None = None,
    hub_fraction: float = 0.3,
    n_hubs: int = 5,
    dangling_fraction: float = 0.05,
) -> np.ndarray:
    """Directed edge array (E, 2) int64 over vertex ids [0, n_pages).

    Zipf-ish out-degrees ``deg(v) = max(1, round(dmax·(v+1)^-0.7))``,
    ~``hub_fraction`` of pages add one link to a hub page (dst-skew,
    exercises the salted reduce), ``dangling_fraction`` of pages get
    out-degree 0 (exercises PR dangling mass).  Duplicates/self-loops may
    occur (Graph.from_edges normalizes).
    """
    rng = np.random.default_rng(seed)
    if dmax is None:
        dmax = max(4, int(np.sqrt(n_pages)))
    v = np.arange(n_pages)
    deg = np.maximum(1, np.round(dmax * (v + 1) ** -0.7)).astype(np.int64)
    dangling = rng.random(n_pages) < dangling_fraction
    deg[dangling] = 0
    total = int(deg.sum())
    src = np.repeat(v, deg)
    dst = rng.integers(0, n_pages, size=total)
    # re-draw self-loops once (any left over are dropped by
    # normalization); guard n_pages == 1, where every edge is a
    # self-loop and the redraw range would be empty
    loops = src == dst
    if n_pages > 1:
        dst[loops] = (dst[loops] + 1 + rng.integers(0, n_pages - 1, size=loops.sum())) % n_pages
    # clamp the hub pool to the vertex count: drawing indices in
    # [0, n_hubs) against a permutation truncated to n_pages would
    # IndexError for n_pages < n_hubs
    hubs = rng.permutation(n_pages)[: min(n_hubs, n_pages)]
    hub_pick = (~dangling) & (rng.random(n_pages) < hub_fraction)
    hub_src = v[hub_pick]
    hub_dst = hubs[rng.integers(0, hubs.size, size=hub_src.size)]
    keep = hub_src != hub_dst
    src = np.concatenate([src, hub_src[keep]])
    dst = np.concatenate([dst, hub_dst[keep]])
    return np.stack([src, dst], axis=1).astype(np.int64)


# ---------------------------------------------------------------------------
# pages corpus (FIXTURES.md F1) — hrefs ARE the ground-truth edges
# ---------------------------------------------------------------------------

_BASE_TS = _dt.datetime(2024, 1, 1, 0, 0, 0)


def page_url(vid: int, n_sites: int = 10) -> str:
    return f"https://site{vid % n_sites}.example/p/{vid}"


def _page_para(vid: int, lang: str) -> str:
    """Body paragraph — the ONE definition both html and text render, so
    the text/html parity the fixtures promise cannot drift."""
    return (
        f"Page {vid} in {lang}. "
        + " ".join(f"token{(vid * 31 + k) % 97}" for k in range(20))
    )


def _page_text(vid: int, lang: str, out_urls: list[str]) -> str:
    """The page's visible text — single source of truth for html AND text."""
    para = _page_para(vid, lang)
    link_words = " ".join(f"link to {u}" for u in out_urls)
    return f"T{vid}\n{para}\n{link_words}".rstrip()


def _page_html(vid: int, lang: str, out_urls: list[str]) -> bytes:
    para = _page_para(vid, lang)
    anchors = "".join(f'<a href="{u}">link to {u}</a> ' for u in out_urls)
    html = (
        f"<html><head><title>T{vid}</title></head><body>"
        f"<p>{para}</p><p>{anchors.rstrip()}</p></body></html>"
    )
    return html.encode("utf-8")


def pages_corpus(
    n_pages: int,
    seed: int = SEED,
    n_sites: int = 10,
    second_snapshot_fraction: float = 0.05,
) -> tuple[list[tuple], np.ndarray]:
    """(rows, ground_truth_edges).

    rows = list of (url, warc_ts, html: bytes, text, lang) matching
    PAGES_SCHEMA; ~5% of urls get a second, later snapshot with the SAME
    content (tests latest-per-url dedup without changing the edge truth).
    ground_truth_edges = (E,2) int64 vid pairs (normalized: no dups/loops).
    """
    rng = np.random.default_rng(seed)
    raw = synthetic_crawl(n_pages, seed=seed)
    # normalize to the ground truth Graph.from_edges would produce
    mask = raw[:, 0] != raw[:, 1]
    dedup = np.unique(raw[mask], axis=0)
    out_lists: dict[int, list[int]] = {v: [] for v in range(n_pages)}
    for s, d in dedup:
        out_lists[int(s)].append(int(d))
    rows = []
    ts_offsets = rng.integers(0, 30 * 24 * 3600, size=n_pages)
    langs = rng.choice(LANGS, size=n_pages)
    second = rng.random(n_pages) < second_snapshot_fraction
    for vid in range(n_pages):
        url = page_url(vid, n_sites)
        lang = str(langs[vid])
        out_urls = [page_url(d, n_sites) for d in sorted(out_lists[vid])]
        ts = _BASE_TS + _dt.timedelta(seconds=int(ts_offsets[vid]))
        html = _page_html(vid, lang, out_urls)
        text = _page_text(vid, lang, out_urls)
        rows.append((url, ts, html, text, lang))
        if second[vid]:
            rows.append(
                (url, ts + _dt.timedelta(days=31), html, text, lang)
            )
    return rows, dedup
