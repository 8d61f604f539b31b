"""Extraction invariant tests (BASELINE.json:15: byte-identical extracted
text per url; SURVEY.md §5.2.3) + full pages→edges front-end chain."""

from __future__ import annotations

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from linkgraph.extract import (
    extract_links,
    extract_pages,
    extract_text,
    latest_snapshot_per_url,
    pages_to_edge_urls,
)
from linkgraph.dictionary import edges_from_url_pairs, encode_urls
from linkgraph.fixtures import pages_corpus, page_url
from linkgraph.graph import Graph
from linkgraph.types import PAGES_SCHEMA


def _pages_df(spark, n=60):
    rows, truth = pages_corpus(n)
    return spark.createDataFrame(rows, PAGES_SCHEMA), truth


def test_extract_text_golden_bytes():
    """Pin exact bytes — the per-row invariant vs any re-implementation."""
    html = (
        b"<html><head><title>T1</title><script>var x=1;</script></head>"
        b"<body><p>Hello  world</p><!-- c --><div>Bye</div>"
        b'<a href="https://a.example/x">link text</a></body></html>'
    )
    assert extract_text(html) == "T1\nHello world\nBye\nlink text"
    assert extract_links(html) == ["https://a.example/x"]


def test_extract_text_deterministic_and_idempotent():
    html = b"<html><body><p>a</p><p>b</p></body></html>"
    t1 = extract_text(html)
    assert t1 == extract_text(html)
    # idempotent: extracting already-extracted text changes nothing
    assert extract_text(t1.encode()) == t1


@settings(max_examples=200, deadline=None)
@given(st.binary(max_size=400))
def test_extract_total_on_arbitrary_bytes(b):
    """Extraction is total and deterministic on arbitrary input bytes."""
    assert extract_text(b) == extract_text(b)
    assert extract_links(b) == extract_links(b)


def test_fixture_text_matches_extraction(spark):
    """The pages fixture's text column IS extract_text(html), byte-equal,
    through the distributed Arrow path."""
    pages, _ = _pages_df(spark, 60)
    ext = extract_pages(pages).select("url", "warc_ts", "text")
    joined = ext.join(
        pages.selectExpr("url", "warc_ts", "text as expected"),
        ["url", "warc_ts"],
    )
    rows = joined.collect()
    assert len(rows) > 0
    for r in rows:
        assert r.text == r.expected, r.url


def test_extraction_parallelism_invariant(spark):
    """Same bytes → same text regardless of partitioning (SURVEY.md §5.2.3)."""
    pages, _ = _pages_df(spark, 40)
    a = {
        (r.url, r.warc_ts): r.text
        for r in extract_pages(pages.repartition(1)).collect()
    }
    b = {
        (r.url, r.warc_ts): r.text
        for r in extract_pages(pages.repartition(16)).collect()
    }
    assert a == b


def test_latest_snapshot_dedup(spark):
    pages, _ = _pages_df(spark, 100)
    latest = latest_snapshot_per_url(pages)
    assert latest.count() == pages.select("url").distinct().count()
    assert latest.groupBy("url").count().where("count > 1").count() == 0


def test_pages_to_edges_matches_ground_truth(spark):
    """Full front end: pages → extract → explode → dictionary → edges —
    the resulting vid graph is isomorphic to the generator's edge list."""
    pages, truth = _pages_df(spark, 80)
    pairs = pages_to_edge_urls(pages)
    verts = encode_urls(pairs.selectExpr("src_url as url").unionAll(
        pairs.selectExpr("dst_url as url")
    ), num_partitions=4)
    edges = edges_from_url_pairs(pairs, verts)
    g = Graph.from_edges(edges, num_partitions=4)

    # map engine vids back to generator vids via url
    url_to_gen = {}
    for s, d in truth:
        url_to_gen.setdefault(page_url(int(s)), int(s))
        url_to_gen.setdefault(page_url(int(d)), int(d))
    vid_map = {
        r.vid: url_to_gen[r.url] for r in verts.collect() if r.url in url_to_gen
    }
    got = {
        (vid_map[r.src], vid_map[r.dst]) for r in g.edges.collect()
    }
    want = {(int(s), int(d)) for s, d in truth}
    assert got == want


def test_extract_links_ignores_lookalike_attributes():
    # data-href / ng-href / xlink:href are non-navigational templating
    # attributes — emitting them would add phantom edges to the graph
    from linkgraph.extract import extract_links

    html = (
        b'<a data-href=/evil>x</a><a ng-href="/e2">y</a>'
        b'<a xlink:href=/e3>z</a><a href=/good>k</a><a HREF="/q">q</a>'
    )
    assert extract_links(html) == ["/good", "/q"]


def test_extract_anchor_texts_pairing_and_cleaning():
    from linkgraph.extract import extract_anchor_texts

    html = (
        b'<html><body>'
        b'<a href="http://x/a">hello <b>world</b></a>'
        b"<a href=/rel>unquoted\nhref</a>"
        b'<a name="t">no href skipped</a>'
        b'<a data-href="n" href="y">lookalike attr</a>'
        b"</body></html>"
    )
    assert extract_anchor_texts(html) == [
        ("http://x/a", "hello world"),
        ("/rel", "unquoted href"),
        ("y", "lookalike attr"),
    ]
    assert extract_anchor_texts(None) == []
    assert extract_anchor_texts(b"") == []


@given(st.binary(max_size=400))
@settings(max_examples=60, deadline=None)
def test_extract_anchor_texts_total_on_arbitrary_bytes(b):
    from linkgraph.extract import extract_anchor_texts

    for href, anchor in extract_anchor_texts(b):
        assert isinstance(href, str) and isinstance(anchor, str)


def test_anchor_pages_and_index(spark):
    from linkgraph.extract import anchor_index, anchor_pages

    rows = [
        (
            "https://s1.example/p",
            b'<a href="https://t.example/x">buy now</a>'
            b'<a href="https://t.example/x">buy now</a>'
            b'<a href="https://t.example/x">official site</a>'
            b'<a href="https://other.example/y">misc</a>'
            b'<a href="https://t.example/x"></a>',  # empty anchor dropped
        ),
        (
            "https://s2.example/p",
            b'<a href="https://t.example/x">buy now</a>',
        ),
    ]
    pages = spark.createDataFrame(rows, "url string, html binary")
    anchors = anchor_pages(pages)
    got = {(r.url, r.href, r.anchor) for r in anchors.collect()}
    assert ("https://s1.example/p", "https://t.example/x", "buy now") in got
    assert len([1 for _, h, _ in got if h == "https://other.example/y"]) == 1

    idx = {
        (r.target, r.anchor): r.n for r in anchor_index(anchors).collect()
    }
    assert idx[("https://t.example/x", "buy now")] == 3
    assert idx[("https://t.example/x", "official site")] == 1
    assert ("https://t.example/x", "") not in idx

    top = anchor_index(anchors, top_k=1).collect()
    by_target = {r.target: (r.anchor, r.n) for r in top}
    assert by_target["https://t.example/x"] == ("buy now", 3)

    host_idx = {
        (r.target, r.anchor): r.n
        for r in anchor_index(anchors, by_host=True).collect()
    }
    assert host_idx[("t.example", "buy now")] == 3


def test_canonical_url_rules(spark):
    from linkgraph.extract import canonical_url

    cases = [
        # (input, expected)
        ("HTTP://ExAmple.CoM/Path/To/X", "http://example.com/Path/To/X"),
        ("https://Example.com:443/a/", "https://example.com/a"),
        ("http://example.com:80/", "http://example.com"),
        ("http://example.com:8080/a", "http://example.com:8080/a"),
        ("http://example.com/a#frag", "http://example.com/a"),
        ("http://example.com/CaseSensitive", "http://example.com/CaseSensitive"),
        ("not a url", "not a url"),
    ]
    df = spark.createDataFrame([(u,) for u, _ in cases], "url string")
    got = [
        r.c for r in df.select(canonical_url(F.col("url")).alias("c")).collect()
    ]
    assert got == [e for _, e in cases]


def test_inlink_host_diversity_farm_vs_editorial(spark):
    from linkgraph.extract import inlink_host_diversity

    # farm.example throws 4 links at /target; 4 distinct hosts each
    # throw 1 link at /popular; one bad url contributes nothing
    rows = [
        ("https://farm.example/p1", "https://victim.example/target"),
        ("https://farm.example/p2", "https://victim.example/target"),
        ("https://farm.example/p3", "https://victim.example/target"),
        ("https://FARM.example/p4", "https://victim.example/target"),
        ("https://a.example/x", "https://hub.example/popular"),
        ("https://b.example/x", "https://hub.example/popular"),
        ("https://c.example/x", "https://hub.example/popular"),
        ("https://d.example/x", "https://hub.example/popular"),
        ("not-a-url", "https://hub.example/popular"),
    ]
    df = spark.createDataFrame(rows, "src_url string, dst_url string")
    got = {r.dst_url: r for r in inlink_host_diversity(df).collect()}
    farm = got["https://victim.example/target"]
    # host matching is case-insensitive: FARM.example == farm.example
    assert farm.inlinks == 4 and farm.distinct_hosts == 1
    assert farm.host_diversity == 0.25 and farm.top_host_share == 1.0
    pop = got["https://hub.example/popular"]
    assert pop.inlinks == 4 and pop.distinct_hosts == 4
    assert pop.host_diversity == 1.0 and pop.top_host_share == 0.25


def test_extract_links_nofollow_filter():
    from linkgraph.extract import extract_links

    html = (
        b'<a href="/a">keep</a>'
        b'<a rel="nofollow" href="/b">drop</a>'
        b'<a href="/c" rel="ugc nofollow">drop attr-after-href</a>'
        b"<a rel=nofollow href=/d>drop unquoted</a>"
        b'<a rel="dofollow" href="/e">keep: token boundary</a>'
        b'<a data-rel="nofollow" href="/f">keep: not the rel attr</a>'
        b'<a href="/g" rel="sponsored">keep</a>'
    )
    assert extract_links(html) == ["/a", "/b", "/c", "/d", "/e", "/f", "/g"]
    assert extract_links(html, include_nofollow=False) == [
        "/a", "/e", "/f", "/g",
    ]


def test_extract_links_nofollow_path_equivalent_without_nofollow():
    """On nofollow-free html the per-tag path must reproduce the
    byte-pinned default path exactly."""
    from linkgraph.extract import extract_links
    from linkgraph.fixtures import pages_corpus

    rows, _ = pages_corpus(40)
    for r in rows:
        html = r[2]
        assert extract_links(html) == extract_links(
            html, include_nofollow=False
        ), html[:200]


def test_resolve_redirects_chain_and_terminal(spark):
    # 5 → 4 → 2 → 0 (terminal), 9 → 0, 1 → 0; all resolve
    mapping = spark.createDataFrame(
        [(5, 4), (4, 2), (2, 0), (9, 0), (1, 0)], "src long, dst long"
    )
    from linkgraph.extract import resolve_redirects

    got = {
        r.src: (r.target, r.hops, r.resolved)
        for r in resolve_redirects(mapping).collect()
    }
    assert got == {
        5: (0, 3, True),
        4: (0, 2, True),
        2: (0, 1, True),
        9: (0, 1, True),
        1: (0, 1, True),
    }


def test_resolve_redirects_flags_cycles(spark):
    # a→b→a cycle plus a tail c→a: ALL THREE land in the cycle and are
    # unresolved (a tail into a loop never reaches content either)
    mapping = spark.createDataFrame(
        [(10, 11), (11, 10), (12, 10)], "src long, dst long"
    )
    from linkgraph.extract import resolve_redirects

    rows = resolve_redirects(mapping, max_rounds=8).collect()
    assert all(not r.resolved for r in rows)
    assert {r.src for r in rows} == {10, 11, 12}


def test_resolve_redirects_log_rounds(spark):
    """A 64-hop chain resolves within far fewer than 64 composition
    rounds (pointer doubling: ⌈log₂ 64⌉ = 6 < 10)."""
    mapping = spark.createDataFrame(
        [(i, i - 1) for i in range(1, 65)], "src long, dst long"
    )
    from linkgraph.extract import resolve_redirects

    got = {r.src: (r.target, r.hops) for r in
           resolve_redirects(mapping, max_rounds=10).collect()}
    assert got[64] == (0, 64)
    assert got[1] == (0, 1)
    assert all(t == 0 for t, _ in got.values())


def _robots_fixture(spark):
    rules = spark.createDataFrame(
        [
            ("a.example", "/p/", False),
            ("a.example", "/p/public/", True),
            ("a.example", "/tie/", True),
            ("a.example", "/tie/", False),
            ("b.example", "/x/", False),
        ],
        "host string, path_prefix string, allow boolean",
    )
    urls = spark.createDataFrame(
        [
            ("https://a.example/p/secret",),        # /p/ disallow
            ("https://a.example/p/public/doc",),    # longer allow wins
            ("https://a.example/tie/page",),        # equal length: allow wins
            ("https://a.example/other",),           # no matching rule
            ("https://b.example/y",),               # host has rules, none match
            ("https://c.example/anything",),        # host without rules
        ],
        "url string",
    )
    return urls, rules


def test_robots_longest_match_and_tie_rules(spark):
    from linkgraph.extract import robots_allowed

    urls, rules = _robots_fixture(spark)
    got = {
        r.url: (r.allowed, r.matched_prefix)
        for r in robots_allowed(urls, rules).collect()
    }
    assert got == {
        "https://a.example/p/secret": (False, "/p/"),
        "https://a.example/p/public/doc": (True, "/p/public/"),
        "https://a.example/tie/page": (True, "/tie/"),
        "https://a.example/other": (True, None),
        "https://b.example/y": (True, None),
        "https://c.example/anything": (True, None),
    }


def test_robots_no_window_in_plan(spark):
    """The winner pick must be a max_by aggregation, not a sort-based
    window — a host with 10^9 urls must not pay a per-host sort."""
    from linkgraph.extract import robots_allowed

    urls, rules = _robots_fixture(spark)
    plan = robots_allowed(urls, rules)._jdf.queryExecution().executedPlan().toString()
    assert "Window" not in plan, plan


def test_hll_host_cardinality_accuracy_and_determinism(spark):
    from linkgraph.extract import host_url_cardinality

    rows = []
    for h, n in (("small.example", 9), ("mid.example", 60), ("big.example", 400)):
        rows += [(f"https://{h}/p/{i}", h) for i in range(n)]
        # duplicates must not change the estimate (set semantics)
        rows += [(f"https://{h}/p/0", h)] * 5
    df = spark.createDataFrame(rows, "url string, host string")
    got = {r.host: (r.occupied, r.est) for r in host_url_cardinality(df).collect()}
    for h, n in (("small.example", 9), ("mid.example", 60), ("big.example", 400)):
        occ, est = got[h]
        assert occ <= 64
        # m=64 → standard error ≈13%; allow 3σ
        assert abs(est - n) / n < 0.4, (h, n, est)
    # partitioning invariance: registers are max-folds, order-free
    got2 = {
        r.host: (r.occupied, round(r.est, 6))
        for r in host_url_cardinality(df.repartition(16)).collect()
    }
    assert {h: (o, round(e, 6)) for h, (o, e) in got.items()} == got2


def test_anchor_entropy_known_values(spark):
    import math

    from linkgraph.extract import anchor_entropy

    counts = spark.createDataFrame(
        [
            (1, "click here", 5), (1, "example", 5),   # uniform 2 → ln 2
            (2, "buy cheap meds", 1000),               # single anchor → 0
            (3, "a", 1), (3, "b", 1), (3, "c", 1), (3, "d", 1),  # ln 4
        ],
        "target long, anchor string, n long",
    )
    got = {r.target: r for r in anchor_entropy(counts).collect()}
    assert abs(got[1].entropy - math.log(2)) < 1e-12
    assert abs(got[2].entropy - 0.0) < 1e-12
    assert got[2].n_links == 1000
    assert abs(got[3].entropy - math.log(4)) < 1e-12


def test_resolve_redirects_cycle_survives_default_rounds(spark):
    """Review regression: a redirect cycle at the DEFAULT max_rounds
    must flag resolved=false, not overflow BIGINT at round ~63 (hops
    doubles every composition round; ANSI mode raises on overflow)."""
    from linkgraph.extract import resolve_redirects

    mapping = spark.createDataFrame(
        [(10, 11), (11, 10), (12, 10)], "src long, dst long"
    )
    rows = resolve_redirects(mapping).collect()  # default max_rounds=64
    assert len(rows) == 3 and all(not r.resolved for r in rows)
