"""Deduplication operators (exact / MinHash-LSH / SimHash / Jaccard)."""

from __future__ import annotations

import itertools

from pyspark.sql import functions as F

from linkgraph.textops.dedup import (
    exact_duplicates,
    jaccard_pairs,
    minhash_lsh_candidates,
    minhash_signatures,
    simhash64,
    simhash_near_duplicates,
    word_shingles,
)

BASE = (
    "the quick brown fox jumps over the lazy dog while the cat sleeps "
    "by the warm fire and dreams of chasing mice through green fields"
)


def _docs(spark):
    rows = [
        (0, BASE),
        (1, BASE),  # exact dup of 0
        (2, BASE.replace("fox", "wolf")),  # near dup
        (3, "completely different text about spark dataframes and shuffles"),
        (4, ""),
        (5, BASE + " extra tail words appended here"),  # near dup superset
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def _py_shingles(text, n=3):
    toks = text.lower().split()
    return {" ".join(toks[i : i + n]) for i in range(len(toks) - n + 1)}


def test_exact_duplicates(spark):
    d = exact_duplicates(_docs(spark))
    rows = {(r.doc_id, r.group_id, r.group_size) for r in d.collect()}
    assert rows == {(0, 0, 2), (1, 0, 2)}


def test_word_shingles_match_python(spark):
    sh = word_shingles(_docs(spark))
    got = {}
    for r in sh.collect():
        got.setdefault(r.doc_id, set()).add(r.shingle)
    for doc_id, text in [(0, BASE), (3, "completely different text about spark dataframes and shuffles")]:
        assert got.get(doc_id, set()) == _py_shingles(text)
    assert 4 not in got  # empty text → no shingles


def test_minhash_identical_docs_identical_signatures(spark):
    sig = minhash_signatures(_docs(spark))
    s = {}
    for r in sig.collect():
        s.setdefault(r.doc_id, {})[r.seed] = r.minhash
    assert s[0] == s[1]
    assert s[0] != s[3]


def test_lsh_candidates_find_dups(spark):
    cands = {
        (r.a, r.b) for r in minhash_lsh_candidates(_docs(spark)).collect()
    }
    assert (0, 1) in cands  # exact dups always collide
    # near-dups highly likely to collide on ≥1 band (deterministic given
    # fixed hash functions — pinned by this test)
    assert (0, 2) in cands or (0, 5) in cands
    assert (0, 3) not in cands and (1, 3) not in cands


def test_jaccard_pairs_exact_values(spark):
    got = {
        (r.a, r.b): r.jaccard
        for r in jaccard_pairs(_docs(spark), threshold=0.0).collect()
    }
    docs = {r.doc_id: r.text for r in _docs(spark).collect()}
    for (a, b), jac in got.items():
        sa, sb = _py_shingles(docs[a]), _py_shingles(docs[b])
        want = len(sa & sb) / len(sa | sb)
        assert abs(jac - want) < 1e-12, (a, b)
    assert got[(0, 1)] == 1.0
    assert (0, 3) not in got  # no shared shingles


def test_simhash_properties(spark):
    fp = {r.doc_id: r.simhash for r in simhash64(_docs(spark)).collect()}
    assert fp[0] == fp[1]
    assert fp[4] == 0
    nd = {(r.a, r.b): r.hamming for r in simhash_near_duplicates(_docs(spark), max_hamming=10).collect()}
    assert nd.get((0, 1)) == 0


def _py_simhash(text):
    """Reference semantics the JVM pipeline must reproduce bit-for-bit:
    per-occurrence md5-prefix token hashes, vote>0 bit rule, signed
    reinterpret.  (This was the engine's round-1 mapInArrow body.)"""
    import hashlib

    votes = [0] * 64
    for tok in (text or "").lower().split():
        h = int.from_bytes(hashlib.md5(tok.encode()).digest()[:8], "big")
        for i in range(64):
            votes[i] += 1 if (h >> i) & 1 else -1
    fp = sum(1 << i for i in range(64) if votes[i] > 0)
    return fp - (1 << 64) if fp >= (1 << 63) else fp


def test_simhash_matches_python_reference(spark):
    rows = [
        (0, BASE),
        (1, ""),
        (2, "   \t  "),  # whitespace-only → 0 like empty
        (3, "one"),
        (4, "repeat repeat repeat unique"),  # occurrence-weighted votes
        (5, "MiXeD Case TOKENS and  double  spaces"),
        (6, None),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    got = {r.doc_id: r.simhash for r in simhash64(df).collect()}
    assert len(got) == len(rows)
    for doc_id, text in rows:
        assert got[doc_id] == _py_simhash(text), (doc_id, text)


def test_lsh_hot_bucket_cap(spark):
    # 500 docs sharing every band key (identical text) + one near-dup
    # pair: without the cap the degenerate bucket alone is ~125k pairs;
    # with the cap those buckets are dropped and the honest pair remains.
    hot = [(i, "boilerplate header identical on every page of the site x") for i in range(500)]
    pair = [(1000, BASE), (1001, BASE.replace("fox", "wolf"))]
    df = spark.createDataFrame(hot + pair, "doc_id long, text string")
    got = {(r.a, r.b) for r in minhash_lsh_candidates(df, max_bucket=100).collect()}
    assert all(a >= 1000 for a, _ in got), "hot bucket leaked through the cap"
    # uncapped recall on the small fixture corpus is unchanged by default cap
    base = {(r.a, r.b) for r in minhash_lsh_candidates(_docs(spark), max_bucket=None).collect()}
    capped = {(r.a, r.b) for r in minhash_lsh_candidates(_docs(spark)).collect()}
    assert base == capped


def test_jaccard_verify_matches_python(spark):
    """Pair-driven verify returns the same exact Jaccard as a set-based
    Python oracle for every candidate pair with ≥1 common shingle."""
    from linkgraph.textops.dedup import jaccard_verify

    docs = _docs(spark)
    pairs = [(a, b) for a in range(6) for b in range(a + 1, 6)]
    pdf = spark.createDataFrame(pairs, "a long, b long")
    got = {
        (r.a, r.b): r.jaccard for r in jaccard_verify(docs, pdf).collect()
    }
    texts = {r.doc_id: r.text for r in docs.collect()}
    for a, b in pairs:
        sa, sb = _py_shingles(texts[a]), _py_shingles(texts[b])
        common = len(sa & sb)
        if common == 0:
            assert (a, b) not in got
        else:
            want = common / len(sa | sb)
            assert abs(got[(a, b)] - want) < 1e-12, (a, b)


def test_dedup_clusters_matches_union_find(spark):
    """End-to-end pipeline vs a pure-Python oracle replaying the SAME
    stages (md5 minhash bands → shingle Jaccard ≥ t → exact groups →
    union-find), so LSH's deterministic recall is replayed rather than
    assumed perfect; plus the structural invariants every clustering
    must satisfy."""
    import hashlib

    from linkgraph.textops.dedup import dedup_clusters

    docs = _docs(spark).union(
        spark.createDataFrame(
            [(6, "hi"), (7, "hi"), (8, BASE)], "doc_id long, text string"
        )
    )
    out = dedup_clusters(docs, num_hashes=4, rows_per_band=1, threshold=0.5)
    got = {
        r.doc_id: (r.cluster_id, r.is_canonical) for r in out.collect()
    }

    texts = {r.doc_id: r.text for r in docs.collect()}
    # -- python twin ---------------------------------------------------
    def mh(seed, text):
        sh = _py_shingles(text)
        if not sh:
            return None
        return min(
            hashlib.md5(f"{seed}:{s}".encode()).hexdigest() for s in sh
        )

    parent = {d: d for d in texts}

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    def union(a, b):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)

    ids = sorted(texts)
    for a, b in itertools.combinations(ids, 2):
        lsh_hit = any(
            mh(s, texts[a]) == mh(s, texts[b]) and mh(s, texts[a])
            for s in range(4)
        )
        if lsh_hit:
            sa, sb = _py_shingles(texts[a]), _py_shingles(texts[b])
            if sa | sb and len(sa & sb) / len(sa | sb) >= 0.5:
                union(a, b)
        if texts[a] == texts[b]:  # exact rescue
            union(a, b)
    want = {d: find(d) for d in ids}

    assert set(got) == set(ids)
    for d in ids:
        assert got[d] == (want[d], int(want[d] == d)), d
    # invariants: canonical doc is the cluster min and appears once
    clusters = {}
    for d, (c, canon) in got.items():
        clusters.setdefault(c, []).append((d, canon))
    for c, members in clusters.items():
        assert min(d for d, _ in members) == c
        assert sum(canon for _, canon in members) == 1


def test_minhash_xxhash64_path_equivalent_recall(spark):
    """The xxhash64 throughput path is a different (equally valid) LSH
    permutation family — candidate sets for NEAR-dups may differ from
    the md5 path's sample, but the guaranteed recall is identical:
    byte-identical docs share every signature under ANY hash family, so
    every exact-duplicate pair must appear under both.  Also pin
    determinism across runs."""
    from linkgraph.textops.dedup import (
        exact_duplicates,
        minhash_lsh_candidates,
        minhash_signatures,
    )

    df = _docs(spark)
    exact = exact_duplicates(df).collect()
    by_group: dict = {}
    for r in exact:
        by_group.setdefault(r.group_id, []).append(r.doc_id)
    must_pairs = {
        (min(a, b), max(a, b))
        for ids in by_group.values()
        for a in ids
        for b in ids
        if a != b
    }
    assert must_pairs, "fixture corpus must contain exact dups"
    for hf in ("md5", "xxhash64"):
        got = {
            (r.a, r.b)
            for r in minhash_lsh_candidates(df, hash_fn=hf).collect()
        }
        assert must_pairs <= got, (hf, must_pairs - got)

    s1 = sorted(
        map(tuple, minhash_signatures(df, hash_fn="xxhash64").collect())
    )
    s2 = sorted(
        map(tuple, minhash_signatures(df, hash_fn="xxhash64").collect())
    )
    assert s1 == s2  # deterministic, partitioning-independent


def test_minhash_rejects_unknown_hash_fn(spark):
    import pytest as _pytest

    from linkgraph.textops.dedup import minhash_signatures

    with _pytest.raises(ValueError):
        minhash_signatures(_docs(spark), hash_fn="sha1").collect()


def test_mirror_host_pairs_finds_mirrors_and_caps_boilerplate(spark):
    from linkgraph.textops.dedup import mirror_host_pairs

    rows = []
    # hosts m1/m2 mirror 3 documents; host solo has unique content
    for i, txt in enumerate(["alpha doc", "beta doc", "gamma doc"]):
        rows.append((i, txt, "m1"))
        rows.append((100 + i, txt, "m2"))
    rows.append((200, "unique doc", "solo"))
    # boilerplate text served by 30 hosts — must be dropped by the cap,
    # contributing ZERO pairs despite being the biggest fingerprint group
    for h in range(30):
        rows.append((300 + h, "copyright footer", f"b{h}"))
    df = spark.createDataFrame(rows, "doc_id long, text string, host string")

    got = {
        (r.host_a, r.host_b): r.shared
        for r in mirror_host_pairs(df, max_hosts_per_fp=20).collect()
    }
    assert got == {("m1", "m2"): 3}

    # cap disabled: the boilerplate group explodes into C(30,2) pairs
    uncapped = mirror_host_pairs(df, max_hosts_per_fp=None, min_shared=1)
    assert uncapped.count() == 1 + 30 * 29 // 2
