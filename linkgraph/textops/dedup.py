"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Design notes for 10^12-document scale:

- **exact**: hash-groupBy on md5(text) — one shuffle of (hash, id), never
  of the text bodies.  Partial aggregation makes duplicate-heavy corpora
  cheap (map-side combine collapses per-partition duplicates).
- **MinHash**: signatures over word-shingles with k seeded hash
  functions; per-doc min per seed is one hash aggregation, linear in
  |docs|·|shingles|·k.  Two hash families: md5 (default — identical hex
  output in Spark and DuckDB, so the oracle replays the exact pipeline)
  and xxhash64 (the production throughput path: long-valued, ~4× smaller
  shuffle rows, no crypto digest; equivalence pinned by test).
- **LSH banding**: signatures → band keys → self-join per band =
  candidate pairs; only candidates are verified (exact Jaccard), so the
  all-pairs product never materializes.
- **SimHash**: 64-bit fingerprints fully JVM-side (explode tokens →
  ``md5`` → 64 conditional sums in one grouped aggregation); near-dups =
  Hamming distance ≤ r on band-partitioned fingerprints.
- **n-gram Jaccard**: exact pairwise Jaccard through an inverted shingle
  index (join on shingle, count common, normalize), with a document-
  frequency cap on hot shingles — the textual analog of hub-skew
  handling: a shingle appearing in 10^6 docs would create 10^12 candidate
  pairs; capping df ≤ ``max_df`` bounds the join fan-out.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _norm_tokens(col):
    """lowercase whitespace tokenization — identical semantics in DuckDB:
    ``string_split_regex(lower(trim(text)), '\\s+')``."""
    return F.split(F.lower(F.trim(col)), r"\s+")


def word_shingles(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id", n: int = 3
) -> DataFrame:
    """Distinct word n-gram shingles per doc: ``(doc_id, shingle)``.

    Shingles come from a single NARROW array expression (slice windows of
    the token array, joined by spaces) — zero shuffles, zero self-joins.
    The previous explode + (n−1) positional self-joins shuffled the full
    token set n−1 times just to align adjacent positions; on the dedup
    hot path at corpus scale those exchanges dominated everything else.
    Docs with fewer than n tokens produce no shingles — enforced by the
    ``size(_toks) >= n`` guard, which is LOAD-BEARING: Spark's
    ``sequence(1, 0)`` yields the DESCENDING list ``[1, 0]`` (not an
    empty list), so without the guard short docs would hit ``slice``
    with start 0 (error) or emit truncated windows.
    """
    toks = _norm_tokens(F.col(text_col))
    windows = F.expr(
        f"transform(sequence(1, size({'_toks'}) - {n - 1}), "
        f"i -> concat_ws(' ', slice(_toks, i, {n})))"
    )
    return (
        df.select(F.col(id_col), toks.alias("_toks"))
        .where(F.size("_toks") >= n)
        .select(id_col, F.explode(windows).alias("shingle"))
        .dropDuplicates([id_col, "shingle"])
    )


def exact_duplicates(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Exact-duplicate groups: ``(doc_id, group_id, group_size)``.

    ``group_id`` = min doc_id sharing identical text bytes (via md5);
    only docs in groups of size ≥ 2 are returned.
    """
    h = df.select(F.col(id_col), F.md5(F.col(text_col)).alias("_h"))
    groups = h.groupBy("_h").agg(
        F.min(id_col).alias("group_id"), F.count(F.lit(1)).alias("group_size")
    )
    return (
        h.join(groups.where(F.col("group_size") >= 2), "_h")
        .select(id_col, "group_id", "group_size")
    )


def minhash_signatures(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    shingle_n: int = 3,
    hash_fn: str = "md5",
) -> DataFrame:
    """MinHash signature per doc: ``(doc_id, seed, minhash)``.

    ``hash_fn="md5"`` (default): hash_s(shingle) = md5(s || ':' ||
    shingle); minhash = lexicographic min of the hex digests —
    engine-portable (same values in DuckDB), which is what the driver's
    value-hash gate replays.

    ``hash_fn="xxhash64"``: the production throughput path —
    xxhash64(seed, shingle) as a signed long, minhash = numeric min.
    Any consistent total order over a well-mixed hash is a valid
    min-hash permutation, so recall/threshold behavior is statistically
    equivalent — the two families draw DIFFERENT (equally valid) band
    samples for near-dups, while byte-identical docs are caught under
    either (pinned by test).  What changes is cost: no crypto digest, no 32-char hex strings — the
    shuffle row shrinks ~4× and hashing is ~an order of magnitude
    cheaper (A/B in BENCH/NOTES.md).  Not DuckDB-replayable (no
    xxhash64 there), hence not the catalog default.
    """
    if hash_fn not in ("md5", "xxhash64"):
        raise ValueError(f"hash_fn must be 'md5' or 'xxhash64', got {hash_fn}")
    sh = word_shingles(df, text_col, id_col, n=shingle_n)
    seeds = F.explode(
        F.array(*[F.lit(i) for i in range(num_hashes)])
    ).alias("seed")
    if hash_fn == "xxhash64":
        h = F.xxhash64(F.col("seed"), F.col("shingle"))
    else:
        h = F.md5(
            F.concat_ws(":", F.col("seed").cast("string"), F.col("shingle"))
        )
    hashed = sh.select(id_col, "shingle", seeds).select(
        id_col, "seed", h.alias("h")
    )
    return hashed.groupBy(id_col, "seed").agg(F.min("h").alias("minhash"))


def minhash_lsh_candidates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    max_bucket: int | None = 1000,
    hash_fn: str = "md5",
) -> DataFrame:
    """LSH candidate pairs ``(a, b)`` (a < b): docs agreeing on ≥1 band.

    bands = num_hashes / rows_per_band; band key = concatenated minhashes
    of the band's seeds.  The per-band self-join touches only same-bucket
    docs — linear in Σ bucket².

    ``max_bucket`` is the hot-bucket skew guard, the banded analog of
    ``jaccard_pairs.max_df``: a degenerate band key shared by B docs
    (boilerplate-heavy corpora — empty pages, templated headers) costs
    B² candidate rows before verification.  Buckets larger than
    ``max_bucket`` are dropped BEFORE the self-join, bounding any single
    bucket's cost at max_bucket²; such buckets carry almost no
    similarity signal per pair but all of the quadratic blow-up.  Exact
    duplicates inside a dropped bucket are still caught by
    ``exact_duplicates`` (identical text ⇒ identical md5), which is the
    correct tool for that regime.  ``None`` disables the cap.
    """
    sig = minhash_signatures(
        df, text_col, id_col, num_hashes, shingle_n, hash_fn=hash_fn
    )
    band = (F.col("seed") / rows_per_band).cast("int").alias("band")
    # explicit string cast: the xxhash64 path's minhash is a long, and
    # ANSI mode rejects implicit bigint→string in concat_ws (no-op for
    # the md5 path, whose minhash is already a string)
    bands = (
        sig.select(id_col, band, "seed", "minhash")
        .groupBy(id_col, "band")
        .agg(
            F.concat_ws(
                "|",
                F.array_sort(
                    F.collect_list(
                        F.concat_ws(
                            "=",
                            F.col("seed").cast("string"),
                            F.col("minhash").cast("string"),
                        )
                    )
                ),
            ).alias("band_key")
        )
    )
    if max_bucket is not None:
        # one extra |buckets|-row aggregation + a semi-ish join keyed the
        # same way as the candidate join — cheap relative to B² rows
        sizes = bands.groupBy("band", "band_key").agg(
            F.count(F.lit(1)).alias("_bsz")
        )
        bands = bands.join(
            sizes.where(F.col("_bsz") <= max_bucket), ["band", "band_key"]
        ).select(id_col, "band", "band_key")
    left = bands.select(F.col(id_col).alias("a"), "band", "band_key")
    right = bands.select(F.col(id_col).alias("b"), "band", "band_key")
    return (
        left.join(right, ["band", "band_key"])
        .where(F.col("a") < F.col("b"))
        .select("a", "b")
        .dropDuplicates(["a", "b"])
    )


def jaccard_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_df: int | None = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard pairs ≥ threshold: ``(a, b, jaccard)``.

    Inverted-index join on shingles; ``max_df`` drops shingles appearing
    in more than that many docs before pairing (skew guard — such
    shingles carry almost no similarity signal but quadratic join cost).
    """
    sh = word_shingles(df, text_col, id_col, n=shingle_n)
    if max_df is not None:
        dfreq = sh.groupBy("shingle").agg(F.count(F.lit(1)).alias("_df"))
        sh = sh.join(dfreq.where(F.col("_df") <= max_df), "shingle").select(
            id_col, "shingle"
        )
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("_sz"))
    a = sh.select(F.col(id_col).alias("a"), "shingle")
    b = sh.select(F.col(id_col).alias("b"), "shingle")
    common = (
        a.join(b, "shingle")
        .where(F.col("a") < F.col("b"))
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("_common"))
    )
    sa = sizes.select(F.col(id_col).alias("a"), F.col("_sz").alias("_sa"))
    sb = sizes.select(F.col(id_col).alias("b"), F.col("_sz").alias("_sb"))
    jac = (
        common.join(sa, "a")
        .join(sb, "b")
        .select(
            "a",
            "b",
            (
                F.col("_common")
                / (F.col("_sa") + F.col("_sb") - F.col("_common"))
            ).alias("jaccard"),
        )
    )
    return jac.where(F.col("jaccard") >= threshold)


def simhash64(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """64-bit SimHash fingerprint per doc: ``(doc_id, simhash)``.

    Token hash = first 8 bytes of md5, big-endian (deterministic across
    engines/runs; replayable in DuckDB as
    ``CAST('0x'||substr(md5(tok),1,16) AS UBIGINT)``).  Bit ``i`` of the
    fingerprint is set iff the per-occurrence vote ``Σ_tok (2·bit_i − 1)``
    is strictly positive; empty/whitespace-only/NULL docs fingerprint
    to 0.

    Everything runs JVM-side in whole-stage codegen: explode tokens →
    ``md5`` → one grouped aggregation with 64 conditional sums — no
    Python in the loop (the previous per-token ``hashlib.md5`` Python
    loop ran at a few MB/s/core and was the engine's slowest operator at
    crawl scale; see BENCH/NOTES.md for the A/B).  Shuffle volume is one
    ~65-long partial-agg row per doc per input partition (map-side
    combine collapses token rows before the exchange), independent of
    document length.

    The 64-bit token hash is handled as two 32-bit halves (``conv`` of
    8 hex chars each fits a signed long); the final signed-int64
    reinterpretation adds ``−2^63`` for bit 63 instead of ``+2^63``.
    """
    from functools import reduce
    from operator import add

    toks = _norm_tokens(F.col(text_col))
    h = F.md5(F.col("tok"))
    # w=0 rows (empty/null token from empty docs) keep the doc alive
    # through the groupBy while contributing nothing to any vote.
    w = F.when(F.col("tok").isNull() | (F.col("tok") == ""), F.lit(0)).otherwise(
        F.lit(1)
    )
    rows = (
        df.select(
            F.col(id_col).cast("long").alias("doc_id"),
            F.explode_outer(toks).alias("tok"),
        )
        .select(
            "doc_id",
            w.alias("w"),
            F.when(w == 1, F.conv(F.substring(h, 1, 8), 16, 10).cast("long"))
            .otherwise(F.lit(0))
            .alias("hi"),
            F.when(w == 1, F.conv(F.substring(h, 9, 8), 16, 10).cast("long"))
            .otherwise(F.lit(0))
            .alias("lo"),
        )
    )
    aggs = [F.sum("w").alias("W")]
    for i in range(64):
        src, sh = ("lo", i) if i < 32 else ("hi", i - 32)
        bit = F.shiftrightunsigned(F.col(src), sh).bitwiseAND(F.lit(1))
        # only count set bits on real tokens (w=0 rows have hi=lo=0 so
        # their bits are already 0, but keep the product for clarity)
        aggs.append(F.sum(bit * F.col("w")).alias(f"s{i}"))
    agg = rows.groupBy("doc_id").agg(*aggs)
    # vote_i = 2*s_i − W > 0  ⇔  2*s_i > W;  signed two's complement:
    # value = Σ_{i<63} b_i·2^i − b_63·2^63
    terms = [
        F.when(2 * F.col(f"s{i}") > F.col("W"), F.lit(v)).otherwise(F.lit(0))
        for i, v in ((i, -(1 << 63) if i == 63 else 1 << i) for i in range(64))
    ]
    return agg.select("doc_id", reduce(add, terms).alias("simhash"))


def simhash_near_duplicates(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_hamming: int = 3,
    num_bands: int = 4,
) -> DataFrame:
    """Near-dup pairs by SimHash: ``(a, b, hamming)`` with distance ≤ r.

    Pigeonhole banding: split the 64-bit fingerprint into ``num_bands``
    blocks; any pair within Hamming r < num_bands agrees on ≥1 whole
    block, so a per-block equality self-join finds all candidates —
    verified exactly with bit_count(xor).
    """
    if not 0 <= max_hamming < 64:
        raise ValueError(f"max_hamming must be in [0, 64), got {max_hamming}")
    if 64 % num_bands:
        raise ValueError(f"num_bands must divide 64, got {num_bands}")
    if max_hamming >= num_bands:
        # pigeonhole guarantee requires r < bands: with r >= bands, a pair
        # with one differing bit per block agrees on NO block and would be
        # silently missed — auto-widen to the smallest divisor of 64 that
        # restores the bound instead of returning false negatives
        num_bands = next(b for b in (2, 4, 8, 16, 32, 64) if b > max_hamming)
    fp = simhash64(df, text_col, id_col)
    width = 64 // num_bands
    block = lambda b: F.shiftrightunsigned(F.col("simhash"), b * width).bitwiseAND(
        F.lit((1 << width) - 1)
    )
    cands = None
    for bnd in range(num_bands):
        l = fp.select(F.col("doc_id").alias("a"), F.col("simhash").alias("fa"), block(bnd).alias("blk"))
        r = fp.select(F.col("doc_id").alias("b"), F.col("simhash").alias("fb"), block(bnd).alias("blk"))
        c = l.join(r, "blk").where(F.col("a") < F.col("b")).select("a", "b", "fa", "fb")
        cands = c if cands is None else cands.unionAll(c)
    cands = cands.dropDuplicates(["a", "b"])
    hamming = F.bit_count(F.col("fa").bitwiseXOR(F.col("fb")))
    return (
        cands.select("a", "b", hamming.alias("hamming"))
        .where(F.col("hamming") <= max_hamming)
    )


def jaccard_verify(
    df: DataFrame,
    pairs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    shingle_n: int = 3,
) -> DataFrame:
    """Exact n-gram Jaccard for a GIVEN candidate set: ``(a, b, jaccard)``.

    Pair-driven verification: each (a, b) candidate is expanded by doc
    a's shingles then intersected with doc b's via a (b, shingle)
    equi-join — cost ∝ |candidates|·|shingles/doc|, never the
    all-pairs-sharing-a-shingle product that ``jaccard_pairs``'s
    inverted index pays.  This is the verify stage of the LSH pipeline:
    candidate generation bounds the pair count, so the expansion is
    linear in what LSH emitted.  Candidates with zero common shingles
    drop out of the inner join (their Jaccard is 0 — callers filter by a
    positive threshold anyway).  Sizes use the FULL shingle sets (no
    ``max_df`` cap) so the returned Jaccard is exact.
    """
    sh = word_shingles(df, text_col, id_col, n=shingle_n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("_sz"))
    sa = sh.select(F.col(id_col).alias("a"), "shingle")
    sb = sh.select(F.col(id_col).alias("b"), "shingle")
    common = (
        pairs.join(sa, "a")
        .join(sb, ["b", "shingle"])
        .groupBy("a", "b")
        .agg(F.count(F.lit(1)).alias("_common"))
    )
    return (
        common.join(sizes.select(F.col(id_col).alias("a"), F.col("_sz").alias("_sa")), "a")
        .join(sizes.select(F.col(id_col).alias("b"), F.col("_sz").alias("_sb")), "b")
        .select(
            "a",
            "b",
            (
                F.col("_common")
                / (F.col("_sa") + F.col("_sb") - F.col("_common"))
            ).alias("jaccard"),
        )
    )


def dedup_clusters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    num_hashes: int = 8,
    rows_per_band: int = 2,
    shingle_n: int = 3,
    threshold: float = 0.8,
    max_bucket: int | None = 1000,
    hash_fn: str = "md5",
) -> DataFrame:
    """End-to-end near-duplicate clustering — the canonical web-corpus
    dedup pipeline: ``(doc_id, cluster_id, is_canonical)``.

    Stages (each the bucketed/candidate-bounded scale shape, never
    all-pairs):

    1. **candidates** — MinHash-LSH banding (``minhash_lsh_candidates``,
       hot buckets capped at ``max_bucket``);
    2. **verify** — exact n-gram Jaccard on candidates only
       (``jaccard_verify``), keep pairs ≥ ``threshold``;
    3. **exact rescue** — identical-text pairs from
       ``exact_duplicates`` as star edges onto the group min.
       Load-bearing, not redundant: exact dups inside a capped hot
       bucket, and docs shorter than ``shingle_n`` tokens (no
       shingles ⇒ no signature ⇒ invisible to LSH), are caught here;
    4. **cluster** — hash-min connected components over the dup-pair
       graph (the engine's own CC superstep — the dup graph of a real
       corpus has mega-clusters of boilerplate, so the driver never
       materializes it; transitive closure stays distributed);
    5. **canonicalize** — cluster id = min doc_id in the component;
       ``is_canonical`` = 1 on that doc (the survivor a dedup job
       keeps), 0 on the rest.  Docs in no dup pair are their own
       singleton cluster with is_canonical = 1.
    """
    from linkgraph.algorithms.cc import connected_components
    from linkgraph.graph import Graph

    cand = minhash_lsh_candidates(
        df, text_col, id_col, num_hashes, rows_per_band, shingle_n,
        max_bucket, hash_fn=hash_fn,
    )
    near = (
        jaccard_verify(df, cand, text_col, id_col, shingle_n)
        .where(F.col("jaccard") >= threshold)
        .select("a", "b")
    )
    star = (
        exact_duplicates(df, text_col, id_col)
        .where(F.col(id_col) != F.col("group_id"))
        .select(F.col("group_id").alias("a"), F.col(id_col).alias("b"))
    )
    edges = near.unionAll(star).select(
        F.col("a").alias("src"), F.col("b").alias("dst")
    )
    g = Graph.from_edges(edges)
    try:
        comp = connected_components(g).state.select(
            F.col("vid").alias(id_col), "comp"
        )
        out = (
            df.select(id_col)
            .join(comp, id_col, "left")
            .select(
                id_col,
                F.coalesce("comp", F.col(id_col)).alias("cluster_id"),
            )
            .withColumn(
                "is_canonical",
                (F.col(id_col) == F.col("cluster_id")).cast("int"),
            )
        )
        # materialize before releasing the dup graph's persisted edges
        out = out.localCheckpoint(eager=True)
    finally:
        g.unpersist()
    return out


def mirror_host_pairs(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    host_col: str = "host",
    max_hosts_per_fp: int | None = 20,
    min_shared: int = 2,
) -> DataFrame:
    """Mirror-site detection: host pairs ranked by shared exact-content
    fingerprints → ``(host_a, host_b, shared)`` with ``host_a < host_b``.

    Two hosts serving many byte-identical documents are mirrors (or a
    scraper/CDN pair) — a first-class training-data signal: mirrored
    corpora inflate dedup clusters and double-count quality stats, and
    the standard hygiene move is to keep one host of each mirror pair
    (Common-Crawl-style curation; cf. the host-level rollups in
    textops/corpus.py `host_rollup`).

    Physical shape at 100 TB:
    - fingerprint = ``md5(text)`` — the shuffle carries 32-byte hashes,
      never document bodies (same contract as :func:`exact_duplicates`).
    - ``max_hosts_per_fp`` is the boilerplate guard (the analog of
      ``minhash_lsh_candidates.max_bucket``): a fingerprint served by
      hundreds of hosts is template/boilerplate content, which carries
      all of the quadratic pair blow-up and none of the mirror signal.
      The guard is a TWO-PASS plan, mirroring ``max_bucket``: a
      map-side-combined ``count`` per fingerprint first, then a
      ``left_semi`` join keeps only fingerprints with ≤ cap hosts, and
      only THOSE reach ``collect_set`` — so no aggregation buffer ever
      materializes an over-cap host array (a boilerplate fingerprint
      served by millions of hosts would otherwise OOM the executor in
      the set build itself, before the size() filter could run).
    - per-surviving-fingerprint DISTINCT host sets via ``collect_set``
      (now bounded by construction), then host PAIRS exploded per
      fingerprint — cost Σ_{|hosts_fp| ≤ cap} |hosts_fp|², never
      corpus-quadratic, in the set build AND the pair explode.
    - final ``groupBy(host_a, host_b).count()`` is map-side combined;
      output cardinality is |host pairs with shared content|, tiny.

    ``min_shared`` suppresses incidental single-document overlaps.
    """
    fp_host = (
        df.select(
            F.md5(F.col(text_col)).alias("fp"), F.col(host_col).alias("host")
        )
        .dropDuplicates(["fp", "host"])
    )
    if max_hosts_per_fp is not None:
        # Pass 1: bounded count agg (map-side combined) → keep only
        # fingerprints whose host fan-out fits the cap. This runs BEFORE
        # collect_set so no executor ever buffers an over-cap host array.
        small_fps = (
            fp_host.groupBy("fp")
            .agg(F.count(F.lit(1)).alias("_nh"))
            .where(F.col("_nh") <= max_hosts_per_fp)
            .select("fp")
        )
        fp_host = fp_host.join(small_fps, "fp", "left_semi")
    hosts_per_fp = (
        fp_host.groupBy("fp")
        .agg(F.collect_set("host").alias("hosts"))
        .where(F.size("hosts") >= 2)
        .select(F.array_sort("hosts").alias("hosts"))
    )
    pairs = hosts_per_fp.select(
        F.explode(
            F.expr(
                "flatten(transform(hosts, (x, i) -> "
                "transform(slice(hosts, i + 2, size(hosts)), "
                "y -> struct(x as host_a, y as host_b))))"
            )
        ).alias("p")
    ).select("p.host_a", "p.host_b")
    return (
        pairs.groupBy("host_a", "host_b")
        .agg(F.count(F.lit(1)).alias("shared"))
        .where(F.col("shared") >= min_shared)
    )
