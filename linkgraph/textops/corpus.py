"""Corpus-level text statistics and filters for training-data curation:
Gopher-style repetition stats, cross-document boilerplate n-grams,
benchmark-contamination overlap, and TF-IDF term ranking.

These are the standard corpus-curation passes published for web-scale
LLM training pipelines (Rae et al., *Scaling Language Models: Methods,
Analysis & Insights from Training Gopher*, 2021 — repetition filters;
Wenzek et al., *CCNet*, 2020 — cross-document boilerplate removal;
Brown et al., *GPT-3*, 2020 — n-gram decontamination against eval
benchmarks).  Reference: none (upstream essentials is a graph-kernel
library); these extend the engine per the task brief's training-data
mandate, alongside textops/dedup.py and textops/quality.py.

All four operators stay JVM-side (built-in ``pyspark.sql.functions``
only — no Python UDFs anywhere): n-grams are built NARROW with
``slice``+``arrays_zip`` over the token array (no per-token shuffle; the
only shuffles are the count aggregations, which map-side combine), and
every expression has an exact DuckDB twin in linkgraph/queries.py so the
driver's value-hash gate replays them.

Scale shapes (the 100 TB story):

- :func:`repetition_stats` is embarrassingly parallel — zero shuffles
  beyond the scan; every stat is computed per-row with higher-order
  array functions inside whole-stage codegen.
- :func:`boilerplate_ngrams` shuffles (ngram → doc-frequency) pairs
  AFTER an in-doc ``array_distinct``, so a hot boilerplate n-gram
  contributes one row per map partition into the count (partial agg),
  never |docs| rows to one reducer; the join back to docs is an equi-join
  on the n-gram key that AQE turns into a broadcast when the boilerplate
  set is small (it is, by definition: df ≥ min_df survivors).
- :func:`contamination` keeps the benchmark side tiny by construction
  (an eval set, thousands of docs at most) — ``F.broadcast`` pins the
  replicated side so the corpus never shuffles.
- :func:`tfidf_terms` is two map-side-combined aggregations (term-in-doc
  tf, term df) plus one join keyed on the term; the per-doc top-k is a
  window over doc_id — the same bounded-group shape as labelprop's mode.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _tokens(text_col: str) -> F.Column:
    """Token array: split on single spaces, drop empties (matches the
    DuckDB twin's ``string_split(text, ' ')`` + empty filter)."""
    t = F.coalesce(F.col(text_col), F.lit(""))
    return F.filter(F.split(t, " "), lambda x: x != "")


def _ngrams(tok: F.Column, n: int) -> F.Column:
    """n-gram array (space-joined) built narrow from the token array:
    zip n shifted slices — no explode, no shuffle, pure codegen."""
    cnt = F.greatest(F.size(tok) - F.lit(n - 1), F.lit(0))
    slices = [F.slice(tok, i + 1, cnt) for i in range(n)]
    zipped = F.arrays_zip(*slices)
    return F.transform(
        zipped, lambda s: F.concat_ws(" ", *[s[str(i)] for i in range(n)])
    )


def repetition_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Gopher-style within-document repetition features, one row per doc:

    ``(doc_id, n_tokens, distinct_ratio, top_bigram_frac,
    dup_trigram_frac)``

    - ``distinct_ratio`` — distinct tokens / tokens (low = degenerate
      repetition, the classic spam signal);
    - ``top_bigram_frac`` — fraction of tokens covered by the single
      most frequent bigram (count × 2 / n_tokens), Gopher's
      "top n-gram fraction" at n=2;
    - ``dup_trigram_frac`` — fraction of trigram positions whose trigram
      occurs more than once in the doc, Gopher's "duplicate n-gram
      fraction" at n=3.

    Zero-shuffle: every stat folds over per-row arrays with
    ``aggregate``/``transform`` (whole-stage codegen); short docs
    (< n tokens) report 0 for the n-gram stats.
    """
    tok = _tokens(text_col)

    def _adjacent_eq(sorted_col: F.Column) -> F.Column:
        """0/1 array: eq[i] = (sorted[i+1] == sorted[i]).

        All multiplicity statistics of the sorted array are functions of
        this int array, so the per-element folds below never touch a
        string again — the previous shape folded a struct carrying the
        PREVIOUS GRAM STRING through every step (string struct churn:
        10⁶ bench docs at local[32] took 186.9 s with string folds,
        15.6–18.6 s with this int-array form — tools/bench_textops.py
        corpus, full-evaluation timing).

        size < 2 guard: sequence(1, 0) DESCENDS in Spark rather than
        returning empty — emit an empty int array instead."""
        return F.when(
            F.size(sorted_col) >= 2,
            F.transform(
                F.sequence(F.lit(1), F.size(sorted_col) - 1),
                lambda i: (
                    F.element_at(sorted_col, i + 1)
                    == F.element_at(sorted_col, i)
                ).cast("int"),
            ),
        ).otherwise(F.array().cast("array<int>"))

    def _max_count(eq: F.Column) -> F.Column:
        # max multiplicity = 1 + longest run of 1s in eq — int-only fold
        return (
            F.aggregate(
                eq,
                F.struct(F.lit(0).alias("run"), F.lit(0).alias("best")),
                lambda acc, e: F.struct(
                    F.when(e == 1, acc["run"] + 1).otherwise(F.lit(0)).alias("run"),
                    F.greatest(
                        acc["best"],
                        F.when(e == 1, acc["run"] + 1).otherwise(F.lit(0)),
                    ).alias("best"),
                ),
                lambda acc: acc["best"],
            )
            + 1
        )

    def _dup_positions(eq: F.Column) -> F.Column:
        # positions inside runs of length ≥ 2: each eq=1 adds one, and a
        # run's FIRST eq (prev=0) retro-credits the run head (+1 extra)
        return F.aggregate(
            eq,
            F.struct(F.lit(0).alias("prev"), F.lit(0).alias("dup")),
            lambda acc, e: F.struct(
                e.alias("prev"),
                (
                    acc["dup"]
                    + F.when(
                        e == 1,
                        F.when(acc["prev"] == 0, F.lit(2)).otherwise(F.lit(1)),
                    ).otherwise(F.lit(0))
                ).alias("dup"),
            ),
            lambda acc: acc["dup"],
        )

    # layered selects: the sorted gram arrays and eq arrays are each
    # referenced more than once downstream — naming them in their own
    # projection keeps CollapseProject from re-inlining (= re-sorting)
    base = df.select(
        F.col(id_col),
        F.size(tok).alias("_n"),
        F.array_sort(_ngrams(tok, 2)).alias("_bis"),
        F.array_sort(_ngrams(tok, 3)).alias("_tris"),
        F.size(F.array_distinct(tok)).alias("_nd"),
    )
    eqs = base.select(
        id_col,
        "_n",
        "_nd",
        F.size("_tris").alias("_ntri"),
        _adjacent_eq(F.col("_bis")).alias("_bieq"),
        _adjacent_eq(F.col("_tris")).alias("_trieq"),
    )
    n_tok = F.col("_n")
    # n ≥ 2 (not just > 0): with no bigrams at all the max-multiplicity
    # is undefined — report 0 like the n-gram-free short-doc convention
    top_bi_frac = F.when(
        n_tok >= 2,
        (_max_count(F.col("_bieq")) * F.lit(2)).cast("double") / n_tok,
    ).otherwise(F.lit(0.0))
    dup_tri_frac = F.when(
        F.col("_ntri") > 0,
        _dup_positions(F.col("_trieq")).cast("double") / F.col("_ntri"),
    ).otherwise(F.lit(0.0))
    distinct_ratio = F.when(
        n_tok > 0, F.col("_nd").cast("double") / n_tok
    ).otherwise(F.lit(0.0))
    return eqs.select(
        F.col(id_col),
        n_tok.cast("long").alias("n_tokens"),
        F.round(distinct_ratio, 6).alias("distinct_ratio"),
        F.round(top_bi_frac, 6).alias("top_bigram_frac"),
        F.round(dup_tri_frac, 6).alias("dup_trigram_frac"),
    )


def boilerplate_ngrams(
    df: DataFrame,
    n: int = 3,
    min_df: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document boilerplate measurement (CCNet-style, n-gram
    granularity): an n-gram is *boilerplate* when it appears in at least
    ``min_df`` distinct documents; each doc reports the fraction of its
    n-gram positions covered by boilerplate.

    Returns ``(doc_id, n_ngrams, boiler_frac)`` for every doc.

    Physical shape: per-doc ``array_distinct`` BEFORE the explode bounds
    the df-count input at one row per (doc, distinct n-gram); the count
    aggregation map-side combines, so a corpus-wide boilerplate n-gram
    (the hot key) reaches the reducer once per map partition.  The match
    count joins doc n-grams to the survivor set on the n-gram key — AQE
    broadcasts the survivor side when small.
    """
    grams = df.select(
        F.col(id_col), _ngrams(_tokens(text_col), n).alias("grams")
    )
    per_doc = grams.select(
        id_col, F.explode_outer("grams").alias("gram")
    )
    dfreq = (
        grams.select(
            id_col, F.explode(F.array_distinct("grams")).alias("gram")
        )
        .groupBy("gram")
        .agg(F.count("*").alias("df"))
        .where(F.col("df") >= min_df)
        .select("gram")
    )
    matched = per_doc.join(dfreq, "gram", "left_semi").groupBy(id_col).agg(
        F.count("*").alias("n_boiler")
    )
    totals = grams.select(
        id_col, F.size("grams").alias("n_ngrams")
    )
    return totals.join(matched, id_col, "left").select(
        id_col,
        F.col("n_ngrams").cast("long").alias("n_ngrams"),
        F.round(
            F.when(
                F.col("n_ngrams") > 0,
                F.coalesce(F.col("n_boiler"), F.lit(0)).cast("double")
                / F.col("n_ngrams"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("boiler_frac"),
    )


def contamination(
    df: DataFrame,
    benchmark: DataFrame,
    n: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination check (GPT-3 appendix-C style): for each
    corpus doc, the fraction of its n-gram positions that appear anywhere
    in the benchmark set's n-grams.

    ``benchmark`` is any DataFrame with the same ``text_col`` (the eval
    set).  Returns ``(doc_id, n_ngrams, contam_frac)``; docs above a
    threshold get dropped/flagged by the caller.

    The benchmark n-gram set is distinct-ed and **broadcast** — eval sets
    are thousands of docs, the corpus is the 100 TB side and never moves.
    """
    bench_grams = (
        benchmark.select(F.explode(_ngrams(_tokens(text_col), n)).alias("gram"))
        .distinct()
    )
    per_doc = df.select(
        F.col(id_col), F.explode_outer(_ngrams(_tokens(text_col), n)).alias("gram")
    )
    matched = (
        per_doc.join(F.broadcast(bench_grams), "gram", "left_semi")
        .groupBy(id_col)
        .agg(F.count("*").alias("n_hit"))
    )
    totals = df.select(
        F.col(id_col), F.size(_ngrams(_tokens(text_col), n)).alias("n_ngrams")
    )
    return totals.join(matched, id_col, "left").select(
        id_col,
        F.col("n_ngrams").cast("long").alias("n_ngrams"),
        F.round(
            F.when(
                F.col("n_ngrams") > 0,
                F.coalesce(F.col("n_hit"), F.lit(0)).cast("double")
                / F.col("n_ngrams"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("contam_frac"),
    )


def paragraph_dedup(
    df: DataFrame,
    para_tokens: int = 12,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet-style paragraph-level deduplication (Wenzek et al. 2020 §3:
    dedup at paragraph granularity by hash, keeping the first
    occurrence): chunk each doc's token stream into fixed windows of
    ``para_tokens`` tokens ("paragraphs" — the driver corpus is flat
    token text, so windows stand in for newline paragraphs), drop every
    paragraph whose md5 was already seen at a smaller (doc_id, pos),
    and reassemble the surviving text in position order.

    Returns ``(doc_id, n_paras, n_kept, clean_md5)`` per doc —
    ``clean_md5`` is the md5 of the space-joined surviving paragraphs
    (md5('') for fully-deduplicated docs), so the value-hash gate pins
    the reassembled text without shipping it.

    Physical shape at 100 TB: paragraphs explode to (doc, pos, md5)
    rows; the keep-first rule is a min-struct aggregation on the hash
    key (map-side combined — a boilerplate paragraph repeated in 10⁹
    docs reaches the reducer once per map partition, and the winner is
    one row) followed by one equi-join back on (hash, doc, pos); never
    a window over the hash key (a window would pull a hot paragraph's
    full occurrence list into one task).  Reassembly is a per-doc
    sort_array over collected (pos, paragraph) structs — bounded by the
    doc's own paragraph count.
    """
    toks = df.select(
        F.col(id_col), _tokens(text_col).alias("tok")
    ).withColumn("n", F.size("tok"))
    paras = toks.select(
        id_col,
        F.posexplode_outer(
            # n = 0 guard: sequence(0, -1) DESCENDS in Spark (yielding
            # [0, -1]) rather than returning empty — emit NULL instead,
            # which posexplode_outer turns into one all-NULL row that
            # the isNotNull filter below drops
            F.when(
                F.col("n") > 0,
                F.transform(
                    F.sequence(
                        F.lit(0),
                        F.ceil(
                            F.col("n") / F.lit(float(para_tokens))
                        ).cast("int")
                        - 1,
                    ),
                    lambda p: F.array_join(
                        F.slice(
                            F.col("tok"), p * para_tokens + 1, para_tokens
                        ),
                        " ",
                    ),
                ),
            )
        ).alias("pos", "para"),
    )
    hashed = paras.where(F.col("para").isNotNull()).select(
        id_col, "pos", "para", F.md5("para").alias("h")
    )
    winners = hashed.groupBy("h").agg(
        F.min(F.struct(F.col(id_col), F.col("pos"))).alias("w")
    ).select(
        "h",
        F.col(f"w.{id_col}").alias(id_col),
        F.col("w.pos").alias("pos"),
    )
    kept = hashed.join(winners, ["h", id_col, "pos"], "left_semi")
    reassembled = kept.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("n_kept"),
        F.array_join(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("pos"), F.col("para")))
                ),
                lambda s: s["para"],
            ),
            " ",
        ).alias("clean"),
    )
    totals = toks.select(
        id_col,
        F.when(
            F.col("n") > 0,
            F.ceil(F.col("n") / F.lit(float(para_tokens))).cast("long"),
        )
        .otherwise(F.lit(0))
        .alias("n_paras"),
    )
    return totals.join(reassembled, id_col, "left").select(
        id_col,
        "n_paras",
        F.coalesce("n_kept", F.lit(0)).cast("long").alias("n_kept"),
        F.md5(F.coalesce("clean", F.lit(""))).alias("clean_md5"),
    )


def tfidf_terms(
    df: DataFrame,
    k: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-k TF-IDF terms per document: ``(doc_id, term, tfidf)``.

    ``tfidf = tf × ln(N / df)`` (raw term count × inverse document
    frequency, natural log — the textbook form).  Deterministic total
    order: rank by (rounded tfidf DESC, term ASC), so ties and cross-
    engine last-ulp float noise cannot reorder the survivors.

    Two map-side-combined aggregations (per-doc tf, corpus df) + one
    equi-join on the term + a bounded per-doc window — the same shapes
    the engine's labelprop mode uses, all hub-safe.
    """
    toks = df.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count("*").alias("tf"))
    n_docs = df.count()
    dfreq = tf.groupBy("term").agg(F.count("*").alias("df"))
    scored = tf.join(dfreq, "term").select(
        id_col,
        "term",
        F.round(
            F.col("tf") * F.log(F.lit(float(n_docs)) / F.col("df")), 6
        ).alias("tfidf"),
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("tfidf"), F.asc("term"))
    return (
        scored.withColumn("_rk", F.row_number().over(w))
        .where(F.col("_rk") <= k)
        .select(id_col, "term", "tfidf")
    )


def duplicate_spans(
    df: DataFrame,
    n: int = 12,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Cross-document duplicated-substring statistics — the
    substring-level (ExactSubstr) companion to whole-doc and paragraph
    dedup (Lee et al., *Deduplicating Training Data Makes Language
    Models Better*, 2022 §4.1: remove any ≥50-token span occurring
    twice anywhere in the corpus; here the span unit is an ``n``-token
    sliding window).

    One row per doc: ``(doc_id, n_tokens, n_windows, dup_windows,
    dup_tokens, dup_token_frac)`` where ``dup_windows`` counts this
    doc's window positions whose n-token window occurs ≥ 2 times in the
    WHOLE corpus (other docs or elsewhere in this doc), ``dup_tokens``
    is the union length of those overlapping n-token spans (each sorted
    duplicated position contributes ``min(n, next_pos − pos)`` — the
    interval-union identity), and ``dup_token_frac = dup_tokens /
    n_tokens`` is the fraction of the doc Lee et al.'s cut rule would
    remove.

    Reference: none (upstream essentials is a graph-kernel library);
    this extends the engine per the task brief's training-data mandate.

    Physical shape at 100 TB: windows are built NARROW per row
    (slice+zip, no shuffle) and explode only into the two hash
    aggregations — (window → corpus count) map-side combines, so a
    boilerplate window repeated 10⁹ times reaches a reducer once per
    map partition; the duplicated-window set joins back as an equi-join
    on the window key (AQE broadcasts it when small).  The span-union
    is a per-doc window function over that doc's own duplicated
    positions — bounded by the doc's length, never corpus-wide.  The
    shuffle key is the window STRING (exact semantics, ~n·8 bytes); at
    100 TB swap it for ``xxhash64(gram)`` — collisions then over-mark
    a window as duplicated at P(collision) ≈ |windows|²/2⁶⁵, the
    standard trade Lee et al. make.
    """
    tok = _tokens(text_col)
    base = df.select(F.col(id_col), tok.alias("tok")).select(
        id_col,
        F.size("tok").alias("n_tokens"),
        _ngrams(F.col("tok"), n).alias("grams"),
    )
    wins = base.select(id_col, F.posexplode("grams").alias("pos", "gram"))
    dup_grams = (
        wins.groupBy("gram")
        .agg(F.count(F.lit(1)).alias("cnt"))
        .where(F.col("cnt") >= 2)
        .select("gram")
    )
    dupw = wins.join(dup_grams, "gram", "left_semi")
    w = Window.partitionBy(id_col).orderBy("pos")
    cov = dupw.select(
        F.col(id_col),
        F.least(
            F.coalesce(F.lead("pos").over(w) - F.col("pos"), F.lit(n)),
            F.lit(n),
        ).alias("cov"),
    )
    per_doc = cov.groupBy(id_col).agg(
        F.count(F.lit(1)).alias("dup_windows"),
        F.sum("cov").alias("dup_tokens"),
    )
    return (
        base.select(id_col, "n_tokens", F.size("grams").alias("n_windows"))
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.col("n_tokens").cast("long").alias("n_tokens"),
            F.col("n_windows").cast("long").alias("n_windows"),
            F.coalesce("dup_windows", F.lit(0)).cast("long").alias("dup_windows"),
            F.coalesce("dup_tokens", F.lit(0)).cast("long").alias("dup_tokens"),
            F.round(
                F.when(
                    F.col("n_tokens") > 0,
                    F.coalesce(F.col("dup_tokens"), F.lit(0)).cast("double")
                    / F.col("n_tokens"),
                ).otherwise(F.lit(0.0)),
                6,
            ).alias("dup_token_frac"),
        )
    )


def unigram_surprisal(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-document mean unigram surprisal under the corpus's own
    unigram language model — the cheapest "perplexity-style" quality
    score a curation pipeline runs before a real LM pass (CCNet's
    LM-perplexity bucketing, Wenzek et al. 2020 §3, degenerated to the
    unigram model so it needs no external artifact).

    ``surprisal(t) = −log2(count(t) / total_tokens)``; one row per doc:
    ``(doc_id, n_tokens, mean_surprisal)`` (mean over token POSITIONS —
    a token occurring twice in the doc counts twice; 0.0 for empty
    docs).  Low mean = repetitive/common-word text (boilerplate, SEO
    spam); high mean = rare-token soup (lists, code, gibberish); the
    useful corpus lives in the middle band, exactly how CCNet buckets
    head/middle/tail.

    Reference: none (upstream essentials is a graph-kernel library);
    training-data mandate, companion to :func:`tfidf_terms`.

    Physical shape at 100 TB: two map-side-combined aggregations (per-
    (doc,term) tf — key cardinality bounded by Σ distinct terms per
    doc; corpus term counts — bounded by |vocab|), one equi-join on the
    term (AQE broadcasts the vocab side when it fits), and a final
    per-doc re-aggregation keyed on doc_id.  The corpus total rides a
    1-row cross join (broadcast), never a driver round-trip.
    """
    toks = df.select(
        F.col(id_col), F.explode(_tokens(text_col)).alias("term")
    )
    tf = toks.groupBy(id_col, "term").agg(F.count(F.lit(1)).alias("tf"))
    vocab = tf.groupBy("term").agg(F.sum("tf").alias("cf"))
    total = vocab.agg(F.sum("cf").alias("total"))
    scored = tf.join(vocab, "term").crossJoin(F.broadcast(total))
    per_doc = scored.groupBy(id_col).agg(
        F.sum("tf").cast("long").alias("n_tokens"),
        (
            F.sum(
                F.col("tf")
                * -F.log2(F.col("cf").cast("double") / F.col("total"))
            )
            / F.sum("tf")
        ).alias("mean_surprisal"),
    )
    return (
        df.select(id_col)
        .join(per_doc, id_col, "left")
        .select(
            id_col,
            F.coalesce("n_tokens", F.lit(0)).cast("long").alias("n_tokens"),
            F.round(F.coalesce("mean_surprisal", F.lit(0.0)), 6).alias(
                "mean_surprisal"
            ),
        )
    )


def c4_filters(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    min_words_per_line: int = 5,
    min_sentences: int = 3,
) -> DataFrame:
    """C4-style page/line heuristic filters (Raffel et al., *Exploring
    the Limits of Transfer Learning with a Unified Text-to-Text
    Transformer*, JMLR 2020, §2.2): ``(doc_id, n_lines, n_kept_lines,
    n_sentences, has_lorem_ipsum, has_curly_brace, keep)``.

    Line rule: a line is KEPT iff it has ≥ ``min_words_per_line``
    whitespace words AND ends in terminal punctuation (``. ! ? "``,
    trailing whitespace allowed).  Page rules: flag placeholder text
    (``lorem ipsum``) and code pages (``{``); ``keep = 1`` iff the page
    has ≥ ``min_sentences`` sentence terminators, no placeholder text,
    and no brace.  Counters are reported alongside the flags so a
    curation pipeline can re-threshold without a second scan.

    Embarrassingly parallel: line splitting and the kept-line predicate
    run as higher-order array functions (``split`` + ``filter`` with a
    ``regexp_count``/``rlike`` lambda) inside whole-stage codegen — zero
    shuffles, zero Python, scan-bound.  NULL text counts as empty.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    lines = F.split(t, "\n")
    kept = F.filter(
        lines,
        lambda x: (
            F.regexp_count(x, F.lit(r"\S+")) >= F.lit(min_words_per_line)
        )
        & x.rlike(r'[.!?"]\s*$'),
    )
    n_sent = F.regexp_count(t, F.lit(r"[.!?]")).cast("long")
    has_lorem = F.lower(t).contains("lorem ipsum").cast("int")
    has_brace = t.contains("{").cast("int")
    keep = (
        (n_sent >= min_sentences) & (has_lorem == 0) & (has_brace == 0)
    ).cast("int")
    return df.select(
        F.col(id_col),
        F.size(lines).cast("long").alias("n_lines"),
        F.size(kept).cast("long").alias("n_kept_lines"),
        n_sent.alias("n_sentences"),
        has_lorem.alias("has_lorem_ipsum"),
        has_brace.alias("has_curly_brace"),
        keep.alias("keep"),
    )


def host_rollup(
    df: DataFrame,
    host_col: str = "host",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Per-host curation dashboard: ``(host, n_docs, n_keep, keep_rate,
    avg_tokens, n_dup_docs)`` — the rollup a crawl operator reads to
    decide which hosts to de-prioritize (low keep-rate = boilerplate or
    non-prose; high dup share = mirror or template farm).

    Pure composition of the engine's per-doc passes — :func:`c4_filters`
    keep flag, ``token_counts`` lengths, ``exact_duplicates`` membership
    — joined on doc_id and rolled up with one map-side-combined
    aggregation keyed on host.  Host keys are low-cardinality relative
    to docs, so the rollup output is tiny; the per-doc passes stay
    scan-bound (the dedup pass shuffles md5 hashes only).
    """
    from linkgraph.textops.dedup import exact_duplicates
    from linkgraph.textops.quality import token_counts

    keep = c4_filters(df, text_col, id_col).select(id_col, "keep")
    toks = token_counts(df, text_col, id_col).select(id_col, "n_tokens")
    dup = (
        exact_duplicates(df, text_col, id_col)
        .select(id_col)
        .withColumn("_dup", F.lit(1))
    )
    base = (
        df.select(F.col(id_col), F.col(host_col))
        .join(keep, id_col)
        .join(toks, id_col)
        .join(dup, id_col, "left")
    )
    n_docs = F.count(F.lit(1))
    n_keep = F.sum("keep")
    return base.groupBy(host_col).agg(
        n_docs.cast("long").alias("n_docs"),
        n_keep.cast("long").alias("n_keep"),
        F.round(n_keep.cast("double") / n_docs, 6).alias("keep_rate"),
        F.round(F.avg("n_tokens"), 6).alias("avg_tokens"),
        F.sum(F.coalesce("_dup", F.lit(0))).cast("long").alias("n_dup_docs"),
    )


def token_zipf_alpha(
    df: DataFrame,
    xmin: int = 2,
    text_col: str = "text",
) -> DataFrame:
    """Zipf/power-law exponent of the corpus TERM-FREQUENCY
    distribution via the Clauset–Shalizi–Newman continuous-MLE
    approximation (SIAM Rev. 2009 eq. 3.7 — the same estimator
    :func:`linkgraph.algorithms.graphstats.powerlaw_alpha` applies to
    in-degrees): 1 row ``(xmin, n_vocab, n_tail, alpha)``.

    A natural-language corpus has α ≈ 2 over term frequencies (Zipf's
    law); machine-generated/templated spam and tokenizer breakage push
    it far off — a one-number corpus-health check next to
    ``repetition_stats``.

    Physical shape: one map-side-combined term-count aggregation (the
    hot term reaches the reducer once per map partition) + one filtered
    1-row aggregate — the 10⁹-term vocabulary never leaves the
    executors.
    """
    if xmin < 1:
        raise ValueError(f"xmin must be >= 1, got {xmin}")
    tf = (
        df.select(F.explode(_tokens(text_col)).alias("term"))
        .groupBy("term")
        .agg(F.count(F.lit(1)).alias("tf"))
    )
    # ONE pass over the term counts: vocab size and the tail MLE are
    # conditional aggregates over the same tf relation (an eager
    # tf.count() would run the corpus-wide explode+groupBy — the
    # expensive job — twice per call)
    in_tail = F.col("tf") >= xmin
    logs = F.when(
        in_tail, F.log(F.col("tf").cast("double") / (xmin - 0.5))
    )
    n_tail = F.count(F.when(in_tail, F.lit(1)))
    return tf.agg(
        F.lit(xmin).cast("long").alias("xmin"),
        F.count(F.lit(1)).cast("long").alias("n_vocab"),
        n_tail.cast("long").alias("n_tail"),
        F.round(
            F.lit(1.0) + n_tail.cast("double") / F.sum(logs), 6
        ).alias("alpha"),
    )


def mixture_plan(
    df: DataFrame,
    weights: dict[str, float],
    token_budget: int,
    source_col: str = "source",
    text_col: str = "text",
) -> DataFrame:
    """Training-mixture sampling plan: per-source keep rates that hit a
    token budget at fixed mixture proportions →
    ``(source, n_docs, tokens, rate, kept_tokens, deficit)``.

    The standard pretraining-data step (fixed-mixture sampling as in
    the GPT-3 / Pile recipes — public method): each source s gets a
    token target ``budget·w_s/Σw``; the sampling rate is
    ``min(1, target_s/T_s)`` where T_s is the source's available
    tokens.  ``deficit = true`` marks sources whose target exceeds
    their supply (rate capped at 1 — the caller must re-normalize or
    oversample, surfaced rather than silently under-filled).

    Sources absent from ``weights`` get weight 0 (rate 0 — excluded).

    Physical shape: ONE map-side-combined per-source aggregation over
    token counts (the token counting is a codegen projection); the
    weight table is a broadcast literal map.  Nothing about a 10¹²-doc
    corpus reaches the driver but |sources| rows.
    """
    if token_budget < 0:
        raise ValueError(f"token_budget must be >= 0, got {token_budget}")
    wsum = float(sum(weights.values()))
    if wsum <= 0:
        raise ValueError("weights must sum to a positive value")
    w = F.coalesce(
        F.create_map(
            *[F.lit(x) for kv in sorted(weights.items()) for x in kv]
        )[F.col(source_col)],
        F.lit(0.0),
    )
    per_src = (
        df.select(
            F.col(source_col), F.size(_tokens(text_col)).alias("_nt")
        )
        .groupBy(source_col)
        .agg(
            F.count(F.lit(1)).cast("long").alias("n_docs"),
            F.sum("_nt").cast("long").alias("tokens"),
        )
    )
    target = w / F.lit(wsum) * F.lit(float(token_budget))
    # tokens = 0 (a source whose docs are all empty/whitespace) must
    # report rate 0 + deficit, not DIVIDE_BY_ZERO under ANSI mode
    rate = F.when(
        F.col("tokens") > 0,
        F.least(F.lit(1.0), target / F.col("tokens").cast("double")),
    ).otherwise(F.lit(0.0))
    return per_src.select(
        source_col,
        "n_docs",
        "tokens",
        rate.alias("rate"),
        (rate * F.col("tokens").cast("double")).alias("kept_tokens"),
        (target > F.col("tokens").cast("double")).alias("deficit"),
    )


def dedup_token_savings(
    df: DataFrame,
    source_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Token accounting for exact dedup, per source:
    ``(source, n_docs, tokens, dup_docs, dup_tokens, savings)`` where
    ``savings = dup_tokens / tokens`` — the fraction of a source's
    token mass that exact dedup removes (non-canonical copies of a
    duplicate group).

    The dashboard number behind every dedup decision: which sources
    are mirror-heavy enough that deduping them changes the mixture
    (pair this with :func:`mixture_plan` — post-dedup token supply is
    ``tokens − dup_tokens``).

    Physical shape: the :func:`linkgraph.textops.dedup.exact_duplicates`
    md5-groupBy (hashes shuffle, bodies don't) joined back on the doc
    id, then ONE map-side-combined per-source aggregation.
    """
    from linkgraph.textops.dedup import exact_duplicates

    dups = exact_duplicates(df, text_col, id_col).select(
        id_col, (F.col(id_col) != F.col("group_id")).alias("_is_dup")
    )
    toks = df.select(
        id_col, F.col(source_col), F.size(_tokens(text_col)).alias("_nt")
    )
    joined = toks.join(dups, id_col, "left").select(
        source_col,
        "_nt",
        F.coalesce("_is_dup", F.lit(False)).alias("_is_dup"),
    )
    return joined.groupBy(source_col).agg(
        F.count(F.lit(1)).cast("long").alias("n_docs"),
        F.sum("_nt").cast("long").alias("tokens"),
        F.sum(F.col("_is_dup").cast("long")).cast("long").alias("dup_docs"),
        F.sum(F.when(F.col("_is_dup"), F.col("_nt")).otherwise(F.lit(0)))
        .cast("long")
        .alias("dup_tokens"),
        F.round(
            # zero-token guard (mirrors mixture_plan): a source whose docs
            # all tokenize empty gets savings 0.0, not NaN from 0.0/0.0
            F.when(
                F.sum("_nt") > 0,
                F.sum(
                    F.when(F.col("_is_dup"), F.col("_nt")).otherwise(F.lit(0))
                ).cast("double")
                / F.sum("_nt"),
            ).otherwise(F.lit(0.0)),
            6,
        ).alias("savings"),
    )
