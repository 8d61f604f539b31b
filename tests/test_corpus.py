"""Corpus-curation operators: repetition stats, boilerplate n-grams,
benchmark contamination, TF-IDF (linkgraph/textops/corpus.py).

Hand-computable fixtures pin the semantics; the catalog sweep
(test_catalog.py entries repetition_stats / boilerplate_ngrams /
contamination / tfidf_top1) replays the same ops against DuckDB twins
on the sf tables.
"""

from __future__ import annotations

import math

from pyspark.sql import functions as F

from linkgraph.textops.corpus import (
    boilerplate_ngrams,
    contamination,
    repetition_stats,
    tfidf_terms,
)


def test_repetition_stats_hand_computed(spark):
    # doc 0: "a b a b a" — tokens=5, distinct=2, bigrams: ab ba ab ba
    #   → top bigram count 2 → frac 2*2/5 = 0.8
    #   trigrams: aba bab aba → 'aba' occurs twice → dup positions 2/3
    # doc 1: all-distinct — no repetition anywhere
    # doc 2: empty; doc 3: too short for trigrams
    df = spark.createDataFrame(
        [(0, "a b a b a"), (1, "w x y z"), (2, ""), (3, "p q")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in repetition_stats(df).collect()}
    assert got[0].n_tokens == 5
    assert got[0].distinct_ratio == round(2 / 5, 6)
    assert got[0].top_bigram_frac == round(4 / 5, 6)
    assert got[0].dup_trigram_frac == round(2 / 3, 6)
    assert got[1].distinct_ratio == 1.0
    assert got[1].dup_trigram_frac == 0.0
    assert got[2].n_tokens == 0 and got[2].distinct_ratio == 0.0
    assert got[3].dup_trigram_frac == 0.0  # no trigrams → 0, not NaN


def test_boilerplate_min_df_gate(spark):
    # trigram "x y z" appears in docs 0,1,2 (df=3 → boilerplate at
    # min_df=3); "a b c" only in doc 0 (df=1 → not boilerplate).
    df = spark.createDataFrame(
        [
            (0, "x y z a b c"),
            (1, "x y z q"),
            (2, "r x y z"),
            (3, "u v w t"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in boilerplate_ngrams(df, n=3, min_df=3).collect()}
    # doc 0 trigrams: xyz yza zab abc → 1 of 4 boilerplate
    assert got[0].n_ngrams == 4 and got[0].boiler_frac == 0.25
    assert got[1].boiler_frac == 0.5  # xyz yzq → 1 of 2
    assert got[2].boiler_frac == 0.5  # rxy xyz → 1 of 2
    assert got[3].boiler_frac == 0.0
    # raising min_df past the df kills the match
    got4 = {r.doc_id: r for r in boilerplate_ngrams(df, n=3, min_df=4).collect()}
    assert all(r.boiler_frac == 0.0 for r in got4.values())


def test_contamination_against_benchmark(spark):
    corpus = spark.createDataFrame(
        [(0, "the quick brown fox jumps"), (1, "lorem ipsum dolor sit amet")],
        "doc_id long, text string",
    )
    bench = spark.createDataFrame(
        [(100, "the quick brown fox runs")], "doc_id long, text string"
    )
    got = {r.doc_id: r for r in contamination(corpus, bench, n=3).collect()}
    # doc 0 trigrams: tqb qbf bfj — bench has tqb qbf bfr → 2/3 hit
    assert got[0].n_ngrams == 3
    assert got[0].contam_frac == round(2 / 3, 6)
    assert got[1].contam_frac == 0.0


def test_tfidf_ranking_and_value(spark):
    # 'rare' appears once, in 1 of 4 docs → tfidf = 1 * ln(4/1)
    # 'common' appears in all docs → idf = ln(1) = 0
    df = spark.createDataFrame(
        [
            (0, "common rare"),
            (1, "common"),
            (2, "common"),
            (3, "common"),
        ],
        "doc_id long, text string",
    )
    top = {r.doc_id: r for r in tfidf_terms(df, k=1).collect()}
    assert top[0].term == "rare"
    assert top[0].tfidf == round(math.log(4.0), 6)
    # docs 1-3: only 'common' with tfidf 0; deterministic tie-break keeps it
    assert top[1].term == "common" and top[1].tfidf == 0.0


def test_tfidf_k_and_determinism(spark):
    df = spark.createDataFrame(
        [(0, "b b a a c"), (1, "d")], "doc_id long, text string"
    )
    rows = tfidf_terms(df, k=2).where(F.col("doc_id") == 0).collect()
    assert len(rows) == 2
    # equal tfidf for a and b (both tf=2, same df) → term ASC breaks tie
    assert [r.term for r in rows] == ["a", "b"] or rows[0].tfidf > rows[1].tfidf


def test_paragraph_dedup_keep_first(spark):
    """Duplicate paragraphs are kept only at their smallest (doc_id,
    pos); docs reassemble from surviving windows in order."""
    import hashlib

    from linkgraph.textops.corpus import paragraph_dedup

    # 4-token "paragraphs": doc 0 = [A B], doc 1 = [B C] (B duplicated),
    # doc 2 = [A] (fully duplicated), doc 3 empty text
    A = "a b c d"
    B = "e f g h"
    C = "i j k l"
    df = spark.createDataFrame(
        [(0, f"{A} {B}"), (1, f"{B} {C}"), (2, A), (3, "")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in paragraph_dedup(df, para_tokens=4).collect()}
    assert (out[0].n_paras, out[0].n_kept) == (2, 2)
    assert (out[1].n_paras, out[1].n_kept) == (2, 1)  # B dropped
    assert (out[2].n_paras, out[2].n_kept) == (1, 0)  # fully deduped
    assert (out[3].n_paras, out[3].n_kept) == (0, 0)
    md5 = lambda s: hashlib.md5(s.encode()).hexdigest()  # noqa: E731
    assert out[0].clean_md5 == md5(f"{A} {B}")
    assert out[1].clean_md5 == md5(C)
    assert out[2].clean_md5 == md5("")
    assert out[3].clean_md5 == md5("")


def test_paragraph_dedup_short_tail_window(spark):
    """The last window may be shorter than para_tokens; it still deduces
    by content."""
    from linkgraph.textops.corpus import paragraph_dedup

    df = spark.createDataFrame(
        [(0, "x y z w tail"), (1, "tail")],
        "doc_id long, text string",
    )
    out = {r.doc_id: r for r in paragraph_dedup(df, para_tokens=4).collect()}
    # doc 0: windows ["x y z w", "tail"]; doc 1: ["tail"] — dup of 0's tail
    assert (out[0].n_paras, out[0].n_kept) == (2, 2)
    assert (out[1].n_paras, out[1].n_kept) == (1, 0)


def test_duplicate_spans_hand_computed(spark):
    # n=3 windows.  doc 0 and doc 1 share the run "a b c d" → windows
    # "a b c" (pos 0) and "b c d" (pos 1) are corpus-duplicated in
    # both docs.  Interval union in doc 0: positions [0,1] each start a
    # 3-token span; sorted gaps → min(3, 1-0)=1 for pos 0, then 3 for
    # the last → 4 covered tokens of 6.
    df = spark.createDataFrame(
        [
            (0, "a b c d x y"),
            (1, "q a b c d"),
            (2, "u v w r s t"),   # all windows unique corpus-wide
            (3, "m m m m m"),     # within-doc repeat: "m m m" ×3 dupes itself
            (4, ""),
        ],
        "doc_id long, text string",
    )
    from linkgraph.textops.corpus import duplicate_spans

    got = {r.doc_id: r for r in duplicate_spans(df, n=3).collect()}
    assert got[0].n_windows == 4 and got[0].dup_windows == 2
    assert got[0].dup_tokens == 4
    assert got[0].dup_token_frac == round(4 / 6, 6)
    # doc 1: same two windows at pos 1,2 → union again 4 of 5 tokens
    assert got[1].dup_windows == 2 and got[1].dup_tokens == 4
    assert got[2].dup_windows == 0 and got[2].dup_token_frac == 0.0
    # doc 3: "m m m" occurs 3× within one doc → all 3 positions dup,
    # contiguous union covers the whole 5-token doc
    assert got[3].dup_windows == 3 and got[3].dup_tokens == 5
    assert got[3].dup_token_frac == 1.0
    assert got[4].n_tokens == 0 and got[4].dup_token_frac == 0.0


def test_unigram_surprisal_hand_computed(spark):
    from linkgraph.textops.corpus import unigram_surprisal

    # corpus: a a a b  → p(a)=3/4, p(b)=1/4
    # doc 0 = "a a a" → mean = -log2(3/4); doc 1 = "b" → 2.0 bits
    df = spark.createDataFrame(
        [(0, "a a a"), (1, "b"), (2, "")],
        "doc_id long, text string",
    )
    got = {r.doc_id: r for r in unigram_surprisal(df).collect()}
    assert got[0].n_tokens == 3
    assert got[0].mean_surprisal == round(-math.log2(3 / 4), 6)
    assert got[1].mean_surprisal == 2.0
    assert got[2].n_tokens == 0 and got[2].mean_surprisal == 0.0


def test_c4_filters_hand_computed(spark):
    from linkgraph.textops.corpus import c4_filters

    long_kept = "one two three four five six."
    long_unterminated = "one two three four five six seven"
    short_terminated = "too short."
    df = spark.createDataFrame(
        [
            (0, f"{long_kept}\n{long_unterminated}\n{short_terminated}"),
            (1, 'he said "stop right there now friend!" and left. ok? yes.'),
            (2, "Lorem Ipsum dolor sit amet consectetur adipiscing elit."),
            (3, "function f() { return 1; } is code. it has brace. really."),
            (4, "no sentences at all just words"),
            (5, None),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (
            r.n_lines,
            r.n_kept_lines,
            r.n_sentences,
            r.has_lorem_ipsum,
            r.has_curly_brace,
            r.keep,
        )
        for r in c4_filters(df).collect()
    }
    # doc 0: 3 lines; only line 1 has >=5 words AND terminal punct
    assert got[0] == (3, 1, 2, 0, 0, 0)
    # doc 1: single line ending '.', quote-terminated mid-sentence ok;
    # 4 terminators (! . ? .) -> keep
    assert got[1] == (1, 1, 4, 0, 0, 1)
    # doc 2: lorem ipsum (case-insensitive) kills it despite 1 sentence
    assert got[2][3] == 1 and got[2][5] == 0
    # doc 3: brace kills it despite 3 sentences
    assert got[3] == (1, 1, 3, 0, 1, 0)
    # doc 4: zero terminators -> not kept
    assert got[4] == (1, 0, 0, 0, 0, 0)
    # NULL text == empty text: one empty line, nothing kept
    assert got[5] == (1, 0, 0, 0, 0, 0)


def test_c4_filters_line_rule_thresholds(spark):
    from linkgraph.textops.corpus import c4_filters

    df = spark.createDataFrame(
        [(0, "a b c d e.\na b c d.\na b c d e f g!   \nx y z w v?")],
        "doc_id long, text string",
    )
    row = c4_filters(df, min_words_per_line=5).collect()[0]
    # lines 1 (5 words '.'), 3 (7 words '!' + trailing ws), 4 (5 words '?')
    assert row.n_lines == 4
    assert row.n_kept_lines == 3


def test_host_rollup_hand_computed(spark):
    from linkgraph.textops.corpus import host_rollup

    kept = "one two three four five. six seven eight nine ten? more here!"
    df = spark.createDataFrame(
        [
            (0, "a.example", kept),
            (1, "a.example", "dup text"),
            (2, "a.example", "dup text"),
            (3, "b.example", kept),
        ],
        "doc_id long, host string, text string",
    )
    got = {
        r.host: (r.n_docs, r.n_keep, r.keep_rate, r.n_dup_docs)
        for r in host_rollup(df).collect()
    }
    # dup groups are CORPUS-wide: docs 0 and 3 are cross-host mirrors of
    # each other, so both count as dups on their respective hosts —
    # mirror detection is the point of the rollup
    assert got["a.example"] == (3, 1, round(1 / 3, 6), 3)
    assert got["b.example"] == (1, 1, 1.0, 1)


def test_token_zipf_alpha_matches_numpy(spark):
    import math

    from linkgraph.textops.corpus import token_zipf_alpha

    docs = spark.createDataFrame(
        [
            (0, "a a a a b b c d"),
            (1, "a a b c e"),
            (2, "a b f"),
        ],
        "doc_id long, text string",
    )
    row = token_zipf_alpha(docs, xmin=2).collect()[0]
    # tf: a=7, b=4, c=2, d=1, e=1, f=1 → vocab 6, tail {7,4,2}
    assert (row.n_vocab, row.n_tail) == (6, 3)
    expected = 1.0 + 3 / sum(math.log(f / 1.5) for f in (7, 4, 2))
    assert abs(row.alpha - round(expected, 6)) < 1e-9


def test_mixture_plan_budget_and_deficit(spark):
    from linkgraph.textops.corpus import mixture_plan

    docs = spark.createDataFrame(
        [(i, "t " * 100, "web" if i < 8 else "code") for i in range(10)],
        "doc_id long, text string, source string",
    )
    # web: 8 docs × 100 tokens = 800; code: 2 × 100 = 200
    got = {
        r.source: r
        for r in mixture_plan(
            docs, {"web": 1.0, "code": 1.0}, token_budget=500
        ).collect()
    }
    # each target = 250: web rate 250/800, code rate 1.0 + deficit
    assert abs(got["web"].rate - 250 / 800) < 1e-12
    assert not got["web"].deficit
    assert got["code"].rate == 1.0 and got["code"].deficit
    assert abs(got["web"].kept_tokens - 250.0) < 1e-9
    assert abs(got["code"].kept_tokens - 200.0) < 1e-9


def test_mixture_plan_unknown_source_excluded(spark):
    from linkgraph.textops.corpus import mixture_plan

    docs = spark.createDataFrame(
        [(0, "a b c", "web"), (1, "d e f", "spam")],
        "doc_id long, text string, source string",
    )
    got = {r.source: r.rate for r in
           mixture_plan(docs, {"web": 1.0}, 2).collect()}
    assert got["spam"] == 0.0 and got["web"] > 0


def test_dedup_token_savings_counts(spark):
    from linkgraph.textops.corpus import dedup_token_savings

    docs = spark.createDataFrame(
        [
            (0, "one two three", "a"),     # canonical (min id of group)
            (1, "one two three", "a"),     # dup of 0
            (2, "unique text here", "a"),
            (3, "one two three", "b"),     # cross-source dup of 0
        ],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in dedup_token_savings(docs).collect()}
    assert got["a"].tokens == 9 and got["a"].dup_docs == 1
    assert got["a"].dup_tokens == 3
    assert abs(got["a"].savings - round(3 / 9, 6)) < 1e-12
    # source b's only doc is a non-canonical copy of group 0
    assert got["b"].dup_docs == 1 and abs(got["b"].savings - 1.0) < 1e-12


def test_mixture_plan_zero_token_source(spark):
    """Review regression: an all-whitespace source must report
    rate 0 + deficit, not DIVIDE_BY_ZERO under ANSI mode."""
    from linkgraph.textops.corpus import mixture_plan

    docs = spark.createDataFrame(
        [(0, "real text here", "web"), (1, "   ", "empty")],
        "doc_id long, text string, source string",
    )
    got = {
        r.source: r
        for r in mixture_plan(docs, {"web": 1.0, "empty": 1.0}, 10).collect()
    }
    assert got["empty"].rate == 0.0 and got["empty"].deficit
    assert got["web"].rate > 0


def test_dedup_token_savings_zero_token_source(spark):
    """A source whose docs all tokenize to zero tokens must report
    savings 0.0, not NaN from 0.0/0.0 (ADVICE r02 — mirrors
    mixture_plan's zero-token guard)."""
    import math

    from linkgraph.textops.corpus import dedup_token_savings

    docs = spark.createDataFrame(
        [(1, "", "empty"), (2, "", "empty"), (3, "real words here", "ok")],
        "doc_id long, text string, source string",
    )
    got = {r.source: r for r in dedup_token_savings(docs).collect()}
    assert got["empty"].tokens == 0
    assert not math.isnan(got["empty"].savings)
    assert got["empty"].savings == 0.0
