"""Text analysis operators: token counts, quality scores, language ID,
document fingerprints.

All hot-path math uses built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage codegen); the only Arrow UDF is the rolling-hash fingerprint
(bit math).  Expressions are chosen to have exact ANSI-SQL twins so the
DuckDB oracle can replay them (regexp semantics kept to the common
POSIX-class subset both engines share).
"""

from __future__ import annotations

from collections.abc import Iterator

import pyarrow as pa
from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# Tiny per-language marker lexicons (deterministic heuristic language ID —
# the classic stopword-profile method; NOT a trained model).
LANG_MARKERS: dict[str, list[str]] = {
    "en": ["the", "and", "of", "to", "in", "is", "that", "for", "with", "was"],
    "es": ["el", "la", "de", "que", "los", "las", "una", "por", "con", "para"],
    "de": ["der", "die", "das", "und", "ist", "nicht", "ein", "mit", "auf", "zu"],
    "fr": ["le", "la", "les", "des", "est", "une", "dans", "pour", "qui", "pas"],
    "zh": ["的", "是", "了", "在", "我", "有", "和", "不", "这", "中"],
}


def token_counts(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """``(doc_id, n_tokens, n_chars, avg_token_len)``.

    Whitespace tokenization; empty text → 0 tokens.  SQL twin uses the
    same ``length``-difference formulation so the two engines agree on
    edge cases (consecutive whitespace, leading/trailing).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))  # NULL text == empty text
    n_tokens = F.regexp_count(t, F.lit(r"\S+"))
    n_chars = F.length(t)
    return df.select(
        F.col(id_col),
        n_tokens.cast("long").alias("n_tokens"),
        n_chars.cast("long").alias("n_chars"),
        F.when(n_tokens > 0, n_chars.cast("double") / n_tokens)
        .otherwise(F.lit(0.0))
        .alias("avg_token_len"),
    )


def quality_scores(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic quality features + composite score per doc.

    ``(doc_id, n_tokens, punct_ratio, digit_ratio, upper_ratio,
    stopword_ratio, quality)`` — the standard cheap pre-filter features
    for web-corpus curation.  ``quality`` ∈ [0,1]: product of clamped
    feature terms (monotone, deterministic).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))  # NULL text == empty text
    n_chars = F.length(t)
    nz = F.greatest(n_chars, F.lit(1)).cast("double")
    trimmed = F.trim(t)
    n_tokens = F.regexp_count(t, F.lit(r"\S+")).cast("long")
    punct = (
        n_chars - F.length(F.regexp_replace(t, r"[.,;:!?'\"()\[\]{}-]", ""))
    ).cast("double") / nz
    digits = (
        n_chars - F.length(F.regexp_replace(t, r"[0-9]", ""))
    ).cast("double") / nz
    uppers = (
        n_chars - F.length(F.regexp_replace(t, r"[A-Z]", ""))
    ).cast("double") / nz
    en_stop = LANG_MARKERS["en"]
    toks = F.split(F.lower(trimmed), r"\s+")
    stop_hits = F.size(F.filter(toks, lambda x: x.isin(*en_stop)))
    stopword_ratio = F.when(n_tokens > 0, stop_hits.cast("double") / n_tokens).otherwise(
        F.lit(0.0)
    )
    len_term = F.least(n_tokens.cast("double") / F.lit(20.0), F.lit(1.0))
    punct_term = F.lit(1.0) - F.least(punct * 4, F.lit(1.0))
    digit_term = F.lit(1.0) - F.least(digits * 4, F.lit(1.0))
    quality = F.round(len_term * punct_term * digit_term, 6)
    return df.select(
        F.col(id_col),
        n_tokens.alias("n_tokens"),
        F.round(punct, 6).alias("punct_ratio"),
        F.round(digits, 6).alias("digit_ratio"),
        F.round(uppers, 6).alias("upper_ratio"),
        F.round(stopword_ratio, 6).alias("stopword_ratio"),
        quality.alias("quality"),
    )


def language_id(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic language ID: ``(doc_id, pred_lang, lang_hits)``.

    Tokenize, count marker-word hits per language, argmax with
    deterministic tie-break (max hits, ties broken by language code
    ascending); zero hits → 'und'.  Implementation is an explode +
    broadcast-join against the tiny marker table + hash agg + a
    row_number window (partitions are ≤ |languages| rows per doc, so the
    window is skew-free by construction).
    """
    spark = df.sparkSession
    markers = spark.createDataFrame(
        [(lang, w) for lang, ws in LANG_MARKERS.items() for w in ws],
        "lang string, word string",
    )
    # CJK-bearing tokens are excluded from the word stream: their marker
    # hits come from the per-character stream below, and counting a
    # standalone marker character as BOTH a whitespace token and a
    # character would double-weight zh against every other language
    toks = df.select(
        F.col(id_col),
        F.explode(F.split(F.lower(F.trim(F.col(text_col))), r"\s+")).alias("word"),
    ).where(~F.col("word").rlike("[一-鿿]"))
    # zh has no whitespace tokens; match per-character for CJK markers
    chars = df.select(
        F.col(id_col),
        F.explode(
            F.filter(
                F.split(F.col(text_col), ""),
                lambda c: (c >= "一") & (c <= "鿿"),
            )
        ).alias("word"),
    )
    hits = (
        toks.unionAll(chars)
        .join(F.broadcast(markers), "word")
        .groupBy(id_col, "lang")
        .agg(F.count(F.lit(1)).alias("hits"))
    )
    from pyspark.sql import Window

    w = Window.partitionBy(id_col).orderBy(F.desc("hits"), F.asc("lang"))
    best = (
        hits.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .select(
            F.col(id_col),
            F.col("lang").alias("pred_lang"),
            F.col("hits").alias("lang_hits"),
        )
    )
    return df.select(id_col).join(best, id_col, "left").select(
        id_col,
        F.coalesce("pred_lang", F.lit("und")).alias("pred_lang"),
        F.coalesce("lang_hits", F.lit(0)).alias("lang_hits"),
    )


def doc_fingerprint(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Polynomial rolling hash of the text bytes: ``(doc_id, fingerprint)``.

    fp = Σ bytes[i]·B^(n−1−i) mod P (B=131, P=2^61−1) — deterministic,
    order-sensitive (unlike bag-of-words hashes), computed vectorized in
    one Arrow pass.  The content-identity key for incremental re-crawls.
    """

    def run(batches: Iterator[pa.RecordBatch]) -> Iterator[pa.RecordBatch]:
        B, P = 131, (1 << 61) - 1

        for batch in batches:
            ids = batch.column(0).to_pylist()
            texts = batch.column(1).to_pylist()
            out = []
            for t in texts:
                h = 0
                for byte in (t or "").encode("utf-8"):
                    h = (h * B + byte) % P
                out.append(h)
            yield pa.RecordBatch.from_arrays(
                [pa.array(ids, type=pa.int64()), pa.array(out, type=pa.int64())],
                names=["doc_id", "fingerprint"],
            )

    return df.select(F.col(id_col).cast("long"), F.col(text_col)).mapInArrow(
        run, schema="doc_id long, fingerprint long"
    )


# Portable regex subset (Java regex on Spark, RE2 on DuckDB — both sides
# of the oracle seam): ASCII classes, bounded repetition, word
# boundaries; no lookaround, no backreferences.  Patterns are
# fixed-structure so non-overlapping leftmost match COUNTS agree between
# leftmost-first (Java) and leftmost-longest (RE2) semantics.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"
PII_PHONE_RE = r"\b\d{3}[-. ]\d{3}[-. ]\d{4}\b"


def pii_scan(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc PII indicator counts: ``(doc_id, n_emails, n_ipv4,
    n_phones, has_pii)`` — the standard cheap pre-redaction scan of a
    training corpus (emails / IPv4 literals / NANP-shaped phone
    numbers).

    Detection only — redaction is a downstream ``regexp_replace`` with
    the same patterns; a training-data pipeline typically routes
    ``has_pii = 1`` docs to a scrubbing pass rather than dropping them.

    All three counters are JVM ``regexp_count`` expressions in one
    whole-stage-codegen projection: no shuffle, no Python, scan-bound —
    the plan a 100 TB corpus scan needs.  NULL text counts as empty.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    ne = F.regexp_count(t, F.lit(PII_EMAIL_RE)).cast("long")
    ni = F.regexp_count(t, F.lit(PII_IPV4_RE)).cast("long")
    np_ = F.regexp_count(t, F.lit(PII_PHONE_RE)).cast("long")
    return df.select(
        F.col(id_col),
        ne.alias("n_emails"),
        ni.alias("n_ipv4"),
        np_.alias("n_phones"),
        ((ne + ni + np_) > 0).cast("int").alias("has_pii"),
    )


# Encoding-hygiene patterns, same portable Java↔RE2 subset as the PII
# set (\x{HHHH} code-point escapes — NOT \uHHHH, which RE2 lacks).
HYG_REPLACEMENT_RE = r"\x{FFFD}"
HYG_CONTROL_RE = r"[\x00-\x08\x0B\x0C\x0E-\x1F]"
HYG_MOJIBAKE_RE = r"[\x{C2}\x{C3}][\x{80}-\x{BF}]"
HYG_NONASCII_RE = r"[^\x00-\x7F]"


def encoding_hygiene(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-doc encoding-hygiene scan: ``(doc_id, n_replacement,
    n_control, n_mojibake, ascii_ratio, clean)``.

    The standard corpus-ingest triage for web text that survived a
    charset-guessing crawl pipeline: U+FFFD replacement characters
    (decode failures), C0 control characters (binary contamination;
    tab/newline/CR excluded), and the Ã/Â + continuation-range digraphs
    that mark UTF-8 bytes mis-decoded as Latin-1 ("cafÃ©").
    ``ascii_ratio`` supports language-aware downstream thresholds (CJK
    pages are legitimately low-ASCII — this column is a feature, not a
    filter).  ``clean = 1`` iff all three counters are zero.

    Like :func:`pii_scan`: four ``regexp`` expressions in one
    whole-stage-codegen projection — zero shuffle, zero Python,
    scan-bound.  NULL text counts as empty (clean, ratio 1.0).
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_repl = F.regexp_count(t, F.lit(HYG_REPLACEMENT_RE)).cast("long")
    n_ctl = F.regexp_count(t, F.lit(HYG_CONTROL_RE)).cast("long")
    n_moji = F.regexp_count(t, F.lit(HYG_MOJIBAKE_RE)).cast("long")
    n_chars = F.length(t)
    ascii_ratio = F.when(
        n_chars > 0,
        F.length(F.regexp_replace(t, HYG_NONASCII_RE, "")).cast("double")
        / n_chars,
    ).otherwise(F.lit(1.0))
    return df.select(
        F.col(id_col),
        n_repl.alias("n_replacement"),
        n_ctl.alias("n_control"),
        n_moji.alias("n_mojibake"),
        F.round(ascii_ratio, 6).alias("ascii_ratio"),
        ((n_repl + n_ctl + n_moji) == 0).cast("int").alias("clean"),
    )


# GPT-2-style pre-tokenizer pieces (Radford et al. 2019, the public
# regex), restricted to the lookahead-free subset both Java regex and
# RE2 compile: contraction suffixes | space?-letter-run |
# space?-digit-run | space?-punct-run.  (The original's trailing
# `\s+(?!\S)` branch needs lookahead — RE2 has none — and only affects
# how trailing whitespace is grouped, which a COUNT never sees.)
BPE_PIECE_RE = r"'s|'t|'re|'ve|'m|'ll|'d| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+"


def bpe_piece_stats(
    df: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """BPE-ish token accounting: ``(doc_id, n_pieces, n_words,
    pieces_per_word, chars_per_piece)``.

    ``n_pieces`` counts GPT-2 pre-tokenizer pieces — the unit BPE
    subword vocabularies split further, so it tracks real LLM token
    counts far better than whitespace words do on punctuation-heavy or
    contraction-heavy text; ``pieces_per_word`` ≈ tokenization
    overhead, the standard budget statistic for training-data sizing.

    Same shape as :func:`token_counts`: one JVM ``regexp_count``
    projection, zero shuffle, scan-bound.  NULL text counts as empty.
    """
    t = F.coalesce(F.col(text_col), F.lit(""))
    n_pieces = F.regexp_count(t, F.lit(BPE_PIECE_RE)).cast("long")
    n_words = F.regexp_count(t, F.lit(r"\S+")).cast("long")
    return df.select(
        F.col(id_col),
        n_pieces.alias("n_pieces"),
        n_words.alias("n_words"),
        F.round(
            F.when(n_words > 0, n_pieces.cast("double") / n_words).otherwise(
                F.lit(0.0)
            ),
            6,
        ).alias("pieces_per_word"),
        F.round(
            F.when(n_pieces > 0, F.length(t).cast("double") / n_pieces)
            .otherwise(F.lit(0.0)),
            6,
        ).alias("chars_per_piece"),
    )
