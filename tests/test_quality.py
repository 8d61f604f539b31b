"""Text-analysis operators: token counts, quality, language ID, fingerprint."""

from __future__ import annotations

from linkgraph.textops.quality import (
    doc_fingerprint,
    language_id,
    quality_scores,
    token_counts,
)


def test_token_counts(spark):
    df = spark.createDataFrame(
        [(0, "a bb  ccc"), (1, ""), (2, "   "), (3, "single")],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_tokens, r.n_chars) for r in token_counts(df).collect()}
    assert got[0] == (3, 9)
    assert got[1] == (0, 0)
    assert got[2] == (0, 3)
    assert got[3] == (1, 6)


def test_quality_scores_monotone(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat sat on the mat and then it ran to the door of the house near the lake shore today"),
            (1, "!!! ??? ,,, ;;; ::: !!!"),
            (2, "1234 5678 9012 3456"),
        ],
        "doc_id long, text string",
    )
    q = {r.doc_id: r.quality for r in quality_scores(df).collect()}
    assert q[0] > q[1] and q[0] > q[2]
    p = {r.doc_id: r.punct_ratio for r in quality_scores(df).collect()}
    assert p[1] > 0.5


def test_language_id_marker_texts(spark):
    df = spark.createDataFrame(
        [
            (0, "the cat and the dog of the house is that for with was"),
            (1, "el perro y la casa de que los las una por con para"),
            (2, "der hund und die katze ist nicht ein mit auf zu"),
            (3, "le chien et la maison est une dans pour qui pas les des"),
            (4, "的是了在我有和不这中"),
            (5, "zzz qqq xxx"),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: r.pred_lang for r in language_id(df).collect()}
    assert got == {0: "en", 1: "es", 2: "de", 3: "fr", 4: "zh", 5: "und"}


def test_language_id_oracle_parity_incl_cjk(spark):
    """Engine vs DuckDB LANGID_SQL twin on a corpus WITH CJK text — the
    fixture corpus has none, which once masked a missing-zh oracle."""
    import duckdb
    import pandas as pd

    from linkgraph.queries import LANGID_SQL

    rows = [
        (0, "the cat and the dog is in the house"),
        (1, "我 有 一 本 书 是 好 的"),      # whitespace-tokenized zh
        (2, "这是中文的句子不用空格的"),        # unsegmented zh (chars only)
        (3, "mixed the 的 und der"),          # cross-language collision
        (4, None),
        (5, ""),
    ]
    sdf = spark.createDataFrame(rows, "doc_id long, text string")
    got = {
        r.doc_id: (r.pred_lang, r.lang_hits)
        for r in language_id(sdf).collect()
    }
    assert got[1][0] == "zh" and got[2][0] == "zh"

    con = duckdb.connect()
    con.register(
        "documents",
        pd.DataFrame(rows, columns=["doc_id", "text"], dtype=object),
    )
    want = {
        int(doc_id): (lang, int(hits))
        for doc_id, lang, hits in con.execute(LANGID_SQL).fetchall()
    }
    assert got == want


def test_doc_fingerprint_matches_python_twin(spark):
    texts = [(0, "hello world"), (1, ""), (2, "hello world"), (3, "HELLO")]
    df = spark.createDataFrame(texts, "doc_id long, text string")
    got = {r.doc_id: r.fingerprint for r in doc_fingerprint(df).collect()}

    def twin(t):
        B, P = 131, (1 << 61) - 1
        h = 0
        for byte in t.encode():
            h = (h * B + byte) % P
        return h

    for i, t in texts:
        assert got[i] == twin(t)
    assert got[0] == got[2] != got[3]


def test_pii_scan_counts_and_flag(spark):
    from linkgraph.textops.quality import pii_scan

    df = spark.createDataFrame(
        [
            (0, "mail me at jo.doe+x@sub.example.org or admin@example.com"),
            (1, "server 192.168.0.1 and 10.0.0.255 up"),
            (2, "call 555-123-4567 or 555.987.6543 today"),
            (3, "nothing sensitive here"),
            (4, None),
            # @ without a TLD'd domain, bare version number, short digits
            (5, "user@localhost v1.2.3 12-34-56"),
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_emails, r.n_ipv4, r.n_phones, r.has_pii)
        for r in pii_scan(df).collect()
    }
    assert got[0] == (2, 0, 0, 1)
    assert got[1] == (0, 2, 0, 1)
    assert got[2] == (0, 0, 2, 1)
    assert got[3] == (0, 0, 0, 0)
    assert got[4] == (0, 0, 0, 0)
    assert got[5] == (0, 0, 0, 0)


def test_pii_scan_duckdb_regex_parity(spark):
    """The three patterns must COUNT identically under Java regex and
    RE2 — the oracle seam the pii_scan entry rides on."""
    import duckdb

    from linkgraph.textops.quality import (
        PII_EMAIL_RE,
        PII_IPV4_RE,
        PII_PHONE_RE,
        pii_scan,
    )

    texts = [
        "a@b.co.uk then c-d@e.io.",
        "1.2.3.4.5 overlapping 255.255.255.255",
        "555-123-4567x 111 222 3333 and 12.34.56.78",
        "u5@ex.com and 10.3.0.1 call 555-123-4567",
        "edge@case.museum trailing",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {
        r.doc_id: (r.n_emails, r.n_ipv4, r.n_phones)
        for r in pii_scan(df).collect()
    }
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = tuple(
            con.execute(
                "SELECT len(regexp_extract_all(?, ?))", [t, pat]
            ).fetchone()[0]
            for pat in (PII_EMAIL_RE, PII_IPV4_RE, PII_PHONE_RE)
        )
        assert got[i] == want, (i, t, got[i], want)


def test_encoding_hygiene_hand(spark):
    from linkgraph.textops.quality import encoding_hygiene

    df = spark.createDataFrame(
        [
            (0, "perfectly clean ascii text."),
            (1, "bad � marker and � again"),
            (2, "binary\x00junk\x07here"),
            (3, "cafÃ© mis-decoded"),
            (4, "tabs\tand\nnewlines\rare fine"),
            (5, None),
            (6, "中文文本 ok"),  # CJK: low ascii but clean
        ],
        "doc_id long, text string",
    )
    got = {
        r.doc_id: (r.n_replacement, r.n_control, r.n_mojibake, r.clean)
        for r in encoding_hygiene(df).collect()
    }
    assert got[0] == (0, 0, 0, 1)
    assert got[1] == (2, 0, 0, 0)
    assert got[2] == (0, 2, 0, 0)
    assert got[3] == (0, 0, 1, 0)
    assert got[4] == (0, 0, 0, 1)
    assert got[5] == (0, 0, 0, 1)
    assert got[6] == (0, 0, 0, 1)
    ratios = {r.doc_id: r.ascii_ratio for r in encoding_hygiene(df).collect()}
    assert ratios[0] == 1.0 and ratios[5] == 1.0
    assert ratios[6] < 0.6


def test_bpe_piece_stats_hand(spark):
    from linkgraph.textops.quality import bpe_piece_stats

    df = spark.createDataFrame(
        [
            (0, "I'll say 42 things, don't I?"),
            (1, "plain words here"),
            (2, ""),
            (3, None),
        ],
        "doc_id long, text string",
    )
    got = {r.doc_id: (r.n_pieces, r.n_words) for r in bpe_piece_stats(df).collect()}
    # I|'ll| say| 42| things|,| don|'t| I|? = 10 pieces over 6 words
    assert got[0] == (10, 6)
    assert got[1] == (3, 3)
    assert got[2] == (0, 0)
    assert got[3] == (0, 0)


def test_bpe_piece_regex_java_re2_parity(spark):
    """Alternation semantics differ (leftmost-first vs leftmost-longest);
    the contraction-first ordering makes COUNTS agree — pin it."""
    import duckdb

    from linkgraph.textops.quality import BPE_PIECE_RE, bpe_piece_stats

    texts = [
        "it's we'll they're I'd you've I'm don't",
        "'simple leading apostrophe and trailing'",
        "a1b2c3 mixed 12ab runs... (x)[y]{z}",
        "多语言 mixed 中文 text with spaces",
        "  leading and trailing   ",
    ]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    got = {r.doc_id: r.n_pieces for r in bpe_piece_stats(df).collect()}
    con = duckdb.connect()
    for i, t in enumerate(texts):
        want = con.execute(
            "SELECT len(regexp_extract_all(?, ?))", [t, BPE_PIECE_RE]
        ).fetchone()[0]
        assert got[i] == want, (i, t, got[i], want)
