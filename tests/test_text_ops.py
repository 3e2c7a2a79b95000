"""Text-analysis operators: token stats, quality, language-ID,
fingerprints (operators/text.py) against plain-Python references."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from tdigest_spark.operators import text as T


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat and the hat is on the mat", "en"),
        (1, "der hund und die katze ist nicht da", "de"),
        (2, "zzz qqq xxx yyy www", "xx"),  # no markers
        (3, "the the the", "en"),
        (4, "and  the   cat", "en"),  # multiple spaces
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


def test_token_stats(docs):
    out = {r["doc_id"]: r for r in T.token_stats(docs).collect()}
    assert out[0]["n_tokens"] == 9
    assert out[0]["n_distinct_tokens"] == 7
    assert out[3]["n_tokens"] == 3
    assert out[3]["n_distinct_tokens"] == 1
    assert out[4]["n_tokens"] == 3  # empty tokens from double spaces dropped
    assert out[0]["max_token_len"] == 3
    # stopwords: the(3) and(1) is(1) on? 'on' not in list -> check exact
    sw = set(T.DEFAULT_STOPWORDS)
    toks = "the cat and the hat is on the mat".split()
    assert out[0]["n_stopwords"] == sum(t in sw for t in toks)


def test_quality_score(docs):
    r = {x["doc_id"]: x for x in T.quality_score(docs).collect()}
    toks = "the cat and the hat is on the mat".split()
    sw = set(T.DEFAULT_STOPWORDS)
    exp = sum(t in sw for t in toks) / len(toks)
    assert abs(r[0]["stopword_ratio"] - exp) < 1e-15
    assert 0 < r[0]["alpha_ratio"] < 1  # spaces are non-alpha


def test_language_id(docs):
    out = {r["doc_id"]: r for r in T.language_id(docs).collect()}
    assert out[0]["pred_lang"] == "en"
    assert out[1]["pred_lang"] == "de"
    assert out[2]["pred_lang"] == "und"
    assert out[2]["n_hits"] == 0
    assert out[3]["pred_lang"] == "en"
    assert out[3]["n_hits"] == 3


def test_content_fingerprint_permutation_invariant(spark):
    rows = [(0, "a b c d"), (1, "d c b a"), (2, "a b c e")]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    fp = {r["doc_id"]: r["fingerprint"] for r in T.content_fingerprint(df).collect()}
    assert fp[0] == fp[1]
    assert fp[0] != fp[2]
    # md5 of the canonical sorted-distinct token join
    assert fp[0] == hashlib.md5(b"a b c d").hexdigest()


def test_shingles(spark):
    df = spark.createDataFrame([(0, "a b c d e")], "doc_id long, text string")
    sh = df.select(T.shingles_col("text", 3).alias("sh")).collect()[0]["sh"]
    assert sh == ["a b c", "b c d", "c d e"]
    # shorter than k -> whole text as one shingle
    df2 = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    sh2 = df2.select(T.shingles_col("text", 3).alias("sh")).collect()[0]["sh"]
    assert sh2 == ["a b"]


def test_minhash_fingerprint_deterministic(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e"), (1, "a b c d e")], "doc_id long, text string"
    )
    fps = [r["minhash"] for r in T.minhash_fingerprint(df).collect()]
    assert fps[0] == fps[1]
    exp = min(
        hashlib.md5(s.encode()).hexdigest() for s in ["a b c", "b c d", "c d e"]
    )
    assert fps[0] == exp


def test_repetition_stats_values(spark):
    rows = [
        (0, "a b a b a b"),        # toks 6, distinct 2; bigrams: [a b]x3,[b a]x2 of 5
        (1, "x y z"),              # all distinct; bigrams [x y],[y z] -> top 1/2
        (2, "w"),                  # shorter than 2 -> one whole-text shingle
        (3, None),                 # NULL text: row kept, NULL metrics
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in T.repetition_stats(df).collect()}
    assert set(out) == {0, 1, 2, 3}  # cardinality preserved incl. NULL text
    assert abs(out[0]["dup_token_ratio"] - (1 - 2 / 6)) < 1e-15
    assert abs(out[0]["top_bigram_frac"] - 3 / 5) < 1e-15
    assert out[1]["dup_token_ratio"] == 0.0
    assert abs(out[1]["top_bigram_frac"] - 0.5) < 1e-15
    assert out[2]["dup_token_ratio"] == 0.0
    assert out[2]["top_bigram_frac"] == 1.0
    assert out[3]["dup_token_ratio"] is None
    assert out[3]["top_bigram_frac"] is None


def test_gopher_repetition_values(spark):
    rows = [
        (0, "l1\nl1\nl2 l2 l2"),          # dup line + repeated bigram
        (1, "t t t t t t t t t t t t"),    # pathological repeat
        (2, "a b"),                        # too short for n >= 3
        (3, None),                         # NULL text: row kept, NULL metrics
        (4, ""),                           # empty text: no lines, no grams
        (5, "p q p q p"),                  # bigram-count tie
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    out = {r["doc_id"]: r for r in T.gopher_repetition(df).collect()}
    assert set(out) == {0, 1, 2, 3, 4, 5}

    # doc 0: lines [l1, l1, "l2 l2 l2"] -> (3-2)/3; char mass 12, dup 4
    assert out[0]["dup_line_frac"] == (3 - 2) / 3
    assert out[0]["dup_line_char_frac"] == 4 / 12
    # tokens split on literal space ONLY, so newlines ride inside a
    # token: ["l1\nl1\nl2", "l2", "l2"].  Bigrams both unique; the
    # (count, gram) tie-break picks the lexicographically larger
    # "l2 l2" (len 5, count 1); nch 14
    assert out[0]["top_2gram_char_frac"] == (5 * 1) / 14
    # 3 tokens -> no 5-grams at all -> NULL, distinct from 0.0
    assert out[0]["dup_5gram_char_frac"] is None
    assert out[0]["dup_10gram_char_frac"] is None

    # doc 1: "t t" x11, len 3, nch 23 -> the documented overlap proxy > 1
    assert out[1]["top_2gram_char_frac"] == (3 * 11) / 23
    assert out[1]["dup_5gram_char_frac"] == 1.0   # all 8 5-grams identical
    assert out[1]["dup_line_frac"] == 0.0          # one line

    # doc 2: single bigram covers the whole text
    assert out[2]["top_2gram_char_frac"] == 1.0
    assert out[2]["top_3gram_char_frac"] is None
    assert out[2]["dup_5gram_char_frac"] is None

    for c in T._gopher_cols((2, 3, 4), (5, 10)):
        assert out[3][c] is None, c   # NULL text
        assert out[4][c] is None, c   # empty text

    # equal-count tie-break: "p q" x2 and "q p" x2 -> largest gram wins
    assert out[5]["top_2gram_char_frac"] == (3 * 2) / 9


def test_gopher_repetition_lane_equivalence(spark):
    """The zero-shuffle mapInPandas lane is VALUE-IDENTICAL to the jvm
    oracle lane — same integer counts, same single IEEE divisions."""
    rows = [
        (0, "a b a b c\na b a b c\nx y z"),
        (1, "w1 w2 w3 w4 w5 w6 w7 w8 w9 w10 w11"),
        (2, None),
        (3, "t t t t t t t t t t t t"),
        (4, "a b"),
        (5, "x\n\nx\ny y\ny y"),
        (6, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    jvm = sorted(T.gopher_repetition(df).collect())
    pandas = sorted(T.gopher_repetition(df, lane="pandas").collect())
    assert jvm == pandas


def test_gopher_repetition_validation(spark):
    df = spark.createDataFrame([(0, "a")], "doc_id long, text string")
    with pytest.raises(ValueError):
        T.gopher_repetition(df, top_ns=(1, 2))
    with pytest.raises(ValueError):
        T.gopher_repetition(df, dup_ns=(5, 5))
    with pytest.raises(ValueError):
        T.gopher_repetition(df, lane="nope")


def test_url_canonicalization_edges(spark):
    from tdigest_spark.operators.text import url_canonical, url_host

    rows = [
        ("HTTP://Example.COM:80/a?b=1#f", "http://example.com/a?b=1", "example.com"),
        ("https://USER:pw@WWW.X.org:443", "https://www.x.org/", "www.x.org"),
        ("http://h.io:8080", "http://h.io:8080/", "h.io"),
        ("ftp://Files.example.net/pub/", "ftp://files.example.net/pub/", "files.example.net"),
        ("not a url", None, ""),
        (None, None, None),
    ]
    df = spark.createDataFrame([(u,) for u, _, _ in rows], "url string")
    got = df.select(
        url_canonical("url").alias("c"), url_host("url").alias("h")
    ).collect()
    for (u, want_c, want_h), r in zip(rows, got):
        assert r["c"] == want_c, (u, r["c"])
        assert r["h"] == want_h, (u, r["h"])


# ------------------------------------------------------------------- PII


@pytest.fixture(scope="module")
def pii_docs(spark):
    rows = [
        (0, "write to alice.smith+x@Mail.Example.COM for help"),
        (1, "server 192.168.100.200 and 10.0.0.1 replied"),
        (2, "call (555) 010-2368 or 555-010-2368 today"),
        (3, "a@b.co sent 10.0.0.1 then dialed 555-010-2368"),
        (4, None),
        (5, "no pii here at all"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


def test_pii_redact_counts_and_text(pii_docs):
    out = {r["doc_id"]: r for r in T.pii_redact(pii_docs).collect()}
    assert (out[0]["n_emails"], out[0]["n_ipv4"], out[0]["n_phones"]) == (1, 0, 0)
    assert out[0]["text_redacted"] == "write to <EMAIL> for help"
    assert (out[1]["n_emails"], out[1]["n_ipv4"], out[1]["n_phones"]) == (0, 2, 0)
    assert out[1]["text_redacted"] == "server <IP> and <IP> replied"
    assert (out[2]["n_emails"], out[2]["n_ipv4"], out[2]["n_phones"]) == (0, 0, 2)
    assert out[2]["text_redacted"] == "call <PHONE> or <PHONE> today"
    # all three categories in one doc, counted once each (sequential rule)
    assert (out[3]["n_emails"], out[3]["n_ipv4"], out[3]["n_phones"]) == (1, 1, 1)
    assert out[3]["text_redacted"] == "<EMAIL> sent <IP> then dialed <PHONE>"
    assert (out[5]["n_emails"], out[5]["n_ipv4"], out[5]["n_phones"]) == (0, 0, 0)
    assert out[5]["text_redacted"] == "no pii here at all"


def test_pii_redact_null_text(pii_docs):
    r = {x["doc_id"]: x for x in T.pii_redact(pii_docs).collect()}[4]
    assert r["n_emails"] is None and r["n_ipv4"] is None and r["n_phones"] is None
    assert r["text_redacted"] is None


def test_pii_no_cross_category_double_count(spark):
    # a phone never matches inside an already-redacted IP and vice versa:
    # IPv4 groups are <=3 digits (no 4-digit tail), phones have no dots
    df = spark.createDataFrame(
        [(0, "ip 10.20.30.40 phone 555-010-2368")], "doc_id long, text string"
    )
    r = T.pii_redact(df).collect()[0]
    assert (r["n_ipv4"], r["n_phones"]) == (1, 1)
    assert r["text_redacted"] == "ip <IP> phone <PHONE>"


# ----------------------------------------------------------------- lines


def test_clean_lines_rules(spark):
    page = "\n".join(
        [
            "This sentence survives the cleaning pass.",
            "Too short.",
            "Please enable JavaScript to continue viewing.",
            "this line has no terminal punctuation at all",
            "We updated our Cookie settings and Privacy Policy.",
            "Another good line ends here!",
        ]
    )
    df = spark.createDataFrame([(0, page), (1, None)], "doc_id long, text string")
    out = {r["doc_id"]: r for r in T.clean_lines(df).collect()}
    assert out[0]["n_lines"] == 6
    assert out[0]["n_lines_kept"] == 2
    assert out[0]["clean_text"] == (
        "This sentence survives the cleaning pass.\nAnother good line ends here!"
    )
    assert out[1]["n_lines"] is None and out[1]["clean_text"] is None


def test_clean_lines_all_dropped_yields_empty(spark):
    df = spark.createDataFrame([(0, "nope\nstill no")], "doc_id long, text string")
    r = T.clean_lines(df).collect()[0]
    assert r["n_lines_kept"] == 0 and r["clean_text"] == ""


def test_clean_lines_options(spark):
    df = spark.createDataFrame(
        [(0, "three words here\nbad cookie line yes")], "doc_id long, text string"
    )
    r = T.clean_lines(df, require_terminal_punct=False).collect()[0]
    assert r["n_lines_kept"] == 1  # blocklist still applies
    r2 = T.clean_lines(df, require_terminal_punct=False, blocklist=()).collect()[0]
    assert r2["n_lines_kept"] == 2


# --------------------------------------------------------------- chunking


def test_chunk_tokens_no_overlap(spark):
    df = spark.createDataFrame(
        [(0, "a b c d e f g"), (1, "x y"), (2, None), (3, "   ")],
        "doc_id long, text string",
    )
    rows = T.chunk_tokens(df, budget=3).collect()
    got = {(r["doc_id"], r["chunk_idx"]): (r["chunk_text"], r["n_chunk_tokens"])
           for r in rows}
    assert got == {
        (0, 0): ("a b c", 3),
        (0, 1): ("d e f", 3),
        (0, 2): ("g", 1),
        (1, 0): ("x y", 2),
    }  # NULL and whitespace-only docs emit nothing


def test_chunk_tokens_overlap_covers_all(spark):
    toks = [f"t{i}" for i in range(25)]
    df = spark.createDataFrame([(0, " ".join(toks))], "doc_id long, text string")
    rows = sorted(
        T.chunk_tokens(df, budget=8, overlap=2).collect(),
        key=lambda r: r["chunk_idx"],
    )
    # step = 6: starts 0,6,12,18 then 24 -> ceil((25-8)/6)=3 -> 4 chunks
    assert [r["chunk_idx"] for r in rows] == [0, 1, 2, 3]
    assert rows[0]["chunk_text"].split() == toks[0:8]
    assert rows[1]["chunk_text"].split() == toks[6:14]
    assert rows[3]["chunk_text"].split() == toks[18:25]
    assert rows[3]["n_chunk_tokens"] == 7
    # union of chunks covers every token
    seen = set()
    for r in rows:
        seen.update(r["chunk_text"].split())
    assert seen == set(toks)


def test_chunk_tokens_rejects_bad_params(spark):
    df = spark.createDataFrame([(0, "a b")], "doc_id long, text string")
    with pytest.raises(ValueError):
        T.chunk_tokens(df, budget=0)
    with pytest.raises(ValueError):
        T.chunk_tokens(df, budget=4, overlap=4)


def test_quality_and_repetition_survive_empty_text(spark):
    """Zero-token / zero-char docs get NULL ratios instead of an
    ANSI-mode 0/0 job abort (one empty-extraction page must not kill a
    corpus run)."""
    from tdigest_spark.operators.text import quality_score, repetition_stats

    rows = [(0, "the cat sat"), (1, ""), (2, "   "), (3, None)]
    df = spark.createDataFrame(rows, "doc_id long, text string")
    q = {
        r["doc_id"]: (r["stopword_ratio"], r["alpha_ratio"], r["mean_token_len"])
        for r in quality_score(df).collect()
    }
    assert q[0][0] is not None
    assert q[1] == (None, None, None)
    assert q[2][0] is None and q[2][2] is None  # whitespace: 0 tokens
    rep = {r["doc_id"]: r["dup_token_ratio"] for r in repetition_stats(df).collect()}
    assert rep[0] == 0.0 and rep[1] is None and rep[2] is None


def test_url_canonical_fragment_question_mark(spark):
    """A '?' INSIDE the fragment must not resurrect fragment content as
    a query string — both URLs canonicalize fragment-free."""
    from tdigest_spark.operators.text import url_canonical

    rows = [("http://h/path#sec?a=1",), ("http://h/path#sec",), ("http://h/p?a=1#sec",)]
    df = spark.createDataFrame(rows, "url string")
    got = [r["c"] for r in df.select(url_canonical("url").alias("c")).collect()]
    assert got[0] == got[1] == "http://h/path"
    assert got[2] == "http://h/p?a=1"
