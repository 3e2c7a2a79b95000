"""Model-based scoring operators (operators/scoring.py): hashed-feature
linear classifier and bigram-LM NLL against plain-Python references."""

from __future__ import annotations

import hashlib
import math

import pytest
from pyspark.sql import functions as F

from tdigest_spark.operators import scoring as S


def _md5hex(s: str) -> str:
    return hashlib.md5(s.encode()).hexdigest()


def _py_bucket(tok: str, n_buckets: int) -> int:
    return int(_md5hex("b:" + tok)[:8], 16) % n_buckets


def _py_weight(bucket: int) -> float:
    return (int(_md5hex(f"w:{bucket}")[:8], 16) % 2001 - 1000) / 1000.0


def _py_logit(text: str, n_buckets: int) -> float | None:
    toks = [t for t in text.split(" ") if t]
    if not toks:
        return None
    acc = 0.0  # left fold, same order as F.aggregate
    for t in toks:
        acc += _py_weight(_py_bucket(t, n_buckets))
    return acc / float(len(toks))


@pytest.fixture(scope="module")
def docs(spark):
    rows = [
        (0, "the cat sat on the mat", "en"),
        (1, "the cat sat", "en"),
        (2, "dog", "en"),  # 1 token: no bigrams
        (3, "", "en"),  # empty
        (4, None, "en"),  # NULL text
        (5, "völlig neue wörter überall hier", "de"),  # all-OOV vs en LM
    ]
    return spark.createDataFrame(rows, "doc_id long, text string, lang string")


class TestHashedLogit:
    def test_exact_vs_python_fold(self, spark, docs):
        out = {r["doc_id"]: r for r in S.hashed_logit(docs, n_buckets=64).collect()}
        assert out[0]["n_tokens"] == 6
        assert out[0]["logit"] == _py_logit("the cat sat on the mat", 64)
        assert out[5]["logit"] == _py_logit("völlig neue wörter überall hier", 64)

    def test_empty_and_null_text(self, spark, docs):
        out = {r["doc_id"]: r for r in S.hashed_logit(docs).collect()}
        assert out[3]["n_tokens"] == 0 and out[3]["logit"] is None
        assert out[4]["n_tokens"] == 0 and out[4]["logit"] is None
        assert len(out) == docs.count()  # enrichment op: no row drops

    def test_custom_weight_fn(self, spark, docs):
        # constant weight 1.0 -> logit is exactly 1.0 for non-empty docs
        out = {
            r["doc_id"]: r
            for r in S.hashed_logit(
                docs, weight_fn=lambda b: F.lit(1.0)
            ).collect()
        }
        assert out[0]["logit"] == 1.0
        assert out[2]["logit"] == 1.0


class TestBigramLM:
    def test_training_counts(self, spark, docs):
        bc, pc, vv = S.train_bigram_lm(docs.filter(F.col("lang") == "en"))
        bigrams = {(r["prefix"], r["word"]): r["c_bigram"] for r in bc.collect()}
        # "the cat" occurs in doc0 and doc1
        assert bigrams[("the", "cat")] == 2
        assert bigrams[("cat", "sat")] == 2
        assert bigrams[("on", "the")] == 1
        prefixes = {r["prefix"]: r["c_prefix"] for r in pc.collect()}
        # 'the' as prefix: the->cat (x2), the->mat (x1)
        assert prefixes["the"] == 3
        # MLE normalization: prefix counts equal summed bigram counts
        assert sum(prefixes.values()) == sum(bigrams.values())
        # vocab: the,cat,sat,on,mat,dog (doc2's lone token counts; 3/4 empty)
        assert vv.collect()[0]["v"] == 6

    def test_nll_matches_python(self, spark, docs):
        lm = S.train_bigram_lm(docs.filter(F.col("lang") == "en"))
        out = {
            r["doc_id"]: r for r in S.bigram_nll_bits(docs, lm).collect()
        }
        v = 6
        bigr = {("the", "cat"): 2, ("cat", "sat"): 2, ("sat", "on"): 1,
                ("on", "the"): 1, ("the", "mat"): 1}
        pref = {"the": 3, "cat": 2, "sat": 1, "on": 1}

        def py_nll(text):
            toks = [t for t in text.split(" ") if t]
            acc = 0.0
            for a, b in zip(toks, toks[1:]):
                p = (bigr.get((a, b), 0) + 1.0) / (pref.get(a, 0) + 1.0 * v)
                acc += round(-math.log2(p), 6)
            return acc

        assert out[0]["n_bigrams"] == 5 and out[0]["oov_bigrams"] == 0
        assert out[0]["nll_bits"] == pytest.approx(
            py_nll("the cat sat on the mat"), abs=1e-9
        )
        assert out[0]["avg_nll_bits"] == pytest.approx(
            out[0]["nll_bits"] / 5.0, abs=0
        )
        # all-OOV German doc: every bigram unseen, scored by smoothing
        assert out[5]["oov_bigrams"] == out[5]["n_bigrams"] == 4
        assert out[5]["nll_bits"] == pytest.approx(
            4 * round(-math.log2(1.0 / v), 6), abs=1e-9
        )

    def test_short_and_null_docs_survive(self, spark, docs):
        lm = S.train_bigram_lm(docs.filter(F.col("lang") == "en"))
        out = {
            r["doc_id"]: r for r in S.bigram_nll_bits(docs, lm).collect()
        }
        assert len(out) == docs.count()
        for did in (2, 3, 4):  # 1 token / empty / NULL
            assert out[did]["n_bigrams"] == 0
            assert out[did]["nll_bits"] is None
            assert out[did]["avg_nll_bits"] is None

    def test_higher_nll_for_unusual_text(self, spark):
        # 50 docs of a repetitive in-distribution phrase + 1 gibberish doc
        rows = [(i, "alpha beta gamma delta alpha beta", "en") for i in range(50)]
        rows.append((99, "qq zz pp rr qq zz", "en"))
        df = spark.createDataFrame(rows, "doc_id long, text string, lang string")
        lm = S.train_bigram_lm(df.filter(F.col("doc_id") < 50))
        out = {r["doc_id"]: r for r in S.bigram_nll_bits(df, lm).collect()}
        assert out[99]["avg_nll_bits"] > out[0]["avg_nll_bits"]


# ------------------------------------------------------------------- DSIR


def _py_gram_bucket(a: str, b: str, n_buckets: int) -> int:
    return int(_md5hex(f"g:{a} {b}")[:8], 16) % n_buckets


def _py_dsir_micro(
    text: str, target: list[str], raw: list[str], n_buckets: int, alpha=1.0
):
    """Plain-Python replica of dsir_logratio's integer micro-bit weight."""
    def buckets(t):
        toks = [x for x in t.split(" ") if x]
        return [
            _py_gram_bucket(toks[i], toks[i + 1], n_buckets)
            for i in range(len(toks) - 1)
        ]

    ct: dict[int, int] = {}
    cr: dict[int, int] = {}
    for t in target:
        for b in buckets(t):
            ct[b] = ct.get(b, 0) + 1
    for t in raw:
        for b in buckets(t):
            cr[b] = cr.get(b, 0) + 1
    tct, tcr = sum(ct.values()), sum(cr.values())

    def micro(c, total):
        p = (c + alpha) / (total + alpha * n_buckets)
        # round-half-up like Spark/DuckDB ROUND (banker's would differ)
        x = math.log2(p) * 1e6
        return math.floor(x + 0.5) if x >= 0 else -math.floor(-x + 0.5)

    bs = buckets(text)
    if not bs:
        return 0, None
    return len(bs), sum(
        micro(ct.get(b, 0), tct) - micro(cr.get(b, 0), tcr) for b in bs
    )


STYLE_A = [
    "the quick brown fox jumps over the lazy dog again",
    "a quick brown fox and a lazy dog walk home",
]
STYLE_B = [
    "zzz qqq xxx vvv kkk jjj www uuu yyy ttt",
    "kkk jjj zzz qqq www xxx uuu vvv ttt sss",
]


@pytest.fixture(scope="module")
def dsir_frames(spark):
    raw = [(i, (STYLE_A + STYLE_B)[i % 4]) for i in range(24)]
    raw += [(100, None), (101, "one")]
    rawdf = spark.createDataFrame(raw, "doc_id long, text string")
    tgt = spark.createDataFrame(
        list(enumerate(STYLE_A)), "doc_id long, text string"
    )
    return rawdf, tgt, raw


def test_dsir_logratio_matches_python_model(dsir_frames):
    rawdf, tgt, raw = dsir_frames
    out = {r["doc_id"]: r for r in S.dsir_logratio(rawdf, tgt, n_buckets=512).collect()}
    raw_texts = [t for _, t in raw if t is not None]
    for did, text in raw[:8]:
        n, micro = _py_dsir_micro(text, STYLE_A, raw_texts, 512)
        assert out[did]["n_grams"] == n
        assert out[did]["llr_micro"] == micro, did
        assert out[did]["llr_bits"] == micro / 1e6
    # target-style docs outscore off-style docs
    a = [out[i]["llr_bits"] for i in range(24) if i % 4 in (0, 1)]
    b = [out[i]["llr_bits"] for i in range(24) if i % 4 in (2, 3)]
    assert min(a) > max(b)


def test_dsir_logratio_null_short_and_invariance(dsir_frames):
    rawdf, tgt, _ = dsir_frames
    out = {r["doc_id"]: r for r in S.dsir_logratio(rawdf, tgt, n_buckets=512).collect()}
    assert out[100]["n_grams"] == 0 and out[100]["llr_micro"] is None
    assert out[101]["n_grams"] == 0 and out[101]["llr_micro"] is None
    rep = {
        r["doc_id"]: r
        for r in S.dsir_logratio(rawdf.repartition(7), tgt, n_buckets=512).collect()
    }
    assert {k: tuple(v) for k, v in out.items()} == {
        k: tuple(v) for k, v in rep.items()
    }


def test_gumbel_topk_deterministic_and_weighted(dsir_frames):
    rawdf, tgt, _ = dsir_frames
    scored = S.dsir_logratio(rawdf, tgt, n_buckets=512)
    sel = S.gumbel_topk(scored, 8)
    picked = [r["doc_id"] for r in sel.collect()]
    assert len(picked) == 8 and len(set(picked)) == 8
    # deterministic across re-runs and repartitions
    again = [r["doc_id"] for r in S.gumbel_topk(scored.repartition(5), 8).collect()]
    assert sorted(picked) == sorted(again)
    # no-evidence docs (NULL weight) never selected
    assert 100 not in picked and 101 not in picked
    # weights dominate noise here: every pick is target-style
    assert all(p % 4 in (0, 1) for p in picked)
    # a different seed reorders the in-style ranking deterministically
    other = [r["doc_id"] for r in S.gumbel_topk(scored, 8, seed="s2").collect()]
    assert all(p % 4 in (0, 1) for p in other)


def test_gumbel_topk_rank_and_key_schema(dsir_frames):
    rawdf, tgt, _ = dsir_frames
    scored = S.dsir_logratio(rawdf, tgt, n_buckets=512)
    rows = S.gumbel_topk(scored, 5).collect()
    assert [r["rank"] for r in sorted(rows, key=lambda r: -r["key_micro"])] == [
        1,
        2,
        3,
        4,
        5,
    ]


def test_gumbel_sample_fraction_matches_topk_scheme(spark):
    # 400 scored rows with distinct weights; the digest-thresholded
    # fraction selection approximates |rows|*fraction and every selected
    # key clears every rejected key (it thresholds the SAME keys
    # gumbel_topk ranks)
    rows = [(i, (i * 37) % 400 * 1000) for i in range(400)]
    rows += [(1000, None)]  # no-evidence row: never selected
    scored = spark.createDataFrame(rows, "doc_id long, llr_micro long")
    sel = S.gumbel_sample_fraction(scored, 0.25, delta=200.0)
    got = sel.collect()
    ids = {r["doc_id"] for r in got}
    assert 1000 not in ids
    assert abs(len(got) - 100) <= 10  # rank error O(1/delta) of n=400
    # consistency with the exact top-k ranking over the same keys
    exact = S.gumbel_topk(scored, len(got)).collect()
    assert ids == {r["doc_id"] for r in exact}
    # deterministic across repartition
    again = {
        r["doc_id"]
        for r in S.gumbel_sample_fraction(
            scored.repartition(7), 0.25, delta=200.0
        ).collect()
    }
    assert again == ids
    with pytest.raises(ValueError):
        S.gumbel_sample_fraction(scored, 1.5)


# ----------------------------------------------------- train_hashed_logit

class TestTrainHashedLogit:
    def _mk(self, spark, n=120, seed=3):
        import numpy as np

        spam = ["buy", "cheap", "pills", "casino", "winner", "click"]
        ham = ["the", "science", "report", "data", "method", "results"]
        rng = np.random.default_rng(seed)
        rows = []
        for i in range(n):
            rows.append((i, 1.0, " ".join(spam[j] for j in rng.integers(0, 6, 10))))
            rows.append((1000 + i, 0.0, " ".join(ham[j] for j in rng.integers(0, 6, 10))))
        rows.append((9999, None, "null label skipped"))
        rows.append((9998, 1.0, ""))
        return spark.createDataFrame(rows, "doc_id long, label double, text string")

    def test_partition_invariant_bit_exact(self, spark):
        import numpy as np

        from tdigest_spark.operators.scoring import train_hashed_logit

        df = self._mk(spark)
        a = train_hashed_logit(df, epochs=5, n_buckets=128, lr=2.0)
        b = train_hashed_logit(df.repartition(17), epochs=5, n_buckets=128, lr=2.0)
        assert np.array_equal(a["weights"], b["weights"])
        assert a["bias"] == b["bias"]
        assert a["history"] == b["history"]
        assert a["n_docs"] == b["n_docs"] == 240

    def test_matches_pure_python_reference_exactly(self, spark):
        """The distributed trainer equals a single-process reference
        implementing the same quantized algorithm — integer weights,
        bias, and micro-nat loss history all exact."""
        import hashlib

        import numpy as np

        from tdigest_spark.operators.scoring import train_hashed_logit

        df = self._mk(spark, n=60)
        nb, epochs, lr = 64, 4, 1.5
        got = train_hashed_logit(df, epochs=epochs, n_buckets=nb, lr=lr)

        def bucket(tok: str) -> int:
            return int(hashlib.md5(b"b:" + tok.encode()).hexdigest()[:8], 16) % nb

        docs = [
            (r["label"], [bucket(t) for t in r["text"].split(" ") if t != ""])
            for r in df.collect()
            if r["label"] is not None
        ]
        docs = [(y, b) for y, b in docs if b]
        W = np.zeros(nb, dtype=np.int64)
        B = 0
        hist = []
        for _ in range(epochs):
            G = np.zeros(nb, dtype=np.int64)
            BG = 0
            L = 0
            for y, bl in docs:
                b = np.array(bl)
                z = W[b].sum() / (len(b) * 1e6) + B / 1e6
                p = 1.0 / (1.0 + np.exp(-z))
                q = int(np.rint((p - y) / len(b) * 1e9))
                np.add.at(G, b, q)
                BG += int(np.rint((p - y) * 1e9))
                lv = y * np.logaddexp(0.0, -z) + (1.0 - y) * np.logaddexp(0.0, z)
                L += int(np.rint(lv * 1e6))
            N = len(docs)
            hist.append(L / 1e6 / N)
            step = lr / (N * 1e9) * 1e6
            W = W - np.rint(G * step).astype(np.int64)
            B = B - int(np.rint(BG * step))
        assert np.array_equal(got["weights"], W)
        assert got["bias"] == B
        assert got["history"] == hist
        # final_loss: one more pass over the SHIPPED weights
        L = 0
        for y, bl in docs:
            b = np.array(bl)
            z = W[b].sum() / (len(b) * 1e6) + B / 1e6
            lv = y * np.logaddexp(0.0, -z) + (1.0 - y) * np.logaddexp(0.0, z)
            L += int(np.rint(lv * 1e6))
        assert got["final_loss"] == L / 1e6 / len(docs)
        assert got["final_loss"] < got["history"][-1]

    def test_learns_and_applies(self, spark):
        from tdigest_spark.operators.scoring import (
            apply_hashed_logit,
            train_hashed_logit,
        )

        df = self._mk(spark)
        m = train_hashed_logit(df, epochs=10, n_buckets=256, lr=2.0)
        assert all(a > b for a, b in zip(m["history"], m["history"][1:]))
        scored = apply_hashed_logit(
            df.filter("label is not null and text != ''"), m
        ).collect()
        sp = [r["p"] for r in scored if r["doc_id"] < 1000]
        hp = [r["p"] for r in scored if r["doc_id"] >= 1000]
        assert min(sp) > max(hp)
        assert all(0.0 < r["p"] < 1.0 for r in scored)

    def test_model_serde_roundtrip(self, spark):
        import numpy as np

        from tdigest_spark.operators.scoring import (
            logit_model_from_bytes,
            logit_model_to_bytes,
            train_hashed_logit,
        )

        m = train_hashed_logit(self._mk(spark, n=20), epochs=2, n_buckets=32)
        m2 = logit_model_from_bytes(logit_model_to_bytes(m))
        assert np.array_equal(m["weights"], m2["weights"])
        assert m2["bias"] == m["bias"]
        assert m2["n_buckets"] == m["n_buckets"]
        assert m2["n_docs"] == m["n_docs"]
        with pytest.raises(ValueError):
            logit_model_from_bytes(b"XXXX" + bytes(24))

    def test_validation_and_empty(self, spark):
        from tdigest_spark.operators.scoring import train_hashed_logit

        df = self._mk(spark, n=5)
        with pytest.raises(ValueError):
            train_hashed_logit(df, epochs=0)
        with pytest.raises(ValueError):
            train_hashed_logit(df, n_buckets=0)
        empty = spark.createDataFrame(
            [(1, None, "x"), (2, 1.0, "")], "doc_id long, label double, text string"
        )
        with pytest.raises(ValueError, match="no trainable rows"):
            train_hashed_logit(empty, epochs=1, n_buckets=8)


def test_apply_hashed_logit_pandas_lane_matches_jvm(spark):
    """The broadcast pandas lane reproduces the jvm literal lane's
    logits BIT-EXACTLY (same IEEE fold order); p within 1 ulp (exp)."""
    import numpy as np

    from tdigest_spark.operators.scoring import (
        apply_hashed_logit,
        train_hashed_logit,
    )

    rows = [
        (1, 1.0, "buy cheap pills now"),
        (2, 0.0, "the science report method"),
        (3, 1.0, "cheap cheap cheap"),
        (4, 0.0, "data results the report"),
        (5, None, None),
        (6, 1.0, ""),
    ]
    df = spark.createDataFrame(rows, "doc_id long, label double, text string")
    m = train_hashed_logit(df, epochs=3, n_buckets=64, lr=2.0)
    jvm = {r["doc_id"]: r for r in apply_hashed_logit(df, m).collect()}
    pnd = {
        r["doc_id"]: r
        for r in apply_hashed_logit(df.repartition(3), m, lane="pandas").collect()
    }
    assert set(jvm) == set(pnd) == {1, 2, 3, 4, 5, 6}
    for k in jvm:
        a, b = jvm[k], pnd[k]
        assert a["n_tokens"] == b["n_tokens"], k
        assert a["logit"] == b["logit"], k  # bit-exact (incl. None==None)
        if a["p"] is None:
            assert b["p"] is None
        else:
            assert abs(a["p"] - b["p"]) < 1e-15
    assert jvm[5]["logit"] is None and jvm[6]["logit"] is None
    import pytest as _pt

    with _pt.raises(ValueError, match="unknown lane"):
        apply_hashed_logit(df, m, lane="bogus")


# ------------------------------------------------------------------- BM25


def _py_bm25(
    corpus: dict[int, str],
    terms: list[str],
    k1: float = 1.2,
    b: float = 0.75,
) -> dict[int, float]:
    """Pure-Python BM25 with the operator's exact float-op order."""
    import math

    tokd = {i: [t for t in s.split(" ") if t] for i, s in corpus.items()}
    n = len(tokd)
    tt = sum(len(v) for v in tokd.values())
    avgdl = tt / float(n) if n else 1.0
    out = {}
    for i, v in tokd.items():
        s = 0.0
        for t in terms:
            dfc = float(sum(1 for w in tokd.values() if t in w))
            idf = round(math.log((n - dfc + 0.5) / (dfc + 0.5) + 1.0), 6)
            tf = float(v.count(t))
            if tf > 0:
                s += idf * (tf * (k1 + 1.0)) / (
                    tf + k1 * (1.0 - b + b * len(v) / avgdl)
                )
        out[i] = s
    return out


@pytest.fixture(scope="module")
def bm25_docs(spark):
    rows = [
        (0, "spark merge spark vector"),
        (1, "customer window hash table"),
        (2, "spark spark spark"),
        (3, None),
        (4, ""),
        (5, "vector merge"),
        (6, "merge vector spark customer merge"),
    ]
    return spark.createDataFrame(rows, "doc_id long, text string")


class TestBM25:
    TERMS = ["merge", "spark", "vector"]

    def test_score_matches_python_reference(self, spark, bm25_docs):
        from tdigest_spark.operators.scoring import bm25_score

        got = {
            r["doc_id"]: (r["n_tokens"], r["bm25"])
            for r in bm25_score(bm25_docs, self.TERMS).collect()
        }
        corpus = {
            0: "spark merge spark vector",
            1: "customer window hash table",
            2: "spark spark spark",
            4: "",
            5: "vector merge",
            6: "merge vector spark customer merge",
        }
        ref = _py_bm25(corpus, self.TERMS)
        for i, s in ref.items():
            n_tok, bm = got[i]
            assert n_tok == len([t for t in corpus[i].split(" ") if t])
            assert bm == s  # bit-exact: same op order, quantized idf
        # NULL text: row kept, no evidence
        assert got[3] == (0, None)
        # zero-match doc scores exactly 0.0, empty doc too
        assert got[1][1] == 0.0 and got[4][1] == 0.0

    def test_score_duplicate_terms_collapse(self, spark, bm25_docs):
        from tdigest_spark.operators.scoring import bm25_score

        once = bm25_score(bm25_docs, ["spark"]).collect()
        twice = bm25_score(bm25_docs, ["spark", "spark"]).collect()
        assert sorted(map(tuple, once)) == sorted(map(tuple, twice))

    def test_topk_differential_vs_literal_lane(self, spark, bm25_docs):
        from tdigest_spark.operators.scoring import bm25_score, bm25_topk

        terms = sorted(self.TERMS)  # sorted -> identical fold order
        q = spark.createDataFrame(
            [("q1", terms)], "query_id string, terms array<string>"
        )
        lane2 = {
            r["doc_id"]: r["bm25"]
            for r in bm25_topk(bm25_docs, q, k=100).collect()
        }
        lane1 = {
            r["doc_id"]: r["bm25"]
            for r in bm25_score(bm25_docs, terms).collect()
        }
        # every matched doc agrees bit-for-bit; zero-match/NULL docs are
        # retrieval-absent in the topk lane
        assert set(lane2) == {i for i, s in lane1.items() if s}
        for i, s in lane2.items():
            assert s == lane1[i]

    def test_topk_k_cap_rank_and_tiebreak(self, spark, bm25_docs):
        from tdigest_spark.operators.scoring import bm25_topk

        # doc 0 and doc 6 both contain 'customer'? no — build a tie:
        # two docs with identical token multiset => identical score
        rows = [
            (10, "alpha beta"),
            (11, "beta alpha"),
            (12, "alpha alpha beta"),
            (13, "gamma"),
        ]
        df = spark.createDataFrame(rows, "doc_id long, text string")
        q = spark.createDataFrame(
            [("q", ["alpha"])], "query_id string, terms array<string>"
        )
        out = bm25_topk(df, q, k=2).orderBy("rank").collect()
        assert [r["rank"] for r in out] == [1, 2]
        assert len(out) == 2  # k cap applied
        full = bm25_topk(df, q, k=10).orderBy("rank").collect()
        # identical-score tie (docs 10, 11) breaks by ascending doc_id
        tied = [r for r in full if r["doc_id"] in (10, 11)]
        assert tied[0]["doc_id"] == 10 and tied[1]["doc_id"] == 11
        assert tied[0]["bm25"] == tied[1]["bm25"]
        assert 13 not in {r["doc_id"] for r in full}  # no-match absent

    def test_topk_multi_query_and_null_terms(self, spark, bm25_docs):
        from tdigest_spark.operators.scoring import bm25_topk

        q = spark.createDataFrame(
            [
                ("q1", ["spark"]),
                ("q2", ["customer", "customer", "window"]),
                ("q3", ["zzz_absent"]),
                ("q4", [None, "hash"]),
            ],
            "query_id string, terms array<string>",
        )
        out = bm25_topk(bm25_docs, q, k=5).collect()
        by_q = {}
        for r in out:
            by_q.setdefault(r["query_id"], []).append(r["doc_id"])
        assert set(by_q["q1"]) == {0, 2, 6}
        assert set(by_q["q2"]) == {1, 6}
        assert "q3" not in by_q  # no matching docs -> query absent
        assert set(by_q["q4"]) == {1}  # NULL term ignored, 'hash' matches

    def test_score_empty_terms_raises(self, spark, bm25_docs):
        from tdigest_spark.operators.scoring import bm25_score

        with pytest.raises(ValueError):
            bm25_score(bm25_docs, [])


def test_gumbel_topk_excludes_null_weight_docs(spark):
    """k larger than the scored-row count must NOT backfill with
    NULL-weight no-evidence docs (matches gumbel_sample_fraction)."""
    from tdigest_spark.operators.scoring import gumbel_topk

    rows = [(1, 100), (2, 200), (3, None), (4, None)]
    df = spark.createDataFrame(rows, "doc_id long, llr_micro long")
    got = {r["doc_id"] for r in gumbel_topk(df, k=10).collect()}
    assert got == {1, 2}


def test_bigram_nll_degenerate_lm_and_alpha_guard(spark):
    """An LM trained on an empty slice (v = 0) scores every doc NULL
    instead of aborting the job under ANSI mode; alpha <= 0 is rejected
    up front."""
    from pyspark.sql import functions as F

    from tdigest_spark.operators.scoring import bigram_nll_bits, train_bigram_lm

    docs = spark.createDataFrame(
        [(0, "a b c"), (1, "x y")], "doc_id long, text string"
    )
    lm = train_bigram_lm(docs.filter(F.lit(False)))
    out = {r["doc_id"]: r["nll_bits"] for r in bigram_nll_bits(docs, lm).collect()}
    assert out == {0: None, 1: None}
    with pytest.raises(ValueError, match="alpha"):
        bigram_nll_bits(docs, lm, alpha=0.0)


class TestBM25Frozen:
    def test_frozen_stats_bit_identical_to_two_pass(self, spark, bm25_docs):
        from tdigest_spark.operators.scoring import bm25_score, bm25_stats

        terms = ["merge", "spark", "vector"]
        st = bm25_stats(bm25_docs, terms)
        live = {tuple(r) for r in bm25_score(bm25_docs, terms).collect()}
        frozen = {
            tuple(r)
            for r in bm25_score(bm25_docs, terms, stats=st).collect()
        }
        assert frozen == live  # same integer stats -> bit-identical

    def test_frozen_plan_is_pure_scan_stage(self, spark, bm25_docs):
        from tdigest_spark.operators.scoring import bm25_score, bm25_stats
        from tdigest_spark.plans import explain_str

        st = bm25_stats(bm25_docs, ["spark"])
        plan = explain_str(bm25_score(bm25_docs, ["spark"], stats=st))
        assert "Exchange" not in plan and "Join" not in plan
        assert "MapInPandas" not in plan

    def test_frozen_runs_on_a_stream(self, spark, tmp_path, bm25_docs):
        """Stateless scan-stage algebra: the frozen scorer applies to a
        readStream frame unchanged, and per-row results equal batch."""
        from tdigest_spark.operators.scoring import bm25_score, bm25_stats

        src = str(tmp_path / "bm25_src")
        bm25_docs.coalesce(1).write.mode("overwrite").parquet(src)
        st = bm25_stats(bm25_docs, ["merge", "spark"])
        sdf = spark.readStream.schema("doc_id long, text string").parquet(src)
        scored = bm25_score(sdf, ["merge", "spark"], stats=st)
        out = str(tmp_path / "bm25_out")
        q = (
            scored.writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", str(tmp_path / "bm25_ckpt"))
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)
        got = {
            r["doc_id"]: r["bm25"] for r in spark.read.parquet(out).collect()
        }
        want = {
            r["doc_id"]: r["bm25"]
            for r in bm25_score(bm25_docs, ["merge", "spark"], stats=st).collect()
        }
        assert got == want

    def test_frozen_missing_term_raises(self, spark, bm25_docs):
        from tdigest_spark.operators.scoring import bm25_score

        with pytest.raises(ValueError, match="missing terms"):
            bm25_score(
                bm25_docs,
                ["spark", "vector"],
                stats={"n_docs": 5, "total_tokens": 20, "df": {"spark": 3}},
            )

    def test_frozen_inconsistent_stats_raise(self, spark, bm25_docs):
        """df > n_docs makes the idf log argument non-positive (silent
        NULL scores); a mismatched/smaller snapshot must fail loudly."""
        from tdigest_spark.operators.scoring import bm25_score

        with pytest.raises(ValueError, match="df > n_docs"):
            bm25_score(
                bm25_docs,
                ["spark"],
                stats={"n_docs": 2, "total_tokens": 20, "df": {"spark": 3}},
            )
        with pytest.raises(ValueError, match="must be >= 0"):
            bm25_score(
                bm25_docs,
                ["spark"],
                stats={"n_docs": -1, "total_tokens": 20, "df": {"spark": 0}},
            )


def test_bm25_topk_multirow_query_terms_dedup(spark, bm25_docs):
    """One query_id split across multiple rows must not double-count a
    term shared between the rows."""
    from tdigest_spark.operators.scoring import bm25_topk

    one = spark.createDataFrame(
        [("q1", ["spark", "merge"]), ("q1", ["spark", "vector"])],
        "query_id string, terms array<string>",
    )
    flat = spark.createDataFrame(
        [("q1", ["spark", "merge", "vector"])],
        "query_id string, terms array<string>",
    )
    a = {r["doc_id"]: r["bm25"] for r in bm25_topk(bm25_docs, one, k=50).collect()}
    b = {r["doc_id"]: r["bm25"] for r in bm25_topk(bm25_docs, flat, k=50).collect()}
    assert a == b
