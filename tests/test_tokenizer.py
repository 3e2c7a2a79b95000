"""Distributed BPE training: differential vs a pure-Python reference
implementation of the Sennrich et al. algorithm (same tie-break:
count desc, lhs asc, rhs asc), plus encode/training consistency."""

from __future__ import annotations

from collections import Counter

from tdigest_spark.operators.tokenizer import (
    EOW,
    bpe_encode,
    bpe_train,
    pair_counts,
    word_freq_table,
    initial_symbols,
)

CORPUS = [
    "low low low low low",
    "lower lower newest newest",
    "newest newest newest newest",
    "widest widest widest",
    "new new new slow slow",
    "lowest lowest newest wide wide",
]


def _ref_bpe(word_counts: dict, n_merges: int, min_pair_count: int = 2):
    """Reference BPE trainer (driver-side dicts, the classic loop)."""
    vocab = {}
    for w, c in word_counts.items():
        key = tuple(list(w) + [EOW])
        vocab[key] = vocab.get(key, 0) + c
    merges = []
    for _ in range(n_merges):
        pc = Counter()
        for syms, c in vocab.items():
            for i in range(len(syms) - 1):
                pc[(syms[i], syms[i + 1])] += c
        if not pc:
            break
        (a, b), cnt = min(
            pc.items(), key=lambda kv: (-kv[1], kv[0][0], kv[0][1])
        )
        if cnt < min_pair_count:
            break
        merges.append((a, b))
        nv = {}
        for syms, c in vocab.items():
            out, i = [], 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            key = tuple(out)
            nv[key] = nv.get(key, 0) + c
        vocab = nv
    return merges, vocab


def _word_counts(corpus):
    wc = Counter()
    for line in corpus:
        wc.update(w for w in line.split(" ") if w)
    return dict(wc)


def test_bpe_train_matches_reference(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    got = bpe_train(df, n_merges=25, min_pair_count=2)
    want, _ = _ref_bpe(_word_counts(CORPUS), 25, 2)
    assert got == want
    assert len(got) > 10  # the corpus supports a real merge sequence


def test_bpe_train_partition_invariant(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    a = bpe_train(df, n_merges=12)
    b = bpe_train(df.repartition(7), n_merges=12)
    assert a == b


def test_bpe_encode_reproduces_training_state(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges = bpe_train(df, n_merges=20, min_pair_count=2)
    _, ref_vocab = _ref_bpe(_word_counts(CORPUS), 20, 2)
    final = {}  # word -> trained symbol tuple
    for syms in ref_vocab:
        word = "".join(syms).removesuffix(EOW)
        final[word] = list(syms)
    words_df = spark.createDataFrame(
        [(i, w) for i, w in enumerate(sorted(final))], "doc_id long, text string"
    )
    enc = {
        r["text"]: r["bpe_tokens"]
        for r in bpe_encode(words_df, merges, id_col="doc_id")
        .join(words_df, "doc_id")
        .collect()
    }
    for w, syms in final.items():
        assert enc[w] == syms, w


def test_bpe_encode_multiword_and_null(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges = bpe_train(df, n_merges=15)
    docs = spark.createDataFrame(
        [(0, "low newest"), (1, None), (2, "")],
        "doc_id long, text string",
    )
    out = {r["doc_id"]: r["bpe_tokens"] for r in bpe_encode(docs, merges).collect()}
    _, ref_vocab = _ref_bpe(_word_counts(CORPUS), 15, 2)
    final = {"".join(s).removesuffix(EOW): list(s) for s in ref_vocab}
    assert out[0] == final["low"] + final["newest"]
    assert out[1] is None
    assert out[2] == []


def test_bpe_batched_rounds_disjoint_and_ordered(spark):
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    merges = bpe_train(df, n_merges=16, batch_size=4)
    assert len(merges) == len(set(merges))
    # every selected pair must actually occur in the corpus alphabet
    alphabet = set("".join(_word_counts(CORPUS))) | {EOW}
    for lhs, rhs in merges:
        assert set(lhs) <= alphabet - {EOW} or lhs.endswith(EOW)
    # batched tokenizer still encodes the corpus losslessly
    docs = spark.createDataFrame(
        [(i, t) for i, t in enumerate(CORPUS)], "doc_id long, text string"
    )
    enc = bpe_encode(docs, merges).collect()
    for r in enc:
        joined = "".join(r["bpe_tokens"]).replace(EOW, " ").strip()
        assert joined == CORPUS[r["doc_id"]]


def test_bpe_train_converges_early(spark):
    # all-unique single-occurrence words: no pair reaches min_pair_count
    df = spark.createDataFrame([("ab cd ef",)], "text string")
    assert bpe_train(df, n_merges=10, min_pair_count=2) == []


def test_pair_counts_weighted(spark):
    wc = word_freq_table(
        spark.createDataFrame([("ab ab b",)], "text string")
    )
    words = wc.select(initial_symbols("word").alias("syms"), "cnt")
    got = {
        (r["lhs"], r["rhs"]): r["cnt"] for r in pair_counts(words).collect()
    }
    assert got == {("a", "b"): 2, ("b", EOW): 3}


def test_tokenizer_train_job_end_to_end(spark, tmp_path):
    """jobs/tokenizer_train_job.py: artifact layout, determinism, and the
    merge table equals the in-process trainer's output."""
    import json
    import os
    import subprocess

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    inp = str(tmp_path / "corpus")
    spark.createDataFrame([(t,) for t in CORPUS], "text string").write.mode(
        "overwrite"
    ).parquet(inp)
    out = str(tmp_path / "tok")
    env = dict(os.environ)
    env["SPARK_DRIVER_MEM"] = "2g"
    proc = subprocess.run(
        [
            "python", os.path.join(repo, "jobs", "tokenizer_train_job.py"),
            "--input", inp, "--out", out, "--merges", "15", "--batch", "4",
        ],
        capture_output=True, text=True, timeout=420, cwd=repo, env=env,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    report = json.loads(proc.stdout.strip().splitlines()[-1])
    assert report["n_merges"] == 15
    got = [
        (r["lhs"], r["rhs"])
        for r in spark.read.parquet(os.path.join(out, "merges.parquet"))
        .orderBy("rank")
        .collect()
    ]
    df = spark.createDataFrame([(t,) for t in CORPUS], "text string")
    want = bpe_train(df, n_merges=15, batch_size=4)
    assert got == want
    with open(os.path.join(out, "report.json")) as fh:
        assert json.load(fh)["n_merges"] == 15
