"""Distributed BPE tokenizer training and encoding.

Byte-pair-encoding tokenizer training (Sennrich, Haddow & Birch 2016,
"Neural Machine Translation of Rare Words with Subword Units") is the
canonical step between corpus curation and pretraining — and it is a
pure counting problem, so it distributes the way every operator in
this package does: the corpus collapses to a word-frequency table in
ONE shuffle, and every merge round after that runs over the word
table, never the corpus.

Scale shape (the part that matters at 10^12 documents):

- `word_freq_table` is one partial-aggregating groupBy over exploded
  tokens — the corpus text is read once and never again.  At web
  scale the distinct-word table is ~10^8-10^9 rows of a few dozen
  bytes: a *small* DataFrame by the corpus's standards, but far too
  big to collect — which is why training stays distributed instead of
  doing the classic driver-side dict loop.
- Each merge round is (a) one partial-aggregating pair-count over the
  word table's symbol arrays (all-JVM transform/explode — the shuffle
  carries (lhs, rhs, partial cnt) rows only), (b) a driver-side top-k
  of a handful of candidate rows (TakeOrdered, k ~ batch), and (c) an
  all-JVM fold (`F.aggregate`) that rewrites the symbol arrays —
  guarded so rows not containing the pair are left untouched.
- Lineage is truncated with `localCheckpoint` every few rounds, the
  same pattern `dedup.resolve_clusters` uses for its iterative
  connected-components loop.

The per-round fold is EXACT left-to-right non-overlapping pair
merging: the accumulator's trailing element can only equal `lhs` if it
was not itself just merged (the merged symbol `lhs+rhs` is strictly
longer than `lhs`), so "aaa" under ("a","a") folds to ["aa","a"] —
byte-identical to the reference algorithm's scan.

`batch_size > 1` is the standard frequency-batching speedup (apply the
top-B pairwise-symbol-disjoint pairs in one round).  Disjointness
makes the *application* order-independent — merging (a,b) cannot
change the count or the occurrences of a pair sharing no symbol with
it — but sequential BPE might have preferred a pair *created* by an
earlier merge in the same batch, so batched training is a documented
approximation of the sequential merge LIST (each selected pair still
had its true corpus count at selection time).  `batch_size=1` is
bit-exact vs the reference algorithm and is what the differential
tests pin.

Tie-break: (count desc, lhs asc, rhs asc) — a total order, so training
is deterministic across partitionings, cluster sizes, and engines.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

from .text import tokens_col

#: End-of-word marker appended as a standalone symbol (Sennrich-style).
EOW = "</w>"


def word_freq_table(
    df: DataFrame,
    text_col: str = "text",
    delimiter: str = " ",
    min_count: int = 1,
) -> DataFrame:
    """Corpus -> (word, cnt): the one pass that touches text.  One
    partial-aggregating shuffle of (word, partial count); `min_count`
    prunes the hapax tail (at web scale most distinct words are noise
    seen once — dropping them shrinks the working table ~10x without
    moving any merge decision that has support)."""
    wc = (
        df.select(F.explode(tokens_col(text_col, delimiter)).alias("word"))
        .groupBy("word")
        .agg(F.count("*").alias("cnt"))
    )
    if min_count > 1:
        wc = wc.filter(F.col("cnt") >= int(min_count))
    return wc


def initial_symbols(word: Column | str) -> Column:
    """Character symbols plus a trailing EOW marker symbol."""
    c = F.col(word) if isinstance(word, str) else word
    return F.concat(F.split(c, ""), F.array(F.lit(EOW)))


def pair_counts(words: DataFrame, syms_col: str = "syms", cnt_col: str = "cnt") -> DataFrame:
    """Weighted adjacent-symbol pair counts over the word table:
    (lhs, rhs, cnt).  All-JVM: transform+explode in the scan stage,
    one partial-aggregating groupBy."""
    pairs = F.expr(
        f"transform(slice({syms_col}, 1, size({syms_col}) - 1), "
        f"(s, i) -> struct(s AS lhs, element_at({syms_col}, i + 2) AS rhs))"
    )
    return (
        words.select(F.explode(pairs).alias("p"), F.col(cnt_col))
        .groupBy("p.lhs", "p.rhs")
        .agg(F.sum(cnt_col).alias("cnt"))
    )


def _merge_fold(syms: Column, pairs: Sequence[tuple[str, str]]) -> Column:
    """Left-to-right non-overlapping merge of every adjacent (lhs, rhs)
    in `pairs` into lhs+rhs, as ONE pure-JVM fold pass.

    Correctness notes:
    - Self-overlap safe: the fold's trailing element after a merge is
      lhs+rhs, which can never compare equal to any pair's lhs (pairs
      are symbol-disjoint and none equals a merged string — bpe_train's
      selection enforces both), so "aaa" under ("a","a") -> ["aa","a"].
    - One pass == sequential per-pair passes for symbol-disjoint pairs:
      merging one pair only creates adjacencies involving its (strictly
      longer) merged symbol, which no other selected pair references.
    - All pairs ride a single CASE chain inside one aggregate() — NEVER
      nest per-pair folds: when(guard, fold).otherwise(syms) references
      its child 3x, so chaining k folds builds a 3^k expression tree
      that OOMs task deserialization (observed at batch 8 on the 4M
      corpus: 12 GB heap gone inside ObjectInputStream).
    """
    pairs = list(pairs)
    if not pairs:
        return syms

    def step(acc: Column, s: Column) -> Column:
        expr = F.concat(acc, F.array(s))
        nonempty = F.size(acc) > 0
        tail = F.element_at(acc, -1)
        for lhs, rhs in reversed(pairs):
            expr = F.when(
                nonempty & (tail == F.lit(lhs)) & (s == F.lit(rhs)),
                F.concat(
                    F.slice(acc, F.lit(1), F.size(acc) - 1),
                    F.array(F.lit(lhs + rhs)),
                ),
            ).otherwise(expr)
        return expr

    fold = F.aggregate(syms, F.array().cast("array<string>"), step)
    # rows containing no selected pair's symbols skip the fold entirely
    guard = None
    for lhs, rhs in pairs:
        g = F.array_contains(syms, lhs) & F.array_contains(syms, rhs)
        guard = g if guard is None else (guard | g)
    return F.when(guard, fold).otherwise(syms)


def bpe_train(
    df: DataFrame,
    text_col: str = "text",
    n_merges: int = 100,
    min_pair_count: int = 2,
    batch_size: int = 1,
    delimiter: str = " ",
    min_word_count: int = 1,
    checkpoint_every: int = 8,
) -> list[tuple[str, str]]:
    """Train a BPE merge list over a corpus.  Returns the ordered list
    of (lhs, rhs) merges — the tokenizer artifact `bpe_encode` applies.

    Stops early when no pair reaches `min_pair_count` (the reference
    algorithm's convergence condition).  See the module docstring for
    the scale shape and the batched-round exactness contract.
    """
    if n_merges < 1:
        raise ValueError("n_merges must be >= 1")
    if batch_size < 1:
        raise ValueError("batch_size must be >= 1")
    wc = word_freq_table(df, text_col, delimiter, min_word_count)
    words = wc.select(
        initial_symbols("word").alias("syms"), F.col("cnt")
    ).persist()
    words.count()
    merges: list[tuple[str, str]] = []
    rounds = 0
    try:
        while len(merges) < n_merges:
            want = min(batch_size, n_merges - len(merges))
            # over-fetch so the disjointness filter can still fill the batch
            cand = (
                pair_counts(words)
                .filter(F.col("cnt") >= int(min_pair_count))
                .orderBy(F.desc("cnt"), "lhs", "rhs")
                .limit(want * 4)
                .collect()
            )
            chosen: list[tuple[str, str]] = []
            used: set[str] = set()
            for r in cand:
                if len(chosen) >= want:
                    break
                if r["lhs"] in used or r["rhs"] in used:
                    continue
                chosen.append((r["lhs"], r["rhs"]))
                used.update((r["lhs"], r["rhs"], r["lhs"] + r["rhs"]))
            if not chosen:
                break
            nxt = words.select(
                _merge_fold(F.col("syms"), chosen).alias("syms"), "cnt"
            )
            rounds += 1
            if rounds % checkpoint_every == 0:
                nxt = nxt.localCheckpoint(eager=True)
            else:
                nxt = nxt.persist()
                nxt.count()
            words.unpersist()
            words = nxt
            merges.extend(chosen)
    finally:
        words.unpersist()
    return merges


def bpe_encode(
    df: DataFrame,
    merges: Sequence[tuple[str, str]],
    text_col: str = "text",
    out_col: str = "bpe_tokens",
    id_col: str = "doc_id",
    delimiter: str = " ",
) -> DataFrame:
    """Encode text with a trained merge list: (id_col, out_col
    array<string>) — subword symbols in document order, EOW markers
    attached.  Inverse-consistency contract: encoding the training
    corpus reproduces exactly the symbol state training ended in
    (pinned by tests).

    Applying ~10^3-10^4 ranked merges per word is an inherently
    iterative inner loop, so this is the module's Pandas stage
    (mapInPandas, Arrow-batched).  The dominant cost disappears behind
    a per-batch word memo: natural text is Zipfian, so each batch
    encodes ~distinct-words, not ~tokens.  The merge table rides the
    closure (KB-sized — it IS the tokenizer)."""
    import pandas as pd

    ranks = {tuple(m): i for i, m in enumerate(merges)}
    id_type = df.schema[id_col].dataType.simpleString()
    schema = f"{id_col} {id_type}, {out_col} array<string>"

    def _encode_word(word: str, memo: dict) -> list[str]:
        got = memo.get(word)
        if got is not None:
            return got
        syms = list(word) + [EOW]
        while len(syms) > 1:
            best_rank = None
            best_pair = None
            for i in range(len(syms) - 1):
                r = ranks.get((syms[i], syms[i + 1]))
                if r is not None and (best_rank is None or r < best_rank):
                    best_rank, best_pair = r, (syms[i], syms[i + 1])
            if best_pair is None:
                break
            a, b = best_pair
            out = []
            i = 0
            while i < len(syms):
                if i + 1 < len(syms) and syms[i] == a and syms[i + 1] == b:
                    out.append(a + b)
                    i += 2
                else:
                    out.append(syms[i])
                    i += 1
            syms = out
        memo[word] = syms
        return syms

    def _run(batches):
        for pdf in batches:
            memo: dict = {}
            toks = []
            for t in pdf[text_col]:
                if t is None:
                    toks.append(None)
                    continue
                enc: list[str] = []
                for w in t.split(delimiter):
                    if w:
                        enc.extend(_encode_word(w, memo))
                toks.append(enc)
            yield pd.DataFrame({id_col: pdf[id_col], out_col: toks})

    return df.select(id_col, text_col).mapInPandas(_run, schema)
