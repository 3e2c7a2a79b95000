"""Model-based document scoring for corpus curation.

Two scorers a production web-corpus pipeline runs after the heuristic
gates (`text.quality_score`) and before sampling:

- bigram-LM negative log-likelihood (CCNet-style): train an add-alpha
  smoothed bigram language model on a reference slice (CCNet uses
  Wikipedia; here any DataFrame of text), score every document by mean
  bits-per-bigram.  High NLL = unusual text (gibberish, boilerplate
  soup, wrong language); CCNet buckets the corpus by this signal.
- hashed-feature linear classifier (fastText-style): logit = mean of
  per-token bucket weights, buckets from a hash of the token.  The
  weights of a real deployment come from training; `bucket_weight`'s
  deterministic md5-derived placeholder keeps the full scoring
  plumbing (hash -> bucket -> weight -> ordered mean) testable and
  oracle-exact end to end.  Swapping in trained weights is a one-arg
  change (`weight_fn`).

Engine-neutral float discipline (both scorers are driver-gated against
DuckDB, value-exact):
- all hashing is md5 (like the dedup/sketch lanes), integer algebra via
  hex-prefix parses;
- the classifier never touches libm: weights are exact integer-derived
  doubles, the mean is an ordered fold (identical FP op order in both
  engines) and one exact-rounded division;
- the LM needs log2, and JVM vs DuckDB libm differ by 1 ulp on ~30% of
  inputs (measured), so each per-bigram term is quantized to 1e-6 bits
  (`round(term, 6)`) before the ordered fold — a boundary hit needs the
  true value within ~1 ulp of a 5e-7 grid edge (~4e-9 per term), and
  the inputs are deterministic, so green at one SF stays green.

Scale shape (100 TB): LM training is two partial-aggregating groupBys
over (prefix, word) pairs — shuffle carries counted pairs, never text.
Scoring explodes bigrams, joins the model (sort-merge by default; a
pruned model broadcasts under AQE), and re-aggregates per doc — the
same explode/join/re-agg shape as `dedup_lines_corpus`.  The classifier
is pure scan-stage column algebra: zero shuffles, zero joins.
"""

from __future__ import annotations

from typing import Callable

from pyspark.sql import Column, DataFrame, functions as F

from .text import tokens_col


def _hex_prefix_long(h: Column, n_hex: int = 8) -> Column:
    """First `n_hex` hex chars of a hash string as a non-negative long."""
    return F.conv(F.substring(h, 1, n_hex), 16, 10).cast("long")


def token_bucket(tok: Column, n_buckets: int) -> Column:
    """Deterministic feature bucket for a token: md5('b:'||tok) mod n."""
    return _hex_prefix_long(F.md5(F.concat(F.lit("b:"), tok))) % n_buckets


def bucket_weight(bucket: Column, seed: str = "w") -> Column:
    """Placeholder model weight for a bucket, uniform on the 0.001 grid
    in [-1, 1]: (md5-derived integer mod 2001 - 1000) / 1000.  Exact in
    both engines (integer ops + one correctly-rounded division)."""
    h = F.md5(F.concat(F.lit(seed + ":"), bucket.cast("string")))
    return (_hex_prefix_long(h) % 2001 - 1000).cast("double") / 1000.0


def hashed_logit(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    delimiter: str = " ",
    weight_fn: Callable[[Column], Column] | None = None,
) -> DataFrame:
    """fastText-style linear score: mean over tokens of the weight of the
    token's hash bucket.

    Returns (id_col, n_tokens, logit); logit is NULL for empty/NULL
    text.  The mean is an ordered left fold over the token array (not a
    group sum), so the FP accumulation order is defined by the document
    itself — engine- and partitioning-independent.  Zero shuffles: the
    whole scorer runs in the scan stage.

    `weight_fn` maps a bucket column to a weight column; the default is
    the deterministic `bucket_weight` placeholder (see module
    docstring).  A trained model is supplied as e.g.
    ``weight_fn=lambda b: F.element_at(F.lit(weights_array), b + 1)``.
    """
    wf = weight_fn or bucket_weight
    toks = df.select(
        F.col(id_col), tokens_col(text_col, delimiter).alias("__t")
    )
    n = F.size("__t")
    total = F.aggregate(
        F.col("__t"),
        F.lit(0.0),
        lambda acc, x: acc + wf(token_bucket(x, n_buckets)),
    )
    return toks.select(
        F.col(id_col),
        F.coalesce(n, F.lit(0)).cast("long").alias("n_tokens"),
        F.when(n > 0, total / n.cast("double")).alias("logit"),
    )


def _bigrams(toks: Column | str) -> Column:
    """array<struct<prefix,word>> of adjacent token pairs, in order.

    `toks` must be a bound column from a prior projection (the
    element_at calls sit inside a transform lambda — an inline token
    expression would be re-evaluated per index, O(tokens^2) per doc;
    see shingles_from_tokens).
    """
    toks = F.col(toks) if isinstance(toks, str) else toks
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: F.struct(
                F.element_at(toks, i).alias("prefix"),
                F.element_at(toks, i + 1).alias("word"),
            ),
        ),
    ).otherwise(F.array().cast("array<struct<prefix:string,word:string>>"))


def train_bigram_lm(
    train_df: DataFrame,
    text_col: str = "text",
    delimiter: str = " ",
) -> tuple[DataFrame, DataFrame, DataFrame]:
    """Count-based bigram LM from a reference corpus.

    Returns (bigram_counts, prefix_counts, vocab):
    - bigram_counts: (prefix, word, c_bigram)
    - prefix_counts: (prefix, c_prefix) — c_prefix is the total bigram
      count with that prefix (= occurrences of the word excluding
      document-final positions), so MLE probabilities per prefix sum
      to 1 before smoothing;
    - vocab: one row (v) — distinct token count over all positions,
      the smoothing denominator's vocabulary size.

    Two partial-aggregating groupBys; the shuffle carries (prefix,
    word) pairs with partial counts, never text.  All three outputs are
    small relative to the corpus (vocabulary-sized) and typically
    persist + broadcast downstream.
    """
    toks = train_df.select(tokens_col(text_col, delimiter).alias("__t"))
    pairs = toks.select(F.explode(_bigrams("__t")).alias("__bg")).select(
        F.col("__bg.prefix").alias("prefix"), F.col("__bg.word").alias("word")
    )
    bigram_counts = pairs.groupBy("prefix", "word").agg(
        F.count("*").cast("long").alias("c_bigram")
    )
    prefix_counts = bigram_counts.groupBy("prefix").agg(
        F.sum("c_bigram").cast("long").alias("c_prefix")
    )
    vocab = toks.select(F.explode("__t").alias("__w")).agg(
        F.countDistinct("__w").cast("long").alias("v")
    )
    return bigram_counts, prefix_counts, vocab


def bigram_nll_bits(
    df: DataFrame,
    lm: tuple[DataFrame, DataFrame, DataFrame],
    text_col: str = "text",
    id_col: str = "doc_id",
    alpha: float = 1.0,
    delimiter: str = " ",
    term_decimals: int = 6,
) -> DataFrame:
    """Score documents under an add-alpha smoothed bigram LM.

    P(w|v) = (c(v,w) + alpha) / (c(v.) + alpha*V); per-bigram term is
    -log2(P) quantized to `term_decimals` (see module docstring), the
    per-doc total is an ordered left fold over the terms in document
    order.  Returns
    (id_col, n_bigrams, oov_bigrams, nll_bits, avg_nll_bits):
    - oov_bigrams: bigrams unseen in training (smoothing still scores
      them; the count is its own novelty signal);
    - nll_bits NULL (not 0) for docs with < 2 tokens — "no evidence",
      not "perfectly predicted".

    Plan: explode bigrams with position -> left join bigram counts on
    (prefix, word) -> left join prefix counts -> broadcast the 1-row
    vocab -> re-aggregate per doc (terms collected ordered by
    position) -> left join back to the id spine so short/NULL docs
    survive with NULL score.  The model joins are sort-merge on the
    pair key by default; prune + broadcast the model when it fits.
    """
    bigram_counts, prefix_counts, vocab = lm
    spine = df.select(
        F.col(id_col), tokens_col(text_col, delimiter).alias("__t")
    )
    e = (
        spine.select(
            F.col(id_col),
            F.posexplode(_bigrams("__t")).alias("__p", "__bg"),
        )
        .select(
            F.col(id_col),
            F.col("__p"),
            F.col("__bg.prefix").alias("prefix"),
            F.col("__bg.word").alias("word"),
        )
        .join(bigram_counts, ["prefix", "word"], "left")
        .join(prefix_counts, ["prefix"], "left")
        .crossJoin(F.broadcast(vocab))
    )
    p = (F.coalesce(F.col("c_bigram"), F.lit(0)) + F.lit(alpha)).cast(
        "double"
    ) / (
        F.coalesce(F.col("c_prefix"), F.lit(0))
        + F.lit(alpha) * F.col("v")
    ).cast("double")
    term = F.round(-F.log2(p), term_decimals)
    scored = (
        e.select(
            F.col(id_col),
            F.col("__p"),
            term.alias("__nll"),
            F.col("c_bigram").isNull().cast("int").alias("__oov"),
        )
        .groupBy(id_col)
        .agg(
            F.count("*").cast("long").alias("n_bigrams"),
            F.sum("__oov").cast("long").alias("oov_bigrams"),
            F.aggregate(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct(F.col("__p"), F.col("__nll")))
                    ),
                    lambda s: s["__nll"],
                ),
                F.lit(0.0),
                lambda acc, x: acc + x,
            ).alias("nll_bits"),
        )
    )
    return (
        spine.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_bigrams", F.lit(0)).cast("long").alias("n_bigrams"),
            F.coalesce("oov_bigrams", F.lit(0)).cast("long").alias(
                "oov_bigrams"
            ),
            F.col("nll_bits"),
            (F.col("nll_bits") / F.col("n_bigrams").cast("double")).alias(
                "avg_nll_bits"
            ),
        )
    )
