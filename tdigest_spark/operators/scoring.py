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

import numpy as np
from pyspark.sql import Column, DataFrame, Window, functions as F

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
    if alpha <= 0:
        raise ValueError(
            "alpha must be > 0 (add-alpha smoothing; alpha=0 gives "
            "log2(0) for every OOV bigram)"
        )
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
    denom = (
        F.coalesce(F.col("c_prefix"), F.lit(0)) + F.lit(alpha) * F.col("v")
    ).cast("double")
    p = (
        F.coalesce(F.col("c_bigram"), F.lit(0)) + F.lit(alpha)
    ).cast("double") / F.when(denom > 0, denom).otherwise(F.lit(1.0))
    # denom == 0 only against a DEGENERATE LM (empty training corpus ->
    # v = 0, OOV prefix): the guard yields a NULL term (log2 path below
    # sees p from denom=1 -> term finite, so force NULL explicitly) —
    # unguarded, the 0/0 aborts the job under ANSI mode
    term = F.when(
        denom > 0, F.round(-F.log2(p), term_decimals)
    ).otherwise(F.lit(None).cast("double"))
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


# ------------------------------------------------------------------- DSIR


def _gram_bucket(toks: Column | str, n_buckets: int) -> Column:
    """array<long> of hashed-bigram feature buckets, one per adjacent
    token pair (DSIR's hashed n-gram features).  `toks` must be a bound
    column (see _bigrams)."""
    toks = F.col(toks) if isinstance(toks, str) else toks
    n = F.size(toks)
    return F.when(
        n >= 2,
        F.transform(
            F.sequence(F.lit(1), n - 1),
            lambda i: _hex_prefix_long(
                F.md5(
                    F.concat(
                        F.lit("g:"),
                        F.element_at(toks, i),
                        F.lit(" "),
                        F.element_at(toks, i + 1),
                    )
                )
            )
            % n_buckets,
        ),
    ).otherwise(F.array().cast("array<bigint>"))


def dsir_logratio(
    df: DataFrame,
    target_df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 8192,
    alpha: float = 1.0,
    delimiter: str = " ",
    term_decimals: int = 6,
) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, "Data Selection for
    Language Models via Importance Resampling"): score every raw
    document by its log-likelihood ratio under bag-of-hashed-bigram
    unigram models of the TARGET distribution (the high-quality corpus
    you want more of) vs the RAW distribution (the crawl you select
    from):

        log_w(doc) = sum over bigrams g of
                     [log2 p_target(b(g)) - log2 p_raw(b(g))]

    with add-alpha smoothing over `n_buckets` hashed features.  Positive
    means target-like; `gumbel_topk` turns the weights into the paper's
    sampled-without-replacement selection.

    Returns (id_col, n_grams, llr_micro, llr_bits):
    - llr_micro: the weight in integer MICRO-BITS (bigint).  Each
      per-bucket log2 is quantized to `term_decimals` once, model-side
      (n_buckets rows), so the per-doc accumulation is an INTEGER sum —
      order-independent, partitioning-independent, and engine-exact
      (bigram_nll_bits must fold doubles in document order to get the
      same guarantee; here the finite feature space lets us do better).
    - llr_bits = llr_micro / 1e6 (double, exact: micro counts are far
      below 2^53); NULL for docs with < 2 tokens ("no evidence").
    - NULL text survives with n_grams = 0 and NULL weight.

    Scale shape (100 TB): both model passes are partial-aggregating
    groupBys over (bucket) — the shuffle carries at most n_buckets
    partial counts per task, never text.  The model is DENSE
    (n_buckets rows, every bucket carries its smoothed term even with
    zero evidence) and KB-sized, so scoring is explode -> broadcast
    join -> per-doc integer re-agg; the only corpus-wide shuffle
    carries (id, int64) partial sums.
    """
    spark = df.sparkSession

    def _bucket_counts(frame: DataFrame, name: str) -> DataFrame:
        toks = frame.select(tokens_col(text_col, delimiter).alias("__t"))
        return (
            toks.select(
                F.explode(_gram_bucket("__t", n_buckets)).alias("bucket")
            )
            .groupBy("bucket")
            .agg(F.count("*").cast("long").alias(name))
        )

    dense = spark.range(n_buckets).select(F.col("id").alias("bucket"))
    model = (
        dense.join(_bucket_counts(target_df, "ct"), "bucket", "left")
        .join(_bucket_counts(df, "cr"), "bucket", "left")
        .select(
            "bucket",
            F.coalesce("ct", F.lit(0)).alias("ct"),
            F.coalesce("cr", F.lit(0)).alias("cr"),
        )
    )
    # totals via a 1-row broadcast (sums of the small model table)
    totals = model.agg(
        F.sum("ct").alias("tct"), F.sum("cr").alias("tcr")
    )
    scale = 10 ** term_decimals

    def _log_micro(c: Column, total: Column) -> Column:
        p = (c + F.lit(alpha)).cast("double") / (
            total + F.lit(alpha) * F.lit(n_buckets)
        ).cast("double")
        # round(x * scale) -> integer-valued double -> exact cast; the
        # alternative round(x, 6) * scale lands EPSILON off an integer
        # and Spark's cast-to-long truncates where DuckDB's rounds
        return F.round(F.log2(p) * scale)

    lr = model.crossJoin(F.broadcast(totals)).select(
        "bucket",
        (
            _log_micro(F.col("ct"), F.col("tct"))
            - _log_micro(F.col("cr"), F.col("tcr"))
        )
        .cast("long")
        .alias("llr_term"),
    )

    spine = df.select(F.col(id_col), tokens_col(text_col, delimiter).alias("__t"))
    e = spine.select(
        F.col(id_col), F.explode(_gram_bucket("__t", n_buckets)).alias("bucket")
    ).join(F.broadcast(lr), "bucket")
    scored = e.groupBy(id_col).agg(
        F.count("*").cast("long").alias("n_grams"),
        F.sum("llr_term").cast("long").alias("llr_micro"),
    )
    return (
        spine.select(id_col)
        .join(scored, id_col, "left")
        .select(
            F.col(id_col),
            F.coalesce("n_grams", F.lit(0)).cast("long").alias("n_grams"),
            F.col("llr_micro"),
            (F.col("llr_micro").cast("double") / F.lit(float(scale))).alias(
                "llr_bits"
            ),
        )
    )


def gumbel_topk(
    scored: DataFrame,
    k: int,
    id_col: str = "doc_id",
    weight_col: str = "llr_micro",
    seed: str = "gumbel",
    temperature: float = 1.0,
    term_decimals: int = 6,
) -> DataFrame:
    """DSIR's resampling step: sample k rows WITHOUT replacement with
    probability proportional to exp2(weight/temperature) via the Gumbel
    top-k trick — key = weight/T + Gumbel noise, take the k largest.
    (Base-2 throughout to pair with dsir_logratio's bits; a base change
    is a temperature change.)

    The noise is derived from md5(seed:id) — deterministic, engine-
    neutral, and independent of the weights, so the selection is a pure
    function of (data, seed, k): re-runs, repartitions, and the DuckDB
    oracle all pick the identical sample.  u is uniform on a 2^20 grid
    offset to the cell centers (never 0 or 1); the Gumbel term is
    quantized to `term_decimals` like the weights.  NULL weights
    (no-evidence docs) are EXCLUDED — without the filter they would
    backfill ranks whenever k exceeds the scored-row count, diverging
    from `gumbel_sample_fraction`, which always drops them.

    Returns the selected rows: (id_col, weight_col, key_micro, rank).
    Top-k is a TakeOrdered at the driver for small k; for huge k use
    `gumbel_sample_fraction` (digest-thresholded) instead.
    """
    key = _gumbel_key(id_col, weight_col, seed, temperature, term_decimals)
    ranked = (
        scored.select(
            F.col(id_col), F.col(weight_col), key.alias("key_micro")
        )
        .filter(F.col("key_micro").isNotNull())
        .orderBy(F.desc("key_micro"), F.asc(id_col))
        .limit(k)
    )
    w = Window.orderBy(F.desc("key_micro"), F.asc(id_col))
    return ranked.withColumn("rank", F.row_number().over(w).cast("int"))


def _gumbel_key(
    id_col: str,
    weight_col: str,
    seed: str,
    temperature: float,
    term_decimals: int,
) -> Column:
    """key_micro = weight/T + Gumbel(md5(seed:id)) in integer micro-bits
    (see gumbel_topk for the determinism/quantization rationale)."""
    u = (
        (
            _hex_prefix_long(
                F.md5(F.concat(F.lit(seed + ":"), F.col(id_col).cast("string")))
            )
            % F.lit(1 << 20)
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(1 << 20))
    scale = 10 ** term_decimals
    gumbel_micro = F.round(-F.log2(-F.log2(u)) * scale).cast("long")
    return (
        F.round(F.col(weight_col).cast("double") / F.lit(temperature)).cast(
            "long"
        )
        + gumbel_micro
    )


def gumbel_sample_fraction(
    scored: DataFrame,
    fraction: float,
    id_col: str = "doc_id",
    weight_col: str = "llr_micro",
    seed: str = "gumbel",
    temperature: float = 1.0,
    term_decimals: int = 6,
    delta: float = 200.0,
) -> DataFrame:
    """The scale path for DSIR selection: when k is millions+ a global
    TakeOrdered ships k rows to the driver; instead, keep every row
    whose Gumbel key clears the t-digest estimate of the
    (1 - fraction) quantile of the key distribution — the sketch
    library feeding the pipeline decision (same pattern as
    digest.quantile_filter, which this composes).

    Plan shape: one map-side-combining digest build over key_micro
    (raw rows never shuffle), a 1-row cutoff broadcast back onto the
    scan, a scan-stage comparison.  The selected COUNT is approximate:
    off by at most the digest's rank error (~O(1/delta) of the corpus;
    exact at the extreme tails, which is where small fractions live).
    Distribution-wise it is the identical Gumbel-top-k scheme —
    thresholding the same keys `gumbel_topk` ranks.

    No-evidence rows (NULL weight -> NULL key) never pass the cutoff
    comparison, matching gumbel_topk.  Returns
    (id_col, weight_col, key_micro).
    """
    if not 0.0 < fraction < 1.0:
        raise ValueError(f"fraction must be in (0, 1) (got {fraction})")
    from .digest import quantile_filter

    keyed = scored.select(
        F.col(id_col),
        F.col(weight_col),
        _gumbel_key(id_col, weight_col, seed, temperature, term_decimals)
        .cast("double")
        .alias("__key_d"),
    )
    kept = quantile_filter(
        keyed, "__key_d", q=1.0 - fraction, delta=delta, keep="ge"
    )
    return kept.select(
        F.col(id_col),
        F.col(weight_col),
        F.col("__key_d").cast("long").alias("key_micro"),
    )


# ------------------------------------------------------------------------
# distributed training for the hashed-feature classifier

_W_SCALE = 10**6  # weights live in integer micro-units
_G_SCALE = 10**9  # per-token gradient quantum (nano-units)


def train_hashed_logit(
    df: DataFrame,
    label_col: str = "label",
    text_col: str = "text",
    n_buckets: int = 1024,
    delimiter: str = " ",
    epochs: int = 10,
    lr: float = 1.0,
    cache: bool = True,
) -> dict:
    """Distributed full-batch training of the `hashed_logit` classifier
    (fastText-style quality filter): logistic regression on hashed-
    bucket token features, z = mean(w[bucket(t)]) + bias.

    DETERMINISTIC BY CONSTRUCTION — the trained model is bit-identical
    under any repartitioning or re-run, like every sketch in this
    library: weights are integer micro-units; each doc's residual
    (p - y) is computed from exact integer state, quantized per token
    to integer nano-units, and accumulated with int64 sums (order-free);
    the driver update rounds once per bucket per epoch.  No float ever
    crosses an aggregation boundary.

    Plan shape (per epoch): ONE mapInPandas scan over the cached
    (label, bucket-array) projection — tokenization + md5 bucketing run
    JVM-side ONCE up front (identical to inference's `token_bucket`) —
    emitting ONE dense int64 gradient row per partition (8·n_buckets
    bytes).  Nothing shuffles; the driver sums n_partitions partials
    and broadcasts the updated weights.  Labels are scarce, so the
    training frame is a labeled SAMPLE (thousands..millions of rows);
    the 100 TB corpus meets the model only at inference, which is pure
    scan-stage algebra (`hashed_logit`).

    Labels: cast to double, y in [0, 1] (soft labels fine); NULL-label
    and zero-token docs are excluded.  Loss history records mean
    logloss at each epoch START (quantized micro-bits, deterministic);
    `final_loss` is one extra pass over the SHIPPED weights — the number
    a consumer of the serialized model should quote.

    Training-time z sums integer weights then divides once; inference's
    ordered fold can differ by ulps — both are deterministic, and a
    linear classifier's decisions don't hinge on ulps (documented, not
    reconciled).

    Returns {"weights": int64 ndarray (micro-units), "bias": int,
    "n_buckets", "n_docs", "history": [float]}.
    """
    from pyspark.sql import types as T

    if epochs < 1:
        raise ValueError("epochs must be >= 1")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")

    toks = tokens_col(text_col, delimiter)
    feats = df.select(
        F.col(label_col).cast("double").alias("__y"),
        F.transform(toks, lambda t: token_bucket(t, n_buckets)).alias("__b"),
    ).filter(F.col("__y").isNotNull() & (F.size("__b") > 0))
    if cache:
        feats = feats.persist()

    out_schema = T.StructType(
        [
            T.StructField("grad", T.BinaryType()),
            T.StructField("bias_grad", T.LongType()),
            T.StructField("loss_micro", T.LongType()),
            T.StructField("n_docs", T.LongType()),
        ]
    )

    sc = df.sparkSession.sparkContext
    W = np.zeros(n_buckets, dtype=np.int64)
    B = 0
    history: list[float] = []
    n_total = 0
    try:
        for _ in range(epochs):
            bc = sc.broadcast((W.tobytes(), B))

            def partials(batches):
                import pandas as _pd

                wb, bias = bc.value
                w = np.frombuffer(wb, dtype=np.int64)
                g = np.zeros(w.shape[0], dtype=np.int64)
                bg = 0
                loss = 0
                nd = 0
                for pdf in batches:
                    if not len(pdf):
                        continue
                    ys = pdf["__y"].to_numpy(dtype=np.float64)
                    lists = pdf["__b"].tolist()
                    lens = np.array([len(x) for x in lists], dtype=np.int64)
                    flat = np.concatenate(lists).astype(np.int64)
                    offsets = np.concatenate(([0], np.cumsum(lens)[:-1]))
                    zsum = np.add.reduceat(w[flat], offsets)
                    z = zsum / (lens * float(_W_SCALE)) + bias / float(_W_SCALE)
                    p = 1.0 / (1.0 + np.exp(-z))
                    resid = p - ys
                    # per-token integer quantum; c_{d,k} enters via add.at
                    q = np.rint(resid / lens * _G_SCALE).astype(np.int64)
                    np.add.at(g, flat, np.repeat(q, lens))
                    bg += int(np.rint(resid * _G_SCALE).astype(np.int64).sum())
                    # stable soft-label logloss in micro-nats
                    l_pos = np.logaddexp(0.0, -z)
                    l_neg = np.logaddexp(0.0, z)
                    lv = ys * l_pos + (1.0 - ys) * l_neg
                    loss += int(np.rint(lv * _W_SCALE).astype(np.int64).sum())
                    nd += len(pdf)
                yield _pd.DataFrame(
                    {
                        "grad": [g.tobytes()],
                        "bias_grad": [bg],
                        "loss_micro": [loss],
                        "n_docs": [nd],
                    }
                )

            rows = feats.mapInPandas(partials, out_schema).collect()
            bc.destroy()
            G = np.zeros(n_buckets, dtype=np.int64)
            BG = 0
            L = 0
            N = 0
            for r in rows:
                G += np.frombuffer(r["grad"], dtype=np.int64)
                BG += r["bias_grad"]
                L += r["loss_micro"]
                N += r["n_docs"]
            if N == 0:
                raise ValueError("no trainable rows (all labels NULL or empty text)")
            n_total = N
            history.append(L / float(_W_SCALE) / N)
            step = lr / (N * float(_G_SCALE)) * float(_W_SCALE)
            W = W - np.rint(G * step).astype(np.int64)
            B = B - int(np.rint(BG * step))
        # history[k] is the loss BEFORE epoch k's update, so one more
        # pass measures the SHIPPED weights (what a consumer of the
        # serialized model actually gets); same quantized machinery, so
        # it is deterministic like everything else here
        bc = sc.broadcast((W.tobytes(), B))
        rows = feats.mapInPandas(partials, out_schema).collect()
        bc.destroy()
        final_loss = (
            sum(r["loss_micro"] for r in rows) / float(_W_SCALE) / n_total
        )
    finally:
        if cache:
            feats.unpersist()
    return {
        "weights": W,
        "bias": B,
        "n_buckets": n_buckets,
        "n_docs": n_total,
        "history": history,
        "final_loss": final_loss,
    }


def trained_weight_fn(model: dict) -> Callable[[Column], Column]:
    """Bind a trained model's weights as a `hashed_logit` weight_fn: a
    literal double array indexed scan-side (exact micro-unit grid
    values).  Fine to a few 10^5 buckets; beyond that, score via a
    broadcast + mapInPandas lane instead of a literal.

    The ndarray goes to F.lit WHOLE — one py4j call for one array
    Literal.  A python list would expand to one lit() call per bucket
    (measured: 22.9 s of driver-side plan build at 2^16 buckets vs
    ~0.1 s for the ndarray form; identical plan)."""
    arr = np.asarray(model["weights"], dtype=np.float64) / float(_W_SCALE)
    lit = F.lit(arr)
    return lambda b: F.element_at(lit, b.cast("int") + 1)


def apply_hashed_logit(
    df: DataFrame,
    model: dict,
    text_col: str = "text",
    id_col: str = "doc_id",
    delimiter: str = " ",
    lane: str = "jvm",
) -> DataFrame:
    """Score with a trained model: (id, n_tokens, logit, p).

    Lanes (logits bit-identical; p can differ 1 ulp — JVM vs libm exp —
    asserted in tests/test_scoring.py):
    - "jvm" (default): the `hashed_logit` scan-stage plan with the
      weight array as ONE literal.  Literal build is a py4j transfer —
      ~0.1 s at 4k buckets, seconds at 2^16, impractical at the 2^20 a
      production fastText-style model wants.
    - "pandas": the weight vector broadcasts out-of-band (8 MB at 2^20)
      and ONE mapInPandas scores each doc with the SAME left-to-right
      fold (np.cumsum is defined sequentially, so prefix sums reproduce
      the JVM fold's IEEE order exactly; tokenize+md5-bucket match
      `tokens_col`/`token_bucket` — the training differential already
      pins that equivalence).  Zero shuffle either way.
    """
    bias = model["bias"] / float(_W_SCALE)
    if lane == "pandas":
        import hashlib

        from pyspark.sql import types as T

        nb = int(model["n_buckets"])
        w = np.asarray(model["weights"], dtype=np.float64) / float(_W_SCALE)
        bc = df.sparkSession.sparkContext.broadcast(w.tobytes())
        id_type = df.schema[id_col].dataType
        schema = T.StructType(
            [
                T.StructField(id_col, id_type),
                T.StructField("n_tokens", T.LongType(), False),
                T.StructField("logit", T.DoubleType()),
                T.StructField("p", T.DoubleType()),
            ]
        )

        def score(batches):
            import pandas as _pd

            wv = np.frombuffer(bc.value, dtype=np.float64)
            for pdf in batches:
                n = len(pdf)
                if not n:
                    continue
                ids = pdf[id_col].to_numpy()
                n_toks = np.zeros(n, dtype=np.int64)
                logits = np.full(n, np.nan)
                for i, txt in enumerate(pdf[text_col]):
                    if txt is None:
                        continue
                    toks = [t for t in txt.split(delimiter) if t != ""]
                    n_toks[i] = len(toks)
                    if not toks:
                        continue
                    bk = np.fromiter(
                        (
                            int(
                                hashlib.md5(b"b:" + t.encode()).hexdigest()[:8],
                                16,
                            )
                            % nb
                            for t in toks
                        ),
                        dtype=np.int64,
                        count=len(toks),
                    )
                    # sequential prefix sum == the JVM aggregate fold
                    logits[i] = np.cumsum(wv[bk])[-1] / float(len(toks)) + bias
                ps = 1.0 / (1.0 + np.exp(-logits))
                out = _pd.DataFrame(
                    {
                        id_col: ids,
                        "n_tokens": n_toks,
                        "logit": logits,
                        "p": ps,
                    }
                )
                yield out

        return df.select(F.col(id_col), F.col(text_col)).mapInPandas(score, schema)
    if lane != "jvm":
        raise ValueError(f"unknown lane: {lane!r}")
    out = hashed_logit(
        df,
        text_col=text_col,
        id_col=id_col,
        n_buckets=model["n_buckets"],
        delimiter=delimiter,
        weight_fn=trained_weight_fn(model),
    )
    z = F.col("logit") + F.lit(bias)
    return out.select(
        F.col(id_col),
        "n_tokens",
        z.alias("logit"),
        (F.lit(1.0) / (F.lit(1.0) + F.exp(-z))).alias("p"),
    )


def logit_model_to_bytes(model: dict) -> bytes:
    """Serialize a trained model (little-endian: magic, n_buckets,
    bias, n_docs, weights int64[n])."""
    import struct

    head = struct.pack(
        "<4sqqq", b"HLG1", model["n_buckets"], model["bias"], model["n_docs"]
    )
    return head + np.ascontiguousarray(model["weights"], dtype="<i8").tobytes()


def logit_model_from_bytes(blob: bytes) -> dict:
    import struct

    magic, n, bias, n_docs = struct.unpack_from("<4sqqq", blob, 0)
    if magic != b"HLG1":
        raise ValueError("not a hashed-logit model blob")
    w = np.frombuffer(blob, dtype="<i8", offset=28, count=n).astype(np.int64)
    return {
        "weights": w,
        "bias": bias,
        "n_buckets": n,
        "n_docs": n_docs,
        "history": [],
    }


# ------------------------------------------------------------------- BM25


def _eq_lit(term: str):
    """Single-parameter equality closure for higher-order F.filter."""
    lit = F.lit(term)
    return lambda x: x == lit


def bm25_stats(
    df: DataFrame,
    terms: "list[str]",
    text_col: str = "text",
    delimiter: str = " ",
) -> dict:
    """Collect BM25 collection statistics for `terms` over a reference
    corpus — ONE partial-aggregated job, KBs to the driver.  Feed the
    returned dict to `bm25_score(stats=)` for frozen-snapshot scoring
    (the streaming face).  Returns {"n_docs", "total_tokens",
    "df": {term: doc_frequency}}."""
    terms = list(dict.fromkeys(terms))
    if not terms:
        raise ValueError("terms must be non-empty")
    toks = tokens_col(text_col, delimiter)
    base = df.select(toks.alias("__t"))
    has = F.col("__t").isNotNull()
    aggs = [
        F.count(F.when(has, 1)).cast("long").alias("__nd"),
        F.sum(F.when(has, F.size("__t")).otherwise(F.lit(0)))
        .cast("long")
        .alias("__tt"),
    ]
    for i, t in enumerate(terms):
        aggs.append(
            F.count(F.when(F.array_contains("__t", F.lit(t)), 1))
            .cast("long")
            .alias(f"__df{i}")
        )
    row = base.agg(*aggs).collect()[0]
    return {
        "n_docs": int(row["__nd"]),
        "total_tokens": int(row["__tt"]),
        "df": {t: int(row[f"__df{i}"]) for i, t in enumerate(terms)},
    }


def bm25_score(
    df: DataFrame,
    terms: "list[str]",
    text_col: str = "text",
    id_col: str = "doc_id",
    k1: float = 1.2,
    b: float = 0.75,
    delimiter: str = " ",
    idf_decimals: int = 6,
    stats: dict | None = None,
) -> DataFrame:
    """Okapi BM25 relevance of every document to ONE literal query.

    The keyword-side companion of the embedding retrieval lanes
    (`similarity.cosine_topk` etc.) and the standard data-selection
    signal for domain-targeted corpus curation ("keep documents
    relevant to these seed terms"): score(d) = sum over query terms of
    idf(t) * tf * (k1+1) / (tf + k1 * (1 - b + b * dl/avgdl)), with the
    Lucene-style non-negative idf = ln(1 + (N - df + 0.5)/(df + 0.5)).

    Two passes, zero data-row shuffles: pass 1 folds the collection
    stats (N, total token count, per-term document frequencies) into
    ONE partial-aggregated row — per-term df rides the same aggregate
    as `array_contains` count-ifs, so the corpus is scanned once
    however many terms the query has.  Pass 2 cross-joins that
    broadcast 1-row frame and computes tf and the score as pure
    scan-stage array algebra (no explode, no join, no Python).  This is
    the literal lane for a handful of terms; for query SETS or large
    vocabularies use `bm25_topk` (broadcast term table, exploded-token
    equi-join).

    Engine-neutral float discipline (module docstring): idf is the only
    libm term and is quantized to `idf_decimals` before use; everything
    else is integer-derived doubles combined in a FIXED order (the
    `terms` argument order, left fold), so the driver gate hash-matches
    DuckDB.  Zero-match docs score exactly 0.0.

    NULL-text rows keep their row with n_tokens = 0 and NULL bm25 ("no
    evidence", like `bigram_nll_bits`); they do not count toward N or
    avgdl.  Duplicate query terms are collapsed (first occurrence kept)
    so a term can't double-score.

    FROZEN mode (`stats=` from `bm25_stats`): the collection statistics
    come from a reference snapshot instead of the scored frame — the
    operator then touches only the current rows (no aggregation, no
    join: pure scan-stage algebra), so it is stateless and runs
    UNCHANGED on a structured stream, exactly like
    `percentile_enrich(digests=)`.  Bit-identical to the two-pass lane
    when the stats match (same integer-valued doubles, same op order).
    """
    if not terms:
        raise ValueError("terms must be non-empty")
    terms = list(dict.fromkeys(terms))
    toks = tokens_col(text_col, delimiter)
    base = df.select(F.col(id_col), toks.alias("__t"))
    has = F.col("__t").isNotNull()
    if stats is None:
        aggs = [
            F.count(F.when(has, 1)).cast("long").alias("__nd"),
            F.sum(F.when(has, F.size("__t")).otherwise(F.lit(0)))
            .cast("long")
            .alias("__tt"),
        ]
        for i, t in enumerate(terms):
            aggs.append(
                F.count(F.when(F.array_contains("__t", F.lit(t)), 1))
                .cast("long")
                .alias(f"__df{i}")
            )
        e = base.crossJoin(F.broadcast(base.agg(*aggs)))
        nd_long = F.col("__nd")
        tt_long = F.col("__tt")
        df_longs = [F.col(f"__df{i}") for i in range(len(terms))]
    else:
        missing = [t for t in terms if t not in stats["df"]]
        if missing:
            raise ValueError(f"stats['df'] missing terms: {missing}")
        # consistency: df > n_docs makes the idf log argument
        # non-positive -> silent NULL scores; fail loudly instead
        # (mismatched snapshot, e.g. stats from a smaller corpus)
        if int(stats["n_docs"]) < 0 or int(stats["total_tokens"]) < 0:
            raise ValueError(
                f"inconsistent stats: n_docs={stats['n_docs']} "
                f"total_tokens={stats['total_tokens']} must be >= 0"
            )
        over = {
            t: int(stats["df"][t])
            for t in terms
            if int(stats["df"][t]) > int(stats["n_docs"])
        }
        if over:
            raise ValueError(
                f"inconsistent stats snapshot: df > n_docs="
                f"{stats['n_docs']} for terms {over}"
            )
        e = base
        nd_long = F.lit(int(stats["n_docs"])).cast("long")
        tt_long = F.lit(int(stats["total_tokens"])).cast("long")
        df_longs = [
            F.lit(int(stats["df"][t])).cast("long") for t in terms
        ]
    nd = nd_long.cast("double")
    # ANSI-safe: an all-NULL-text corpus has __nd == 0; the guard value
    # is never read (every row takes the NULL-text branch below)
    avgdl = F.when(nd_long > 0, tt_long.cast("double") / nd).otherwise(
        F.lit(1.0)
    )
    dl = F.size("__t").cast("double")
    score = None
    for i, t in enumerate(terms):
        dfc = df_longs[i].cast("double")
        idf = F.round(
            F.log((nd - dfc + 0.5) / (dfc + 0.5) + 1.0), idf_decimals
        )
        # NB: the closure must stay single-parameter — F.filter treats a
        # 2-arg lambda (even via a default arg) as the (element, index)
        # form and binds the second parameter to the INDEX column
        tf = F.size(F.filter("__t", _eq_lit(t))).cast("double")
        # tf > 0 implies dl >= 1 and avgdl > 0, so the denominator is
        # strictly positive even at b = 1; tf == 0 contributes an exact
        # 0.0 (adding +0.0 leaves the running fold bit-identical, so
        # this lane agrees ulp-for-ulp with bm25_topk's matched-terms
        # fold when `terms` is sorted)
        term_s = F.when(
            tf > 0,
            idf
            * (tf * (k1 + 1.0))
            / (tf + k1 * (1.0 - b + b * dl / avgdl)),
        ).otherwise(F.lit(0.0))
        score = term_s if score is None else score + term_s
    return e.select(
        F.col(id_col),
        F.when(has, F.size("__t")).otherwise(F.lit(0))
        .cast("long")
        .alias("n_tokens"),
        F.when(has, score).alias("bm25"),
    )


def bm25_topk(
    df: DataFrame,
    queries: DataFrame,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_col: str = "query_id",
    terms_col: str = "terms",
    k1: float = 1.2,
    b: float = 0.75,
    delimiter: str = " ",
    idf_decimals: int = 6,
) -> DataFrame:
    """Top-k BM25 retrieval for a SET of queries (query_col, terms
    array<string>) — the inverted-index shape, built as one corpus scan
    plus narrow-row aggregations.

    Plan (100 TB story): the distinct term vocabulary of the query set
    is tiny next to the corpus, so it BROADCASTS; corpus tokens explode
    in the scan stage and the broadcast hash equi-join discards every
    non-query token before anything shuffles.  The only wide movement
    is the (id, term, tf) partial-aggregated count — bytes scale with
    matched tokens, never with text.  Per-term document frequencies
    re-aggregate those same narrow rows (Spark reuses the tf Exchange);
    both df and the 1-row collection stats come back as broadcasts.
    Final per-(query, doc) scores fold per-term contributions in
    SORTED-term order (deterministic FP order in both engines), and
    top-k is a per-query row_number window tie-broken by ascending doc
    id.  For astronomically hot queries (a term matching most of the
    corpus) the per-query window sort dominates — cap candidates
    upstream (e.g. score against a `quota_by_key`-balanced slice) or
    raise k-phase two-level top-k the way `ann_bruteforce_topk` does.

    Retrieval semantics: only documents matching >= 1 query term appear
    (zero-match docs would all tie at 0.0); queries with no matching
    docs are absent.  NULL-text rows can't match.  NULL / empty-string
    terms never match any token (`tokens_col` drops empties).  Terms
    are deduped per query via array_distinct.

    Scores are bit-identical to `bm25_score(df, sorted(terms))` on the
    matched docs (see the +0.0 note there) — pytest pins the
    differential; the driver gate hash-matches a windowed DuckDB oracle.
    """
    toks = tokens_col(text_col, delimiter)
    base = df.select(F.col(id_col), toks.alias("__t")).filter(
        F.col("__t").isNotNull()
    )
    stats = base.agg(
        F.count(F.lit(1)).cast("long").alias("__nd"),
        F.sum(F.size("__t")).cast("long").alias("__tt"),
    )
    # distinct over (query, term) PAIRS: array_distinct only dedups
    # within one row — a query_id spanning multiple rows of `queries`
    # would otherwise double-count its shared terms in the score fold
    qterms = queries.select(
        F.col(query_col),
        F.explode(F.array_distinct(F.col(terms_col))).alias("__term"),
    ).distinct()
    term_table = qterms.select("__term").distinct()
    tf = (
        base.select(
            F.col(id_col),
            F.size("__t").cast("double").alias("__dl"),
            F.explode("__t").alias("__term"),
        )
        .join(F.broadcast(term_table), "__term")
        .groupBy(id_col, "__dl", "__term")
        .agg(F.count(F.lit(1)).cast("double").alias("__tf"))
    )
    dfreq = tf.groupBy("__term").agg(
        F.count(F.lit(1)).cast("long").alias("__df")
    )
    scored = (
        tf.join(F.broadcast(dfreq), "__term")
        .join(F.broadcast(qterms), "__term")
        .crossJoin(F.broadcast(stats))
    )
    nd = F.col("__nd").cast("double")
    avgdl = F.when(
        F.col("__nd") > 0, F.col("__tt").cast("double") / nd
    ).otherwise(F.lit(1.0))
    dfc = F.col("__df").cast("double")
    idf = F.round(F.log((nd - dfc + 0.5) / (dfc + 0.5) + 1.0), idf_decimals)
    s = (
        idf
        * (F.col("__tf") * (k1 + 1.0))
        / (F.col("__tf") + k1 * (1.0 - b + b * F.col("__dl") / avgdl))
    )
    per_qd = scored.groupBy(query_col, id_col).agg(
        F.aggregate(
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct(F.col("__term"), s.alias("__s")))
                ),
                lambda x: x["__s"],
            ),
            F.lit(0.0),
            lambda a, x: a + x,
        ).alias("bm25")
    )
    w = Window.partitionBy(query_col).orderBy(
        F.col("bm25").desc(), F.col(id_col).asc()
    )
    return (
        per_qd.select(
            F.col(query_col),
            F.col(id_col),
            F.col("bm25"),
            F.row_number().over(w).alias("rank"),
        )
        .filter(F.col("rank") <= k)
    )
