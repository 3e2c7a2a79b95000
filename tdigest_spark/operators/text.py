"""Text-analysis operators for web-corpus pipelines.

Everything here is *declarative*: pure `pyspark.sql.functions` column
expressions (JVM-side, whole-stage-codegen'd), no Python UDFs.  That is
deliberate — at 100 TB these run inside the parquet scan stage with
predicate pushdown and column pruning intact, and the semantics are
mirror-expressible in ANSI SQL for oracle checking.

Operators:
- tokenize / token_stats: token counting + basic quality signals
- language_id: marker-stopword n-gram heuristic (broadcast join + argmax)
- quality_score: composite document-quality heuristics
- content_fingerprint: order-insensitive bag-of-words fingerprint (md5)
- minhash_fingerprint: min-over-shingles md5 fingerprint (rolling-hash
  style document fingerprint; also the primitive behind MinHash dedup)

Design note: all hashing is md5-of-string because md5 is bit-identical
across Spark, DuckDB, and Python — which makes every operator exactly
oracle-checkable (no engine-specific hash like xxhash64 in semantics;
xxhash64 is reserved for physical concerns like salting).
"""

from __future__ import annotations

from typing import Mapping, Sequence

from pyspark.sql import Column, DataFrame, functions as F

# Default language marker stopwords: high-frequency function words that the
# heuristic counts per candidate language. Ties broken by language code.
DEFAULT_MARKERS: Mapping[str, Sequence[str]] = {
    "en": ("the", "and", "of", "to", "in", "is", "that", "with"),
    "de": ("der", "die", "und", "das", "ist", "nicht", "mit", "ein"),
    "es": ("el", "la", "que", "y", "en", "los", "una", "por"),
    "fr": ("le", "la", "les", "des", "est", "une", "dans", "pour"),
    "zh": ("de", "shi", "le", "zai", "you", "wo", "ta", "zhe"),
}

DEFAULT_STOPWORDS: Sequence[str] = tuple(
    w for ws in DEFAULT_MARKERS.values() for w in ws
)


def tokens_col(text_col: Column | str, delimiter: str = " ") -> Column:
    """Split into tokens on a literal delimiter, dropping empty tokens.

    A literal split (not a regex) so DuckDB's ``string_split`` produces
    the identical array.  F.split treats its pattern as a Java regex, so
    the delimiter is regex-escaped here — without that, delimiter="."
    would split between every character and "|" between every pair.
    (re.escape leaves " " untouched, so the default path is unchanged.)
    """
    import re as _re

    c = F.col(text_col) if isinstance(text_col, str) else text_col
    pat = F.lit(_re.escape(delimiter)).cast("string")
    return F.filter(F.split(c, pat, -1), lambda t: t != "")


def token_stats(
    df: DataFrame,
    text_col: str = "text",
    stopwords: Sequence[str] = DEFAULT_STOPWORDS,
) -> DataFrame:
    """Append integer token statistics: n_tokens, n_stopwords, n_distinct
    tokens, max token length. All built-in array functions."""
    toks = tokens_col(text_col)
    sw = F.array(*[F.lit(w) for w in sorted(set(stopwords))])
    return (
        df.withColumn("__toks", toks)
        .withColumn("n_tokens", F.size("__toks").cast("long"))
        .withColumn(
            "n_stopwords",
            F.size(F.filter("__toks", lambda t: F.array_contains(sw, t))).cast("long"),
        )
        .withColumn("n_distinct_tokens", F.size(F.array_distinct("__toks")).cast("long"))
        .withColumn(
            "max_token_len",
            F.array_max(F.transform("__toks", lambda t: F.length(t))).cast("long"),
        )
        .drop("__toks")
    )


def quality_score(
    df: DataFrame,
    text_col: str = "text",
    stopwords: Sequence[str] = DEFAULT_STOPWORDS,
) -> DataFrame:
    """Composite quality heuristics (Gopher/C4-style signals, simplified):

    - stopword_ratio  = n_stopwords / n_tokens
    - mean_token_len  = (chars - (n_tokens-1)) / n_tokens  (single-space text)
    - alpha_ratio     = alphabetic chars / chars

    Ratios are exact rationals of integers so they divide identically in
    any IEEE engine.  Zero-token / zero-char documents (empty or
    whitespace-only text) get NULL ratios — unguarded, the 0/0 double
    division ABORTS the whole job under Spark 4's default ANSI mode,
    so one empty-extraction page would kill a corpus run.
    """
    out = token_stats(df, text_col, stopwords)
    nch = F.length(text_col).cast("long")
    alpha = (
        F.length(F.regexp_replace(F.col(text_col), "[^a-zA-Z]", "")).cast("long")
    )
    ntok = F.col("n_tokens")
    return (
        out.withColumn("n_chars_text", nch)
        .withColumn(
            "stopword_ratio",
            F.when(ntok > 0, F.col("n_stopwords").cast("double") / ntok),
        )
        .withColumn(
            "alpha_ratio", F.when(nch > 0, alpha.cast("double") / nch)
        )
        .withColumn(
            "mean_token_len",
            F.when(
                ntok > 0,
                (nch - (ntok - F.lit(1))).cast("double") / ntok,
            ),
        )
    )


def language_id(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    markers: Mapping[str, Sequence[str]] = DEFAULT_MARKERS,
) -> DataFrame:
    """Marker-stopword language ID.

    Plan shape: explode tokens -> broadcast join a tiny (token, lang)
    marker table -> count hits per (doc, lang) -> argmax by
    (hits desc, lang asc).  The marker table is a literal local relation,
    so Catalyst broadcasts it; the only shuffle is the per-doc groupBy,
    whose key cardinality is n_docs (no skew).

    Returns (id_col, pred_lang, n_hits); docs with zero marker hits get
    pred_lang='und', n_hits=0.
    """
    from pyspark.sql import Window

    spark = df.sparkSession
    pairs = [(w, lang) for lang, ws in markers.items() for w in ws]
    marker_df = spark.createDataFrame(pairs, "token string, cand_lang string")

    toks = df.select(F.col(id_col), F.explode(tokens_col(text_col)).alias("token"))
    hits = (
        toks.join(F.broadcast(marker_df), "token")
        .groupBy(id_col, "cand_lang")
        .agg(F.count("*").alias("n_hits"))
    )
    w = Window.partitionBy(id_col).orderBy(F.desc("n_hits"), F.asc("cand_lang"))
    best = (
        hits.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") == 1)
        .select(id_col, F.col("cand_lang").alias("pred_lang"), "n_hits")
    )
    return (
        df.select(id_col)
        .join(best, id_col, "left")
        .select(
            id_col,
            F.coalesce("pred_lang", F.lit("und")).alias("pred_lang"),
            F.coalesce("n_hits", F.lit(0)).cast("long").alias("n_hits"),
        )
    )


def content_fingerprint(
    df: DataFrame, text_col: str = "text", out_col: str = "fingerprint"
) -> DataFrame:
    """Order-insensitive document fingerprint: md5 over the sorted distinct
    token bag. Two documents that are token-set permutations of each other
    collide — a cheap canonicalization-level dedup key."""
    canon = F.concat_ws(" ", F.array_sort(F.array_distinct(tokens_col(text_col))))
    return df.withColumn(out_col, F.md5(canon))


def shingles_from_tokens(toks: Column | str, k: int = 3) -> Column:
    """Word k-gram shingles from a *materialized* token-array column.

    IMPORTANT: `toks` must be a bound column from a prior projection, not
    an inline `tokens_col(...)` expression — Catalyst inlines lambda-free
    variables, so an inline token expression would be re-evaluated once
    per shingle index (O(tokens²) per doc; measured 50x slower on real
    documents).  Documents shorter than k tokens produce their whole
    text as the one shingle.
    """
    toks = F.col(toks) if isinstance(toks, str) else toks
    n = F.size(toks)
    grams = F.transform(
        F.sequence(F.lit(1), F.greatest(n - F.lit(k - 1), F.lit(1))),
        lambda i: F.concat_ws(" ", F.slice(toks, i, k)),
    )
    return F.when(n >= k, grams).otherwise(F.array(F.concat_ws(" ", toks)))


def shingles_col(text_col: Column | str, k: int = 3) -> Column:
    """Inline word-k-gram shingles straight from a text column.

    Convenience for small data/tests ONLY — the token split is inlined
    into the per-index lambda, making it O(tokens²) per document.  Hot
    paths must project `tokens_col(text)` first and use
    `shingles_from_tokens` (see minhash_signatures / jaccard_pairs)."""
    return shingles_from_tokens(tokens_col(text_col), k)


def minhash_fingerprint(
    df: DataFrame, text_col: str = "text", k: int = 3, out_col: str = "minhash"
) -> DataFrame:
    """Rolling-shingle document fingerprint: lexicographic min of
    md5(shingle) over word k-grams.  This is a 1-permutation MinHash — the
    primitive the LSH dedup stacks per-lane (operators.dedup).  Tokens are
    materialized in their own projection (see shingles_from_tokens)."""
    with_toks = df.withColumn("__mfp_toks", tokens_col(text_col))
    return with_toks.withColumn(
        out_col,
        F.array_min(F.transform(shingles_from_tokens(F.col("__mfp_toks"), k), F.md5)),
    ).drop("__mfp_toks")


# BPE-style pre-tokenizer pattern (GPT-2 family), constrained to the
# regex subset Java regex and RE2 (DuckDB) evaluate identically: no
# lookaheads, Unicode categories only (\p{L}, \p{N}), leftmost-first
# alternation.  \s differs between the engines only on U+000B — absent
# from any text corpus this pipeline ingests.
BPE_TOKEN_PATTERN = r"'(?:s|t|re|ve|m|ll|d)| ?\p{L}+| ?\p{N}+| ?[^\s\p{L}\p{N}]+|\s+"


def regex_token_stats(
    df: DataFrame,
    text_col: str = "text",
    pattern: str = BPE_TOKEN_PATTERN,
) -> DataFrame:
    """BPE-ish token counting: the GPT-2 pre-tokenizer split as a pure
    JVM regexp, complementing the whitespace counts of token_stats.

    Appends integer columns (all exactly oracle-expressible):
    - n_bpe_tokens:    total pre-tokenizer matches (whitespace runs incl.)
    - n_bpe_words:     matches that are not pure whitespace — the count a
                       tokenizer's vocabulary would actually see
    - n_bpe_alpha:     word matches containing a letter
    - bpe_chars_per_token: length(text) / n_bpe_words (double; NULL when
                       the text has no word tokens)

    Runs inside whole-stage codegen in the scan stage; no UDF, no shuffle.
    """
    toks = F.regexp_extract_all(F.col(text_col), F.lit(pattern), 0)
    words = F.filter(toks, lambda t: ~t.rlike(r"^\s+$"))
    return (
        df.withColumn("__bpe", toks)
        .withColumn("__bpe_w", words)
        .withColumn("n_bpe_tokens", F.size("__bpe").cast("long"))
        .withColumn("n_bpe_words", F.size("__bpe_w").cast("long"))
        .withColumn(
            "n_bpe_alpha",
            F.size(F.filter("__bpe_w", lambda t: t.rlike(r"\p{L}"))).cast("long"),
        )
        .withColumn(
            "bpe_chars_per_token",
            F.when(
                F.col("n_bpe_words") > 0,
                F.length(text_col).cast("double") / F.col("n_bpe_words"),
            ),
        )
        .drop("__bpe", "__bpe_w")
    )


def repetition_stats(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Gopher-style repetition signals — the strongest single predictor
    of boilerplate/SEO spam in web corpora:

    - dup_token_ratio: 1 - distinct_tokens/tokens (token-level
      repetitiveness; integer ratio)
    - top_bigram_frac: occurrences of the most frequent word bigram /
      total bigrams (template/keyword-stuffing detector)

    Returns the NARROW frame (id_col, dup_token_ratio, top_bigram_frac),
    one row per input row — the `language_id` shape.  Documents whose
    text is NULL keep their row with NULL metrics (left join back onto
    the id projection; the operator never changes cardinality).

    Plan: both metrics ride ONE pipeline — a narrow (id, text)
    projection tokenizes in the scan stage, dup_token_ratio (linear
    array algebra) travels alongside the exploded bigrams, and a single
    partial-aggregating groupBy chain computes count per (doc, bigram)
    then max/sum per doc.  The total-bigram denominator is sum(count),
    so no frame is ever joined back through the corpus: the only join is
    (id) ⨝ (id, two doubles).  The text column never crosses a shuffle —
    asserted in test_plans.  The tempting no-shuffle mode count
    (`transform(array_distinct(bi), b -> size(filter(bi, = b)))`) is
    O(distinct x n) per document — quadratic in doc length; measured 7s
    for 5k docs and unusable on 10k-token pages.  Exact integer
    rationals, so the columns hash-match any SQL engine.
    """
    narrow = df.select(F.col(id_col), F.col(text_col)).filter(
        F.col(text_col).isNotNull()
    )
    with_toks = narrow.withColumn("__rs_toks", tokens_col(text_col))
    base = with_toks.select(
        F.col(id_col),
        # zero-token docs (empty/whitespace text) get NULL, not an
        # ANSI-mode 0/0 job abort
        F.when(
            F.size("__rs_toks") > 0,
            F.lit(1.0)
            - F.size(F.array_distinct("__rs_toks")).cast("double")
            / F.size("__rs_toks"),
        ).alias("__dtr"),
        shingles_from_tokens(F.col("__rs_toks"), 2).alias("__rs_bi"),
    )
    # explode_OUTER: not for semantics (the bigram array is never empty
    # when text is non-null) but to suppress InferFiltersFromGenerate,
    # which would push a `size(bigrams) > 0` constraint below the token
    # projection — inlining the token split into the per-index shingle
    # lambda, the O(tokens²)-per-doc pitfall this module documents.
    metrics = (
        base.select(
            F.col(id_col), "__dtr", F.explode_outer("__rs_bi").alias("__bg")
        )
        .groupBy(id_col, "__bg")
        .agg(F.count("*").alias("__c"), F.first("__dtr").alias("__dtr1"))
        .groupBy(id_col)
        .agg(
            F.first("__dtr1").alias("dup_token_ratio"),
            (F.max("__c").cast("double") / F.sum("__c")).alias(
                "top_bigram_frac"
            ),
        )
    )
    return df.select(id_col).join(metrics, id_col, "left")


def _strict_ngrams(toks: Column, n: int) -> Column:
    """Strict word n-grams from a *bound* token-array column: documents
    with fewer than n tokens yield an EMPTY array (unlike
    shingles_from_tokens, which falls back to the whole text — right for
    dedup fingerprints, wrong for repetition statistics where a short
    doc simply has no n-grams).  `greatest(..., 1)` keeps the sequence
    ascending on the untaken branch — sequence(1, 0) would descend."""
    cnt = F.greatest(F.size(toks) - F.lit(n - 1), F.lit(1))
    grams = F.transform(
        F.sequence(F.lit(1), cnt),
        lambda i: F.concat_ws(" ", F.slice(toks, i, n)),
    )
    return F.when(F.size(toks) >= n, grams).otherwise(
        F.array().cast("array<string>")
    )


#: Gopher repetition output column order (given top_ns / dup_ns).
def _gopher_cols(top_ns: Sequence[int], dup_ns: Sequence[int]) -> list[str]:
    return (
        ["dup_line_frac", "dup_line_char_frac"]
        + [f"top_{n}gram_char_frac" for n in top_ns]
        + [f"dup_{n}gram_char_frac" for n in dup_ns]
    )


def gopher_repetition(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    top_ns: Sequence[int] = (2, 3, 4),
    dup_ns: Sequence[int] = (5, 10),
    line_sep: str = "\n",
    lane: str = "jvm",
) -> DataFrame:
    """The full Gopher repetition-signal family (Rae et al. 2021, table
    A1) — the quality-filter battery `repetition_stats` gives the first
    two members of:

    - dup_line_frac:      (lines - distinct lines) / lines
    - dup_line_char_frac: chars of lines occurring >= 2x / chars of all
      lines (char mass counts every occurrence)
    - top_{n}gram_char_frac (n in top_ns): chars of the most frequent
      word n-gram x its occurrence count / document chars.  Most
      frequent = max by (count, then gram) — the deterministic
      tie-break both engines share via max(struct).
    - dup_{n}gram_char_frac (n in dup_ns): char mass of n-grams
      occurring >= 2x / char mass of all n-grams.  Overlap-agnostic by
      design (each sliding occurrence counts its full chars): unlike
      the paper's sequential skip-ahead accounting it is expressible as
      pure grouped aggregation in any SQL engine, bounded in [0, 1],
      and monotone in repetition — the property a threshold filter
      needs.

    Returns the NARROW frame (id_col, <metrics>) with exactly one row
    per input row; NULL-text docs keep their row with NULL metrics, and
    a doc too short for some n has NULL for that n's metrics (it has no
    such n-grams — distinct from 0.0, which means "has them, none
    repeated").  All ratios are single IEEE divisions of exact integers,
    so every column hash-matches a SQL oracle.

    Lanes:
    - lane="jvm" (default, oracle lane): ONE tagged explode — every
      (n, gram) instance plus the line stream ride a single
      generate — then a partial-aggregating groupBy(id, n, gram) counts
      within-doc occurrences (map-side combine collapses repeats before
      the exchange, so the shuffle carries ~distinct grams per doc),
      groupBy(id, n) folds per-size masses, and a conditional agg
      pivots the fixed n set to columns.  The raw text column never
      crosses an Exchange.
    - lane="pandas": all metrics are WITHIN-document pure functions, so
      one Arrow-batched mapInPandas scan computes the whole battery
      with ZERO shuffle — the production shape at corpus scale.  Output
      is value-identical to the jvm lane (same integer counts, same
      IEEE divisions; asserted in tests).

    The in-array JVM alternative (count each distinct gram with a
    filter lambda) is O(distinct x n) per doc — the documented
    quadratic trap (see shingles_from_tokens) — which is exactly why
    the jvm lane pays one explode instead.
    """
    top_ns = tuple(top_ns)
    dup_ns = tuple(dup_ns)
    if any(n < 2 for n in (*top_ns, *dup_ns)):
        raise ValueError("n-gram sizes must be >= 2")
    if len(set(top_ns)) != len(top_ns) or len(set(dup_ns)) != len(dup_ns):
        raise ValueError("duplicate n in top_ns/dup_ns")
    out_cols = _gopher_cols(top_ns, dup_ns)
    if lane == "pandas":
        return _gopher_repetition_pandas(
            df, text_col, id_col, top_ns, dup_ns, line_sep, out_cols
        )
    if lane != "jvm":
        raise ValueError(f"unknown lane {lane!r} (jvm|pandas)")
    import re as _re

    ns = sorted(set(top_ns) | set(dup_ns))
    narrow = df.select(F.col(id_col), F.col(text_col)).filter(
        F.col(text_col).isNotNull()
    )
    # Bind tokens/lines in their own projection (O(n²) inline pitfall).
    bound = narrow.select(
        F.col(id_col),
        F.length(text_col).cast("long").alias("__nch"),
        tokens_col(text_col).alias("__toks"),
        F.filter(
            F.split(F.col(text_col), F.lit(_re.escape(line_sep)), -1),
            lambda l: l != "",
        ).alias("__lines"),
    )
    def _tag(tag_n: int):
        # NOTE: must stay a ONE-parameter lambda — F.transform treats a
        # two-parameter lambda as (element, index), so the idiomatic
        # `lambda g, n=n:` default-arg binding silently rebinds n to the
        # array POSITION.
        return lambda g: F.struct(F.lit(tag_n).alias("n"), g.alias("g"))

    streams = [F.transform(F.col("__lines"), _tag(0))] + [
        F.transform(_strict_ngrams(F.col("__toks"), n), _tag(n)) for n in ns
    ]
    tagged = bound.select(
        F.col(id_col), "__nch", F.concat(*streams).alias("__all")
    )
    # explode_OUTER: keeps no-gram docs as a null row (harmlessly folded
    # to NULL metrics below) and — the real reason — suppresses
    # InferFiltersFromGenerate pushing a size()>0 constraint that would
    # inline the token split into the per-index lambdas (the O(tokens²)
    # trap this module documents).
    inst = tagged.select(
        F.col(id_col), "__nch", F.explode_outer("__all").alias("__gr")
    ).select(
        F.col(id_col), "__nch", F.col("__gr.n").alias("__n"),
        F.col("__gr.g").alias("__g"),
    )
    counted = inst.groupBy(id_col, "__nch", "__n", "__g").agg(
        F.count("*").alias("__c")
    )
    chlen = F.length("__g").cast("long")
    per_n = counted.groupBy(id_col, "__nch", "__n").agg(
        F.sum("__c").alias("__total"),
        F.count("*").alias("__distinct"),
        F.max(F.struct(F.col("__c").alias("c"), F.col("__g").alias("g"))).alias(
            "__top"
        ),
        F.sum(chlen * F.col("__c")).alias("__mass_all"),
        F.sum(
            F.when(F.col("__c") >= 2, chlen * F.col("__c")).otherwise(F.lit(0))
        ).alias("__mass_dup"),
    )
    aggs = [
        F.max(
            F.when(
                F.col("__n") == 0,
                (F.col("__total") - F.col("__distinct")).cast("double")
                / F.col("__total"),
            )
        ).alias("dup_line_frac"),
        F.max(
            F.when(
                F.col("__n") == 0,
                F.col("__mass_dup").cast("double") / F.col("__mass_all"),
            )
        ).alias("dup_line_char_frac"),
    ]
    for n in top_ns:
        aggs.append(
            F.max(
                F.when(
                    F.col("__n") == n,
                    (F.length("__top.g").cast("long") * F.col("__top.c"))
                    .cast("double")
                    / F.col("__nch"),
                )
            ).alias(f"top_{n}gram_char_frac")
        )
    for n in dup_ns:
        aggs.append(
            F.max(
                F.when(
                    F.col("__n") == n,
                    F.col("__mass_dup").cast("double") / F.col("__mass_all"),
                )
            ).alias(f"dup_{n}gram_char_frac")
        )
    metrics = per_n.groupBy(id_col).agg(*aggs)
    return df.select(id_col).join(metrics, id_col, "left").select(
        id_col, *out_cols
    )


def _gopher_repetition_pandas(
    df: DataFrame,
    text_col: str,
    id_col: str,
    top_ns: tuple[int, ...],
    dup_ns: tuple[int, ...],
    line_sep: str,
    out_cols: list[str],
) -> DataFrame:
    """Zero-shuffle production lane for gopher_repetition: per-doc
    Counter passes inside one mapInPandas scan.  Same integer counts and
    the same single IEEE divisions as the jvm lane, so the two lanes are
    value-identical (tests assert exact equality)."""
    from collections import Counter

    import pandas as pd

    id_field = df.select(id_col).schema.fields[0]
    schema_parts = [f"`{id_col}` {id_field.dataType.simpleString()}"] + [
        f"{c} double" for c in out_cols
    ]
    out_schema = ", ".join(schema_parts)
    top_ns_l, dup_ns_l = list(top_ns), list(dup_ns)
    ns = sorted(set(top_ns_l) | set(dup_ns_l))

    def _doc_metrics(text):
        if text is None:
            return [None] * len(out_cols)
        vals: list = []
        lines = [l for l in text.split(line_sep) if l != ""]
        if lines:
            lc = Counter(lines)
            total = len(lines)
            mass_all = sum(len(g) * c for g, c in lc.items())
            mass_dup = sum(len(g) * c for g, c in lc.items() if c >= 2)
            vals.append(float(total - len(lc)) / total)
            vals.append(float(mass_dup) / mass_all)
        else:
            vals.extend([None, None])
        toks = [t for t in text.split(" ") if t != ""]
        nch = len(text)
        per_n: dict[int, Counter] = {}
        for n in ns:
            if len(toks) >= n:
                per_n[n] = Counter(
                    " ".join(toks[i : i + n])
                    for i in range(len(toks) - n + 1)
                )
        for n in top_ns_l:
            c = per_n.get(n)
            if not c:
                vals.append(None)
                continue
            # max by (count, gram) — the jvm/SQL max(struct) tie-break.
            cnt, g = max((v, k) for k, v in c.items())
            vals.append(float(len(g) * cnt) / nch)
        for n in dup_ns_l:
            c = per_n.get(n)
            if not c:
                vals.append(None)
                continue
            mass_all = sum(len(g) * v for g, v in c.items())
            mass_dup = sum(len(g) * v for g, v in c.items() if v >= 2)
            vals.append(float(mass_dup) / mass_all)
        return vals

    def _scan(batches):
        for pdf in batches:
            rows = [_doc_metrics(t) for t in pdf[text_col]]
            out = pd.DataFrame(rows, columns=out_cols, dtype="float64")
            out.insert(0, id_col, pdf[id_col].values)
            yield out

    return df.select(id_col, text_col).mapInPandas(_scan, out_schema)


def chunk_tokens(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    budget: int = 512,
    overlap: int = 0,
) -> DataFrame:
    """Context-window chunking: split each document's token stream into
    consecutive windows of at most `budget` tokens (`overlap` tokens of
    lookback between adjacent windows — 0 for training shards, >0 for
    retrieval corpora), the standard preprocessing step before
    tokenizer/embedding stages with a fixed sequence length.

    Returns one row per (document, window): (id_col, chunk_idx long,
    n_chunk_tokens long, chunk_text).  Documents with NULL, empty, or
    whitespace-only text emit no chunks (there is nothing to pack);
    every other document's tokens are covered exactly once (plus the
    overlap lookback).

    Plan: tokens are bound in their own projection (the O(tokens²)
    inline-lambda pitfall — see shingles_from_tokens), the window
    structs are built with sequence+transform+slice JVM-side, and ONE
    posexplode emits the rows — all inside the scan stage, shuffle-free
    and linear in text bytes at any scale.
    """
    if budget < 1:
        raise ValueError("budget must be >= 1")
    if not 0 <= overlap < budget:
        raise ValueError("overlap must be in [0, budget)")
    step = budget - overlap
    with_toks = (
        df.select(F.col(id_col), F.col(text_col))
        .filter(F.col(text_col).isNotNull())
        .select(F.col(id_col), tokens_col(text_col).alias("__ct"))
        .filter(F.size("__ct") > 0)
    )
    n = F.size("__ct")
    # number of windows: 1 + ceil((n - budget) / step) for n > budget
    n_chunks = F.when(
        n <= budget, F.lit(1)
    ).otherwise(
        F.lit(1) + F.ceil((n - F.lit(budget)).cast("double") / F.lit(step)).cast("int")
    )
    chunks = F.transform(
        F.sequence(F.lit(0), n_chunks - 1),
        lambda i: F.concat_ws(" ", F.slice("__ct", i * step + 1, budget)),
    )
    return (
        with_toks.select(
            F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk_text")
        )
        .select(
            F.col(id_col),
            F.col("chunk_idx").cast("long").alias("chunk_idx"),
            F.size(
                F.filter(F.split("chunk_text", " ", -1), lambda t: t != "")
            ).cast("long").alias("n_chunk_tokens"),
            "chunk_text",
        )
    )


# ------------------------------------------------------------------ PII

# Patterns constrained to the Java∩RE2 regex subset (no lookarounds, no
# backreferences, ASCII classes, leftmost-greedy quantifiers — identical
# match semantics in Spark's Java regex and DuckDB's RE2), so redaction
# and counts are exactly oracle-checkable.
PII_EMAIL_PATTERN = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_IPV4_PATTERN = r"\b(?:[0-9]{1,3}\.){3}[0-9]{1,3}\b"
PII_PHONE_PATTERN = r"\(?[0-9]{3}\)?[-. ][0-9]{3}[-. ][0-9]{4}\b"


def pii_redact(
    df: DataFrame,
    text_col: str = "text",
    out_col: str = "text_redacted",
) -> DataFrame:
    """C4/Dolma-style PII scrub: emails, IPv4 addresses, and US-style
    phone numbers replaced with typed placeholder tokens, plus per-doc
    match counts (the audit signal a curation run reports).

    Appends: n_emails, n_ipv4, n_phones (long; NULL for NULL text) and
    `out_col` (the redacted text).

    Categories are counted and redacted SEQUENTIALLY — emails first, then
    IPv4 over the email-redacted string, then phones over the IP-redacted
    string — so a digit run can never be double-counted as both an IP and
    a phone (an email's host part is also never counted as a bare IP).
    Each stage is bound in its own projection; all stages are plain
    regexp_replace / regexp_extract_all column expressions that run
    inside whole-stage codegen in the scan stage — no UDF, no shuffle,
    and the text column never leaves the executor that scanned it (the
    100 TB shape: redaction is free relative to the parquet decode).

    Deliberately NOT here: names/addresses (need NER models — out of
    scope for a regex pass and never oracle-exact) and aggressive phone
    variants (international free-form numbers collide with dates, prices
    and ids; a conservative scrub beats a corpus-mangling one).
    """
    c = F.col(text_col)
    n_em = F.size(F.regexp_extract_all(c, F.lit(PII_EMAIL_PATTERN), 0))
    out = df.withColumn("n_emails", n_em.cast("long")).withColumn(
        "__r1", F.regexp_replace(c, PII_EMAIL_PATTERN, "<EMAIL>")
    )
    n_ip = F.size(F.regexp_extract_all(F.col("__r1"), F.lit(PII_IPV4_PATTERN), 0))
    out = out.withColumn("n_ipv4", n_ip.cast("long")).withColumn(
        "__r2", F.regexp_replace(F.col("__r1"), PII_IPV4_PATTERN, "<IP>")
    )
    n_ph = F.size(F.regexp_extract_all(F.col("__r2"), F.lit(PII_PHONE_PATTERN), 0))
    return (
        out.withColumn("n_phones", n_ph.cast("long"))
        .withColumn(out_col, F.regexp_replace(F.col("__r2"), PII_PHONE_PATTERN, "<PHONE>"))
        .drop("__r1", "__r2")
    )


# ----------------------------------------------------------------- lines

# Substrings that mark navigation/boilerplate lines in crawl text (C4's
# "javascript" rule and friends).  Matched case-insensitively as plain
# substrings — no regex, so the oracle is a literal contains().
DEFAULT_LINE_BLOCKLIST: Sequence[str] = (
    "javascript",
    "cookie",
    "privacy policy",
    "terms of use",
)


def clean_lines(
    df: DataFrame,
    text_col: str = "text",
    min_words: int = 3,
    require_terminal_punct: bool = True,
    blocklist: Sequence[str] = DEFAULT_LINE_BLOCKLIST,
    out_col: str = "clean_text",
) -> DataFrame:
    """C4-style line-level cleaning: split the document on newlines, keep
    only lines that (a) have at least `min_words` whitespace tokens,
    (b) end in terminal punctuation (. ! ?) when `require_terminal_punct`,
    and (c) contain no blocklist substring (case-insensitive), then
    reassemble the survivors with newlines.

    Appends: n_lines, n_lines_kept (long) and `out_col`.  NULL text stays
    NULL across all three; a document whose every line is dropped gets
    clean_text = '' (so the caller's min-length gate removes it, matching
    C4's behaviour).

    Everything is array algebra over one split — filter/size/array_join
    inside whole-stage codegen in the scan stage, per-document and
    shuffle-free, so the operator costs one pass over the text bytes at
    any scale.  The blocklist is unrolled into literal contains() tests
    (it is a config constant, not data), which keeps the oracle SQL
    engine-neutral and lets Catalyst constant-fold the lowercasing.
    """
    lines = F.split(F.col(text_col), "\n", -1)

    def _keep(l):  # noqa: E741 - l is the conventional line var
        n_words = F.size(F.filter(F.split(l, " ", -1), lambda t: t != ""))
        cond = n_words >= F.lit(min_words)
        if require_terminal_punct:
            cond = cond & l.rlike(r"[.!?]$")
        low = F.lower(l)
        for b in blocklist:
            cond = cond & ~F.contains(low, F.lit(b.lower()))
        return cond

    kept = F.filter(lines, _keep)
    return (
        df.withColumn("__cl_all", lines)
        .withColumn("__cl_kept", kept)
        .withColumn("n_lines", F.size("__cl_all").cast("long"))
        .withColumn("n_lines_kept", F.size("__cl_kept").cast("long"))
        .withColumn(out_col, F.array_join("__cl_kept", "\n"))
        .drop("__cl_all", "__cl_kept")
    )


# ----------------------------------------------------------------- URLs


_URL_SCHEME_RE = "^([a-zA-Z][a-zA-Z0-9+.-]*)://"
_URL_HOST_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?([^/?#:]*)"
_URL_PORT_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://(?:[^/?#@]*@)?[^/?#:]*:([0-9]+)"
_URL_PATH_RE = "^[a-zA-Z][a-zA-Z0-9+.-]*://[^/?#]*([^?#]*)"
# anchored + lazy so a '?' INSIDE the fragment can't resurrect fragment
# content as a query ('http://h/p#sec?a=1' has no query): the match must
# reach the '?' without crossing a '#'
_URL_QUERY_RE = "^[^#]*?\\?([^#]*)"


def url_host(url_col: Column | str) -> Column:
    """Lowercased host (userinfo and port stripped) — the key for
    host-level quotas/dedup in crawl curation.  Pure regexp_extract
    (RE2-compatible pattern, so DuckDB oracles reproduce it verbatim)."""
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    return F.lower(F.regexp_extract(c, _URL_HOST_RE, 1))


def url_canonical(url_col: Column | str) -> Column:
    """Canonical URL: scheme and host lowercased, userinfo kept out of
    the host key, default ports stripped (http:80, https:443), fragment
    dropped, empty path normalized to '/', query preserved verbatim.

    Deliberately NOT done: query-param reordering and percent-decoding —
    both change semantics on real sites (param order can be significant,
    decoding can alias distinct resources); crawl dedup wants a stable
    conservative key, not an aggressive one.

    All parts are regexp_extract + concat (JVM codegen; same RE2-safe
    patterns in the DuckDB oracle).  Non-URL strings (no scheme://)
    canonicalize to NULL so callers can filter or fall back.
    """
    c = F.col(url_col) if isinstance(url_col, str) else url_col
    scheme = F.lower(F.regexp_extract(c, _URL_SCHEME_RE, 1))
    host = F.lower(F.regexp_extract(c, _URL_HOST_RE, 1))
    port = F.regexp_extract(c, _URL_PORT_RE, 1)
    path = F.regexp_extract(c, _URL_PATH_RE, 1)
    query = F.regexp_extract(c, _URL_QUERY_RE, 1)
    default = ((scheme == "http") & (port == "80")) | (
        (scheme == "https") & (port == "443")
    )
    port_part = F.when((port == "") | default, F.lit("")).otherwise(
        F.concat(F.lit(":"), port)
    )
    path_part = F.when(path == "", F.lit("/")).otherwise(path)
    query_part = F.when(query == "", F.lit("")).otherwise(
        F.concat(F.lit("?"), query)
    )
    return F.when(
        scheme == "", F.lit(None).cast("string")
    ).otherwise(F.concat(scheme, F.lit("://"), host, port_part, path_part, query_part))
