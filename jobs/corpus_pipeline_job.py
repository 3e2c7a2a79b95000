"""spark-submit entry point: the full training-data curation pipeline.

    zip -r tdigest_spark.zip tdigest_spark
    spark-submit --py-files tdigest_spark.zip jobs/corpus_pipeline_job.py \
        --input /data/webpages --output /data/curated

Stages (each a library operator; all narrow or KB-shuffle):
  1. extract_text(html)      — Arrow-batched byte-exact extraction
  2. quality filter          — stopword/alpha-ratio/token-count gates (JVM)
  3. exact + MinHash-LSH dedup -> cluster resolution -> keep representatives
  3.5 (optional --benchmark) eval-set decontamination — broadcast n-gram join
  4. profile                 — per-lang t-digest of text length, HLL of
                               distinct hosts, token-count KLL
  5. write curated parquet (partitioned by lang) + one JSON report line

Deterministic end to end: rerunning over the same input produces the
same curated set and byte-identical digests.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession, functions as F


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--min-tokens", type=int, default=20)
    ap.add_argument("--min-stopword-ratio", type=float, default=0.05)
    ap.add_argument("--jaccard", type=float, default=0.8)
    ap.add_argument("--verify", choices=("exact", "estimate"), default="exact",
                    help="candidate verification: 'exact' re-joins shingle "
                         "sets (bit-exact Jaccard; fine at normal dup "
                         "density), 'estimate' uses MinHash lane agreement "
                         "(constant bytes/pair; required for template-heavy "
                         "corpora where the shingle join explodes)")
    ap.add_argument("--n-hashes", type=int, default=8,
                    help="MinHash lanes (also the --verify estimate "
                         "granularity: thresholds round to 1/n_hashes)")
    ap.add_argument("--max-bucket", type=int, default=200,
                    help="LSH buckets above this are template clusters: "
                         "skipped pairwise, collapsed via exact dedup only")
    ap.add_argument("--delta", type=float, default=200.0)
    ap.add_argument("--benchmark", default=None,
                    help="optional parquet of held-out benchmark docs (text "
                         "column): curated docs sharing n-grams with it are "
                         "dropped (eval-set decontamination)")
    ap.add_argument("--decontam-ngram", type=int, default=8)
    ap.add_argument("--decontam-overlap", type=int, default=1)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("tdigest-corpus-pipeline")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        # local-mode default; a cluster submit overrides via --conf/--driver-memory
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.driver.extraJavaOptions", "-XX:+UseG1GC")
        .getOrCreate()
    )
    from pyspark import StorageLevel

    from tdigest_spark import sketches as SK
    from tdigest_spark.kll import kll_by, kll_quantile_udf
    from tdigest_spark.operators import digest
    from tdigest_spark.operators.dedup import (
        apply_dedup,
        exact_dedup,
        ngram_jaccard_dedup,
    )
    from tdigest_spark.operators.text import quality_score
    from tdigest_spark.sources.webpages import extract_text_column

    report: dict = {}
    import time as _time
    _t0 = _time.perf_counter()
    _last = [_t0]

    def _mark(stage: str) -> None:
        now = _time.perf_counter()
        report[f"sec_{stage}"] = round(now - _last[0], 1)
        _last[0] = now

    # 1-2. extract + quality gates
    raw = spark.read.parquet(args.input)
    docs = (
        extract_text_column(raw)
        .select(
            "url",
            "lang",
            F.col("extracted_text").alias("text"),
            F.xxhash64("url").alias("doc_id"),
        )
    )
    scored = quality_score(docs)
    kept = scored.filter(
        (F.col("n_tokens") >= args.min_tokens)
        & (F.col("stopword_ratio") >= args.min_stopword_ratio)
    ).persist(StorageLevel.MEMORY_AND_DISK)
    report["n_input"] = raw.count()
    report["n_quality"] = kept.count()
    _mark("extract_quality")

    # 3. dedup: exact first (cheap), then near-dup on the survivors
    exact = exact_dedup(kept, ("text",), "doc_id")
    exact_keep = exact.select(F.col("keep_id").alias("doc_id"))
    uniq = kept.join(exact_keep, "doc_id", "left_semi").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    report["n_exact_unique"] = uniq.count()
    _mark("exact_dedup")
    kept.unpersist()  # uniq is materialized; drop the pre-dedup blocks

    from tdigest_spark.operators.dedup import (
        estimated_jaccard_pairs,
        jaccard_pairs,
        lsh_candidate_pairs,
        minhash_signatures,
    )

    sigs = minhash_signatures(uniq, "text", "doc_id", n_hashes=args.n_hashes).persist(
        StorageLevel.MEMORY_AND_DISK
    )
    cands = lsh_candidate_pairs(
        uniq, "text", "doc_id", n_hashes=args.n_hashes,
        max_bucket=args.max_bucket, sigs=sigs,
    )
    if args.verify == "estimate":
        verified = estimated_jaccard_pairs(sigs, cands, "doc_id").filter(
            F.col("jaccard_est") >= args.jaccard
        )
    else:
        verified = jaccard_pairs(uniq, cands, "text", "doc_id").filter(
            F.col("jaccard") >= args.jaccard
        )
    # verified pairs are tiny; materialize them so cluster resolution's
    # iterations never re-run the verification join
    pairs = verified.select("id_a", "id_b").persist(StorageLevel.MEMORY_AND_DISK)
    report["n_near_dup_pairs"] = pairs.count()
    _mark("lsh_verify")
    # pairs is materialized — release the dedup operators' internal caches
    # (signatures, shingle sets) so their disk blocks don't outlive stage 3
    from tdigest_spark.operators.dedup import release_cached

    release_cached()
    sigs.unpersist()
    curated = apply_dedup(uniq, pairs, "doc_id").persist(
        StorageLevel.MEMORY_AND_DISK
    )
    report["n_curated"] = curated.count()
    _mark("cluster_resolve")
    uniq.unpersist()
    pairs.unpersist()

    # 3.5 (optional) benchmark decontamination: drop curated docs whose
    #     text collides with the held-out eval set (broadcast n-gram join
    #     — the corpus text never shuffles)
    if args.benchmark:
        from tdigest_spark.operators.dedup import decontaminate, ngram_contamination

        bench = spark.read.parquet(args.benchmark)
        flags = ngram_contamination(
            curated, bench, "text", "doc_id",
            n=args.decontam_ngram, min_overlap=args.decontam_overlap,
        ).persist(StorageLevel.MEMORY_AND_DISK)
        report["n_contaminated"] = flags.filter("contaminated").count()
        clean = decontaminate(curated, contamination=flags).persist(
            StorageLevel.MEMORY_AND_DISK
        )
        report["n_decontaminated"] = clean.count()
        curated.unpersist()
        flags.unpersist()
        curated = clean
        _mark("decontaminate")

    # 4. profile the curated corpus — text length AND token count per
    #    lang from ONE scan (build_partials_multi shares the pass)
    prof_in = curated.select(
        "lang",
        F.length("text").cast("double").alias("text_len"),
        F.col("n_tokens").cast("double").alias("n_tokens_d"),
    )
    d = digest.digest_profile(
        prof_in, ["text_len", "n_tokens_d"], by=["lang"], delta=args.delta
    )
    qs = digest.quantiles_of(d, (0.5, 0.9, 0.99), by=["lang", "col"]).collect()
    report["text_len_quantiles"] = {
        f"{r['lang']}@{r['q']}": r["quantile"]
        for r in qs
        if r["col"] == "text_len"
    }
    report["token_quantiles"] = {
        f"{r['lang']}@{r['q']}": r["quantile"]
        for r in qs
        if r["col"] == "n_tokens_d"
    }
    hll = SK.hll_by(curated, F.col("url"), by=(), p=12)
    report["distinct_urls_est"] = round(
        hll.select(SK.hll_estimate_col("registers", 12)).collect()[0][0], 1
    )
    kll = kll_by(curated, F.col("n_tokens").cast("double"), by=(), k=200)
    qudf = kll_quantile_udf()
    report["token_p99"] = kll.select(qudf(F.col("kll"), F.lit(0.99))).collect()[0][0]
    _mark("profile")

    # 5. write curated output
    curated.select("url", "lang", "text").write.mode("overwrite").partitionBy(
        "lang"
    ).parquet(args.output)
    _mark("write")
    report["sec_total"] = round(_time.perf_counter() - _t0, 1)
    report["output"] = args.output
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
