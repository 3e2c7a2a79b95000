"""Headline benchmark: one JSON line on stdout.

Runs the flagship operators at $SPARK_GRAFT_SF_DIR (default sf0.1) on
local[$SPARK_GRAFT_CPUS].  Each query is timed end-to-end (plan + execute
+ collect) twice — plus one adaptive retry when the two trials disagree
>1.6x (a host contention window) — rebuilding the DataFrame per trial;
the per-query min is reported (this host's shared virtio disk swings
single readings 2x+), with the first-trial sum as `cold_sec`.  `docs_per_sec` reports ingest
throughput of the global t-digest build+merge over lineitem (the
BASELINE.md north metric).

Usage: python bench.py            # one JSON line
       python bench.py --verbose  # plus per-query stderr progress
"""

from __future__ import annotations

import json
import os
import sys
import time

import pandas as pd

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
VERBOSE = "--verbose" in sys.argv


def log(msg: str) -> None:
    if VERBOSE:
        print(msg, file=sys.stderr, flush=True)


def main() -> None:
    from pyspark.sql import functions as F

    from tdigest_spark.operators import digest, histogram_ops
    from tdigest_spark.operators.dedup import simhash64
    from tdigest_spark.operators.similarity import cosine_topk
    from tdigest_spark.plans import get_spark
    from tdigest_spark import queries as Q
    from tdigest_spark.sources import load_table

    spark = get_spark(
        app_name="tdigest_spark-bench",
        # keep every stage in the status store so per-query shuffle-byte
        # deltas (shuffle_totals) never lose stages between snapshots
        extra_conf={"spark.ui.retainedStages": "100000"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    # warm the JVM + the Python worker pool (one trivial pandas-UDF stage
    # across all cores) so q1 doesn't pay JVM codegen or worker-fork cost
    spark.range(1_000_000).select(F.sum("id")).collect()
    from pyspark.sql.functions import pandas_udf as _pudf

    @_pudf("long")
    def _warm(s: pd.Series) -> pd.Series:
        return s

    cpus_warm = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    spark.range(cpus_warm * 10).repartition(cpus_warm).select(
        F.sum(_warm("id"))
    ).collect()

    # pre-warm the page cache for every input file: the shared virtio disk
    # is the dominant noise source (10x throughput windows), and a cold
    # first read inside a timed trial charges that window to the query.
    import glob as _glob

    for _f in sorted(_glob.glob(os.path.join(SF_DIR, "*.parquet"))):
        with open(_f, "rb") as _fh:
            while _fh.read(1 << 22):
                pass

    li = load_table(spark, SF_DIR, "lineitem")
    docs = load_table(spark, SF_DIR, "documents")
    ev = load_table(spark, SF_DIR, "events")
    emb = load_table(spark, SF_DIR, "embeddings").select(
        "vec_id", "label", F.col("embedding").cast("array<double>").alias("embedding")
    )
    n_li = li.count()
    n_docs = docs.count()

    timings: dict[str, float] = {}

    from tdigest_spark.operators.dedup import release_cached
    from tdigest_spark.operators.digest import release_broadcasts
    from tdigest_spark.plans import shuffle_totals

    timings_first: dict[str, float] = {}
    shuffle_mb: dict[str, float] = {}

    def bench(name: str, fn, n_trials: int = 2) -> None:
        # Two trials per query, min reported.  fn() rebuilds the whole
        # DataFrame each trial (fresh plan objects -> no shuffle-reuse
        # trap), so trial 2 measures real execution with codegen + page
        # cache warm.  This box's shared virtio disk swings single
        # readings by 2x+ (BENCH/BASELINE.md noise-floor section); the
        # min is the stable, comparable statistic.  The first-trial sum
        # is still emitted as cold_sec.
        trials: list[float] = []
        for trial in range(n_trials):
            sw0, _ = shuffle_totals(spark)
            t0 = time.perf_counter()
            fn()
            dt = time.perf_counter() - t0
            if trial == 0:
                timings_first[name] = round(dt, 3)
            trials.append(dt)
            # measured shuffle volume of one run (write side; read ==
            # write in local mode) — the quantitative plan audit
            sw1, _ = shuffle_totals(spark)
            shuffle_mb[name] = round((sw1 - sw0) / 1e6, 3)
            # stage boundary: drop operator-internal persisted
            # intermediates.  Leaked cache blocks are NOT free on later
            # queries — measured 2x slowdown on the queries following the
            # dedup suite (GC + block-manager pressure), exactly what a
            # real job's stage-boundary release_cached() call prevents.
            release_cached()
            release_broadcasts()
        # Adaptive third trial: when the two readings disagree >1.6x, a
        # host contention window hit one of them; one retry usually lands
        # outside the window and recovers the true min.  Bounded (at most
        # one extra run per query) so suite runtime stays predictable.
        if max(trials) / max(min(trials), 1e-9) > 1.6:
            t0 = time.perf_counter()
            fn()
            trials.append(time.perf_counter() - t0)
            release_cached()
            release_broadcasts()
        timings[name] = round(min(trials), 3)
        log(f"{name}: {timings[name]:.2f}s (cold {timings_first[name]:.2f}s)")

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))

    # 1. global t-digest over lineitem: shuffle-free partial build
    #    (mapInPandas per partition) + canonical merge + quantiles.
    #    min_parallelism rescues the LOCAL run only: the sf parquet is one
    #    unsplittable row group, which would pin the build to one Python
    #    worker; at real scale splits >> cores and this is a no-op.
    def global_digest():
        partials = digest.build_partials_per_partition(
            li, "l_extendedprice", delta=100.0, min_parallelism=cpus
        )
        merged = digest.merge_partials(partials, by=())
        digest.quantiles_of(merged, (0.001, 0.01, 0.5, 0.99, 0.999), by=()).collect()

    # docs_per_sec (a headline metric) is derived from this one timing,
    # so it gets an unconditional third trial: the adaptive retry only
    # fires when the two readings DISAGREE, and one bad IO window can
    # slow both in agreement (observed: 2.66s vs the 1.3s steady state).
    bench("tdigest_global_lineitem", global_digest, n_trials=3)
    digest_build_sec = timings["tdigest_global_lineitem"]

    # 1b. one-pass MULTI-column profiling: 3 digests from a single scan.
    #     The point of comparison is 1a — three separate builds would
    #     cost ~3x the scan; the shared-scan build should cost far less.
    def profile_digest():
        prof = digest.digest_profile(
            li, ["l_quantity", "l_extendedprice", "l_discount"],
            delta=100.0, min_parallelism=cpus,
        )
        digest.quantiles_of(prof, (0.5, 0.99), by=["col"]).collect()

    bench("tdigest_profile_3col", profile_digest)

    # 2a. grouped digest, DEFAULT map-side-combine path (zero raw-row
    #     shuffle: stage 1 is mapInPandas partials per input partition)
    def grouped_digest_map():
        partials = digest.build_partials_grouped(
            docs, "n_chars", by=["lang"], delta=200.0, min_parallelism=cpus
        )
        d = digest.merge_partials(partials, by=["lang"])
        digest.quantiles_of(d, (0.5, 0.9, 0.99), by=["lang"]).collect()

    bench("tdigest_by_lang_mapcombine", grouped_digest_map)

    # 2b. the salted-shuffle fallback on the same data (shuffles every raw
    #     row) — kept in the suite so the stage-1 shuffle elimination is
    #     visible as mapcombine <= salted across rounds
    def grouped_digest_salted():
        d = digest.digest_by(
            docs, "n_chars", by=["lang"], delta=200.0, salt=8, combine="shuffle"
        )
        digest.quantiles_of(d, (0.5, 0.9, 0.99), by=["lang"]).collect()

    bench("tdigest_by_lang_salted", grouped_digest_salted)

    # 3. grouped digest over events (bigger groups, same δ regime)
    bench(
        "tdigest_events_by_type",
        lambda: digest.quantiles_of(
            digest.digest_by(ev, "value", by=["event_type"], delta=100.0),
            (0.5, 0.9, 0.99),
            by=["event_type"],
        ).collect(),
    )

    # 4. log-histogram with JVM-side vector-sum merge
    bench(
        "loghistogram_events",
        lambda: histogram_ops.histogram_by(
            ev, "value", 0.01, 500.0, by=["event_type"]
        ).collect(),
    )

    # 5. MinHash-LSH near-dup pipeline (shingle -> sign -> band -> join -> verify)
    bench(
        "minhash_lsh_dedup",
        lambda: Q.q_lsh_near_dup_pairs(spark, SF_DIR).collect(),
    )

    # 5b. same candidates, signature-estimated verification — the 100 TB
    #     path for template-heavy corpora (constant bytes/pair; see
    #     BENCH/BASELINE.md 4M-doc section)
    bench(
        "minhash_lsh_dedup_est",
        lambda: Q.q_lsh_est_jaccard_pairs(spark, SF_DIR).collect(),
    )

    # 5c. same full pipeline on the xxhash64 PRODUCTION hash lane (JVM
    #     long lanes + xxhash64 band keys, zero md5 string machinery).
    #     md5 is kept only for oracle neutrality; this entry measures
    #     what that neutrality costs (5 vs 5c) — the real-pipeline lane.
    def dedup_xx():
        from tdigest_spark.operators.dedup import ngram_jaccard_dedup
        from tdigest_spark.queries import (
            LSH_BANDS, LSH_MAX_BUCKET, MINHASH_K, SHINGLE_K, _docs_with_twins,
        )

        ngram_jaccard_dedup(
            _docs_with_twins(docs), "text", "doc_id", threshold=0.5,
            shingle_k=SHINGLE_K, n_hashes=MINHASH_K, bands=LSH_BANDS,
            max_bucket=LSH_MAX_BUCKET, hash_fn="xxhash64",
        ).collect()

    bench("minhash_lsh_dedup_xx", dedup_xx)

    # 5c'. same full pipeline on the O(n) NumPy rolling signature lane —
    #      no shingle string is ever materialized (5.8x the xxhash lane's
    #      signature throughput on 500k docs; see BENCH/BASELINE.md)
    def dedup_roll():
        from tdigest_spark.operators.dedup import ngram_jaccard_dedup
        from tdigest_spark.queries import (
            LSH_BANDS, LSH_MAX_BUCKET, MINHASH_K, SHINGLE_K, _docs_with_twins,
        )

        ngram_jaccard_dedup(
            _docs_with_twins(docs), "text", "doc_id", threshold=0.5,
            shingle_k=SHINGLE_K, n_hashes=MINHASH_K, bands=LSH_BANDS,
            max_bucket=LSH_MAX_BUCKET, hash_fn="rolling",
        ).collect()

    bench("minhash_lsh_dedup_roll", dedup_roll)

    # 5e. INCREMENTAL dedup: the 10%-of-corpus twin increment deduped
    #     against the standing corpus's PRECOMPUTED signature index (built
    #     and persisted outside the timed region — on a real pipeline the
    #     index is last month's artifact).  Times what a monthly crawl
    #     actually pays: signature build over the increment + two KB-lane
    #     joins; the old corpus is never re-read.  Compare to 5 (full
    #     dedup re-hashes everything).
    from tdigest_spark.operators.dedup import (
        dedup_against_index,
        minhash_signatures,
    )
    from tdigest_spark.queries import (
        LSH_BANDS as _BANDS,
        LSH_MAX_BUCKET as _MAXB,
        MINHASH_K as _MK,
        NEARDUP_MOD as _NDM,
        SHINGLE_K as _SK,
    )

    idx_sigs = minhash_signatures(docs, "text", "doc_id", _MK, _SK).persist()
    idx_sigs.count()  # materialize: the index is a precomputed artifact

    def incr_dedup():
        twins = docs.filter((F.col("doc_id") % _NDM) == 0).select(
            "doc_id", F.expr("substring(text, 1, n_chars - 20)").alias("text")
        )
        dedup_against_index(
            twins, idx_sigs, "text", "doc_id", threshold=0.5,
            n_hashes=_MK, shingle_k=_SK, bands=_BANDS, max_bucket=_MAXB,
        ).count()

    bench("minhash_incremental_dedup", incr_dedup)
    idx_sigs.unpersist()

    # 5d. benchmark decontamination: broadcast n-gram join, corpus text
    #     never shuffles (every 13th doc's first-half tokens = eval set)
    def decontam():
        from tdigest_spark.operators.dedup import ngram_contamination

        toks = F.filter(
            F.split(F.col("text"), F.lit(" ").cast("string"), -1),
            lambda t: t != "",
        )
        bench_set = docs.filter(F.col("doc_id") % 13 == 0).select(
            F.concat_ws(
                " ",
                F.slice(toks, 1,
                        F.greatest(F.floor(F.size(toks) / 2), F.lit(1)).cast("int")),
            ).alias("text")
        )
        ngram_contamination(docs, bench_set, "text", "doc_id", n=8).collect()

    bench("decontaminate_docs", decontam)

    # 5e. cross-corpus line dedup (RefinedWeb stage) over synthesized
    #     multi-line pages; production xxhash64 key lane.  The sum
    #     aggregate forces the full rewrite without collecting 5k texts.
    def line_dedup():
        from tdigest_spark.operators.dedup import dedup_lines_corpus

        pages = docs.select("doc_id", Q._line_dedup_page().alias("text"))
        dedup_lines_corpus(
            pages, min_docs=Q.LINE_DEDUP_MIN_DOCS, hash_fn="xxhash64"
        ).agg(F.sum("n_lines_kept"), F.sum(F.length("clean_text"))).collect()

    bench("line_dedup_corpus", line_dedup)

    # 5g. corpus-global duplicate-SPAN removal (ExactSubstr k-gram
    #     windows) on the production xxhash64 lane; the agg forces the
    #     full token rewrite without collecting 5k texts.
    def span_dedup():
        from tdigest_spark.operators.dedup import dedup_spans_corpus

        dedup_spans_corpus(
            docs.select("doc_id", "text"),
            k=Q.SPAN_K,
            min_count=Q.SPAN_MIN_COUNT,
            hash_fn="xxhash64",
        ).agg(F.sum("n_tokens_kept"), F.sum(F.length("clean_text"))).collect()

    bench("span_dedup_corpus", span_dedup)

    # 5g'. same job on the O(n) NumPy Rabin-Karp lane — the production
    #      path at corpus scale (345s vs JVM-lane timeout on 4M docs);
    #      at bench SF the Python-worker round trip costs more than the
    #      O(n*k) JVM work it saves, so expect parity or slightly worse
    #      here and the win only at scale.
    def span_dedup_roll():
        from tdigest_spark.operators.dedup import dedup_spans_corpus

        dedup_spans_corpus(
            docs.select("doc_id", "text"),
            k=Q.SPAN_K,
            min_count=Q.SPAN_MIN_COUNT,
            hash_fn="rolling",
        ).agg(F.sum("n_tokens_kept"), F.sum(F.length("clean_text"))).collect()

    bench("span_dedup_corpus_roll", span_dedup_roll)

    # 5h. SemDeDup over embeddings + planted twins: scan-stage literal
    #     argmin assignment, in-cell cosine self-join, min-id keep.
    def sem_dedup():
        from tdigest_spark.operators.similarity import semantic_dedup

        twins = emb.filter((F.col("vec_id") % 5) == 0).select(
            (F.col("vec_id") + 100000).alias("vec_id"),
            F.transform("embedding", lambda x: x * 1.01).alias("embedding"),
        )
        cents = emb.filter((F.col("vec_id") % 97) == 1).select(
            F.col("vec_id").cast("int").alias("centroid_id"),
            F.col("embedding").alias("centroid"),
        )
        semantic_dedup(
            emb.select("vec_id", "embedding").unionAll(twins), cents
        ).groupBy("keep").count().collect()

    bench("semantic_dedup", sem_dedup)

    # 5i. DSIR: hashed-bigram importance weights (en slice as target) +
    #     Gumbel top-k selection — model fit + score + resample.
    def dsir():
        from tdigest_spark.operators.scoring import dsir_logratio, gumbel_topk

        scored = dsir_logratio(
            docs.select("doc_id", "lang", "text"),
            docs.filter(F.col("lang") == "en").select("doc_id", "text"),
            n_buckets=Q.DSIR_BUCKETS,
        )
        gumbel_topk(scored, Q.DSIR_K).count()

    bench("dsir_select", dsir)

    # 5f. model-based scoring: bigram-LM NLL (train on the en slice +
    #     score all docs — two count groupBys + explode/join/re-agg) and
    #     the shuffle-free hashed-feature classifier.
    def lm_score():
        from tdigest_spark.operators.scoring import (
            bigram_nll_bits,
            train_bigram_lm,
        )

        lm = train_bigram_lm(docs.filter(F.col("lang") == "en"))
        bigram_nll_bits(docs, lm).agg(
            F.sum("nll_bits"), F.sum("oov_bigrams")
        ).collect()

    bench("lm_nll_bits", lm_score)

    def classifier():
        from tdigest_spark.operators.scoring import hashed_logit

        hashed_logit(docs, n_buckets=1 << 20).agg(F.sum("logit")).collect()

    bench("quality_classifier", classifier)

    # 5g. BM25 multi-query retrieval (broadcast term vocabulary,
    #     exploded-token equi-join, per-query top-k window)
    def bm25():
        from tdigest_spark.operators.scoring import bm25_topk

        q = spark.createDataFrame(
            [(qid, list(ts)) for qid, ts in Q.BM25_QUERIES],
            "query_id string, terms array<string>",
        )
        bm25_topk(docs, q, k=Q.BM25_TOPK).count()

    bench("bm25_topk", bm25)

    # 6. SimHash signatures (explode + 64-way conditional agg)
    bench("simhash", lambda: simhash64(docs, "text", "doc_id").collect())

    # 7. brute-force cosine top-k ANN
    def ann():
        qs = emb.filter((F.col("vec_id") % 50) == 0)
        cosine_topk(emb, qs, k=5).collect()

    bench("ann_bruteforce_topk", ann)

    # 7b. product-quantization ANN: arrow encode (the zero-object-alloc
    # production lane) + ADC search over the codes table
    def pq_ann():
        from tdigest_spark.operators.similarity import (
            pq_encode,
            pq_topk,
            pq_train,
        )

        books = pq_train(emb, n_sub=4, ksub=16, iters=5, seed=3)
        codes = pq_encode(emb, books, lane="arrow")
        qs = emb.filter((F.col("vec_id") % 50) == 0)
        pq_topk(codes, qs, books, k=5).collect()

    bench("pq_adc_topk", pq_ann)

    # 7c. JL random projection (pure scan stage — shuffle_mb should read 0)
    def jl_project():
        from tdigest_spark.operators.similarity import random_project

        random_project(emb, 8, dim=64).agg(
            F.sum(F.element_at("projected", 1))
        ).collect()

    bench("random_project", jl_project)

    # 7d. crawl snapshot diff (two doc scans reduced to (key, md5) lanes)
    def snapshot_diff():
        from tdigest_spark.operators.dedup import crawl_diff

        new = docs.filter((F.col("doc_id") % 7) != 0)
        crawl_diff(docs, new, key_col="doc_id").groupBy("status").count().collect()

    bench("crawl_diff", snapshot_diff)

    # 8. relational baseline (pure Catalyst: scan+filter+agg)
    bench(
        "lineitem_pricing_summary",
        lambda: Q.q_lineitem_pricing_summary(spark, SF_DIR).collect(),
    )

    # 9. companion sketches: HLL distinct counts (pure JVM md5-lane build)
    from tdigest_spark import sketches as SK

    def hll():
        sk = SK.hll_by(ev, F.col("user_id"), by=["event_type"], p=12)
        sk.select(
            "event_type", SK.hll_estimate_col("registers", 12).alias("est")
        ).collect()

    bench("hll_distinct_users", hll)

    # 9b. as-of join: 100k events to per-(user, day) markers — the
    #     single-shuffle tagged-union formulation (no Join node)
    bench(
        "events_asof_join",
        lambda: Q.q_events_asof_join(spark, SF_DIR).count(),
    )

    # 10. KLL grouped quantiles (second quantile sketch family)
    def kll():
        from tdigest_spark.kll import kll_by, kll_quantile_udf

        sk = kll_by(li, "l_extendedprice", by=["l_returnflag"], k=200, salt=8)
        qudf = kll_quantile_udf()
        sk.select("l_returnflag", qudf(F.col("kll"), F.lit(0.99))).collect()

    bench("kll_by_returnflag", kll)

    # 11. BPE training round-1 pair counts (word-freq table = the one
    #     text pass, then all-JVM pair explode + partial agg)
    bench(
        "bpe_merge_candidates",
        lambda: Q.q_bpe_merge_candidates(spark, SF_DIR).collect(),
    )

    # 12. Frequent-Directions / second-moment path: the quantized exact
    #     Gram gate (literal pair-array explode, one partial-agg shuffle)
    bench(
        "gram_embeddings",
        lambda: Q.q_gram_embeddings(spark, SF_DIR).collect(),
    )

    # 13. weighted sampling without replacement (narrow-lane window top-k)
    bench(
        "weighted_sample_docs",
        lambda: Q.q_weighted_sample_docs(spark, SF_DIR).collect(),
    )

    # 14. per-row percentile enrichment over the BIG table: map-combine
    #     digest build + broadcast side channel + one mapInPandas scoring
    #     scan through cdf_batch (zero corpus shuffle; count() keeps the
    #     timed region the full scoring scan without collecting 600k rows)
    bench(
        "percentile_enrich_lineitem",
        lambda: digest.percentile_enrich(
            li.select("l_orderkey", "l_returnflag", "l_extendedprice"),
            "l_extendedprice",
            by=["l_returnflag"],
            delta=100.0,
        ).count(),
    )

    # 15. two-table fuzzy similarity join (recrawl slice vs corpus; the
    #     round-5 driver face of dedup.similarity_join)
    bench(
        "similarity_join",
        lambda: Q.q_similarity_join(spark, SF_DIR).count(),
    )

    # 16. streaming windowed-digest face: a REAL streaming query (file
    #     source -> applyInPandasWithState -> update-mode memory sink)
    #     timed end-to-end including stream startup + checkpoint cost
    bench(
        "windowed_digest_stream",
        lambda: Q.q_windowed_digest_events(spark, SF_DIR).count(),
    )

    total = round(sum(timings.values()), 3)
    out = {
        "metric": "headline_suite_sec",
        "value": total,
        "unit": "sec",
        "queries": timings,
        "shuffle_mb": shuffle_mb,
        "cold_sec": round(sum(timings_first.values()), 3),
        "sf": SF_DIR.rstrip("/").split("sf")[-1],
        "rows": {"lineitem": n_li, "documents": n_docs},
        "docs_per_sec": round(n_li / digest_build_sec, 1),
        "cpus": int(os.environ.get("SPARK_GRAFT_CPUS", "32")),
    }
    print(json.dumps(out), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
