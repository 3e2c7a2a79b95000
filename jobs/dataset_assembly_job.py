"""spark-submit entry point: training-dataset ASSEMBLY over a curated
corpus — the phase after `corpus_pipeline_job.py`'s curation.  Curate
once; assemble many mixes:

    zip -r tdigest_spark.zip tdigest_spark
    spark-submit --py-files tdigest_spark.zip jobs/dataset_assembly_job.py \
        --input /data/curated --output /data/shards \
        --quota-k 10000 --gate-q 0.1 \
        --mixture "en=2.0,zh=1.2" --token-budget 1000000000 \
        --chunk-budget 512 --pack-budget 2048

Stages (each a library operator; every content decision is a
deterministic function of document content, so the assembled dataset is
reproducible bit-for-bit on any cluster size / partitioning):

  1. token count        — JVM split/size in the scan stage
  2. host/domain quota  — quota_by_key over url_host (one key shuffle)
  3. adaptive gate      — quantile_filter: per-lang t-digest quantile of
                          n_tokens as a data-driven floor (map-combine
                          digest build + broadcast cutoffs)
  4. mixture            — mixture_sample: per-lang epoch up-weighting
                          (integer passes + content-keyed fractional
                          pass; scan-stage explode, no shuffle)
  5. token budget       — freeze_to_budget: deterministic hash-ordered
                          prefix freeze (4096-range partial-agg prefix
                          scan; only the boundary range is cumsum'd)
  6. chunking           — chunk_tokens: fixed context windows, one
                          posexplode in the scan stage
  7. packing            — pack_sequences: first-fit-decreasing into
                          pack-budget bins, content-keyed buckets
  8. shard write        — parquet partitioned into --n-shards by
                          pack_id hash, rows sorted (pack_id, pack_pos)
                          within each shard file

One JSON report line: per-stage seconds, row/token counts after every
stage, and the packing fill efficiency.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import DataFrame, SparkSession, functions as F


def parse_mixture(s: str | None) -> dict[str, float]:
    """'en=2.0,zh=1.2' -> {'en': 2.0, 'zh': 1.2}."""
    if not s:
        return {}
    out: dict[str, float] = {}
    for part in s.split(","):
        k, _, v = part.partition("=")
        if not k or not v:
            raise ValueError(f"bad mixture term {part!r}; want name=weight")
        out[k.strip()] = float(v)
    return out


def run_assembly(
    spark: SparkSession,
    curated: DataFrame,
    *,
    id_col: str = "doc_id",
    text_col: str = "text",
    strata_col: str = "lang",
    quota_col: str | None = None,
    quota_k: int = 0,
    gate_q: float = 0.0,
    gate_delta: float = 200.0,
    mixture: dict[str, float] | None = None,
    default_weight: float = 1.0,
    token_budget: int = 0,
    chunk_budget: int = 512,
    chunk_overlap: int = 0,
    pack_budget: int = 2048,
    pack_buckets: int = 1024,
) -> tuple[DataFrame, dict]:
    """The assembly pipeline as a library call (the job's main() wraps it).

    Returns (packed chunks DataFrame, report dict).  The output frame has
    (seq_id string, chunk_idx, n_chunk_tokens, chunk_text, pack_id,
    pack_pos) — one row per packed chunk; `seq_id` is `doc_id` or
    `doc_id#copy` when the mixture stage emitted extra epochs.
    """
    from pyspark import StorageLevel

    from tdigest_spark.operators import digest
    from tdigest_spark.operators.sampling import (
        freeze_to_budget,
        mixture_sample,
        pack_sequences,
        quota_by_key,
    )
    from tdigest_spark.operators.text import chunk_tokens, tokens_col

    report: dict = {}
    t0 = time.perf_counter()
    last = [t0]

    def mark(stage: str) -> None:
        now = time.perf_counter()
        report[f"sec_{stage}"] = round(now - last[0], 1)
        last[0] = now

    # exactly one pipeline frame is cached at a time; `hot` tracks the
    # frame .persist() was actually called on (unpersisting a derived
    # child is a silent no-op and leaks the ancestor's blocks).  The new
    # frame is MATERIALIZED (count) before the predecessor is released —
    # dropping the old cache first would recompute the new stage from the
    # raw scan instead of reading the cached input.
    hot: list[DataFrame] = []

    def cache_swap(new_df: DataFrame) -> tuple[DataFrame, int]:
        p = new_df.persist(StorageLevel.MEMORY_AND_DISK)
        n = p.count()
        if hot:
            hot.pop().unpersist()
        hot.append(p)
        return p, n

    # 1. token count (scan-stage JVM algebra)
    df, report["n_input"] = cache_swap(
        curated.withColumn(
            "n_tokens", F.size(tokens_col(text_col)).cast("long")
        ).filter(F.col("n_tokens") > 0)
    )
    report["tokens_input"] = df.agg(F.sum("n_tokens")).collect()[0][0]
    mark("tokens")

    # 2. host/domain quota — no single site may dominate the corpus.
    #    Deterministic preference order: content hash, so the kept set is
    #    partitioning-invariant (NOT "first k seen").
    if quota_col and quota_k > 0:
        pref = F.md5(F.concat(F.lit("hq:"), F.col(id_col).cast("string")))
        quota_in = df.withColumn("__pref", pref)
        df, report["n_after_quota"] = cache_swap(
            quota_by_key(quota_in, quota_col, ["__pref", id_col], quota_k)
            .drop("__pref")
        )
        mark("quota")

    # 3. adaptive per-lang length gate: drop the shortest gate_q mass of
    #    each stratum (data-driven floor, not a hand-tuned constant)
    if gate_q > 0:
        df, report["n_after_gate"] = cache_swap(
            digest.quantile_filter(
                df, "n_tokens", gate_q, by=[strata_col],
                delta=gate_delta, keep="ge",
            )
        )
        mark("gate")

    # 4. mixture: per-stratum epoch up-weighting.  Downstream identity is
    #    (id, copy) — encode it as a string seq_id so chunking/packing/
    #    freeze hash a single key.
    if mixture:
        mixed = mixture_sample(
            df, id_col, strata_col, mixture, default_weight=default_weight
        )
        df, report["n_after_mixture"] = cache_swap(
            mixed.withColumn(
                "seq_id",
                F.concat(
                    F.col(id_col).cast("string"), F.lit("#"), F.col("copy")
                ),
            )
        )
        mark("mixture")
    else:
        df = df.withColumn("seq_id", F.col(id_col).cast("string"))

    # 5. freeze to the token budget (deterministic hash-ordered prefix)
    if token_budget > 0:
        df, report["n_after_freeze"] = cache_swap(
            freeze_to_budget(df, "seq_id", "n_tokens", token_budget)
        )
        report["tokens_after_freeze"] = df.agg(
            F.sum("n_tokens")
        ).collect()[0][0]
        mark("freeze")

    # 6. context-window chunking
    chunks, report["n_chunks"] = cache_swap(
        chunk_tokens(
            df, text_col, "seq_id", budget=chunk_budget, overlap=chunk_overlap
        ).withColumn(
            "chunk_id",
            F.concat(F.col("seq_id"), F.lit("@"), F.col("chunk_idx")),
        )
    )
    mark("chunk")

    # 7. pack chunks into training sequences
    packed = pack_sequences(
        chunks, "chunk_id", "n_chunk_tokens", pack_budget,
        n_buckets=pack_buckets,
    )
    # packing returns the narrow (chunk_id, pack_id, pack_pos, len) lane;
    # join the chunk text back by the narrow key (id spine shape)
    out, report["n_packed_chunks"] = cache_swap(
        chunks.join(packed.drop("n_chunk_tokens"), "chunk_id")
    )
    stats = out.agg(
        F.countDistinct("pack_id").alias("n_packs"),
        F.sum("n_chunk_tokens").alias("tok"),
    ).collect()[0]
    report["n_packs"] = stats["n_packs"]
    report["tokens_packed"] = stats["tok"]
    # an aggressive gate/quota/budget combination can leave zero packs;
    # emit the (empty) report rather than dying on 0/None at the finish
    report["pack_fill"] = (
        round(stats["tok"] / float(stats["n_packs"] * pack_budget), 4)
        if stats["n_packs"]
        else 0.0
    )
    mark("pack")

    report["sec_total"] = round(time.perf_counter() - t0, 1)
    return out, report


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--output", required=True)
    ap.add_argument("--id-col", default="doc_id")
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--strata-col", default="lang")
    ap.add_argument("--quota-col", default=None,
                    help="column to cap per-key; 'host' derives url_host "
                         "from a url column; empty disables the quota")
    ap.add_argument("--quota-k", type=int, default=0)
    ap.add_argument("--gate-q", type=float, default=0.0,
                    help="if > 0, drop rows below the per-stratum "
                         "n_tokens quantile(q) (adaptive length floor)")
    ap.add_argument("--gate-delta", type=float, default=200.0)
    ap.add_argument("--mixture", default=None,
                    help="per-stratum epoch weights, e.g. 'en=2.0,zh=1.2'")
    ap.add_argument("--default-weight", type=float, default=1.0)
    ap.add_argument("--token-budget", type=int, default=0,
                    help="if > 0, freeze the corpus to this many tokens")
    ap.add_argument("--chunk-budget", type=int, default=512)
    ap.add_argument("--chunk-overlap", type=int, default=0)
    ap.add_argument("--pack-budget", type=int, default=2048)
    ap.add_argument("--pack-buckets", type=int, default=1024)
    ap.add_argument("--n-shards", type=int, default=64)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("tdigest-dataset-assembly")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.driver.extraJavaOptions", "-XX:+UseG1GC")
        .getOrCreate()
    )
    from tdigest_spark.operators.text import url_host

    curated = spark.read.parquet(args.input)
    quota_col = args.quota_col
    if quota_col == "host":
        curated = curated.withColumn("__host", url_host("url"))
        quota_col = "__host"

    out, report = run_assembly(
        spark,
        curated,
        id_col=args.id_col,
        text_col=args.text_col,
        strata_col=args.strata_col,
        quota_col=quota_col,
        quota_k=args.quota_k,
        gate_q=args.gate_q,
        gate_delta=args.gate_delta,
        mixture=parse_mixture(args.mixture),
        default_weight=args.default_weight,
        token_budget=args.token_budget,
        chunk_budget=args.chunk_budget,
        chunk_overlap=args.chunk_overlap,
        pack_budget=args.pack_budget,
        pack_buckets=args.pack_buckets,
    )

    # 8. shard write: co-locate each pack's chunks in one shard file,
    #    ordered (pack_id, pack_pos) — a reader streams whole packed
    #    sequences without a sort.  No global sort: one hash shuffle into
    #    n_shards + a within-partition sort.
    t_w = time.perf_counter()
    from tdigest_spark.sources.manifest import write_observed

    manifest = write_observed(
        out.select(
            "seq_id", "chunk_idx", "n_chunk_tokens", "chunk_text",
            "pack_id", "pack_pos",
            F.pmod(F.col("pack_id"), F.lit(args.n_shards)).alias("shard"),
        )
        .repartition(args.n_shards, "shard")
        .sortWithinPartitions("pack_id", "pack_pos"),
        args.output,
        partition_by=["shard"],
    )
    report["manifest_rows"] = manifest["rows"]
    report["sec_write"] = round(time.perf_counter() - t_w, 1)
    report["sec_total"] = round(report["sec_total"] + report["sec_write"], 1)
    report["output"] = args.output
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
