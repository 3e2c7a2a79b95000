"""spark-submit entry point: train a BPE tokenizer over a curated
corpus and freeze the artifact.

    zip -r tdigest_spark.zip tdigest_spark
    spark-submit --py-files tdigest_spark.zip \
        jobs/tokenizer_train_job.py \
        --input /data/curated --out /data/tokenizer_v1 \
        --merges 32000 --batch 64 --min-word-count 5

Writes two artifacts under --out:
- merges.parquet: (rank long, lhs string, rhs string) — the ordered
  merge table, the tokenizer itself.  Rank order IS application order.
- report.json: corpus stats (docs, distinct words, corpus tokens),
  training settings, wall-clock per phase.

The corpus text is read exactly ONCE (the word-frequency pass); every
merge round after that runs over the distinct-word table — see
tdigest_spark/operators/tokenizer.py for the scale shape.  The merge
table is deterministic (total tie-break order), so re-running the job
on a re-partitioned copy of the corpus produces a byte-identical
artifact — the same reproducibility contract as the sampling/freeze
operators.

On a cluster, leave master/memory to spark-submit --conf; this script
only sets what the job semantics require.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--out", required=True)
    ap.add_argument("--text-col", default="text")
    ap.add_argument("--merges", type=int, default=1000)
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--min-word-count", type=int, default=2)
    ap.add_argument("--min-pair-count", type=int, default=2)
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("tdigest-bpe-train")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .getOrCreate()
    )

    from pyspark.sql import functions as F

    from tdigest_spark.operators.tokenizer import bpe_train, word_freq_table

    df = spark.read.parquet(args.input)
    t0 = time.time()
    stats = (
        word_freq_table(df, args.text_col, min_count=args.min_word_count)
        .agg(F.count("*").alias("words"), F.sum("cnt").alias("tokens"))
        .collect()[0]
    )
    t_words = time.time() - t0

    t1 = time.time()
    merges = bpe_train(
        df,
        text_col=args.text_col,
        n_merges=args.merges,
        batch_size=args.batch,
        min_word_count=args.min_word_count,
        min_pair_count=args.min_pair_count,
    )
    t_train = time.time() - t1

    out_rows = [(i, m[0], m[1]) for i, m in enumerate(merges)]
    spark.createDataFrame(out_rows, "rank long, lhs string, rhs string").coalesce(
        1
    ).write.mode("overwrite").parquet(os.path.join(args.out, "merges.parquet"))

    report = {
        "distinct_words": int(stats["words"]),
        "corpus_tokens": int(stats["tokens"]),
        "n_merges": len(merges),
        "settings": {
            "merges": args.merges,
            "batch": args.batch,
            "min_word_count": args.min_word_count,
            "min_pair_count": args.min_pair_count,
        },
        "word_table_sec": round(t_words, 1),
        "train_sec": round(t_train, 1),
    }
    # Hadoop FS, not builtin open(): --out may be hdfs://, s3a://, ... —
    # os.makedirs would create a literal local "./hdfs:/..." dir and the
    # artifact dir on the cluster store would silently lack its report
    jvm = spark._jvm
    jp = jvm.org.apache.hadoop.fs.Path(args.out.rstrip("/") + "/report.json")
    fs = jp.getFileSystem(spark._jsc.hadoopConfiguration())
    stream = fs.create(jp, True)
    try:
        stream.write(json.dumps(report, indent=2).encode("utf-8"))
    finally:
        stream.close()
    print(json.dumps(report))
    spark.stop()


if __name__ == "__main__":
    main()
