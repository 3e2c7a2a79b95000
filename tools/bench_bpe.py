"""BPE tokenizer-training throughput on the 4M-doc scaling corpus.

Measures the two cost classes separately, because they scale
differently:

- word-table build: the ONE pass over corpus text (explode + partial-
  aggregating groupBy).  Linear in corpus tokens; at 100 TB this is the
  dominant cost and it scales with executors like every other one-scan
  operator here.
- merge rounds: per-round pair-count + fold over the (distinct-word,
  cnt) table — independent of corpus size once the table is built
  (~10^5 rows for this corpus, ~10^8-9 for a real crawl).

Usage: python tools/bench_bpe.py [--path /tmp/tdigest_scaling_corpus4m]
       [--merges 200] [--batch 8] [--min-word-count 2]
Prints one JSON line.
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--path", default="/tmp/tdigest_scaling_corpus4m")
    ap.add_argument("--merges", type=int, default=200)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--min-word-count", type=int, default=2)
    ap.add_argument("--cores", type=int, default=32)
    args = ap.parse_args()

    from pyspark.sql import functions as F

    from tdigest_spark.operators.tokenizer import (
        bpe_train,
        initial_symbols,
        word_freq_table,
    )
    from tdigest_spark.plans import get_spark

    spark = get_spark(
        master=f"local[{args.cores}]",
        app_name="bench-bpe",
        extra_conf={
            "spark.driver.memory": "12g",
            "spark.driver.extraJavaOptions": "-XX:+UseG1GC -XX:MaxGCPauseMillis=100",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    df = spark.read.parquet(args.path).select("text")
    n_docs = df.count()

    t0 = time.time()
    wc = word_freq_table(df, min_count=args.min_word_count)
    words = wc.select(initial_symbols("word").alias("syms"), "cnt").persist()
    stats = words.agg(
        F.count("*").alias("w"), F.sum("cnt").alias("toks")
    ).collect()[0]
    t_wordtable = time.time() - t0

    t1 = time.time()
    merges = bpe_train(
        df,
        n_merges=args.merges,
        batch_size=args.batch,
        min_word_count=args.min_word_count,
    )
    t_train_total = time.time() - t1
    words.unpersist()

    print(
        json.dumps(
            {
                "metric": "bpe_train",
                "docs": n_docs,
                "distinct_words": int(stats["w"]),
                "corpus_tokens": int(stats["toks"]),
                "word_table_sec": round(t_wordtable, 1),
                "train_total_sec": round(t_train_total, 1),
                "merge_rounds_sec": round(t_train_total - t_wordtable, 1),
                "n_merges": len(merges),
                "batch_size": args.batch,
                "docs_per_sec_text_pass": round(n_docs / t_wordtable, 1),
                "tokens_per_sec_text_pass": round(int(stats["toks"]) / t_wordtable, 1),
                "cores": args.cores,
            }
        )
    )


if __name__ == "__main__":
    main()
