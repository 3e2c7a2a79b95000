"""spark-submit entry point: resumable per-lang text-length quantiles
over a web-pages table.

    zip -r tdigest_spark.zip tdigest_spark
    spark-submit --py-files tdigest_spark.zip \
        jobs/webpages_quantiles_job.py \
        --input /data/webpages --checkpoint /data/ck/webpages_len \
        --delta 200 --qs 0.5,0.9,0.99,0.999

The job checkpoints one digest per input split with sha256 lineage;
re-submitting after a kill resumes from the manifest without rescanning
completed splits (tdigest_spark.checkpoint). The final answer is the
canonical merge — byte-identical however many times the job was
interrupted.

On a cluster, leave master/memory to spark-submit --conf; this script
only sets what the job semantics require.
"""

from __future__ import annotations

import argparse
import json
import os
import sys

# on a cluster the package arrives via --py-files; for local runs resolve
# it from the repo checkout next to jobs/
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True)
    ap.add_argument("--checkpoint", required=True)
    ap.add_argument("--value", default="length(text)")
    ap.add_argument("--delta", type=float, default=200.0)
    ap.add_argument("--qs", default="0.5,0.9,0.99,0.999")
    args = ap.parse_args()

    spark = (
        SparkSession.builder.appName("tdigest-webpages-quantiles")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.adaptive.enabled", "true")
        # local-mode default; a cluster submit overrides via --conf/--driver-memory
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "8g"))
        .getOrCreate()
    )

    from pyspark.sql import functions as F

    from tdigest_spark import checkpoint as C

    # materialize the measured column once if it is an expression
    df = spark.read.parquet(args.input)
    if args.value not in df.columns:
        # stage the derived column once; re-staging would rewrite part
        # files under new names and defeat the split-identity resume.
        # The staged dir is KEYED BY THE VALUE EXPRESSION (a different
        # --value must never silently reuse another expression's staged
        # values), and completeness is the _SUCCESS marker: a kill
        # mid-staging leaves a dir without it, which the next run
        # deletes and re-stages instead of resuming over partial data
        # (or wedging on errorifexists).  All probes go through the
        # Hadoop FS API so hdfs://s3a:// checkpoints work.
        import hashlib

        staged = (
            args.checkpoint.rstrip("/")
            + "__staged_value_"
            + hashlib.md5(args.value.encode()).hexdigest()[:8]
        )
        jvm = spark._jvm
        jp = jvm.org.apache.hadoop.fs.Path(staged)
        fs = jp.getFileSystem(spark._jsc.hadoopConfiguration())
        done = jvm.org.apache.hadoop.fs.Path(staged + "/_SUCCESS")
        if fs.exists(jp) and not fs.exists(done):
            fs.delete(jp, True)  # partial staging from a killed run
        if not fs.exists(jp):
            df.select(
                F.expr(args.value).cast("double").alias("v")
            ).write.mode("overwrite").parquet(staged)
        input_path, value_col = staged, "v"
    else:
        input_path, value_col = args.input, args.value

    report = C.checkpointed_build(
        spark, input_path, value_col, args.checkpoint, delta=args.delta
    )
    digest = C.final_digest(spark, args.checkpoint)
    out = {
        "splits_total": report.total_splits,
        "splits_resumed": report.completed_before,
        "splits_built": report.built_now,
        "rows": C.metrics(spark, args.checkpoint)["rows"],
        "quantiles": {
            q: digest.quantile(float(q)) for q in args.qs.split(",")
        },
    }
    print(json.dumps(out))
    spark.stop()


if __name__ == "__main__":
    main()
