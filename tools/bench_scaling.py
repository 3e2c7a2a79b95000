"""Two-parallelism scaling benchmark (the north-rule evidence).

The cluster-size scaling criterion (throughput efficiency >= 0.8 from N
to 4N executors) cannot use a real cluster in this sandbox, so the same
job runs at two local parallelism levels — local[4] vs local[16] on the
same input — and we report docs/sec at both plus the scaling efficiency:

    efficiency = (docs_per_sec_4N / docs_per_sec_N) / 4

Core accounting: a Pandas-UDF task pairs a JVM task thread with a Python
worker process, so local[n] schedules ~2n runnables; 4+4 and 16+16 both
fit this 32-vcpu box, while local[32] would oversubscribe (64 runnables)
and measure contention, not scaling.

The measured job is the north-metric pipeline (docs/sec of t-digest
build+merge) over the Common-Crawl-style corpus (sources.webpages):

    scan parquet -> extract_text(html) [Arrow pandas batch]
                 -> per-lang salted t-digest build + canonical merge
                 -> quantile queries

Every heavy stage is a narrow map; the only shuffle moves KB-sized digest
rows — which is exactly why it scales.

Usage:
    python tools/bench_scaling.py [--docs 4000000] [--runs 4] --out BENCH/BASELINE.md
    python tools/bench_scaling.py --run-one 4 --path /tmp/corpus  # internal
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DEFAULT_CORPUS = "/tmp/tdigest_scaling_corpus4m"


def run_pipeline(spark, path: str) -> dict:
    """The measured job — the north-metric pipeline, docs/sec of
    t-digest build+merge over extracted web text:

    scan parquet -> extract_text(html) (Arrow pandas batch; the
    byte-identical per-url extraction from the input hint) -> per-lang
    salted t-digest build + canonical merge + quantiles.

    One heavy narrow stage (extract+build partials), one KB-sized digest
    shuffle, one collect.  This is the shape that must scale.
    """
    from pyspark.sql import functions as F

    from tdigest_spark.operators import digest
    from tdigest_spark.sources.webpages import extract_text_column

    df = spark.read.parquet(path)
    extracted = extract_text_column(df).select(
        "lang",
        F.length("extracted_text").cast("double").alias("text_len"),
    )
    by_lang = digest.digest_by(
        extracted, "text_len", by=["lang"], delta=100.0, salt=8
    )
    lang_q = digest.quantiles_of(
        by_lang, (0.5, 0.9, 0.99), by=["lang"]
    ).collect()
    return {"lang_rows": len(lang_q)}


def run_one(cores: int, path: str, runs: int) -> None:
    from tdigest_spark.plans import get_spark

    spark = get_spark(
        master=f"local[{cores}]",
        app_name=f"scaling-{cores}",
        shuffle_partitions=cores,
        extra_conf={
            # the corpus is ~1 KB/doc in many small files; default 128 MB
            # bins would coalesce the scan below even 8-way parallelism.
            # On a real cluster input splits outnumber executors and these
            # need no tuning.
            "spark.sql.files.maxPartitionBytes": "48m",
            "spark.sql.files.openCostInBytes": "4m",
            # local[n] runs all tasks in the driver JVM. A moderate heap
            # with G1 is decisively better than a huge one here: measured
            # 8-25x run-to-run swings with a 48g default-GC heap vanish at
            # 12g + G1 (the job itself needs little memory — digests are
            # KBs).
            "spark.driver.memory": "12g",
            "spark.driver.extraJavaOptions": "-XX:+UseG1GC -XX:MaxGCPauseMillis=100",
            # AQE's extra plan rounds are pure serial overhead for this
            # fixed two-stage job; on a real cluster leave it on
            "spark.sql.adaptive.enabled": "false",
        },
    )
    spark.sparkContext.setLogLevel("ERROR")
    n_docs = spark.read.parquet(path).count()
    # pre-warm the OS page cache: the shared virtio disk's throughput
    # varies ~10x with host load, and we are measuring compute scaling,
    # not the sandbox's disk
    import glob

    for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True):
        with open(f, "rb") as fh:
            while fh.read(1 << 22):
                pass
    # warm: JVM + python workers + codegen
    run_pipeline(spark, path)
    times = []
    for _ in range(runs):
        t0 = time.perf_counter()
        run_pipeline(spark, path)
        times.append(time.perf_counter() - t0)
    spark.stop()
    best = min(times)
    print(
        json.dumps(
            {
                "cores": cores,
                "docs": n_docs,
                "times": [round(t, 2) for t in times],
                "best_sec": round(best, 3),
                "docs_per_sec": round(n_docs / best, 1),
            }
        )
    )


def ensure_corpus(path: str, docs: int) -> None:
    if os.path.exists(os.path.join(path, "_SUCCESS")):
        return
    from tdigest_spark.plans import get_spark
    from tdigest_spark.sources.webpages import write_webpages

    spark = get_spark(app_name="scaling-gen")
    spark.sparkContext.setLogLevel("ERROR")
    write_webpages(spark, docs, path)
    spark.stop()


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--docs", type=int, default=4_000_000)
    ap.add_argument("--runs", type=int, default=5)
    ap.add_argument("--path", default=DEFAULT_CORPUS)
    # N vs 4N core accounting: every Pandas-UDF task pairs a JVM task
    # thread with a Python worker process, so local[n] really schedules
    # ~2n runnables. 4+4 and 16+16 both fit this 32-vcpu box; local[32]
    # would oversubscribe (64 runnables) and measure contention, not
    # scaling.
    ap.add_argument("--levels", default="4,16")
    ap.add_argument("--run-one", type=int, default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    if args.run_one:
        run_one(args.run_one, args.path, args.runs)
        return

    ensure_corpus(args.path, args.docs)
    results = {}
    for cores in (int(c) for c in args.levels.split(",")):
        proc = subprocess.run(
            [
                sys.executable,
                os.path.abspath(__file__),
                "--run-one",
                str(cores),
                "--path",
                args.path,
                "--runs",
                str(args.runs),
            ],
            capture_output=True,
            text=True,
            timeout=3600,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")][-1]
        results[cores] = json.loads(line)
        print(line, flush=True)

    lo, hi = sorted(results)
    eff = (results[hi]["docs_per_sec"] / results[lo]["docs_per_sec"]) / (hi / lo)
    summary = {
        "metric": "scaling_efficiency",
        "low_cores": lo,
        "high_cores": hi,
        "docs": results[lo]["docs"],
        "docs_per_sec": {str(c): results[c]["docs_per_sec"] for c in results},
        "efficiency": round(eff, 3),
        "target": 0.8,
        "pass": eff >= 0.8,
    }
    print(json.dumps(summary))
    if args.out:
        write_report(args.out, results, summary)


def write_report(out_path: str, results: dict, summary: dict) -> None:
    os.makedirs(os.path.dirname(out_path), exist_ok=True)
    lo, hi = summary["low_cores"], summary["high_cores"]
    md = f"""# BENCH — measured numbers for tdigest_spark

## Two-parallelism scaling (north-rule evidence)

Same job, same input ({summary['docs']:,} synthetic Common-Crawl-style
web pages), `local[{lo}]` vs `local[{hi}]` (N vs 4N cores), best of
{len(results[lo]['times'])} timed runs after one warm-up.

Measured pipeline: parquet scan -> extract_text(html) (Arrow batch) ->
per-lang salted t-digest build + canonical merge -> quantiles.
Core accounting: each Pandas-UDF task pairs a JVM thread with a Python
worker, so local[n] schedules ~2n runnables; 4+4 and 16+16 fit the
32-vcpu box while local[32] would oversubscribe and measure contention.

| cores | times (s) | best (s) | docs/sec |
|---|---|---|---|
| {lo} | {results[lo]['times']} | {results[lo]['best_sec']} | {results[lo]['docs_per_sec']:,} |
| {hi} | {results[hi]['times']} | {results[hi]['best_sec']} | {results[hi]['docs_per_sec']:,} |

**Scaling efficiency ({lo} -> {hi} cores): {summary['efficiency']}**
(target >= 0.8: {"PASS" if summary['pass'] else "FAIL"})

Why it scales: every heavy stage (text extraction, digest update) is a
narrow map over input splits; the only shuffles carry serialized digests
(~1 KB per (group, salt) row), independent of input size. Skewed `lang`
is split by explicit salting before the merge stage.

Reproduce: `python tools/bench_scaling.py --docs {summary['docs']}
--out BENCH/BASELINE.md`
"""
    with open(out_path, "w") as f:
        f.write(md)


if __name__ == "__main__":
    main()
