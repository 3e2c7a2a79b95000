"""tdigest_spark vs Spark's built-in approx_percentile — same input, same box.

Spark ships a Greenwald-Khanna summary behind `percentile_approx(col, q,
accuracy)`; this library ships a merging t-digest.  Both are one-pass
mergeable sketches, so this is the in-family incumbent comparison: build
each over the same column, time the end-to-end job (scan + build + merge +
query), and score both against exact ranks computed from the full column.

Error metric: for each probe q, err(q) = |exact_rank(estimate)/n - q|
(the published t-digest metric; GK's guarantee is rank error <= 1/accuracy).
Comparable budgets: delta=100 vs accuracy=100 (both promise ~1e-2 rank
error); Spark's default accuracy=10000 is included for reference.

Usage: python tools/bench_vs_builtin.py       # one JSON line on stdout
Env:   SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS
"""

from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
QS = [0.0001, 0.001, 0.01, 0.05, 0.25, 0.5, 0.75, 0.95, 0.99, 0.999, 0.9999]
DELTA = 100.0
REPS = 3  # report the median of REPS fresh-plan runs


def rank_err(sorted_vals: np.ndarray, estimates, qs) -> float:
    n = len(sorted_vals)
    worst = 0.0
    for q, est in zip(qs, estimates):
        # exact rank of the estimate, midpoint convention for ties
        lo = np.searchsorted(sorted_vals, est, side="left")
        hi = np.searchsorted(sorted_vals, est, side="right")
        r = (lo + hi) / 2.0 / n
        worst = max(worst, abs(r - q))
    return worst


def main() -> None:
    from pyspark.sql import functions as F

    from tdigest_spark.operators import digest
    from tdigest_spark.plans import get_spark
    from tdigest_spark.sources import load_table

    spark = get_spark(app_name="tdigest_spark-vs-builtin")
    spark.sparkContext.setLogLevel("ERROR")
    # warm JVM codegen + Python worker pool so neither contender pays
    # first-job fork cost
    spark.range(1_000_000).select(F.sum("id")).collect()
    digest.digest_of(spark.range(10_000).toDF("v"), "v", delta=DELTA)

    col = "l_extendedprice"
    vals = (
        load_table(spark, SF_DIR, "lineitem")
        .select(F.col(col).cast("double").alias("v"))
        .toPandas()["v"]
        .to_numpy()
    )
    vals.sort()
    n = len(vals)

    def run_tdigest():
        li = load_table(spark, SF_DIR, "lineitem")  # fresh plan per run
        t0 = time.time()
        d = digest.digest_of(li, col, delta=DELTA)
        ests = [d.quantile(q) for q in QS]
        return time.time() - t0, ests

    def run_builtin(accuracy: int):
        li = load_table(spark, SF_DIR, "lineitem")
        t0 = time.time()
        row = li.select(
            F.percentile_approx(F.col(col).cast("double"), QS, accuracy).alias("p")
        ).collect()[0]
        return time.time() - t0, list(row["p"])

    def bench(fn, *args):
        times, ests = [], None
        for _ in range(REPS):
            sec, ests = fn(*args)
            times.append(sec)
        return float(np.median(times)), ests

    td_sec, td_ests = bench(run_tdigest)
    gk100_sec, gk100_ests = bench(run_builtin, 100)
    gk10k_sec, gk10k_ests = bench(run_builtin, 10_000)

    out = {
        "metric": "tdigest_vs_percentile_approx",
        "sf": SF_DIR.rstrip("/").rsplit("sf", 1)[-1],
        "rows": n,
        "probe_qs": QS,
        "tdigest_delta100": {
            "sec": round(td_sec, 3),
            "max_rank_err": rank_err(vals, td_ests, QS),
        },
        "percentile_approx_acc100": {
            "sec": round(gk100_sec, 3),
            "max_rank_err": rank_err(vals, gk100_ests, QS),
        },
        "percentile_approx_acc10000": {
            "sec": round(gk10k_sec, 3),
            "max_rank_err": rank_err(vals, gk10k_ests, QS),
        },
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
