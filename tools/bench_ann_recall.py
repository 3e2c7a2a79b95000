"""ANN quality benchmark: recall@k of the PQ / IVFPQ search paths vs
exact L2 ground truth, across probe budgets and quantization rules.

Corpus: deterministic CLUSTERED vectors (planted Gaussian clusters —
real embedding spaces are clustered; on i.i.d. Gaussian noise all
pairs are near-equidistant at 64 dims and "recall" measures nothing,
for ANY index).  Ground truth is exact squared-L2 top-k computed in
NumPy; the measured paths are the actual Spark operators (arrow/numpy
encode lanes + ADC search), so the numbers are end-to-end — candidate
pruning, tie-breaks, LUT algebra and all.

Prints one JSON line per configuration plus a summary line; the BENCH
table in BENCH/BASELINE.md records a run.

Usage: python tools/bench_ann_recall.py [--rows 200000] [--k 10]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    import numpy as np

    from tdigest_spark.plans import get_spark
    from tdigest_spark.operators.similarity import (
        ivf_pq_index,
        ivf_pq_topk,
        ivf_residual_frame,
        ivf_train,
        pq_encode,
        pq_topk,
        pq_train,
    )
    from pyspark.sql import functions as F

    ap = argparse.ArgumentParser()
    ap.add_argument("--rows", type=int, default=200_000)
    ap.add_argument("--k", type=int, default=10)
    ap.add_argument("--n-queries", type=int, default=32)
    ap.add_argument("--n-cells", type=int, default=64)
    ap.add_argument("--n-sub", type=int, default=8)
    ap.add_argument("--ksub", type=int, default=256)
    args = ap.parse_args()

    # deterministic clustered corpus: rows/100 Gaussian clusters of 100
    # points each (sigma 0.25 around unit-scale centers)
    dim = 64
    n_clusters = max(1, args.rows // 100)
    rng = np.random.default_rng(7)
    centers = rng.standard_normal((n_clusters, dim))
    # tile cluster assignments to EXACTLY args.rows (np.repeat with the
    # integer quotient breaks on any --rows not divisible by n_clusters)
    assign = np.arange(args.rows) % n_clusters
    X = centers[assign] + rng.standard_normal((args.rows, dim)) * 0.25

    spark = get_spark(
        master="local[16]", shuffle_partitions=16,
        extra_conf={"spark.driver.memory": "8g", "spark.ui.enabled": "false"},
    )
    spark.sparkContext.setLogLevel("ERROR")

    import pandas as pd

    emb = spark.createDataFrame(
        pd.DataFrame(
            {"vec_id": np.arange(args.rows), "embedding": list(X)}
        )
    ).select("vec_id", F.col("embedding").cast("array<double>").alias("embedding"))
    emb = emb.repartition(32).persist()
    n = emb.count()
    qids = [int(i * (args.rows // args.n_queries)) for i in range(args.n_queries)]
    gt: dict[int, set[int]] = {}
    for q in qids:
        d2 = ((X - X[q]) ** 2).sum(axis=1)
        d2[q] = np.inf
        order = np.lexsort((np.arange(len(d2)), d2))
        gt[q] = set(int(i) for i in order[: args.k])

    queries = emb.filter(F.col("vec_id").isin(qids))

    RETRIEVE = 100  # ADC retrieval depth; exact rerank cuts to k

    def recall(out_df) -> tuple[float, float]:
        """(recall@k of raw ADC top-k, recall@k after exact rerank of the
        ADC top-RETRIEVE) — the second is the deployed-system metric:
        m-byte codes generate candidates, full vectors rerank them."""
        got: dict[int, list[tuple[int, int]]] = {}
        for r in out_df.collect():
            got.setdefault(r["query_id"], []).append((r["rank"], r["neighbor_id"]))
        raw, rr = [], []
        for q in qids:
            cand = [n for _, n in sorted(got.get(q, []))]
            raw.append(len(set(cand[: args.k]) & gt[q]) / args.k)
            if cand:
                d2 = ((X[cand] - X[q]) ** 2).sum(axis=1)
                order = np.lexsort((np.array(cand), d2))
                top = {cand[i] for i in order[: args.k]}
            else:
                top = set()
            rr.append(len(top & gt[q]) / args.k)
        return float(np.mean(raw)), float(np.mean(rr))

    results = []

    def record(name, rec, secs):
        raw, rr = rec
        row = {"config": name, "recall_at_k": round(raw, 4),
               "recall_at_k_reranked": round(rr, 4),
               "sec": round(secs, 2), "k": args.k, "rows": n}
        results.append(row)
        print(json.dumps(row), flush=True)

    # flat PQ (no pruning — quantization error only)
    t0 = time.time()
    books = pq_train(emb, n_sub=args.n_sub, ksub=args.ksub, iters=8, seed=3)
    codes = pq_encode(emb, books, lane="arrow").persist()
    codes.count()
    rec = recall(pq_topk(codes, queries, books, k=RETRIEVE, lane="numpy"))
    record("flat_pq", rec, time.time() - t0)
    codes.unpersist()

    cents = ivf_train(emb, n_cells=args.n_cells, iters=8, seed=3)

    for residual in (False, True):
        if residual:
            rbooks = pq_train(
                ivf_residual_frame(emb, cents),
                n_sub=args.n_sub, ksub=args.ksub, iters=8, seed=3,
            )
        else:
            rbooks = books
        t0 = time.time()
        index = ivf_pq_index(
            emb, cents, rbooks, lane="numpy", residual=residual
        ).persist()
        index.count()
        build_s = time.time() - t0
        for nprobe in (1, 2, 4, 8):
            t0 = time.time()
            rec = recall(
                ivf_pq_topk(
                    index, queries, cents, rbooks,
                    k=RETRIEVE, nprobe=nprobe, residual=residual,
                    lane="numpy",
                )
            )
            record(
                f"ivfpq{'_residual' if residual else ''}_nprobe{nprobe}",
                rec, time.time() - t0,
            )
        index.unpersist()
        print(json.dumps({"config": "index_build",
                          "residual": residual,
                          "sec": round(build_s, 2)}), flush=True)

    print(json.dumps({
        "metric": "ann_recall_suite",
        "rows": n, "k": args.k, "n_queries": args.n_queries,
        "n_cells": args.n_cells, "n_sub": args.n_sub, "ksub": args.ksub,
        "results": {r["config"]: [r["recall_at_k"], r["recall_at_k_reranked"]] for r in results},
    }), flush=True)
    spark.stop()


if __name__ == "__main__":
    main()
