"""Quantile rank-error vs compression (delta) — accuracy half of the
north metric ("max quantile rank-error vs delta").

For each delta, build the digest two ways over the same 600k-value
column (sf0.1 lineitem l_extendedprice):
  - local:       one MergingDigest over the whole array
  - distributed: per-partition partials + canonical merge via Spark
and report the max |estimated rank - q| over a 99-point q-grid plus the
extreme-tail errors and serialized size.  The published t-digest bound
is O(1/delta) relative rank error, exact at q -> 0/1.

Writes the table into BENCH/BASELINE.md (appends an ## Accuracy section,
replacing any previous one).

Usage: python tools/bench_accuracy.py [--out BENCH/BASELINE.md]
"""

from __future__ import annotations

import argparse
import os
import re
import sys

import duckdb
import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from tdigest_spark import MergingDigest  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
DELTAS = (50.0, 100.0, 200.0, 500.0)


def max_rank_error(d: MergingDigest, sorted_vals: np.ndarray, qs) -> float:
    n = sorted_vals.size
    errs = []
    for q in qs:
        est = d.quantile(float(q))
        lo = np.searchsorted(sorted_vals, est, side="left") / n
        hi = np.searchsorted(sorted_vals, est, side="right") / n
        # distance from q to the rank interval covered by the value
        errs.append(0.0 if lo <= q <= hi else min(abs(q - lo), abs(q - hi)))
    return float(max(errs))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="BENCH/BASELINE.md")
    args = ap.parse_args()

    vals = duckdb.sql(
        f"SELECT l_extendedprice FROM '{SF_DIR}/lineitem.parquet'"
    ).fetchnumpy()["l_extendedprice"]
    sv = np.sort(vals)
    qs_mid = np.linspace(0.01, 0.99, 99)
    qs_tail = [0.0001, 0.001, 0.999, 0.9999]

    from tdigest_spark.operators import digest as dops
    from tdigest_spark.plans import get_spark

    spark = get_spark(master="local[8]", shuffle_partitions=8)
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")

    rows = []
    for delta in DELTAS:
        d_local = MergingDigest(delta)
        d_local.add(vals)
        d_dist = dops.digest_of(li, "l_extendedprice", delta=delta)
        rows.append(
            {
                "delta": int(delta),
                "local_mid": max_rank_error(d_local, sv, qs_mid),
                "local_tail": max_rank_error(d_local, sv, qs_tail),
                "dist_mid": max_rank_error(d_dist, sv, qs_mid),
                "dist_tail": max_rank_error(d_dist, sv, qs_tail),
                "centroids": len(MergingDigest.from_bytes(d_dist.to_bytes())),
                "bytes": d_dist.small_byte_size(),
                "exact_ends": (
                    d_dist.quantile(0.0) == sv[0] and d_dist.quantile(1.0) == sv[-1]
                ),
            }
        )
        print(rows[-1], flush=True)

    # discrete heavy-tie column (11 distinct values, 2-9% mass each):
    # the regime that broke the pre-clamp compaction (boundary-singleton
    # violation).  Interval rank error counts 0 whenever the estimate
    # lies anywhere inside a tie run's rank span.
    dvals = duckdb.sql(
        f"SELECT l_discount FROM '{SF_DIR}/lineitem.parquet'"
    ).fetchnumpy()["l_discount"]
    dsv = np.sort(dvals)
    dd_local = MergingDigest(100.0)
    for i in range(0, dvals.size, 10_000):
        dd_local.add(dvals[i : i + 10_000])
    dd_dist = dops.digest_of(li, "l_discount", delta=100.0)
    assert dd_local.check_weights() and dd_dist.check_weights()
    discrete = {
        "local_mid": max_rank_error(dd_local, dsv, qs_mid),
        "dist_mid": max_rank_error(dd_dist, dsv, qs_mid),
        "max_tie_mass": float(
            max(np.unique(dvals, return_counts=True)[1]) / dvals.size
        ),
        "exact_ends": (
            dd_dist.quantile(0.0) == dsv[0] and dd_dist.quantile(1.0) == dsv[-1]
        ),
    }
    print(discrete, flush=True)
    spark.stop()

    lines = [
        "",
        "## Quantile accuracy vs delta (600k values, sf0.1 lineitem l_extendedprice)",
        "",
        "Max |rank(estimate) - q| over a 99-point mid grid (0.01..0.99) and a",
        "tail grid (1e-4, 1e-3, 0.999, 0.9999); `dist` = per-partition build +",
        "canonical merge on local[8] (the production path). The t-digest bound",
        "is ~O(1/delta) mid-range and exact at q->0/1 (boundary singletons).",
        "",
        "| delta | mid err (local) | tail err (local) | mid err (dist) | tail err (dist) | centroids | bytes (small) | q=0/1 exact |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r['delta']} | {r['local_mid']:.5f} | {r['local_tail']:.6f} "
            f"| {r['dist_mid']:.5f} | {r['dist_tail']:.6f} "
            f"| {r['centroids']} | {r['bytes']} | {r['exact_ends']} |"
        )
    lines += [
        "",
        "Discrete heavy-tie column (l_discount: 11 distinct values, "
        f"largest tie mass {discrete['max_tie_mass']:.3f}), delta=100 — the",
        "regime that broke the pre-clamp compaction (cluster means drifted",
        "1 ulp off the tie value and violated the boundary-singleton",
        "invariant).  Interval rank error (0 when the estimate lies inside",
        "a tie run's rank span):",
        "",
        "| build | max interval rank err (mid grid) | q=0/1 exact | invariants |",
        "|---|---|---|---|",
        f"| local | {discrete['local_mid']:.5f} | {discrete['exact_ends']} | check_weights pass |",
        f"| distributed | {discrete['dist_mid']:.5f} | {discrete['exact_ends']} | check_weights pass |",
        "",
        "Both stay within 1/delta + tie-mass slack (the tie-aware bound the",
        "tdigest_profile_lineitem oracle enforces; a bare rank bound is",
        "unsatisfiable when one value holds 9% of the mass).",
    ]
    lines.append("")
    section = "\n".join(lines)

    text = open(args.out).read() if os.path.exists(args.out) else "# BENCH\n"
    text = re.sub(r"\n## Quantile accuracy vs delta.*?(?=\n## |\Z)", "", text, flags=re.S)
    with open(args.out, "w") as f:
        f.write(text.rstrip() + "\n" + section)
    print(f"wrote accuracy section to {args.out}")


if __name__ == "__main__":
    main()
