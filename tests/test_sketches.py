"""Companion sketches (sketches.py): HLL / Count-Min / Bloom — accuracy
bounds vs exact answers, mergeability (grouped -> global rollup equals
direct build), and no-false-negative guarantees."""

from __future__ import annotations

import numpy as np
import pytest
from pyspark.sql import functions as F

from tdigest_spark import sketches as SK


@pytest.fixture(scope="module")
def values(spark):
    """Two groups with known cardinalities and frequencies."""
    rng = np.random.default_rng(13)
    rows = []
    for g, n_distinct, reps in (("a", 3000, 2), ("b", 800, 5)):
        for i in range(n_distinct):
            for _ in range(reps):
                rows.append((g, f"{g}-val-{i}"))
    return spark.createDataFrame(rows, "g string, v string")


def test_hll_error_bound(spark, values):
    sk = SK.hll_by(values, "v", by=["g"], p=12)
    est = {
        r["g"]: r["est"]
        for r in sk.select("g", SK.hll_estimate_col("registers", 12).alias("est"))
        .collect()
    }
    for g, true in (("a", 3000), ("b", 800)):
        assert abs(est[g] - true) / true < 0.05  # ~3 sigma at p=12


def test_hll_merge_equals_direct(spark, values):
    grouped = SK.hll_by(values, "v", by=["g"], p=8)
    rolled = SK.hll_merge(grouped, by=())
    direct = SK.hll_by(values, "v", by=(), p=8)
    assert (
        rolled.collect()[0]["registers"] == direct.collect()[0]["registers"]
    )


def test_countmin_overestimates_within_bound(spark, values):
    sk = SK.countmin_by(values, "v", by=["g"], depth=4, width=256)
    probes = [("a", "a-val-0", 2), ("b", "b-val-1", 5), ("a", "nope", 0)]
    for g, probe, true in probes:
        est = (
            sk.filter(F.col("g") == g)
            .select(
                SK.countmin_query_col("counts", F.lit(probe), 4, 256).alias("e")
            )
            .collect()[0]["e"]
        )
        n = 6000 if g == "a" else 4000
        assert true <= est <= true + 3 * n / 256  # CM never underestimates


def test_countmin_merge_equals_direct(spark, values):
    grouped = SK.countmin_by(values, "v", by=["g"], depth=2, width=64)
    rolled = SK.countmin_merge(grouped, by=())
    direct = SK.countmin_by(values, "v", by=(), depth=2, width=64)
    assert rolled.collect()[0]["counts"] == direct.collect()[0]["counts"]


def test_bloom_no_false_negatives(spark, values):
    sk = SK.bloom_by(values, "v", by=["g"], m_bits=65536, k_hashes=5)
    a_bits = sk.filter(F.col("g") == "a")
    present = [f"a-val-{i}" for i in range(0, 3000, 97)]
    absent = [f"zz-{i}" for i in range(200)]
    probes = spark.createDataFrame([(p,) for p in present + absent], "p string")
    out = a_bits.crossJoin(probes).select(
        "p", SK.bloom_contains_col("bits", F.col("p"), 65536, 5).alias("hit")
    )
    got = {r["p"]: r["hit"] for r in out.collect()}
    assert all(got[p] for p in present)  # no false negatives, ever
    fp = sum(got[p] for p in absent) / len(absent)
    assert fp < 0.1  # ~ (1-exp(-5*3000/65536))^5 ≈ 0.4% + slack


def test_bloom_merge_union(spark, values):
    grouped = SK.bloom_by(values, "v", by=["g"], m_bits=8192, k_hashes=3)
    union = SK.bloom_merge(grouped, by=())
    out = union.select(
        SK.bloom_contains_col("bits", F.lit("a-val-5"), 8192, 3).alias("a"),
        SK.bloom_contains_col("bits", F.lit("b-val-5"), 8192, 3).alias("b"),
    ).collect()[0]
    assert out["a"] and out["b"]
