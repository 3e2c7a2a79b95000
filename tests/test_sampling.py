"""Deterministic sampling/split: content-keyed, partition-invariant."""

from __future__ import annotations

from pyspark.sql import functions as F

from tdigest_spark.operators.sampling import deterministic_sample, hash_split


def test_sample_partition_invariant(spark):
    df1 = spark.range(20_000).withColumnRenamed("id", "doc_id")
    df2 = df1.repartition(17)
    s1 = {r["doc_id"] for r in deterministic_sample(df1, "doc_id", 0.1).collect()}
    s2 = {r["doc_id"] for r in deterministic_sample(df2, "doc_id", 0.1).collect()}
    assert s1 == s2
    assert 0.07 < len(s1) / 20_000 < 0.13


def test_sample_salts_independent(spark):
    df = spark.range(20_000).withColumnRenamed("id", "doc_id")
    a = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.5, salt="a").collect()}
    b = {r["doc_id"] for r in deterministic_sample(df, "doc_id", 0.5, salt="b").collect()}
    overlap = len(a & b) / 20_000
    assert 0.2 < overlap < 0.3  # ~0.25 if independent


def test_hash_split_partition_and_growth_stable(spark):
    df = spark.range(10_000).withColumnRenamed("id", "doc_id")
    full = {
        r["doc_id"]: r["split"]
        for r in hash_split(df, "doc_id", (8, 1, 1)).collect()
    }
    # fractions roughly right, all labels present
    from collections import Counter

    c = Counter(full.values())
    assert set(c) == {"train", "val", "test"}
    assert 0.75 < c["train"] / 10_000 < 0.85
    # growth stability: the same doc keeps its split in a larger corpus
    bigger = spark.range(20_000).withColumnRenamed("id", "doc_id")
    grown = {
        r["doc_id"]: r["split"]
        for r in hash_split(bigger, "doc_id", (8, 1, 1)).collect()
    }
    assert all(grown[k] == v for k, v in full.items())
