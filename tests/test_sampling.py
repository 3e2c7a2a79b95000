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


def test_fixed_sample_exact_k_and_stable(spark):
    df = spark.range(5_000).withColumnRenamed("id", "doc_id")
    from tdigest_spark.operators.sampling import deterministic_fixed_sample

    s1 = {r["doc_id"] for r in deterministic_fixed_sample(df, "doc_id", 100).collect()}
    s2 = {
        r["doc_id"]
        for r in deterministic_fixed_sample(df.repartition(13), "doc_id", 100).collect()
    }
    assert len(s1) == 100 and s1 == s2
    # reservoir property under growth: at most k changes, supersets keep
    # most members
    bigger = spark.range(10_000).withColumnRenamed("id", "doc_id")
    s3 = {
        r["doc_id"]
        for r in deterministic_fixed_sample(bigger, "doc_id", 100).collect()
    }
    assert len(s3) == 100 and len(s1 & s3) > 30  # ~50 expected


def test_stratified_sample_rates(spark):
    from tdigest_spark.operators.sampling import stratified_sample

    rows = [("en", i) for i in range(8000)] + [("de", i + 10_000) for i in range(2000)]
    df = spark.createDataFrame(rows, "lang string, doc_id long")
    out = stratified_sample(df, "doc_id", "lang", {"en": 0.05, "de": 0.5}).collect()
    n_en = sum(1 for r in out if r["lang"] == "en")
    n_de = sum(1 for r in out if r["lang"] == "de")
    assert 250 < n_en < 550 and 850 < n_de < 1150
