"""Bucketed storage (sources/bucketed.py): the write-once-shuffle-never
contract — equi-joins and aggregations on the bucket column plan with no
Exchange, and results match the plain-shuffle formulation exactly."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from tdigest_spark.plans import explain_str
from tdigest_spark.sources.bucketed import bucket_spec, write_bucketed

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def bucketed_pair(spark, tmp_path_factory):
    base = tmp_path_factory.mktemp("bucketed")
    docs = spark.read.parquet(f"{SF}/documents.parquet")
    left = docs.select("doc_id", "lang")
    right = docs.select("doc_id", "n_chars")
    write_bucketed(left, "bkt_left", "doc_id", 4, path=str(base / "l"))
    write_bucketed(right, "bkt_right", "doc_id", 4, path=str(base / "r"))
    yield spark.table("bkt_left"), spark.table("bkt_right"), left, right
    spark.sql("DROP TABLE IF EXISTS bkt_left")
    spark.sql("DROP TABLE IF EXISTS bkt_right")


def test_bucketed_join_no_exchange(spark, bucketed_pair):
    bl, br, left, right = bucketed_pair
    old = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bl.join(br, "doc_id")
        plan = explain_str(joined)
        assert "Exchange" not in plan, plan
        # negative control: the same join off plain parquet shuffles
        shuffled = left.join(right.withColumnRenamed("n_chars", "nc"), "doc_id")
        assert "Exchange" in explain_str(shuffled)
        # and the results are identical
        a = sorted(map(tuple, joined.collect()))
        b = sorted(map(tuple, left.join(right, "doc_id").collect()))
        assert a == b
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", old)


def test_bucketed_groupby_no_exchange(spark, bucketed_pair):
    _, br, _, right = bucketed_pair
    agg = br.groupBy("doc_id").agg(F.sum("n_chars").alias("s"))
    assert "Exchange" not in explain_str(agg)
    a = sorted(map(tuple, agg.collect()))
    b = sorted(
        map(tuple, right.groupBy("doc_id").agg(F.sum("n_chars").alias("s")).collect())
    )
    assert a == b


def test_bucket_spec_roundtrip(spark, bucketed_pair):
    assert bucket_spec(spark, "bkt_left") == (["doc_id"], 4)
    # non-bucketed table reports None
    spark.read.parquet(f"{SF}/region.parquet").write.mode("overwrite").saveAsTable(
        "bkt_plain"
    )
    try:
        assert bucket_spec(spark, "bkt_plain") is None
    finally:
        spark.sql("DROP TABLE IF EXISTS bkt_plain")


def test_write_bucketed_validates(spark):
    docs = spark.read.parquet(f"{SF}/documents.parquet").select("doc_id")
    with pytest.raises(ValueError, match="n_buckets"):
        write_bucketed(docs, "bkt_bad", "doc_id", 0)
