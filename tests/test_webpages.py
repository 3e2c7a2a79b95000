"""Web-pages source tests: deterministic synthesis, byte-identical
extracted text per url (input_hint per-row invariant), skew shape."""

import hashlib

import numpy as np
from pyspark.sql import functions as F

from tdigest_spark.sources import extract_text, extract_text_column, generate_webpages
from tdigest_spark.sources.webpages import LANGS, _gen_batch


def test_generation_deterministic_local():
    a = _gen_batch(np.arange(100))
    b = _gen_batch(np.arange(100))
    assert (a["text"] == b["text"]).all()
    assert (a["url"] == b["url"]).all()
    # independent of batch split
    c1 = _gen_batch(np.arange(0, 50))
    c2 = _gen_batch(np.arange(50, 100))
    assert list(a["text"]) == list(c1["text"]) + list(c2["text"])


def test_extract_text_identity_local():
    pdf = _gen_batch(np.arange(200))
    for html, text in zip(pdf["html"], pdf["text"]):
        assert extract_text(html) == text
        assert (
            hashlib.sha256(extract_text(html).encode()).digest()
            == hashlib.sha256(text.encode()).digest()
        )


def test_spark_generation_partitioning_invariant(spark):
    a = generate_webpages(spark, 500, partitions=2).orderBy("url").collect()
    b = generate_webpages(spark, 500, partitions=7).orderBy("url").collect()
    assert [(r["url"], r["text"], r["lang"]) for r in a] == [
        (r["url"], r["text"], r["lang"]) for r in b
    ]


def test_spark_extract_text_invariant(spark):
    df = generate_webpages(spark, 300, partitions=4)
    out = extract_text_column(df)
    bad = out.filter(F.col("extracted_text") != F.col("text")).count()
    assert bad == 0
    # sha256 per url is stable across two independent generations
    h1 = {
        r["url"]: r["h"]
        for r in extract_text_column(generate_webpages(spark, 100))
        .select("url", F.sha2(F.col("extracted_text"), 256).alias("h"))
        .collect()
    }
    h2 = {
        r["url"]: r["h"]
        for r in extract_text_column(generate_webpages(spark, 100))
        .select("url", F.sha2(F.col("extracted_text"), 256).alias("h"))
        .collect()
    }
    assert h1 == h2


def test_lang_skew(spark):
    counts = dict(
        generate_webpages(spark, 3000, partitions=4)
        .groupBy("lang")
        .count()
        .collect()
    )
    assert set(counts) <= set(LANGS)
    total = sum(counts.values())
    assert counts["en"] / total > 0.45  # Zipf head
    assert len(counts) >= 8  # long tail present


def test_schema(spark):
    df = generate_webpages(spark, 10)
    assert [f.name for f in df.schema.fields] == [
        "url", "warc_ts", "html", "text", "lang"
    ]
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types == {
        "url": "string",
        "warc_ts": "timestamp",
        "html": "binary",
        "text": "string",
        "lang": "string",
    }
