"""Sources: deterministic web-pages synthesis, testdata loaders, and
bucketed (pre-shuffled) table storage."""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from .bucketed import bucket_spec, write_bucketed
from .webpages import (
    WEBPAGES_SCHEMA,
    extract_text,
    extract_text_column,
    generate_webpages,
    read_webpages,
    write_webpages,
)

TESTDATA_TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def load_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    return spark.read.parquet(f"{sf_dir}/{name}.parquet")


def register_testdata_views(spark: SparkSession, sf_dir: str) -> None:
    for t in TESTDATA_TABLES:
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)


__all__ = [
    "WEBPAGES_SCHEMA",
    "extract_text",
    "extract_text_column",
    "generate_webpages",
    "read_webpages",
    "write_webpages",
    "TESTDATA_TABLES",
    "load_table",
    "register_testdata_views",
    "write_bucketed",
    "bucket_spec",
]
