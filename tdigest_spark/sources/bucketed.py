"""Bucketed (pre-shuffled) parquet storage for co-located joins.

A curation pipeline enriches the same corpus repeatedly — signatures,
quality scores, dedup flags, selection weights all join back by doc id.
Done naively, every one of those joins re-shuffles the full corpus.
Spark's bucketing (`bucketBy` at write time) pays that shuffle ONCE:
rows are hash-partitioned into a fixed number of bucket files per
table, the layout is recorded in the catalog, and every later equi-join
or aggregation on the bucket column reads co-located buckets and plans
with ZERO Exchange on the bucketed side (plus zero Sort when the table
is also sortBy'd and each bucket is a single file).

At 100 TB this is the difference between k enrichment stages costing k
corpus-wide shuffles and costing none: the scan itself IS the shuffle.
Bucket count is a write-time choice — size it so one bucket of the
BIGGEST table fits an executor (e.g. 100 TB / 8192 buckets = 12 GB per
bucket before column pruning); both sides of a co-located join must use
the same count (Spark 3+ can also coalesce mismatched counts when one
divides the other — `spark.sql.bucketing.coalesceBucketsInJoin.enabled`).

Engine note: `bucketBy` requires `saveAsTable` (the layout must live in
a catalog — a plain `.parquet(path)` write cannot record it).  Pass
`path=` to keep the data at an explicit location (external table); the
table entry itself lands in the session catalog.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    name: str,
    bucket_cols: str | Sequence[str],
    n_buckets: int,
    sort_cols: str | Sequence[str] | None = None,
    path: str | None = None,
    mode: str = "overwrite",
    format: str = "parquet",
) -> str:
    """Persist `df` hash-bucketed by `bucket_cols` into `n_buckets`
    bucket files per partition, registered as catalog table `name`
    (external when `path` is given).  Rows are also sorted within each
    bucket by `sort_cols` (default: the bucket columns) so single-file
    buckets elide the join Sort too.  Returns `name`; read back with
    `spark.table(name)` — NOT `spark.read.parquet(path)`, which would
    lose the bucketing metadata and with it the shuffle elision."""
    if isinstance(bucket_cols, str):
        bucket_cols = [bucket_cols]
    if sort_cols is None:
        sort_cols = list(bucket_cols)
    elif isinstance(sort_cols, str):
        sort_cols = [sort_cols]
    if n_buckets < 1:
        raise ValueError(f"n_buckets must be >= 1, got {n_buckets}")
    w = (
        df.write.format(format)
        .mode(mode)
        .bucketBy(int(n_buckets), bucket_cols[0], *bucket_cols[1:])
        .sortBy(sort_cols[0], *sort_cols[1:])
    )
    if path is not None:
        w = w.option("path", path)
    w.saveAsTable(name)
    return name


def bucket_spec(spark: SparkSession, name: str) -> tuple[list[str], int] | None:
    """Return (bucket_columns, n_buckets) recorded in the catalog for
    `name`, or None when the table is not bucketed.  Use to validate
    that two tables can co-locate a join (same columns, same count)
    before relying on the shuffle-free plan."""
    rows = spark.sql(f"DESCRIBE EXTENDED {name}").collect()
    info = {r["col_name"]: r["data_type"] for r in rows}
    n = info.get("Num Buckets")
    cols = info.get("Bucket Columns")
    if n is None or cols is None:
        return None
    names = [c.strip().strip("`") for c in cols.strip("[]").split(",") if c.strip()]
    return names, int(n)
