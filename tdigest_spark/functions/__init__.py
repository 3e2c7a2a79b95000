"""Scalar SQL surface: vectorized pandas UDFs over serialized digest columns.

Registered names (all take a BinaryType digest produced by
operators.digest.build/merge):

- tdigest_quantile(digest, q)          -> double
- tdigest_cdf(digest, x)               -> double
- tdigest_trimmed_mean(digest, q1, q2) -> double
- tdigest_total_weight(digest)         -> double
- tdigest_min(digest) / tdigest_max(digest) -> double
- tdigest_centroid_count(digest)       -> int

Digests are ~8·delta bytes, so deserialization cost per row is trivial;
the UDFs are Arrow-batched (one Python call per ~10k digest rows).
A per-batch cache avoids re-deserializing when the same digest appears
with many q values (the quantiles_of explode pattern).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import SparkSession
from pyspark.sql.functions import pandas_udf
from pyspark.sql.types import DoubleType, IntegerType

from ..core import MergingDigest


def _digest_cache(blobs: pd.Series) -> dict:
    cache: dict[bytes, MergingDigest] = {}
    for b in blobs:
        if b is not None:
            bb = bytes(b)
            if bb not in cache:
                cache[bb] = MergingDigest.from_bytes(bb)
    return cache


def _apply2(blobs: pd.Series, args: pd.Series, fn) -> pd.Series:
    cache = _digest_cache(blobs)
    out = np.full(len(blobs), np.nan)
    for i, (b, a) in enumerate(zip(blobs, args)):
        if b is not None and a == a:
            out[i] = fn(cache[bytes(b)], float(a))
    return pd.Series(out)


@pandas_udf(DoubleType())
def tdigest_quantile_udf(digest: pd.Series, q: pd.Series) -> pd.Series:
    return _apply2(digest, q, lambda d, v: d.quantile(v))


@pandas_udf(DoubleType())
def tdigest_cdf_udf(digest: pd.Series, x: pd.Series) -> pd.Series:
    return _apply2(digest, x, lambda d, v: d.cdf(v))


@pandas_udf(DoubleType())
def tdigest_trimmed_mean_udf(
    digest: pd.Series, q1: pd.Series, q2: pd.Series
) -> pd.Series:
    cache = _digest_cache(digest)
    out = np.full(len(digest), np.nan)
    for i, (b, a, c) in enumerate(zip(digest, q1, q2)):
        if b is not None:
            out[i] = cache[bytes(b)].trimmed_mean(float(a), float(c))
    return pd.Series(out)


@pandas_udf(DoubleType())
def tdigest_total_weight_udf(digest: pd.Series) -> pd.Series:
    cache = _digest_cache(digest)
    return pd.Series(
        [cache[bytes(b)].total_weight if b is not None else np.nan for b in digest]
    )


@pandas_udf(DoubleType())
def tdigest_min_udf(digest: pd.Series) -> pd.Series:
    cache = _digest_cache(digest)
    return pd.Series(
        [cache[bytes(b)].minimum() if b is not None else np.nan for b in digest]
    )


@pandas_udf(DoubleType())
def tdigest_max_udf(digest: pd.Series) -> pd.Series:
    cache = _digest_cache(digest)
    return pd.Series(
        [cache[bytes(b)].maximum() if b is not None else np.nan for b in digest]
    )


@pandas_udf(IntegerType())
def tdigest_centroid_count_udf(digest: pd.Series) -> pd.Series:
    cache = _digest_cache(digest)
    return pd.Series(
        [len(cache[bytes(b)]) if b is not None else -1 for b in digest]
    ).astype("int32")


def register_sql_functions(spark: SparkSession) -> None:
    """Expose the digest query surface to spark.sql(...)."""
    spark.udf.register("tdigest_quantile", tdigest_quantile_udf)
    spark.udf.register("tdigest_cdf", tdigest_cdf_udf)
    spark.udf.register("tdigest_trimmed_mean", tdigest_trimmed_mean_udf)
    spark.udf.register("tdigest_total_weight", tdigest_total_weight_udf)
    spark.udf.register("tdigest_min", tdigest_min_udf)
    spark.udf.register("tdigest_max", tdigest_max_udf)
    spark.udf.register("tdigest_centroid_count", tdigest_centroid_count_udf)
