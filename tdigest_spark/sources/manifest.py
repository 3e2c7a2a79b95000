"""Observed writes: parquet output + a data-quality manifest in ONE pass.

Every curation stage that writes a table wants the same bookkeeping —
row count, per-column null counts, value ranges — and the naive way is
a second full scan (`df.count()`, `df.describe()`) that doubles the
stage's IO.  Spark's `DataFrame.observe` attaches aggregate metrics to
the frame itself: they are computed BY THE WRITE JOB as rows stream
through, so the manifest costs zero extra scans — at 100 TB that is the
difference between one pass and two.

The manifest lands as ``_manifest.json`` inside the output directory
(next to parquet's own ``_SUCCESS``), written AFTER the data commit so
its presence certifies a complete, counted write — a cheap resume /
quality gate for downstream stages (`read_manifest`).
"""

from __future__ import annotations

import json
import os
from typing import Sequence

from pyspark.sql import DataFrame, Observation, SparkSession, functions as F

MANIFEST_NAME = "_manifest.json"


def write_observed(
    df: DataFrame,
    path: str,
    stat_cols: Sequence[str] | None = None,
    mode: str = "overwrite",
    partition_by: Sequence[str] | None = None,
) -> dict:
    """Write `df` as parquet at `path` and return (and persist) a
    manifest of metrics observed during that same write job:
    ``rows``, and per column in `stat_cols` (default: every atomic
    column) ``<col>_nulls`` plus, for numeric/timestamp columns,
    ``<col>_min`` / ``<col>_max``.  Exactly one scan happens.

    Array/map/struct/binary columns get null counts only (min/max is
    not defined for them).  Metrics are driver-side scalars — KBs —
    regardless of data size."""
    atomic = {"string", "boolean"}
    numericish = ("int", "bigint", "smallint", "tinyint", "double",
                  "float", "date", "timestamp", "decimal", "long")
    dtypes = dict(df.dtypes)
    if stat_cols is None:
        stat_cols = [c for c, t in df.dtypes
                     if t in atomic or t.startswith(numericish)]
    else:
        missing = [c for c in stat_cols if c not in dtypes]
        if missing:
            raise ValueError(f"stat_cols not in frame: {missing}")

    metrics = [F.count(F.lit(1)).alias("rows")]
    for c in stat_cols:
        metrics.append(
            F.sum(F.col(c).isNull().cast("long")).alias(f"{c}_nulls")
        )
        if dtypes[c].startswith(numericish):
            metrics.append(F.min(c).alias(f"{c}_min"))
            metrics.append(F.max(c).alias(f"{c}_max"))

    obs = Observation("write_observed")
    observed = df.observe(obs, metrics[0], *metrics[1:])
    w = observed.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)

    got = {
        k: (v if not hasattr(v, "isoformat") else v.isoformat())
        for k, v in obs.get.items()
    }
    with open(os.path.join(path, MANIFEST_NAME), "w") as f:
        json.dump(got, f, indent=1, sort_keys=True, default=str)
    return got


def read_manifest(path: str) -> dict | None:
    """Load the manifest an observed write left at `path`, or None when
    the directory was written without one (or the write never
    completed — the manifest is written after the data commit, so its
    absence is itself the signal)."""
    p = os.path.join(path, MANIFEST_NAME)
    if not os.path.exists(p):
        return None
    with open(p) as f:
        return json.load(f)


def assert_manifest(
    spark: SparkSession, path: str, min_rows: int = 1
) -> dict:
    """Downstream-stage gate: the manifest must exist and certify at
    least `min_rows` rows.  Raises ValueError otherwise."""
    m = read_manifest(path)
    if m is None:
        raise ValueError(f"no manifest at {path} — incomplete write?")
    if int(m.get("rows", 0)) < min_rows:
        raise ValueError(f"manifest rows={m.get('rows')} < {min_rows}")
    return m
