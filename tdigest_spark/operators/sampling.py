"""Deterministic sampling and dataset splitting for corpus curation.

`df.sample`/`sampleBy` draw from rand(seed) streams that depend on
partition assignment — rerun the job with a different input layout and
you get a different sample.  Reproducible pipelines (train/eval splits
that must survive re-partitioning, incremental reruns, engine changes)
need CONTENT-KEYED sampling: a row's fate depends only on its id.

Both operators hash with md5 (engine-neutral — any SQL engine
reproduces the exact same subset) and are pure JVM column expressions:
the sample decision is `u(id) < rate` where u(id) maps the first 13 hex
chars (52 bits) of md5(salt||id) into [0, 1).  Filters stay in the scan
stage (predicate on a scalar expression), so Catalyst pushes projection
pruning through and no shuffle is introduced.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, functions as F

_HEX13 = float(16**13)


def _unit_hash(id_col: Column, salt: str) -> Column:
    """Deterministic u(id) in [0, 1): 52-bit md5 prefix / 16^13."""
    h = F.md5(F.concat(F.lit(salt + ":"), id_col.cast("string")))
    return F.conv(F.substring(h, 1, 13), 16, 10).cast("double") / F.lit(_HEX13)


def deterministic_sample(
    df: DataFrame,
    id_col: str,
    rate: float,
    salt: str = "sample",
) -> DataFrame:
    """Keep ~`rate` of rows, decided solely by md5(salt||id) — identical
    subset on any engine, partitioning, or cluster size.  Distinct salts
    draw independent samples (e.g. nested subsampling)."""
    if not 0.0 <= rate <= 1.0:
        raise ValueError("rate must be in [0, 1]")
    return df.filter(_unit_hash(F.col(id_col), salt) < F.lit(float(rate)))


def hash_split(
    df: DataFrame,
    id_col: str,
    weights: Sequence[float],
    labels: Sequence[str] = ("train", "val", "test"),
    salt: str = "split",
    out_col: str = "split",
) -> DataFrame:
    """Assign every row to one of `labels` with probabilities `weights`
    (normalized), keyed by md5(salt||id): the canonical reproducible
    train/val/test split.  A document keeps its split across reruns,
    repartitions, and incremental corpus growth — the property random
    splits lose."""
    if len(weights) != len(labels):
        raise ValueError("weights and labels must have equal length")
    total = float(sum(weights))
    if total <= 0:
        raise ValueError("weights must sum to a positive value")
    u = _unit_hash(F.col(id_col), salt)
    bounds = []
    acc = 0.0
    for w in weights[:-1]:
        acc += w / total
        bounds.append(acc)
    expr: Column = F.lit(labels[-1])
    for b, lab in zip(reversed(bounds), reversed(labels[:-1])):
        expr = F.when(u < F.lit(b), F.lit(lab)).otherwise(expr)
    return df.withColumn(out_col, expr)


def deterministic_fixed_sample(
    df: DataFrame,
    id_col: str,
    k: int,
    salt: str = "sample",
) -> DataFrame:
    """EXACTLY k rows (the k smallest hash values) — the deterministic
    twin of reservoir sampling.  Uniform over ids, stable under
    partitioning/engine, and monotone under corpus growth in the
    reservoir sense (a new row evicts at most one old member).  Plan:
    per-partition top-k then a single k-row merge (Spark's TakeOrdered),
    no full sort, no shuffle of non-candidates."""
    u = _unit_hash(F.col(id_col), salt)
    return (
        df.withColumn("__u", u).orderBy("__u").limit(int(k)).drop("__u")
    )


def quota_by_key(
    df: DataFrame,
    key_col: str,
    order_by: Sequence[Column | str],
    k: int,
    rank_col: str | None = None,
) -> DataFrame:
    """Per-key quota cap: keep at most `k` rows per `key_col`, preferring
    rows earliest in `order_by` — the host-quota / domain-balancing
    primitive of crawl curation (no single site may dominate the corpus).

    `order_by` MUST be a total order per key (break ties with the id
    column) or the kept set is nondeterministic under re-partitioning —
    the same trap `deterministic_sample` exists to avoid.  Pass
    `rank_col` to also keep the within-key rank (1-based).

    Plan: one hash shuffle on `key_col` + a per-key sort for row_number —
    the minimum any per-key top-k needs.  Skew note for 100 TB: a
    pathological key (one host with 10^8 pages) serializes into a single
    window partition; since rows beyond rank k are discarded anyway,
    pre-thin such keys first (e.g. `deterministic_sample` at a rate that
    leaves ~10k x k expected rows for keys whose approximate count —
    one cheap partial-agg pass — exceeds that), then apply the exact
    quota.  For every realistic host distribution the plain window is
    the right plan; AQE handles moderate skew in the shuffle itself.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    w = Window.partitionBy(key_col).orderBy(*cols)
    rk = "__qk_rank" if rank_col is None else rank_col
    out = df.withColumn(rk, F.row_number().over(w)).filter(F.col(rk) <= int(k))
    return out.drop(rk) if rank_col is None else out


def stratified_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    rates: dict,
    default_rate: float = 0.0,
    salt: str = "sample",
) -> DataFrame:
    """Per-stratum deterministic rates (e.g. downsample the Zipf-head
    language, keep the tail): row kept iff u(id) < rates[stratum].
    Same content-keyed stability as deterministic_sample; the rate map
    is a literal CASE chain, so the filter stays in the scan stage."""
    u = _unit_hash(F.col(id_col), salt)
    rate: Column = F.lit(float(default_rate))
    for s, r in sorted(rates.items()):
        rate = F.when(F.col(strata_col) == s, F.lit(float(r))).otherwise(rate)
    return df.filter(u < rate)
