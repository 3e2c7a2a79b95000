"""Distributed t-digest aggregation over DataFrames.

The reference library IS a partial+final aggregation (SURVEY.md §2.2):
update = vectorized fit over a batch, merge = digest ⊕ digest, evaluate =
compress + quantile/cdf.  Spark-first mapping:

    stage 1 (update):  mapInPandas builds one digest per (group, input
                       partition) — *map-side combine*: no raw row ever
                       shuffles; Arrow delivers 10k-row batches, the same
                       amortization granularity as the reference's
                       ingestion chunking (build_partials_grouped)
    stage 2 (merge):   groupBy(keys).applyInPandas(merge)
                       — digests are ~8·delta bytes, so the shuffle moves
                       KBs per group regardless of input size
    evaluate:          scalar pandas UDFs over the digest column
                       (tdigest_quantile / tdigest_cdf / ...)

Scale notes (100 TB / 1000 executors):
- The DEFAULT grouped path (`digest_by(combine="map")`) shuffles ZERO raw
  rows: stage 1 is mapInPandas keeping a dict group→digest per input
  partition, so the only shuffle carries (group, KB-digest) partials —
  splits × groups rows, independent of input size.  A hot group (e.g.
  lang='en' at 60% of a trillion rows) is automatically spread over every
  input split, so there is no skewed reducer to salt away.
- The salted groupBy path (`combine="shuffle"`) remains for cardinality-
  explosive keys (e.g. group-by-user_id with 10^9 groups), where the
  per-partition dict would exceed executor memory and partials would
  outnumber raw rows.  With `salt=S` a skewed group splits into S
  reducers; merge cost is S tiny digests.
- `build_partials_per_partition` (mapInPandas) is the ungrouped variant:
  each input split emits one digest row. This is the 100 TB fast path for
  global digests.
- Merge order is canonicalized (sort by salt/split id) so re-runs are
  byte-identical; within the singleton regime ANY order is byte-identical
  (tests/test_determinism.py).
"""

from __future__ import annotations

from typing import Iterable, Iterator, Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..core import MergingDigest
from ..pdkeys import emit_key_column, unhelp_key, with_string_key_helpers
from ..scale import get_scale

_VALUE = "__td_value"
_SALT = "__td_salt"
DIGEST_FIELDS = "digest binary, n_rows long"

#: sc.broadcast handles created by percentile_enrich — the dedup._CACHED
#: pattern: broadcast blocks outlive the returned DataFrame's use and
#: accumulate over a long session unless released at stage boundaries.
_BROADCASTS: list = []


def release_broadcasts() -> None:
    """Unpersist every digest side channel percentile_enrich has
    broadcast this session.  Safe once the returned frames are
    materialized; a frame still holding a released broadcast would fail
    its next action, so release at stage boundaries only (bench.py does
    this per query, like dedup.release_cached)."""
    while _BROADCASTS:
        b = _BROADCASTS.pop()
        try:
            b.unpersist(blocking=True)
        except Exception:
            pass  # context already stopped


def _build_digest(values: np.ndarray, delta: float, scale: str) -> MergingDigest:
    d = MergingDigest(delta, scale=get_scale(scale))
    vals = values[~np.isnan(values)]
    if vals.size:
        d.add(vals)
    return d


def build_partials(
    df: DataFrame,
    value_col,
    by: Sequence[str] = (),
    delta: float = 100.0,
    scale: str = "K_3",
    salt: int = 0,
    salt_cols: Sequence[str] = (),
) -> DataFrame:
    """Stage-1 digest build: one digest row per (group, salt bucket).

    `value_col` may be a column name or a Column expression. `salt > 1`
    splits each group into `salt` sub-digests keyed by a hash of the value
    (deterministic w.r.t. data, independent of input partitioning), which
    un-skews hot groups like Zipf-heavy `lang` at the cost of `salt` extra
    KB-sized rows in stage 2.

    Salt degeneracy: hashing the value alone means a group dominated by ONE
    repeated value stays in one salt bucket (fine for continuous values,
    degenerate for discrete ones).  Pass `salt_cols` (e.g. a row-unique id
    column) to mix extra entropy into the salt hash — the digest result is
    unchanged (salting only partitions work), but constant-valued hot
    groups then split evenly.
    """
    keys = list(by)
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    proj = [F.col(k) for k in keys] + [value.cast("double").alias(_VALUE)]
    proj += [F.col(c) for c in salt_cols if c not in keys]
    sdf = df.select(*proj)
    group_cols = list(keys)
    if salt and salt > 1:
        salt_inputs = [F.col(_VALUE)] + [F.col(c) for c in salt_cols]
        sdf = sdf.withColumn(
            _SALT, F.pmod(F.xxhash64(*salt_inputs), F.lit(salt)).cast("int")
        )
    else:
        sdf = sdf.withColumn(_SALT, F.lit(0))
    sdf = sdf.drop(*[c for c in salt_cols if c not in keys])
    group_cols.append(_SALT)

    key_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in sdf.schema.fields
        if f.name in keys
    )
    out_schema = ", ".join(
        x for x in (key_schema, f"{_SALT} int", DIGEST_FIELDS) if x
    )

    def build(pdf: pd.DataFrame) -> pd.DataFrame:
        vals = pdf[_VALUE].to_numpy(dtype=np.float64)
        d = _build_digest(vals, delta, scale)
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row[_SALT] = [pdf[_SALT].iloc[0]]
        row["digest"] = [d.to_bytes()]
        row["n_rows"] = [int(np.count_nonzero(~np.isnan(vals)))]
        return pd.DataFrame(row)

    return sdf.groupBy(*group_cols).applyInPandas(build, schema=out_schema)


def build_partials_grouped(
    df: DataFrame,
    value_col,
    by: Sequence[str],
    delta: float = 100.0,
    scale: str = "K_3",
    min_parallelism: int | None = None,
) -> DataFrame:
    """Map-side-combining stage 1 for GROUPED digests: mapInPandas keeps a
    dict group→digest per input partition and emits one digest row per
    (group, partition).  The raw data NEVER shuffles — only (group,
    KB-digest) partials do, exactly like `histogram_ops.histogram_by`.

    State per task is bounded by (#groups seen in this partition) × digest
    size; a hot group is spread across every input split, so skew needs no
    salting.  For cardinality-explosive keys (millions of groups) prefer
    `build_partials` (salted shuffle), where reducer state is one group.

    Output schema matches `build_partials` (`_SALT` carries the input
    partition id) so `merge_partials` consumes either interchangeably.

    `min_parallelism` (opt-in): repartition iff the input has fewer
    partitions than this — rescues local runs over few/unsplittable files
    (single-row-group parquet pins the whole build to one Python worker).
    At real scale input splits outnumber cores, so leave it None: the plan
    stays exchange-free.
    """
    keys = list(by)
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    sdf = df.select(
        *[F.col(k) for k in keys], value.cast("double").alias(_VALUE)
    )
    if min_parallelism and sdf.rdd.getNumPartitions() < min_parallelism:
        sdf = sdf.repartition(min_parallelism)
    sdf = sdf.withColumn("__pid", F.spark_partition_id())

    key_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in sdf.schema.fields
        if f.name in keys
    )
    out_schema = ", ".join(
        x for x in (key_schema, f"{_SALT} int", DIGEST_FIELDS) if x
    )
    # integer key columns group on lossless STRING helpers and come back
    # as nullable Int64 — see pdkeys module docstring for the two ways
    # pandas corrupts raw int64 keys
    sdf, helper, group_cols = with_string_key_helpers(sdf, keys)

    def _unhelp(k: str, v):
        return unhelp_key(helper, k, v)

    def build_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        digests: dict[tuple, MergingDigest] = {}
        rows: dict[tuple, int] = {}
        pid = 0
        for pdf in batches:
            if len(pdf):
                pid = int(pdf["__pid"].iloc[0])
            vals = pdf[_VALUE].to_numpy(dtype=np.float64)
            ok = ~np.isnan(vals)
            # groupby().indices: one pass over the batch, index arrays per
            # group (not a per-group boolean scan of the whole batch)
            idx_by_group = pdf.groupby(group_cols, sort=False, dropna=False).indices
            for g, idx in idx_by_group.items():
                g = g if isinstance(g, tuple) else (g,)
                d = digests.get(g)
                if d is None:
                    d = digests[g] = MergingDigest(delta, scale=get_scale(scale))
                    rows[g] = 0
                v = vals[idx]
                v = v[ok[idx]]
                if v.size:
                    d.add(v)
                    rows[g] += int(v.size)
        if digests:
            out = {}
            for i, k in enumerate(keys):
                vals_k = [_unhelp(k, g[i]) for g in digests]
                out[k] = emit_key_column(helper, k, vals_k)
            out[_SALT] = [pid] * len(digests)
            out["digest"] = [d.to_bytes() for d in digests.values()]
            out["n_rows"] = [rows[g] for g in digests]
            yield pd.DataFrame(out)

    # ship ONLY what the builder reads: the original integer key
    # columns ride along as string helpers, so re-sending them over
    # Arrow would double the key bytes per row
    return sdf.select(*group_cols, _VALUE, "__pid").mapInPandas(
        build_partition, schema=out_schema
    )


def build_partials_per_partition(
    df: DataFrame,
    value_col,
    delta: float = 100.0,
    scale: str = "K_3",
    min_parallelism: int | None = None,
) -> DataFrame:
    """Shuffle-free stage 1 for ungrouped digests: mapInPandas emits ONE
    digest row per input partition (the 100 TB fast path — the raw data
    never crosses the network; only ~KB digest rows do).

    `min_parallelism`: same opt-in low-partition rescue as
    `build_partials_grouped` — None keeps the plan exchange-free."""
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    sdf = df.select(value.cast("double").alias(_VALUE))
    if min_parallelism and sdf.rdd.getNumPartitions() < min_parallelism:
        sdf = sdf.repartition(min_parallelism)
    sdf = sdf.withColumn("__pid", F.spark_partition_id())

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        d = None
        pid = -1
        n = 0
        for pdf in batches:
            vals = pdf[_VALUE].to_numpy(dtype=np.float64)
            vals = vals[~np.isnan(vals)]
            if d is None:
                d = MergingDigest(delta, scale=get_scale(scale))
                if len(pdf):
                    pid = int(pdf["__pid"].iloc[0])
            if vals.size:
                d.add(vals)
                n += vals.size
        if d is not None:
            yield pd.DataFrame(
                {_SALT: [pid], "digest": [d.to_bytes()], "n_rows": [n]}
            )

    return sdf.mapInPandas(per_partition, schema=f"{_SALT} int, {DIGEST_FIELDS}")


def build_partials_multi(
    df: DataFrame,
    value_cols: Sequence[str],
    by: Sequence[str] = (),
    delta: float = 100.0,
    scale: str = "K_3",
    min_parallelism: int | None = None,
) -> DataFrame:
    """Shuffle-free multi-column stage 1: ONE scan builds a digest for
    EVERY listed column (one digest row per (by-group, column, input
    partition); ungrouped when `by` is empty).

    The 100 TB profiling shape: a data-quality report over k numeric
    columns (optionally per group) costs one pass over the table instead
    of k — the scan and Arrow transfer are shared, each batch feeds k
    digests per group in place, and only (groups x k x n_partitions)
    KB-sized rows leave the executors.  Merge with
    `merge_partials(by=[*by, "col"])`.  Per-task state is
    (#groups seen) x k digests — same bound discipline as
    `build_partials_grouped`."""
    cols = list(value_cols)
    keys = list(by)
    sdf = df.select(
        *[F.col(k) for k in keys],
        *[F.col(c).cast("double").alias(c) for c in cols],
    )
    if min_parallelism and sdf.rdd.getNumPartitions() < min_parallelism:
        sdf = sdf.repartition(min_parallelism)
    sdf = sdf.withColumn("__pid", F.spark_partition_id())
    # lossless integer group keys across the pandas boundary (pdkeys)
    sdf, helper, group_cols = with_string_key_helpers(sdf, keys)

    key_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in sdf.schema.fields
        if f.name in keys
    )
    out_schema = ", ".join(
        x
        for x in (key_schema, f"col string, {_SALT} int", DIGEST_FIELDS)
        if x
    )

    def per_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        ds: dict[tuple, MergingDigest] = {}
        ns: dict[tuple, int] = {}
        pid = -1
        seen = False

        def feed(g: tuple, pdf: pd.DataFrame, idx=None) -> None:
            for c in cols:
                arr = pdf[c].to_numpy(dtype=np.float64)
                if idx is not None:
                    arr = arr[idx]
                arr = arr[~np.isnan(arr)]
                if arr.size:
                    k = (*g, c)
                    d = ds.get(k)
                    if d is None:
                        d = ds[k] = MergingDigest(delta, scale=get_scale(scale))
                        ns[k] = 0
                    d.add(arr)
                    ns[k] += int(arr.size)

        for pdf in batches:
            if not seen and len(pdf):
                pid = int(pdf["__pid"].iloc[0])
                seen = True
            if not keys:
                feed((), pdf)
            else:
                for g, idx in pdf.groupby(
                    group_cols, sort=False, dropna=False
                ).indices.items():
                    feed(g if isinstance(g, tuple) else (g,), pdf, idx)
        if seen and ds:
            out = {
                k: emit_key_column(
                    helper, k, [unhelp_key(helper, k, key[i]) for key in ds]
                )
                for i, k in enumerate(keys)
            }
            out["col"] = [key[-1] for key in ds]
            out[_SALT] = [pid] * len(ds)
            out["digest"] = [d.to_bytes() for d in ds.values()]
            out["n_rows"] = [ns[key] for key in ds]
            yield pd.DataFrame(out)

    return sdf.select(*group_cols, *cols, "__pid").mapInPandas(
        per_partition, schema=out_schema
    )


def digest_profile(
    df: DataFrame,
    value_cols: Sequence[str],
    by: Sequence[str] = (),
    delta: float = 100.0,
    scale: str = "K_3",
    min_parallelism: int | None = None,
) -> DataFrame:
    """One-pass digests for every listed column (optionally per group):
    (by..., col, digest, n_rows)."""
    partials = build_partials_multi(
        df, value_cols, by=by, delta=delta, scale=scale,
        min_parallelism=min_parallelism,
    )
    return merge_partials(partials, by=[*by, "col"])


def merge_partials(
    partials: DataFrame,
    by: Sequence[str] = (),
    fanin: int = 64,
    stages: int = 1,
) -> DataFrame:
    """Stage-2 merge: combine digest rows down to one per group.

    Merge order is canonical (ascending salt) so results are reproducible
    across runs and cluster sizes.  With very high partial counts (e.g.
    100k input splits feeding a global digest), set `stages=2`: a first
    pass merges within `salt % fanin` buckets in parallel — a DataFrame
    rendering of `treeAggregate(depth=2)` — before the final single-group
    pass touches only `fanin` rows.
    """
    keys = list(by)
    key_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}" for f in partials.schema.fields
        if f.name in keys
    )
    out_schema = ", ".join(x for x in (key_schema, f"{_SALT} int", DIGEST_FIELDS) if x)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values(_SALT, kind="stable")
        digests = [MergingDigest.from_bytes(b) for b in pdf["digest"]]
        out = digests[0]
        for d in digests[1:]:
            out.merge(d)
        row = {k: [pdf[k].iloc[0]] for k in keys}
        row[_SALT] = [int(pdf[_SALT].min())]
        row["digest"] = [out.to_bytes()]
        row["n_rows"] = [int(pdf["n_rows"].sum())]
        return pd.DataFrame(row)

    cur = partials
    if stages > 1:
        bucket_keys = keys + ["__bucket"]
        cur = cur.withColumn("__bucket", F.pmod(F.col(_SALT), F.lit(fanin)))
        bschema = ", ".join(
            x for x in (key_schema, "__bucket int", f"{_SALT} int", DIGEST_FIELDS) if x
        )

        def merge_bucket(pdf: pd.DataFrame) -> pd.DataFrame:
            out = merge(pdf.drop(columns=["__bucket"]))
            out["__bucket"] = pdf["__bucket"].iloc[0]
            return out[[*keys, "__bucket", _SALT, "digest", "n_rows"]]

        cur = cur.groupBy(*bucket_keys).applyInPandas(merge_bucket, schema=bschema)
        cur = cur.drop("__bucket")

    merged = cur.groupBy(*keys).applyInPandas(merge, schema=out_schema)
    return merged.drop(_SALT)


def digest_by(
    df: DataFrame,
    value_col,
    by: Sequence[str] = (),
    delta: float = 100.0,
    scale: str = "K_3",
    salt: int = 0,
    combine: str = "map",
) -> DataFrame:
    """Convenience: grouped digest build+merge. Returns (by..., digest, n_rows).

    `combine="map"` (default): map-side-combining build — zero raw-row
    shuffle, the 100 TB path.  `combine="shuffle"`: salted groupBy build —
    the fallback for cardinality-explosive group keys (see module doc).
    """
    if combine == "map" and by:
        partials = build_partials_grouped(df, value_col, by=by, delta=delta, scale=scale)
    elif combine == "map":
        partials = build_partials_per_partition(df, value_col, delta=delta, scale=scale)
    else:
        partials = build_partials(
            df, value_col, by=by, delta=delta, scale=scale, salt=salt
        )
    return merge_partials(partials, by=by)


def digest_of(
    df: DataFrame,
    value_col,
    delta: float = 100.0,
    scale: str = "K_3",
    fanin: int = 64,
    stages: int = 1,
) -> MergingDigest:
    """Whole-column digest, driver-side result. Map-side build per partition
    (no data shuffle), tree merge of KB-sized digest rows."""
    partials = build_partials_per_partition(df, value_col, delta=delta, scale=scale)
    merged = merge_partials(partials, by=(), fanin=fanin, stages=stages)
    rows = merged.collect()
    if not rows:
        return MergingDigest(delta, scale=get_scale(scale))
    return MergingDigest.from_bytes(bytes(rows[0]["digest"]))


def quantiles_of(
    digests: DataFrame,
    qs: Iterable[float],
    by: Sequence[str] = (),
    value_name: str = "quantile",
) -> DataFrame:
    """Expand a digest table to one row per (group, q) with the estimate.

    Declarative shape: cross-join with a literal q array (broadcast by
    Catalyst — it is a single-column local relation), then one scalar
    pandas UDF evaluates the digest."""
    from ..functions import tdigest_quantile_udf

    qs = [float(q) for q in qs]
    out = digests.select(
        *by, "digest", F.explode(F.array(*[F.lit(q) for q in qs])).alias("q")
    )
    return out.select(
        *by, "q", tdigest_quantile_udf(F.col("digest"), F.col("q")).alias(value_name)
    )


def cdfs_of(
    digests: DataFrame,
    xs: Iterable[float],
    by: Sequence[str] = (),
    value_name: str = "cdf",
) -> DataFrame:
    from ..functions import tdigest_cdf_udf

    xs = [float(x) for x in xs]
    out = digests.select(
        *by, "digest", F.explode(F.array(*[F.lit(x) for x in xs])).alias("x")
    )
    return out.select(
        *by, "x", tdigest_cdf_udf(F.col("digest"), F.col("x")).alias(value_name)
    )


def digest_drift(
    a: DataFrame,
    b: DataFrame,
    xs: Iterable[float],
    by: Sequence[str] = (),
    per_point: bool = False,
) -> DataFrame:
    """Distribution drift between two digest snapshots, computed FROM THE
    SKETCHES ALONE (no raw re-scan): per group, the maximum absolute CDF
    gap max_x |cdf_a(x) - cdf_b(x)| over the probe grid `xs` — a
    discretized two-sample Kolmogorov-Smirnov statistic, the
    crawl-over-crawl monitoring signal a web pipeline alerts on (did this
    month's text-length / latency / quality distribution move?).

    Inputs are digest tables as produced by `digest_by` / `merge_partials`
    (columns: *by, digest) — e.g. this snapshot's and the previous
    snapshot's checkpointed per-lang sketches.  Groups present in only one
    snapshot are dropped (inner join): drift is defined over common keys.
    NULL group keys match null-safely — present in both snapshots, the
    NULL group is monitored like any other.

    Returns (by..., cdf_drift); `per_point=True` instead returns the full
    (by..., x, cdf_a, cdf_b, cdf_gap) grid for plotting/inspection.

    100 TB plan: both inputs are KB-per-group sketch tables, so the join
    and the |xs|-point expansion move kilobytes.  The corpus scans
    happened when the snapshots were BUILT — monitoring drift between
    crawls is then free, which is exactly why the pipeline checkpoints
    sketches rather than raw quantile vectors.

    Reference parity: cdf per reference semantics (TDigest.jl:381-419,
    defect-corrected per SURVEY §2.3); the two-sample statistic itself has
    no reference counterpart (the reference API is single-digest).
    """
    by = list(by)
    ca = cdfs_of(a, xs, by=by, value_name="cdf_a")
    cb = cdfs_of(b, xs, by=by, value_name="cdf_b")
    # null-SAFE group-key equality: a NULL group key populated in BOTH
    # snapshots is a group like any other (percentile_enrich /
    # quantile_filter semantics) — a name join would silently drop it,
    # indistinguishable from the documented one-sided-group drop
    cbr = cb.select(
        *[F.col(k).alias(f"__b_{k}") for k in by],
        F.col("x").alias("__b_x"),
        "cdf_b",
    )
    cond = F.col("x") == F.col("__b_x")
    for k in by:
        cond = cond & F.col(k).eqNullSafe(F.col(f"__b_{k}"))
    pts = (
        ca.join(cbr, cond, "inner")
        .drop("__b_x", *[f"__b_{k}" for k in by])
        .withColumn("cdf_gap", F.abs(F.col("cdf_a") - F.col("cdf_b")))
    )
    if per_point:
        return pts
    return pts.groupBy(*by).agg(F.max("cdf_gap").alias("cdf_drift"))


def quantile_filter(
    df: DataFrame,
    value_col: str,
    q: float,
    by: Sequence[str] = (),
    delta: float = 100.0,
    scale: str = "K_3",
    keep: str = "ge",
    cutoff_col: str | None = None,
) -> DataFrame:
    """Adaptive quantile gate: keep rows whose `value_col` compares
    `keep`-wise against the PER-GROUP t-digest quantile(q) of that same
    column — the curation pattern "drop the bottom quartile of quality
    per language", where the threshold is data-dependent and group-local
    instead of a hand-tuned global constant.  This is the sketch library
    feeding a pipeline decision, not just a report.

    Plan shape (the 100 TB path): one map-side-combining digest build
    (`digest_by(combine="map")` — raw rows never shuffle, partials are
    KB), a cutoff table of |groups| rows, then a BROADCAST join of the
    cutoffs back onto the corpus with a scan-stage comparison.  The big
    side is scanned exactly twice (build + filter) and shuffled zero
    times.

    `keep`: "ge"/"gt"/"le"/"lt" — which side of the cutoff survives.
    Rows whose group key is NULL join null-safely (NULL is a group like
    any other, matching groupBy semantics); rows whose value is NULL
    never satisfy the comparison and are dropped, like a SQL WHERE.
    Pass `cutoff_col` to retain the threshold that was applied.
    """
    if keep not in ("ge", "gt", "le", "lt"):
        raise ValueError("keep must be one of 'ge', 'gt', 'le', 'lt'")
    d = digest_by(df, value_col, by=by, delta=delta, scale=scale)
    cut = cutoff_col or "__qf_cut"
    cuts = quantiles_of(d, [float(q)], by=by, value_name=cut).drop("q")
    if by:
        renamed = cuts.select(
            *[F.col(c).alias(f"__qf_{c}") for c in by], F.col(cut)
        )
        cond = None
        for c in by:
            term = F.col(c).eqNullSafe(F.col(f"__qf_{c}"))
            cond = term if cond is None else (cond & term)
        joined = df.join(F.broadcast(renamed), cond).drop(
            *[f"__qf_{c}" for c in by]
        )
    else:
        joined = df.crossJoin(F.broadcast(cuts))
    v = F.col(value_col).cast("double")
    c = F.col(cut)
    pred = {"ge": v >= c, "gt": v > c, "le": v <= c, "lt": v < c}[keep]
    out = joined.filter(pred)
    return out if cutoff_col else out.drop(cut)


def percentile_enrich(
    df: DataFrame,
    value_col: str,
    by: Sequence[str] = (),
    delta: float = 100.0,
    scale: str = "K_3",
    out_col: str = "percentile",
    digests: DataFrame | None = None,
    max_groups: int = 100_000,
) -> DataFrame:
    """Attach each row's within-group percentile: `out_col` = the
    group digest's cdf evaluated at the row's own `value_col` — the
    per-document scoring move ("this page's length sits at p93 for its
    language") that turns a distribution sketch into a per-row feature
    for downstream filters and samplers.

    Plan shape (the 100 TB path): one map-side-combining digest build
    (KB partials, zero raw-row shuffle), then the digest table — KB per
    group — travels to workers as an `sc.broadcast` SIDE CHANNEL into a
    single mapInPandas over the corpus.  The corpus is scanned exactly
    twice and shuffled ZERO times, and the digest bytes are materialized
    once per executor, NOT copied per row — deliberately not a broadcast
    join, which would clone the KB digest blob onto every joined row
    (the pq_topk lesson: join-output row-copy moved ~100 GB through a
    6.4M-row join).  Per Arrow batch the rows group in pandas and score
    through the vectorized `cdf_batch` lane (bit-identical to scalar
    `cdf`, tests/test_core.py).

    Pass `digests` (a `digest_by`/`merge_partials` table with columns
    (*by, digest)) to score against a FROZEN snapshot — e.g. last
    crawl's checkpointed sketches — instead of rebuilding; rows whose
    group is absent from it get NULL.  In frozen mode the operator is a
    STATELESS mapInPandas, so it runs unchanged on a streaming
    DataFrame (the monitoring face: score arriving rows against last
    crawl's distribution; chunking-invariant — tests/test_streaming.py).  NULL group keys are groups like
    any other (groupBy semantics).  NULL / non-finite values yield NULL
    (finite probes on a non-empty digest never produce NaN, so NaN is
    an unambiguous missing-marker internally).

    Reference parity: cdf semantics per TDigest.jl:430-544
    (defect-corrected, SURVEY §2.3); the enrichment shape itself is the
    distribution layer feeding the pipeline, no reference counterpart.
    """
    from pyspark.sql import types as T

    by = list(by)
    if digests is None:
        digests = digest_by(df, value_col, by=by, delta=delta, scale=scale)
    # cardinality-explosive `by` guard (the heavy_hitters philosophy):
    # the side channel is for distribution-like keys (lang, source,
    # day — up to ~10^5 KB-sized digests); limit() caps what the driver
    # ever pulls, so a groupBy-user_id mistake raises instead of OOMing.
    rows = digests.select(*by, "digest").limit(max_groups + 1).collect()
    if len(rows) > max_groups:
        raise ValueError(
            f"percentile_enrich: more than max_groups={max_groups} groups; "
            "a digest side channel this large should not broadcast — "
            "reduce the key cardinality or raise max_groups deliberately"
        )

    def _norm_key(k):
        # NaN float group keys: nan != nan would miss every dict lookup,
        # and pandas floats NULL-able numeric keys anyway — fold both
        # sides of the channel to None
        return None if isinstance(k, float) and np.isnan(k) else k

    # integer group keys travel as STRING helper columns: an int64 batch
    # containing one NULL arrives in pandas as float64, silently rounding
    # keys above 2^53 (hash-derived bigints live there) onto wrong or
    # missing table entries.  Spark's long->string cast is plain decimal
    # digits, matching Python str(int) exactly, so strings are lossless.
    int_types = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    field_types = {f.name: f.dataType for f in df.schema.fields}
    helper = {
        c: f"__pe_key_{i}"
        for i, c in enumerate(by)
        if isinstance(field_types.get(c), int_types)
    }
    group_cols = [helper.get(c, c) for c in by]

    def _table_key(r) -> tuple:
        out = []
        for c in by:
            v = _norm_key(r[c])
            if c in helper and v is not None:
                v = str(v)
            out.append(v)
        return tuple(out)

    table = {
        _table_key(r): bytes(r["digest"])
        for r in rows
        if r["digest"] is not None
    }
    bc = df.sparkSession.sparkContext.broadcast(table)
    _BROADCASTS.append(bc)
    out_schema = T.StructType(
        list(df.schema.fields) + [T.StructField(out_col, T.DoubleType(), True)]
    )
    src = df
    if helper:
        src = df.select(
            "*", *[F.col(c).cast("string").alias(h) for c, h in helper.items()]
        )

    def _norm(k):
        # pandas group keys: NaN for NULL numeric keys (None for object),
        # numpy scalars for the rest; collect() gave None / python values.
        if k is None or (isinstance(k, float) and np.isnan(k)):
            return None
        return k.item() if hasattr(k, "item") else k

    helper_names = list(helper.values())

    def enrich(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        cache: dict[tuple, MergingDigest] = {}
        tbl = bc.value
        for pdf in batches:
            n = len(pdf)
            out = np.full(n, np.nan)
            vals = pd.to_numeric(pdf[value_col], errors="coerce").to_numpy(
                dtype=np.float64, na_value=np.nan
            )
            if by:
                groups = pdf.groupby(group_cols, dropna=False, sort=False).indices
            else:
                groups = {(): np.arange(n)}
            for key, idx in groups.items():
                kt = key if isinstance(key, tuple) else (key,)
                kt = tuple(_norm(k) for k in kt)
                d = cache.get(kt)
                if d is None:
                    blob = tbl.get(kt)
                    if blob is None:
                        continue
                    d = MergingDigest.from_bytes(blob)
                    cache[kt] = d
                v = vals[idx]
                mask = np.isfinite(v)
                if mask.any():
                    res = np.full(v.shape, np.nan)
                    res[mask] = d.cdf_batch(v[mask])
                    out[idx] = res
            res_pdf = (
                pdf.drop(columns=helper_names) if helper_names else pdf.copy()
            )
            # nullable Float64 maps NaN -> NULL on the Arrow wire
            res_pdf[out_col] = pd.array(out, dtype="Float64")
            yield res_pdf

    return src.mapInPandas(enrich, out_schema)
