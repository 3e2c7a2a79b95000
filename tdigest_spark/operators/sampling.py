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
    no full sort, no shuffle of non-candidates.

    The order carries the id as tie-break: at 10^9+ ids, 52-bit hash
    collisions are expected (~n²/2^53 pairs), and a colliding pair
    straddling the k boundary would otherwise be resolved by TakeOrdered
    partition-merge order — i.e. by partitioning, the exact
    nondeterminism this operator exists to avoid."""
    u = _unit_hash(F.col(id_col), salt)
    return (
        # NULL ids hash to NULL, which ascending sort puts FIRST — they
        # would fill the whole sample; drop them like every
        # content-keyed operator in this module
        df.withColumn("__u", u)
        .filter(F.col("__u").isNotNull())
        .orderBy("__u", id_col)
        .limit(int(k))
        .drop("__u")
    )


def quota_by_key(
    df: DataFrame,
    key_col: str,
    order_by: Sequence[Column | str],
    k: int,
    rank_col: str | None = None,
    presalt: int | None = None,
    presalt_by: Column | str | None = None,
) -> DataFrame:
    """Per-key quota cap: keep at most `k` rows per `key_col`, preferring
    rows earliest in `order_by` — the host-quota / domain-balancing
    primitive of crawl curation (no single site may dominate the corpus).

    `order_by` MUST be a total order per key (break ties with the id
    column) or the kept set is nondeterministic under re-partitioning —
    the same trap `deterministic_sample` exists to avoid.  Pass
    `rank_col` to also keep the within-key rank (1-based).

    Plan: one hash shuffle on `key_col` + a per-key sort for row_number —
    the minimum any per-key top-k needs.  Skew: a pathological key (one
    host with 10^8 pages) serializes into a single window partition, so
    `presalt=s` adds a salted PRE-CAP stage: rows first rank within
    (key, xxhash64(key, order...) % s) sub-windows — the hot key's sort
    spreads over s reducers — and only each sub-window's top-k (<= s*k
    rows per key, KB not GB) reaches the exact final window.  The kept
    set is IDENTICAL to the plain path by pigeonhole: a row with global
    within-key rank <= k has rank <= k inside any subset containing it,
    so the pre-cap never discards a final survivor.  `presalt_by` is the
    bucketing expression — pass the row id (or any expression that
    varies within a key; order_by entries can't be reused because they
    may be SortOrder expressions, which have no value to hash).  The
    key is hashed alongside it so two keys' rows don't co-bucket
    systematically; determinism is preserved because the bucket depends
    only on row content, never on partitioning.  Default (None) keeps
    the single-window plan — right for every realistic host distribution
    (AQE absorbs moderate skew); reach for presalt when one key holds
    millions of rows.
    """
    from pyspark.sql import Window

    if k < 1:
        raise ValueError("k must be >= 1")
    if presalt is not None and presalt < 2:
        raise ValueError("presalt must be >= 2 (or None for the plain plan)")
    if (presalt is None) != (presalt_by is None):
        raise ValueError("presalt and presalt_by must be passed together")
    cols = [F.col(c) if isinstance(c, str) else c for c in order_by]
    if presalt is not None:
        pb = F.col(presalt_by) if isinstance(presalt_by, str) else presalt_by
        bucket = F.pmod(F.xxhash64(F.col(key_col), pb), F.lit(int(presalt)))
        w1 = Window.partitionBy(F.col(key_col), bucket).orderBy(*cols)
        df = (
            df.withColumn("__qk_pre", F.row_number().over(w1))
            .filter(F.col("__qk_pre") <= int(k))
            .drop("__qk_pre")
        )
    w = Window.partitionBy(key_col).orderBy(*cols)
    rk = "__qk_rank" if rank_col is None else rank_col
    out = df.withColumn(rk, F.row_number().over(w)).filter(F.col(rk) <= int(k))
    return out.drop(rk) if rank_col is None else out


def pack_sequences(
    df: DataFrame,
    id_col: str,
    len_col: str,
    budget: int,
    n_buckets: int = 1024,
    salt: str = "pack",
) -> DataFrame:
    """Sequence packing for pretraining shards: assign documents to
    token-budget bins (packed training sequences) with first-fit-
    decreasing, the classic 11/9·OPT greedy.  Returns one row per input
    row: (id_col, pack_id long, pack_pos long, <len_col> long) where
    pack_pos is the document's position inside its packed sequence.

    Determinism and scale come from the same trick as the rest of this
    module: documents are routed to `n_buckets` CONTENT-KEYED buckets
    (md5(salt||id)), each bucket is packed independently with a
    deterministic in-bucket order (len desc, id asc), and
    pack_id = bucket * 2^32 + local bin index.  The result is invariant
    to partitioning, cluster size, and engine; packing quality is within
    a whisker of global FFD as long as each bucket holds many documents
    relative to the bin capacity (size n_buckets so a bucket is ~10^4-10^6
    docs at your scale — the groupBy is one hash shuffle of
    (id, length) rows, ~16 B each, never the text).

    Packing is inherently sequential per bin, so this is the module's
    one Pandas-UDF operator (applyInPandas per bucket; Arrow-batched
    sort + first-fit over a pruned active-bin list — bins that cannot
    fit the smallest remaining document close forever).  Documents
    longer than `budget` get a bin of their own (pack_pos 0) — callers
    that truncate should chunk first (text.chunk_tokens).  NULL lengths
    count as 0 (packed, no budget consumed), like `freeze_to_budget`.

    Not SQL-expressible (greedy loop), so there is no driver oracle;
    the pytest suite pins assignment totality, capacity, determinism
    under repartitioning, and fill efficiency.
    """
    import pandas as pd

    if budget < 1:
        raise ValueError("budget must be >= 1")
    if n_buckets < 1:
        raise ValueError("n_buckets must be >= 1")
    bucket = F.pmod(
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string"))),
                1, 13,
            ),
            16, 10,
        ).cast("long"),
        F.lit(n_buckets),
    )

    # preserve the caller's id type (string chunk ids are as valid as
    # numeric doc ids); only the length is coerced
    id_type = df.schema[id_col].dataType.simpleString()
    out_schema = f"{id_col} {id_type}, pack_id long, pack_pos long, {len_col} long"

    def _pack(key, pdf: pd.DataFrame) -> pd.DataFrame:
        b = int(key[0])
        order = pdf.sort_values(
            [len_col, id_col], ascending=[False, True], kind="mergesort"
        )
        lens = order[len_col].to_numpy()
        min_need = int(lens[-1]) if len(lens) else 0
        active: list[list[int]] = []  # [remaining, bin_idx] of open bins
        n_bins = 0
        counts: list[int] = []
        pack_id = []
        pack_pos = []
        for ln in lens:
            need = int(ln)
            placed = None
            for slot in active:
                if slot[0] >= need:
                    placed = slot
                    break
            if placed is None:
                placed = [max(budget - need, 0), n_bins]
                counts.append(0)
                n_bins += 1
                active.append(placed)
            else:
                placed[0] -= need
            i = placed[1]
            pack_id.append(b * (1 << 32) + i)
            pack_pos.append(counts[i])
            counts[i] += 1
            # lengths are non-increasing, so a bin that cannot fit the
            # SMALLEST remaining doc is closed forever — this keeps the
            # first-fit scan over a short active list, not all bins
            if placed[0] < min_need:
                active.remove(placed)
        return pd.DataFrame(
            {
                id_col: order[id_col].to_numpy(),
                "pack_id": pack_id,
                "pack_pos": pack_pos,
                len_col: order[len_col].to_numpy(),
            }
        )

    return (
        # NULL lengths count as 0 (the doc is packed, occupies no
        # budget), mirroring freeze_to_budget — a raw NULL would arrive
        # as NaN pandas-side and crash int() mid-task
        df.select(
            F.col(id_col),
            F.coalesce(F.col(len_col).cast("long"), F.lit(0)).alias(len_col),
        )
        .withColumn("__bk", bucket)
        .groupBy("__bk")
        .applyInPandas(_pack, out_schema)
    )


def mixture_sample(
    df: DataFrame,
    id_col: str,
    strata_col: str,
    weights: dict,
    default_weight: float = 0.0,
    salt: str = "mix",
    copy_col: str = "copy",
) -> DataFrame:
    """Dataset-mixture sampling with epoch up-weighting: each stratum is
    repeated `weights[stratum]` times in expectation — an integer number
    of full passes plus a deterministically sampled fractional pass
    (weight 2.4 = every doc twice + a 40% content-keyed sample for the
    third pass).  This is the standard data-mixing move when assembling
    a training corpus from sources of unequal quality/size; weight < 1
    degenerates to `stratified_sample`, weight >= 1 up-weights.

    Copy i of a row survives iff u_i(id) < weight - i, where
    u_i = md5(salt:i:id) in [0, 1) — so each extra pass draws an
    independent content-keyed sample, and a document's multiset of
    copies is invariant to partitioning, cluster size, and engine.
    Output repeats the input row once per surviving copy with
    `copy_col` = 0, 1, ...; downstream packing/shuffling treats copies
    as distinct training examples.

    Plan: a literal copy-index array is exploded in the scan stage and
    filtered by a scalar predicate — no shuffle, no UDF, no join; cost
    is O(rows x ceil(max weight)).  Rows whose stratum is absent from
    `weights` (including NULL strata) get `default_weight`.
    """
    import math

    if default_weight < 0 or any(w < 0 for w in weights.values()):
        raise ValueError("weights must be >= 0")
    max_w = max([default_weight, *weights.values()], default=0.0)
    max_copies = max(1, math.ceil(max_w))
    rate: Column = F.lit(float(default_weight))
    for s, w in sorted(weights.items()):
        rate = F.when(F.col(strata_col) == s, F.lit(float(w))).otherwise(rate)
    out = df.select(
        "*",
        F.explode(
            F.array(*[F.lit(i) for i in range(max_copies)])
        ).alias(copy_col),
    )
    h = F.md5(
        F.concat(
            F.lit(salt + ":"),
            F.col(copy_col).cast("string"),
            F.lit(":"),
            F.col(id_col).cast("string"),
        )
    )
    u = F.conv(F.substring(h, 1, 13), 16, 10).cast("double") / F.lit(_HEX13)
    return out.filter(u < rate - F.col(copy_col).cast("double"))


def freeze_to_budget(
    df: DataFrame,
    id_col: str,
    len_col: str,
    budget: int,
    salt: str = "freeze",
) -> DataFrame:
    """Freeze a corpus to a token budget: keep the deterministic prefix
    of the corpus — documents ordered by content hash u(id) — whose
    INCLUSIVE running sum of `len_col` stays within `budget`.  The kept
    set is a fixed, engine-reproducible "dataset freeze": re-running on
    a re-partitioned or re-shuffled copy of the same corpus selects the
    same documents, and growing the corpus only perturbs the selection
    near the hash boundary (reservoir-style stability).

    Scale design: a naive windowed cumsum needs ONE global sort + a
    single-partition running total — THE bottleneck at 10^12 docs.  The
    hash order is uniform by construction, so instead the 52-bit hash
    space is cut into 4096 fixed ranges (the first 3 hex chars of the
    md5): one partial-aggregating pass computes per-range length sums
    (<= 4096 rows to the driver), a driver prefix scan finds the single
    BOUNDARY range, and only that range — ~1/4096 of the (id, len)
    lane, never the text — is exactly cumsum'd; its kept ids come back
    as a broadcast semi-join.  Ranges below the boundary pass a
    scan-stage predicate untouched; ranges above are pruned in the scan.

    NULL `len_col` counts as 0 (the row is kept if reached); rows with
    NULL `id_col` hash to NULL and are dropped, like every content-keyed
    operator in this module.
    """
    from pyspark.sql import Window

    if budget < 0:
        raise ValueError("budget must be >= 0")
    h = F.md5(F.concat(F.lit(salt + ":"), F.col(id_col).cast("string")))
    rng = F.conv(F.substring(h, 1, 3), 16, 10).cast("int")
    u = F.conv(F.substring(h, 1, 13), 16, 10).cast("double") / F.lit(_HEX13)
    ln = F.coalesce(F.col(len_col).cast("long"), F.lit(0))
    lane = df.select(
        F.col(id_col),
        ln.alias("__fz_len"),
        rng.alias("__fz_r"),
        u.alias("__fz_u"),
    )
    sums = {
        row["__fz_r"]: row["s"]
        for row in lane.groupBy("__fz_r").agg(F.sum("__fz_len").alias("s")).collect()
        if row["__fz_r"] is not None
    }
    running = 0
    boundary = None
    for i in range(4096):
        s = int(sums.get(i, 0))
        if running + s > budget:
            boundary = i
            break
        running += s
    if boundary is None:
        return df.filter(rng.isNotNull())  # whole corpus fits
    w = (
        Window.orderBy("__fz_u", id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    kept_ids = (
        lane.filter(F.col("__fz_r") == boundary)
        .withColumn("__fz_cum", F.sum("__fz_len").over(w))
        .filter(F.col("__fz_cum") <= F.lit(budget - running))
        .select(id_col)
    )
    below = df.filter(rng < F.lit(boundary))
    at = df.filter(rng == F.lit(boundary)).join(
        F.broadcast(kept_ids), id_col, "left_semi"
    )
    return below.unionByName(at)


def weighted_sample_by(
    df: DataFrame,
    id_col: str,
    weight_col: str,
    k: int,
    by: Sequence[str] | None = None,
    salt: str = "wsample",
    method: str = "exp",
    rank_col: str = "sample_rank",
) -> DataFrame:
    """Deterministic weighted sampling WITHOUT replacement: k winners
    (per `by` group, or globally) drawn with probability proportional
    to `weight_col` — the weighted twin of `deterministic_fixed_sample`
    and the building block for "pick 10k docs per language, long docs
    proportionally more often" curation draws.

    Two key functions, both content-keyed off u(id) = md5-uniform:

    - method="exp" (default): key = -ln(u)/w, keep the k SMALLEST —
      the Efraimidis–Spirakis exponential-jumps scheme (keys are
      Exp(w) variates; "Weighted random sampling with a reservoir",
      IPL 2006).  Exact WRS-without-replacement distribution: for k=1
      the inclusion probability is exactly w_i/ΣW.
    - method="ratio": key = u/w — Ohlsson's *sequential Poisson
      sampling* (πps approximation).  Every operation is exact IEEE
      arithmetic (one divide; no libm), so the selection is
      bit-reproducible across engines — this is the lane the DuckDB
      driver oracle runs, since ln() is not guaranteed bit-identical
      between the JVM and a C libm.

    Like reservoir sampling, the candidate state is mergeable: the
    bottom-k keys of a union are the bottom-k of the per-part
    bottom-k's, so partial top-k per partition + one k-row combine is
    associative (globally Spark's TakeOrdered does exactly that;
    per-group the shuffle carries only the (by, id, w, key) lane —
    never the text).

    Returns the NARROW winners frame (by…, id_col, weight double,
    rank_col 1-based by ascending key); semi-join it back for full
    rows.  Rows with NULL/≤0 weight or NULL id are excluded (they have
    zero selection mass).  Ties (identical keys) break by id, so the
    draw is a total order and partition/engine invariant.
    """
    if k < 1:
        raise ValueError("k must be >= 1")
    if method not in ("exp", "ratio"):
        raise ValueError("method must be 'exp' or 'ratio'")
    u = _unit_hash(F.col(id_col), salt)
    w = F.col(weight_col).cast("double")
    if method == "exp":
        # Spark's log() yields NULL at 0; u == 0 (a 52-bit md5 prefix of
        # zero) is the worst possible E-S key (u^(1/w) == 0), i.e. +inf
        key = F.when(u > 0, -F.log(u) / w).otherwise(F.lit(float("inf")))
    else:
        key = u / w
    lane = (
        df.filter(F.col(id_col).isNotNull() & (w > 0))
        .select(
            *[F.col(c) for c in (by or [])],
            F.col(id_col),
            w.alias("__ws_w"),
            key.alias("__ws_key"),
        )
    )
    if not by:
        winners = lane.orderBy("__ws_key", id_col).limit(int(k))
        from pyspark.sql import Window

        wspec = Window.orderBy("__ws_key", id_col)
        winners = winners.withColumn(rank_col, F.row_number().over(wspec))
    else:
        from pyspark.sql import Window

        wspec = Window.partitionBy(*by).orderBy("__ws_key", id_col)
        winners = (
            lane.withColumn(rank_col, F.row_number().over(wspec))
            .filter(F.col(rank_col) <= int(k))
        )
    return winners.select(
        *(by or []), id_col, F.col("__ws_w").alias("weight"), rank_col
    )


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

def cluster_balanced_sample(
    emb: DataFrame,
    centroids: DataFrame,
    k_per_cell: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    seed: str = "cbs",
    rank_col: str | None = None,
) -> DataFrame:
    """Diversity sampling over an embedding column: assign every vector
    to its nearest centroid (cosine; `ivf_assign` — small quantizers
    argmin in the scan stage, zero corpus shuffle), then keep at most
    `k_per_cell` per cell chosen by a content-keyed md5 order — so no
    semantic neighborhood dominates the sample, the within-cell pick is
    unbiased, and the kept set is partitioning/growth-invariant (a
    vector's key never changes when the corpus grows).

    Returns the NARROW frame (id_col, cell[, rank_col]) — join it back
    to fetch payloads; only (id, cell, 32-byte key) rows cross the
    quota window's shuffle, never vectors or text.  `centroids` comes
    from `ivf_train`/`ivf_refine` (or any small (centroid_id, centroid)
    table); pick n_cells ~ target_sample/k so cells stay balanced.
    """
    from .similarity import ivf_assign

    assigned = ivf_assign(
        emb.select(F.col(id_col), F.col(vec_col)), centroids, id_col, vec_col
    ).select(F.col(id_col), F.col("ivf_cell").alias("cell"))
    key = F.md5(
        F.concat(F.lit(seed + ":"), F.col(id_col).cast("string"))
    )
    narrow = assigned.withColumn("__cbs_key", key)
    out = quota_by_key(
        narrow,
        "cell",
        [F.asc("__cbs_key"), F.asc(F.col(id_col))],
        k_per_cell,
        rank_col=rank_col,
    )
    return out.drop("__cbs_key")
