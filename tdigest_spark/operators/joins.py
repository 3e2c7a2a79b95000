"""Custom join flavors Spark lacks as built-ins.

asof_join: for each left row, attach the most recent right row at or
before (backward) / the earliest at or after (forward) its timestamp,
per group — the time-series enrichment join (market data, sensor
alignment, sessionized web events).

Spark has no native ASOF JOIN (DuckDB and pandas do — both serve as
oracles for this implementation).  The naive formulations are
scale-hostile: a range theta-join explodes to a per-group cross product,
and a per-key driver loop is not distributed at all.  This operator is
the single-shuffle formulation:

    tag left/right rows -> union -> ONE window over (by..., ts, tag)
    -> last(right_payload, ignorenulls=True) carry-forward -> keep left

The union stream shuffles once on the group key (the window's
partitionBy); payload travels as a single struct column that is NULL on
left rows, so the carry-forward is one `last(ignorenulls)` — no join
node, no range expansion, no skew beyond what the group key already
has.  Cost at 100 TB: identical to one windowed aggregation over
left+right, which is the floor for this semantics.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import Column, DataFrame, Window, functions as F

_TAG = "__asof_tag"
_PAYLOAD = "__asof_payload"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    by: Sequence[str] = (),
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """As-of join `left` to `right` on `ts_col` within `by` groups.

    direction="backward": match the latest right row with
    right.ts <= left.ts (DuckDB `ASOF JOIN ... ON l.ts >= r.ts`,
    pandas `merge_asof(direction="backward")`).
    direction="forward": earliest right row with right.ts >= left.ts.

    Unmatched left rows keep NULL payload (LEFT-join semantics).
    Right rows with NULL `ts_col` are ignored (they cannot be an as-of
    match); left rows with NULL ts come back unmatched.
    `tolerance_seconds` additionally nulls out matches farther than the
    tolerance from the left timestamp (pandas `tolerance=`).

    Tie discipline: a right row at exactly left.ts matches (inclusive);
    among right rows sharing one timestamp in a group the LAST under
    (ts, original column order) wins for backward (first for forward) —
    callers needing a total order should pre-dedup right per (by, ts).

    Returns every left column plus each `right_cols` entry as
    `<name><suffix>` and `<ts_col><suffix>` (the matched right
    timestamp, NULL when unmatched).

    Scale note: parallelism is the `by` cardinality (the window's
    partitionBy).  With `by=()` or a handful of groups the whole stream
    sorts inside one task per group — for a global as-of join at scale
    use `asof_join_global`, which time-buckets the stream and carries
    the previous bucket's last right row in (same semantics, tested
    equal; parallelism = number of buckets).
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    keys = list(by)
    if right_cols is None:
        right_cols = [c for c in right.columns if c != ts_col and c not in keys]

    payload = F.struct(
        F.col(ts_col).alias("__ts"), *[F.col(c) for c in right_cols]
    )
    # backward: right rows must sort BEFORE a left row with equal ts so
    # last() sees them (tag 0 < 1); forward mirrors with reversed order.
    # right rows with NULL ts can never be a legitimate as-of match —
    # unfiltered they sort FIRST under the ascending window order and
    # phantom-match every left row before the first real right row
    # (with the matched-ts column showing NULL as if unmatched)
    r = right.filter(F.col(ts_col).isNotNull()).select(
        *keys, F.col(ts_col), F.lit(0).alias(_TAG), payload.alias(_PAYLOAD)
    )
    left_cols = left.columns
    l = left.select(
        *left_cols, F.lit(1).alias(_TAG), F.lit(None).cast(
            r.schema[_PAYLOAD].dataType
        ).alias(_PAYLOAD)
    )
    unioned = l.unionByName(r.select(*keys, ts_col, _TAG, _PAYLOAD),
                            allowMissingColumns=True)

    if direction == "backward":
        order: list[Column] = [F.col(ts_col).asc(), F.col(_TAG).asc()]
    else:
        order = [F.col(ts_col).desc(), F.col(_TAG).asc()]
    w = (
        Window.partitionBy(*keys)
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = unioned.withColumn(
        _PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w)
    ).filter(F.col(_TAG) == 1)

    matched_ts = F.col(f"{_PAYLOAD}.__ts")
    if tolerance_seconds is not None:
        gap = F.abs(
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            - F.unix_micros(matched_ts.cast("timestamp"))
        )
        carried = carried.withColumn(
            _PAYLOAD,
            F.when(
                gap <= int(tolerance_seconds * 1_000_000), F.col(_PAYLOAD)
            ),
        )

    out_cols = [F.col(c) for c in left_cols]
    out_cols.append(F.col(f"{_PAYLOAD}.__ts").alias(f"{ts_col}{suffix}"))
    out_cols += [
        F.col(f"{_PAYLOAD}.{c}").alias(f"{c}{suffix}") for c in right_cols
    ]
    return carried.select(*out_cols)


def range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_col: str,
    start_col: str,
    end_col: str,
    by: Sequence[str] = (),
    bucket_width: float = 1.0,
) -> DataFrame:
    """Point-in-interval join ([start, end) containment) as an EQUI-join.

    Spark executes a naive inequality join (`p >= lo AND p < hi`) as
    BroadcastNestedLoopJoin or a cartesian product — O(|points| x
    |intervals|) per group.  This formulation buckets the number line at
    `bucket_width`: each interval explodes to the buckets it covers, each
    point computes its single bucket, and the match becomes a hash
    equi-join on (by..., bucket) followed by the exact containment
    filter.  Cost: one shuffle of points + |interval| x
    (len/bucket_width) bucket rows; pick bucket_width near the median
    interval length so the explode factor stays small.  Overlapping
    intervals yield one output row per match (inner-join semantics);
    each (point, interval) pair meets in exactly one bucket (the
    point's), so no dedup is needed.
    """
    keys = list(by)
    w = float(bucket_width)
    p_b = F.floor(F.col(point_col) / w)
    iv = intervals.withColumn(
        "__bucket",
        F.explode(
            F.sequence(
                F.floor(F.col(start_col) / w),
                F.floor(F.col(end_col) / w),
            )
        ),
    )
    pt = points.withColumn("__bucket", p_b)
    joined = pt.join(iv, [*keys, "__bucket"]).filter(
        (F.col(point_col) >= F.col(start_col))
        & (F.col(point_col) < F.col(end_col))
    )
    return joined.drop("__bucket")


def asof_join_global(
    left: DataFrame,
    right: DataFrame,
    ts_col: str,
    bucket: str = "1 hour",
    right_cols: Sequence[str] | None = None,
    suffix: str = "_right",
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """GLOBAL as-of join (no group key) that stays parallel at scale.

    `asof_join` with `by=()` sorts the whole stream inside one window
    task.  This formulation buckets the timeline at `bucket` width so
    parallelism is the number of buckets:

    1. per bucket, the plain tagged-union window carry-forward runs
       independently (partitionBy the bucket id);
    2. rows preceding their bucket's first right row take the CARRY-IN:
       the last right payload of any earlier bucket, computed from a
       per-bucket summary (one tiny row per non-empty right bucket —
       the only single-partition window runs over that KB-sized table)
       and broadcast back.

    direction="forward" reuses the same machinery on negated
    timestamps (earliest-at-or-after == latest-at-or-before under
    negation).  Semantics identical to `asof_join(by=())` — tested
    equal — including tolerance and LEFT-join NULLs.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if right_cols is None:
        right_cols = [c for c in right.columns if c != ts_col]
    sign = 1 if direction == "backward" else -1
    bucket_us = _interval_us(bucket)

    key = (F.unix_micros(F.col(ts_col).cast("timestamp")) * sign).alias("__k")
    payload = F.struct(
        F.col(ts_col).alias("__ts"), *[F.col(c) for c in right_cols]
    )
    # NULL-ts right rows: same phantom-match hole as asof_join, one
    # level up (a NULL bucket's summary would sort first in the carry
    # window and become every early bucket's carry-in payload)
    r = right.filter(F.col(ts_col).isNotNull()).select(
        key, F.lit(0).alias(_TAG), payload.alias(_PAYLOAD)
    )
    left_cols = left.columns
    l = left.select(
        *left_cols,
        key,
        F.lit(1).alias(_TAG),
        F.lit(None).cast(r.schema[_PAYLOAD].dataType).alias(_PAYLOAD),
    )
    u = l.unionByName(r, allowMissingColumns=True).withColumn(
        "__b", F.floor(F.col("__k") / F.lit(bucket_us))
    )

    # per-bucket last right payload; buckets then need the carry from
    # the nearest EARLIER right bucket.  The summary is one row per
    # non-empty right bucket (KB-sized); a running last(ignorenulls)
    # window over the union of summary and needed buckets resolves every
    # carry in one O(B log B) sort — no inequality join (which Spark
    # executes as a BroadcastNestedLoopJoin, O(B^2) in bucket count: fine
    # at hour grain, quadratic if a caller picks minute buckets over
    # years).  Tag order puts the needing bucket BEFORE its own summary
    # row, so a bucket's carry comes from strictly earlier buckets only.
    rb = r.withColumn("__b", F.floor(F.col("__k") / F.lit(bucket_us)))
    summary = rb.groupBy("__b").agg(F.max_by(_PAYLOAD, "__k").alias("__last"))
    payload_t = r.schema[_PAYLOAD].dataType
    need = u.select("__b").distinct().select(
        "__b", F.lit(0).alias(_TAG), F.lit(None).cast(payload_t).alias("__last")
    )
    cw = (
        Window.orderBy("__b", _TAG)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carry_all = (
        summary.select("__b", F.lit(1).alias(_TAG), "__last")
        .unionByName(need)
        .withColumn("__carry", F.last("__last", ignorenulls=True).over(cw))
        .filter(F.col(_TAG) == 0)
        .select("__b", "__carry")
    )

    w = (
        Window.partitionBy("__b")
        .orderBy("__k", _TAG)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    carried = (
        u.withColumn(_PAYLOAD, F.last(_PAYLOAD, ignorenulls=True).over(w))
        .filter(F.col(_TAG) == 1)
        .join(F.broadcast(carry_all), "__b", "left")
        .withColumn(_PAYLOAD, F.coalesce(F.col(_PAYLOAD), F.col("__carry")))
    )

    matched_ts = F.col(f"{_PAYLOAD}.__ts")
    if tolerance_seconds is not None:
        gap = F.abs(
            F.unix_micros(F.col(ts_col).cast("timestamp"))
            - F.unix_micros(matched_ts.cast("timestamp"))
        )
        carried = carried.withColumn(
            _PAYLOAD,
            F.when(
                gap <= int(tolerance_seconds * 1_000_000), F.col(_PAYLOAD)
            ),
        )

    out_cols = [F.col(c) for c in left_cols]
    out_cols.append(F.col(f"{_PAYLOAD}.__ts").alias(f"{ts_col}{suffix}"))
    out_cols += [
        F.col(f"{_PAYLOAD}.{c}").alias(f"{c}{suffix}") for c in right_cols
    ]
    return carried.select(*out_cols)


def _interval_us(interval: str) -> int:
    qty, unit = interval.split()
    mult = {
        "second": 1, "seconds": 1,
        "minute": 60, "minutes": 60,
        "hour": 3600, "hours": 3600,
        "day": 86400, "days": 86400,
    }[unit]
    return int(qty) * mult * 1_000_000
