"""asof_join vs the pandas merge_asof oracle (backward/forward,
tolerance, unmatched rows, multiple groups)."""

from __future__ import annotations

import datetime as dt

import numpy as np
import pandas as pd
import pytest

from tdigest_spark.operators.joins import asof_join


@pytest.fixture(scope="module")
def frames():
    rng = np.random.default_rng(7)
    base = dt.datetime(2024, 3, 1)
    left_rows, right_rows = [], []
    for g in ("a", "b"):
        lts = np.sort(rng.choice(86_400, size=200, replace=False))
        rts = np.sort(rng.choice(86_400, size=40, replace=False))
        for i, t in enumerate(lts):
            left_rows.append((g, base + dt.timedelta(seconds=int(t)), float(i)))
        for i, t in enumerate(rts):
            right_rows.append((g, base + dt.timedelta(seconds=int(t)), float(100 + i)))
    lpdf = pd.DataFrame(left_rows, columns=["g", "ts", "x"])
    rpdf = pd.DataFrame(right_rows, columns=["g", "ts", "y"])
    return lpdf, rpdf


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_matches_pandas(spark, frames, direction):
    lpdf, rpdf = frames
    got = (
        asof_join(
            spark.createDataFrame(lpdf),
            spark.createDataFrame(rpdf),
            "ts",
            by=["g"],
            direction=direction,
        )
        .toPandas()
        .sort_values(["g", "ts"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        lpdf.sort_values("ts"),
        rpdf.sort_values("ts"),
        on="ts",
        by="g",
        direction=direction,
    ).sort_values(["g", "ts"]).reset_index(drop=True)
    assert got["y_right"].fillna(-1).tolist() == exp["y"].fillna(-1).tolist()


def test_asof_tolerance_and_unmatched(spark, frames):
    lpdf, rpdf = frames
    got = (
        asof_join(
            spark.createDataFrame(lpdf),
            spark.createDataFrame(rpdf),
            "ts",
            by=["g"],
            direction="backward",
            tolerance_seconds=600,
        )
        .toPandas()
        .sort_values(["g", "ts"])
        .reset_index(drop=True)
    )
    exp = pd.merge_asof(
        lpdf.sort_values("ts"),
        rpdf.sort_values("ts"),
        on="ts",
        by="g",
        direction="backward",
        tolerance=pd.Timedelta(seconds=600),
    ).sort_values(["g", "ts"]).reset_index(drop=True)
    assert got["y_right"].fillna(-1).tolist() == exp["y"].fillna(-1).tolist()
    # unmatched (early) left rows exist and carry NULLs
    assert got["y_right"].isna().any()
    assert len(got) == len(lpdf)


def test_asof_single_shuffle_plan(spark, frames):
    """The promised plan: ONE exchange (the window partitionBy) above
    the two scans — no join node, no range expansion."""
    lpdf, rpdf = frames
    out = asof_join(
        spark.createDataFrame(lpdf), spark.createDataFrame(rpdf), "ts", by=["g"]
    )
    simple = out._jdf.queryExecution().executedPlan().toString()
    assert "Join" not in simple
    assert simple.count("Exchange") <= 2  # hash repartition (+AQE read)


def test_range_join_matches_naive(spark):
    """Bucketized range join == the naive inequality join, without the
    nested-loop plan."""
    rng = np.random.default_rng(11)
    pts = spark.createDataFrame(
        [(int(i), float(v)) for i, v in enumerate(rng.uniform(0, 500, 500))],
        "pid long, v double",
    )
    bands = spark.createDataFrame(
        [(i, float(i * i * 5), float((i + 1) * (i + 1) * 5)) for i in range(10)],
        "band long, lo double, hi double",
    )
    from tdigest_spark.operators.joins import range_join

    got = (
        range_join(pts, bands, "v", "lo", "hi", bucket_width=25.0)
        .select("pid", "band")
        .collect()
    )
    exp = (
        pts.join(bands, (pts.v >= bands.lo) & (pts.v < bands.hi))
        .select("pid", "band")
        .collect()
    )
    assert sorted(map(tuple, got)) == sorted(map(tuple, exp))

    plan = (
        range_join(pts, bands, "v", "lo", "hi", bucket_width=25.0)
        ._jdf.queryExecution().executedPlan().toString()
    )
    assert "NestedLoop" not in plan and "Cartesian" not in plan


@pytest.mark.parametrize("direction", ["backward", "forward"])
def test_asof_global_bucketed_equals_single_window(spark, frames, direction):
    """asof_join_global (time-bucketed, parallel) == asof_join(by=())
    (single window), including rows before any right row and tolerance."""
    from tdigest_spark.operators.joins import asof_join_global

    lpdf, rpdf = frames
    l = spark.createDataFrame(lpdf.drop(columns=["g"]))
    r = spark.createDataFrame(rpdf.drop(columns=["g"]).drop_duplicates("ts"))
    for tol in (None, 600):
        base = (
            asof_join(l, r, "ts", by=(), direction=direction,
                      tolerance_seconds=tol)
            .toPandas().sort_values(["ts", "x"]).reset_index(drop=True)
        )
        got = (
            asof_join_global(l, r, "ts", bucket="1 hour",
                             direction=direction, tolerance_seconds=tol)
            .toPandas().sort_values(["ts", "x"]).reset_index(drop=True)
        )
        assert got["y_right"].fillna(-1).tolist() == base["y_right"].fillna(-1).tolist(), (direction, tol)
        assert got["ts_right"].fillna(0).tolist() == base["ts_right"].fillna(0).tolist()


def test_asof_join_ignores_null_ts_right_rows(spark):
    """A right row with NULL timestamp must never match (it used to sort
    first under the window order and phantom-match every left row before
    the first real right row) — in both the grouped and global lanes."""
    from datetime import datetime

    from tdigest_spark.operators.joins import asof_join, asof_join_global

    t = lambda s: datetime.fromisoformat(s)  # noqa: E731
    left = spark.createDataFrame(
        [(1, t("2024-01-01 00:00:10")), (2, t("2024-01-01 00:00:20"))],
        "event_id long, ts timestamp",
    )
    right = spark.createDataFrame(
        [(None, 99.0), (t("2024-01-01 00:00:15"), 42.0)],
        "ts timestamp, value double",
    )
    out = {r["event_id"]: (r["value_right"], r["ts_right"])
           for r in asof_join(left, right, "ts").collect()}
    assert out[1] == (None, None)            # before the first REAL right row
    assert out[2][0] == 42.0                 # matches the real row

    outg = {r["event_id"]: r["value_right"]
            for r in asof_join_global(left, right, "ts", bucket="1 hour").collect()}
    assert outg[1] is None and outg[2] == 42.0
