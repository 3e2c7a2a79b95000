"""End-to-end Spark digest tests: distributed build+merge equals a local
digest over the same values (byte-identical in the canonical path), and
quantiles match the exact oracle in the singleton regime."""

import numpy as np
import pytest
from pyspark.sql import functions as F

from tdigest_spark.core import MergingDigest
from tdigest_spark.operators import (
    build_partials,
    build_partials_per_partition,
    digest_by,
    digest_of,
    merge_partials,
    quantiles_of,
)

from .conftest import SF_DIR
from .util import quantile_ref


@pytest.fixture(scope="module")
def lineitem(spark):
    return spark.read.parquet(f"{SF_DIR}/lineitem.parquet").cache()


def test_global_digest_matches_oracle(spark, lineitem):
    vals = np.array([r[0] for r in lineitem.select("l_quantity").collect()])
    d = digest_of(lineitem, "l_quantity", delta=100)
    assert d.total_weight == len(vals)
    sv = np.sort(vals)
    for q in [0.01, 0.5, 0.99]:
        est = d.quantile(q)
        rank = np.searchsorted(sv, est, side="right") / sv.size
        assert abs(rank - q) <= 0.02, (q, est, rank)
    assert d.quantile(0.0) == sv[0]
    assert d.quantile(1.0) == sv[-1]
    assert d.check_weights()


def test_grouped_digest_singleton_exact(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    digests = digest_by(docs, "n_chars", by=["lang"], delta=500)
    rows = {r["lang"]: r for r in digests.collect()}
    pdf = docs.select("lang", "n_chars").toPandas()
    for lang, grp in pdf.groupby("lang"):
        d = MergingDigest.from_bytes(bytes(rows[lang]["digest"]))
        vals = grp["n_chars"].to_numpy(dtype=float)
        assert d.total_weight == len(vals)
        for q in [0.1, 0.5, 0.9]:
            assert d.quantile(q) == quantile_ref(vals, q), (lang, q)


def test_salted_build_same_result_in_singleton_regime(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    plain = digest_by(docs, "n_chars", by=["lang"], delta=500, salt=0)
    salted = digest_by(docs, "n_chars", by=["lang"], delta=500, salt=8)
    a = {r["lang"]: bytes(r["digest"]) for r in plain.collect()}
    b = {r["lang"]: bytes(r["digest"]) for r in salted.collect()}
    # singleton regime: pure multiset union -> byte-identical however split
    assert a == b


def test_map_combine_equals_shuffle_build_in_singleton_regime(spark):
    """The default map-side-combine grouped build and the salted-shuffle
    fallback are the same multiset union -> byte-identical digests while
    in the singleton regime."""
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    mapped = digest_by(docs, "n_chars", by=["lang"], delta=500, combine="map")
    shuffled = digest_by(
        docs, "n_chars", by=["lang"], delta=500, salt=8, combine="shuffle"
    )
    a = {r["lang"]: (bytes(r["digest"]), r["n_rows"]) for r in mapped.collect()}
    b = {r["lang"]: (bytes(r["digest"]), r["n_rows"]) for r in shuffled.collect()}
    assert a == b


def test_map_combine_multi_key_with_date(spark):
    """Map-combine grouping over a (string, date) composite key round-trips
    key types through Arrow and matches per-group exact quantiles."""
    ev = spark.read.parquet(f"{SF_DIR}/events.parquet").withColumn(
        "day", F.to_date(F.col("ts"))
    )
    out = digest_by(ev, "value", by=["event_type", "day"], delta=5000).collect()
    pdf = ev.select("event_type", "day", "value").toPandas()
    assert len(out) == len(pdf.groupby(["event_type", "day"]))
    for r in out[:10]:
        grp = pdf[(pdf["event_type"] == r["event_type"]) & (pdf["day"] == r["day"])]
        vals = grp["value"].to_numpy(dtype=float)
        d = MergingDigest.from_bytes(bytes(r["digest"]))
        assert d.total_weight == len(vals)
        assert d.quantile(0.5) == quantile_ref(vals, 0.5)


def test_salt_cols_split_constant_hot_group(spark):
    """A group whose value is one repeated constant degenerates to a single
    salt bucket when salting on the value alone; mixing a row-unique column
    via salt_cols splits it across buckets (same final digest)."""
    rows = [(i, "hot", 42.0) for i in range(400)] + [(1000 + i, "cold", float(i)) for i in range(40)]
    df = spark.createDataFrame(rows, "row_id long, k string, v double").repartition(8)

    value_only = build_partials(df, "v", by=["k"], salt=8)
    n_value = value_only.filter(F.col("k") == "hot").count()
    assert n_value == 1  # degenerate: one bucket holds all 400 rows

    entropic = build_partials(df, "v", by=["k"], salt=8, salt_cols=["row_id"])
    n_entropic = entropic.filter(F.col("k") == "hot").count()
    assert n_entropic == 8  # spread across every salt bucket

    # the final digest is identical either way (multiset union, singleton regime)
    a = merge_partials(value_only, by=["k"]).collect()
    b = merge_partials(entropic, by=["k"]).collect()
    da = {r["k"]: bytes(r["digest"]) for r in a}
    db = {r["k"]: bytes(r["digest"]) for r in b}
    assert da == db


def test_quantiles_of_table(spark):
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    digests = digest_by(docs, "n_chars", by=["lang"], delta=500)
    out = quantiles_of(digests, [0.5, 0.9], by=["lang"]).collect()
    langs = {r["lang"] for r in out}
    assert len(out) == 2 * len(langs)
    pdf = docs.select("lang", "n_chars").toPandas()
    for r in out:
        grp = pdf[pdf["lang"] == r["lang"]]["n_chars"].to_numpy(dtype=float)
        assert r["quantile"] == quantile_ref(grp, r["q"])


def test_sql_registration(spark):
    from tdigest_spark.functions import register_sql_functions

    register_sql_functions(spark)
    docs = spark.read.parquet(f"{SF_DIR}/documents.parquet")
    digest_by(docs, "n_chars", by=["lang"], delta=500).createOrReplaceTempView(
        "doc_digests"
    )
    rows = spark.sql(
        """SELECT lang, tdigest_quantile(digest, 0.5) AS p50,
                  tdigest_cdf(digest, 1000.0) AS cdf_1k,
                  tdigest_total_weight(digest) AS n,
                  tdigest_min(digest) AS mn, tdigest_max(digest) AS mx
           FROM doc_digests"""
    ).collect()
    assert len(rows) > 0
    for r in rows:
        assert r["mn"] <= r["p50"] <= r["mx"]
        assert 0.0 <= r["cdf_1k"] <= 1.0
        assert r["n"] > 0


def test_two_stage_merge_equals_single_stage(spark, lineitem):
    partials = build_partials_per_partition(lineitem, "l_extendedprice", delta=100)
    partials = partials.cache()
    one = merge_partials(partials, by=(), stages=1).collect()[0]
    two = merge_partials(partials, by=(), fanin=4, stages=2).collect()[0]
    d1 = MergingDigest.from_bytes(bytes(one["digest"]))
    d2 = MergingDigest.from_bytes(bytes(two["digest"]))
    assert d1.total_weight == d2.total_weight == one["n_rows"] == two["n_rows"]
    # different merge trees: invariants + error-bound equivalence
    assert d1.check_weights() and d2.check_weights()
    for q in [0.01, 0.5, 0.99]:
        assert abs(d1.quantile(q) - d2.quantile(q)) <= max(
            0.02 * abs(d1.quantile(q)), 1e-6
        )


def test_deterministic_across_runs(spark, lineitem):
    a = digest_by(lineitem, "l_extendedprice", by=["l_returnflag"], delta=100)
    b = digest_by(lineitem, "l_extendedprice", by=["l_returnflag"], delta=100)
    da = {r["l_returnflag"]: bytes(r["digest"]) for r in a.collect()}
    db = {r["l_returnflag"]: bytes(r["digest"]) for r in b.collect()}
    assert da == db


def test_nulls_ignored(spark):
    df = spark.createDataFrame(
        [(1, 1.0), (1, None), (1, 2.0), (2, None)], "k int, v double"
    )
    out = digest_by(df, "v", by=["k"], delta=100).collect()
    rows = {r["k"]: r for r in out}
    assert rows[1]["n_rows"] == 2
    d1 = MergingDigest.from_bytes(bytes(rows[1]["digest"]))
    assert d1.total_weight == 2
    d2 = MergingDigest.from_bytes(bytes(rows[2]["digest"]))
    assert d2.total_weight == 0


def test_histogram_by(spark, lineitem):
    from tdigest_spark.histogram import LogHistogram
    from tdigest_spark.operators import histogram_by

    out = histogram_by(
        lineitem, "l_extendedprice", 900.0, 110_000.0, by=["l_returnflag"]
    ).collect()
    pdf = lineitem.select("l_returnflag", "l_extendedprice").toPandas()
    for r in out:
        grp = pdf[pdf["l_returnflag"] == r["l_returnflag"]][
            "l_extendedprice"
        ].to_numpy(dtype=float)
        h = LogHistogram(900.0, 110_000.0)
        h.add(grp[grp > 0])
        assert list(h.counts) == list(r["counts"]), r["l_returnflag"]
        assert r["n_rows"] == (grp > 0).sum()


def test_tdigest_agg_sql_aggregate(spark):
    """Grouped-agg pandas UDF surface: tdigest as a SQL AGGREGATE."""
    from tdigest_spark.functions import register_sql_functions
    from tdigest_spark import MergingDigest
    import numpy as np

    register_sql_functions(spark)
    # keep groups < delta so the serialization-time compress keeps all
    # singletons (exact rank semantics)
    rows = [("a", float(v)) for v in range(80)] + [("b", float(v * 3)) for v in range(50)]
    spark.createDataFrame(rows, "k string, v double").createOrReplaceTempView("t_agg")
    out = {
        r["k"]: r
        for r in spark.sql(
            "SELECT k, tdigest_agg(v) AS d, "
            "tdigest_quantile(tdigest_agg(v), 0.5d) AS p50 FROM t_agg GROUP BY k"
        ).collect()
    }
    assert MergingDigest.from_bytes(bytes(out["a"]["d"])).total_weight == 80
    assert out["a"]["p50"] == 40.0  # rank oracle: sorted[floor(0.5*80)]
    assert out["b"]["p50"] == 75.0


def test_digest_by_empty_and_nan(spark):
    """Edge inputs: empty frame -> empty result; all-NaN group -> zero-weight
    digest row that queries to NaN."""
    import math
    from tdigest_spark.operators import digest
    from tdigest_spark import MergingDigest

    empty = spark.createDataFrame([], "k string, v double")
    assert digest.digest_by(empty, "v", by=["k"]).count() == 0

    rows = [("a", float("nan")), ("a", float("nan")), ("b", 1.0)]
    d = digest.digest_by(spark.createDataFrame(rows, "k string, v double"), "v", by=["k"])
    got = {r["k"]: r for r in d.collect()}
    assert got["a"]["n_rows"] == 0
    assert got["b"]["n_rows"] == 1
    da = MergingDigest.from_bytes(bytes(got["a"]["digest"]))
    assert da.total_weight == 0 and math.isnan(da.quantile(0.5))


def test_grouped_multi_column_profile_matches_per_column(spark, tmp_path):
    """digest_profile(by=...) — one scan, k columns per group — produces
    BIT-IDENTICAL digests to k separate grouped builds (same per-(group,
    partition) partial structure, same canonical merge order).  The input
    lives in parquet files so both jobs see identical partitions
    (repartition() round-robin is NOT stable across separate actions)."""
    import numpy as np

    from tdigest_spark.core import MergingDigest
    from tdigest_spark.operators import digest as D

    rng = np.random.default_rng(31)
    rows = [
        (["x", "y", "z"][int(rng.integers(0, 3))], float(rng.uniform(0, 100)),
         float(rng.uniform(-5, 5)))
        for _ in range(5000)
    ]
    src = str(tmp_path / "profile_src")
    spark.createDataFrame(rows, "g string, a double, b double").repartition(
        8
    ).write.parquet(src)
    df = spark.read.parquet(src)

    prof = {
        (r["g"], r["col"]): bytes(r["digest"])
        for r in D.digest_profile(df, ["a", "b"], by=["g"], delta=200.0).collect()
    }
    for col in ("a", "b"):
        single = {
            r["g"]: bytes(r["digest"])
            for r in D.digest_by(df, col, by=["g"], delta=200.0).collect()
        }
        for g, blob in single.items():
            assert prof[(g, col)] == blob, (g, col)
    # sanity: quantiles readable
    d = MergingDigest.from_bytes(prof[("x", "a")])
    assert 0.0 <= d.quantile(0.5) <= 100.0


def test_quantile_filter_per_group_cutoff(spark):
    from tdigest_spark.operators import digest

    rows = [("en", float(i)) for i in range(1, 101)] + [
        ("de", float(i)) for i in range(1, 41)
    ]
    df = spark.createDataFrame(rows, "lang string, v double")
    kept = digest.quantile_filter(
        df, "v", 0.25, by=["lang"], delta=500.0, keep="ge", cutoff_col="cut"
    ).collect()
    # singleton regime -> exact rank statistic: cutoff = 25th of 100 / 10th of 40
    cuts = {r["lang"]: r["cut"] for r in kept}
    en = sorted(r["v"] for r in kept if r["lang"] == "en")
    de = sorted(r["v"] for r in kept if r["lang"] == "de")
    assert en[0] == cuts["en"] and de[0] == cuts["de"]
    assert en == [float(i) for i in range(int(cuts["en"]), 101)]
    assert de == [float(i) for i in range(int(cuts["de"]), 41)]


def test_quantile_filter_keep_modes_and_nulls(spark):
    import pytest as _pytest

    from tdigest_spark.operators import digest

    rows = [(None if i % 7 == 0 else "g", float(i) if i % 5 else None) for i in range(1, 61)]
    df = spark.createDataFrame(rows, "lang string, v double")
    ge = digest.quantile_filter(df, "v", 0.5, by=["lang"], keep="ge")
    lt = digest.quantile_filter(df, "v", 0.5, by=["lang"], keep="lt")
    n_nonnull = df.filter(F.col("v").isNotNull()).count()
    # ge + lt partition the non-null-value rows exactly (NULL v always dropped)
    assert ge.count() + lt.count() == n_nonnull
    # NULL lang is a group like any other: some of its rows survive
    assert ge.filter(F.col("lang").isNull()).count() > 0
    with _pytest.raises(ValueError):
        digest.quantile_filter(df, "v", 0.5, keep="between")


def test_quantile_filter_global_no_groups(spark):
    from tdigest_spark.operators import digest

    df = spark.createDataFrame([(float(i),) for i in range(1, 101)], "v double")
    out = digest.quantile_filter(df, "v", 0.9, keep="gt")
    vals = sorted(r["v"] for r in out.collect())
    assert vals == [float(i) for i in range(91, 101)]


def test_digest_drift_zero_for_identical_snapshots(spark):
    from tdigest_spark.operators import digest_drift

    df = spark.range(2000).select(
        (F.col("id") % 3).cast("string").alias("g"),
        (F.col("id") % 97).cast("double").alias("v"),
    )
    d = digest_by(df, "v", by=["g"], delta=5000.0)
    out = digest_drift(d, d, (10.0, 48.5, 90.0), by=["g"]).collect()
    assert len(out) == 3
    assert all(r["cdf_drift"] == 0.0 for r in out)


def test_digest_drift_matches_numpy_two_sample(spark):
    """Singleton regime: per-point gaps equal the exact empirical
    two-sample CDF gaps (mid-rank tie convention), and the reduced drift
    is their max."""
    from tdigest_spark.operators import digest_drift

    rng = np.random.default_rng(12)
    va = rng.integers(0, 200, 3000).astype(float)
    vb = (rng.integers(0, 200, 2500) + 30).astype(float)  # shifted
    a = spark.createDataFrame([(float(x),) for x in va], "v double")
    b = spark.createDataFrame([(float(x),) for x in vb], "v double")
    da = digest_by(a.withColumn("g", F.lit("k")), "v", by=["g"], delta=50000.0)
    db = digest_by(b.withColumn("g", F.lit("k")), "v", by=["g"], delta=50000.0)
    # interior probes only: at x == a sample's MAX the reference cdf is
    # 1 - 0.5/n regardless of tie mass (core.cdf boundary rule), which
    # matches the plain mid-tie formula only for a unique max — same
    # exposure the driver's cdf oracles accept (probe grids sit well
    # inside every group's range).
    xs = (25.0, 50.0, 100.0, 150.0, 180.0)

    def ecdf(vals, x):
        return (np.sum(vals < x) + np.sum(vals == x) / 2.0) / vals.size

    pts = {
        r["x"]: (r["cdf_a"], r["cdf_b"], r["cdf_gap"])
        for r in digest_drift(da, db, xs, by=["g"], per_point=True).collect()
    }
    exp_gaps = []
    for x in xs:
        ea, eb = ecdf(va, x), ecdf(vb, x)
        ca, cb, gap = pts[x]
        assert ca == ea and cb == eb, (x, ca, ea, cb, eb)
        assert gap == abs(ea - eb)
        exp_gaps.append(abs(ea - eb))
    drift = digest_drift(da, db, xs, by=["g"]).collect()[0]["cdf_drift"]
    assert drift == max(exp_gaps)
    assert drift > 0.1  # the shift is visible


def test_digest_drift_inner_join_drops_one_sided_groups(spark):
    from tdigest_spark.operators import digest_drift

    a = spark.createDataFrame([("x", 1.0), ("y", 2.0)], "g string, v double")
    b = spark.createDataFrame([("x", 1.0)], "g string, v double")
    da = digest_by(a, "v", by=["g"], delta=100.0)
    db = digest_by(b, "v", by=["g"], delta=100.0)
    out = digest_drift(da, db, (1.5,), by=["g"]).collect()
    assert [r["g"] for r in out] == ["x"]


# ----------------------------------------------------- percentile_enrich

def test_percentile_enrich_matches_scalar_cdf(spark):
    """Every row's percentile equals the scalar cdf of its value on the
    SAME collected digest — exactly (the operator rides cdf_batch, which
    is bit-identical to cdf)."""
    from tdigest_spark.operators import percentile_enrich

    rng = np.random.default_rng(42)
    rows = [
        (int(i), ["en", "de", "fr"][i % 3], float(v))
        for i, v in enumerate(rng.integers(0, 50, size=3000))
    ]
    df = spark.createDataFrame(rows, "id long, lang string, v double").repartition(7)
    d = digest_by(df, "v", by=["lang"], delta=100.0)  # ties force compaction
    local = {
        r["lang"]: MergingDigest.from_bytes(bytes(r["digest"]))
        for r in d.collect()
    }
    out = percentile_enrich(df, "v", by=["lang"], delta=100.0, digests=d)
    for r in out.collect():
        assert r["percentile"] == local[r["lang"]].cdf(r["v"]), r


def test_percentile_enrich_edge_semantics(spark):
    """Exact branch values: min, tied interior, tied-or-not max, all-equal
    group, single-row group, NULL group key, NULL value."""
    from tdigest_spark.operators import percentile_enrich

    rows = [("en", 10.0), ("en", 20.0), ("en", 20.0), ("en", 30.0),
            (None, 5.0), (None, 5.0), ("de", 7.0), ("de", None),
            ("solo", 42.0)]
    df = spark.createDataFrame(rows, "lang string, v double").repartition(3)
    got = {
        (r["lang"], r["v"]): r["percentile"]
        for r in percentile_enrich(df, "v", by=["lang"], delta=1000.0).collect()
    }
    assert got[("en", 10.0)] == 0.125       # ==min: w_le/2/n
    assert got[("en", 20.0)] == 0.5         # tied interior run
    assert got[("en", 30.0)] == 0.875       # ==max: 1 - 0.5/n
    assert got[(None, 5.0)] == 0.5          # all-equal group (min precedence)
    assert got[("de", 7.0)] == 0.5          # n==1 digest
    assert got[("de", None)] is None        # NULL value -> NULL
    assert got[("solo", 42.0)] == 0.5


def test_percentile_enrich_frozen_snapshot(spark):
    """Scoring against a FROZEN digest table: groups absent from the
    snapshot yield NULL; present groups score against the snapshot's
    distribution, not the current frame's."""
    from tdigest_spark.operators import percentile_enrich

    snap_src = spark.createDataFrame(
        [("en", float(v)) for v in range(1, 101)], "lang string, v double"
    )
    snap = digest_by(snap_src, "v", by=["lang"], delta=1000.0)
    cur = spark.createDataFrame(
        [("en", 50.0), ("new", 1.0)], "lang string, v double"
    )
    got = {
        r["lang"]: r["percentile"]
        for r in percentile_enrich(cur, "v", by=["lang"], digests=snap).collect()
    }
    assert got["en"] == (49 + 0.5) / 100.0  # rank in the SNAPSHOT
    assert got["new"] is None


def test_percentile_enrich_global_no_groups(spark):
    from tdigest_spark.operators import percentile_enrich

    df = spark.createDataFrame(
        [(float(v),) for v in range(1, 9)], "v double"
    ).repartition(3)
    got = sorted(
        (r["v"], r["percentile"])
        for r in percentile_enrich(df, "v", delta=1000.0).collect()
    )
    assert got[0] == (1.0, 0.5 / 8)
    assert got[-1] == (8.0, 1 - 0.5 / 8)


def test_percentile_enrich_max_groups_guard(spark):
    from tdigest_spark.operators import percentile_enrich

    df = spark.createDataFrame(
        [(i, str(i), float(i)) for i in range(50)],
        "id long, k string, v double",
    )
    with pytest.raises(ValueError, match="max_groups"):
        percentile_enrich(df, "v", by=["k"], max_groups=10)
    # at or under the cap it works
    out = percentile_enrich(df, "v", by=["k"], max_groups=50).collect()
    assert len(out) == 50 and all(r["percentile"] == 0.5 for r in out)


def test_percentile_enrich_nan_group_key(spark):
    """A NaN double group key is a group like any other: both sides of
    the broadcast channel fold NaN to the same lookup key (nan != nan
    would otherwise miss every lookup and NULL the whole group)."""
    import math

    from tdigest_spark.operators import percentile_enrich

    df = spark.createDataFrame(
        [(1, float("nan"), 10.0), (2, float("nan"), 20.0), (3, 1.0, 5.0)],
        "id long, g double, v double",
    )
    got = {
        r["id"]: r["percentile"]
        for r in percentile_enrich(df, "v", by=["g"], delta=100.0).collect()
    }
    assert got[1] == 0.25 and got[2] == 0.75 and got[3] == 0.5


def test_percentile_enrich_bigint_keys_with_null_in_batch(spark):
    """Integer group keys above 2^53 sharing a batch with a NULL key:
    pandas would float64 the column and round the keys — the string
    helper-key path keeps them exact."""
    big = (1 << 53) + 1  # 9007199254740993, not representable in float64
    rows = [
        (1, big, 10.0),
        (2, big, 20.0),
        (3, None, 7.0),
        (4, (1 << 53) - 1, 5.0),
    ]
    from tdigest_spark.operators import percentile_enrich

    df = spark.createDataFrame(rows, "id long, g long, v double").coalesce(1)
    got = {
        r["id"]: r["percentile"]
        for r in percentile_enrich(df, "v", by=["g"], delta=100.0).collect()
    }
    assert got[1] == 0.25 and got[2] == 0.75   # the big-key group works
    assert got[3] == 0.5 and got[4] == 0.5     # NULL group + neighbor key


def test_build_partials_multi_bigint_keys_with_null_in_batch(spark):
    """build_partials_multi groups pandas-side: bigint keys above 2^53
    colliding under float64, sharing a batch with a NULL key, must stay
    distinct groups (the pdkeys string-helper discipline)."""
    from tdigest_spark.operators.digest import (
        build_partials_multi, merge_partials,
    )

    big = 1 << 53  # big and big+1 collide in float64
    rows = [
        (big, 1.0, 10.0),
        (big + 1, 2.0, 20.0),
        (big + 1, 3.0, 30.0),
        (None, 4.0, 40.0),
    ]
    df = spark.createDataFrame(rows, "g long, a double, b double").coalesce(1)
    parts = build_partials_multi(df, ["a", "b"], by=["g"])
    merged = merge_partials(parts, by=["g", "col"])
    got = {
        (r["g"], r["col"]): r["n_rows"] for r in merged.collect()
    }
    assert got[(big, "a")] == 1 and got[(big + 1, "a")] == 2
    assert got[(None, "a")] == 1
    assert got[(big, "b")] == 1 and got[(big + 1, "b")] == 2
