"""MergingDigest core tests.

Ports the intent of the reference suites:
- basic_invariants.jl (checkWeights after fits and merges)
- cdf_tests.jl (cdf/quantile duality)
- special-cases.jl (small digests, repeated values, singletons at ends)
"""

import numpy as np
import pytest

from tdigest_spark.core import MergingDigest, merge_all
from tdigest_spark.scale import K_0, K_1, K_2, K_3

from .util import cdf_ref, quantile_ref

RNG = np.random.default_rng(42)


# ---------------------------------------------------------------- invariants
# basic_invariants.jl:16-29 — K_0 is skipped there too

@pytest.mark.parametrize("scale", [K_1, K_2, K_3], ids=lambda s: s.name)
@pytest.mark.parametrize("n", [1, 10, 100, 1000, 1_000_000])
def test_fit_invariants(scale, n):
    d = MergingDigest(50, scale=scale)
    d.add(RNG.uniform(size=n))
    assert d.check_weights()
    d.compress()
    assert d.check_weights()
    assert len(d) < d.public_compression or n < d.public_compression


@pytest.mark.parametrize("scale", [K_1, K_2, K_3], ids=lambda s: s.name)
@pytest.mark.parametrize("sizes", [(1, 1000), (1000, 1000), (1000, 0), (100_000, 100_000)])
def test_merge_invariants(scale, sizes):
    a = MergingDigest(50, scale=scale)
    b = MergingDigest(50, scale=scale)
    a.add(RNG.uniform(size=sizes[0]))
    if sizes[1]:
        b.add(RNG.uniform(size=sizes[1]))
    a.merge(b)
    assert a.check_weights()
    assert a.total_weight == sizes[0] + sizes[1]


def test_bounded_size():
    d = MergingDigest(100)
    d.add(RNG.uniform(size=1_000_000))
    d.compress()
    assert len(d) < d.public_compression
    assert d.check_weights()


# ----------------------------------------------------------- cdf_tests.jl

def test_cdf_quantile_duality():
    data = np.array([1.0, 2.0, 3.0, 4.0])
    d = MergingDigest(100)
    d.add(data)
    eps = 1e-9
    for v in data:
        for x in [np.nextafter(v, -np.inf), v, np.nextafter(v, np.inf)]:
            assert d.cdf(x) == cdf_ref(data, x)
        q = d.cdf(v)
        assert d.quantile(q) == v


# ------------------------------------------------------- special-cases.jl

def test_small_digest_1():
    data = [15.0, 20.0, 32.0, 60.0]
    d = MergingDigest(200)
    d.add(data)
    assert d.check_weights()
    assert abs(d.quantile(0.4) - 20) < 1e-10
    assert abs(d.quantile(0.25) - 20) < 1e-10
    assert abs(d.quantile(0.25 - 1e-10) - 15) < 1e-10
    assert abs(d.quantile(0.5 - 1e-10) - 20) < 1e-10
    assert abs(d.quantile(0.5) - 32) < 1e-10


def test_small_digest_2():
    data = [245, 246, 247.249, 240, 243, 248, 250, 241, 244, 245, 245, 247,
            243, 242, 241, 50100, 51246, 52247, 52249, 51240, 53243, 59248,
            59250, 57241, 56244, 55245, 56245, 575247, 58243, 51242, 54241]
    d = MergingDigest(50)
    d.add(data)
    assert d.check_weights()
    assert d.quantile(0.5) == quantile_ref(data, 0.5)


def test_repeated_values_stable():
    # issue 114 regression (special-cases.jl:42-76)
    delta = 100
    samples = [1.0, 2, 2, 2, 2, 2, 3, 3, 3, 3, 3, 4, 5, 6, 7]
    for _ in range(2):
        h1 = MergingDigest(delta)
        data = []
        for _ in range(100):
            data.extend(samples)
            h1.add(samples)
        assert h1.check_weights()
        h2 = MergingDigest(delta)
        h1.compress()
        assert h1.check_weights()
        h2.merge(h1)
        assert h2.check_weights()
        h2.compress()
        x1 = h1.quantile(0.5)
        x2 = h2.quantile(0.5)
        assert abs(quantile_ref(data, 0.5) - x1) <= 0.2
        assert abs(x1 - x2) <= 0.01


def test_all_singletons_exact():
    # special-cases.jl:83-97: brute-force exactness in the singleton regime
    data = np.arange(20, dtype=np.float64)
    d = MergingDigest(100)
    d.add(data)
    assert d.check_weights()
    for x in np.linspace(d.minimum() - 0.1, d.maximum() + 0.1, 2000):
        assert d.cdf(x) == cdf_ref(data, x), x
    for q in np.linspace(0, 1, 1001):
        assert d.quantile(q) == quantile_ref(data, q), q


def test_singleton_step_cdf():
    # special-cases.jl:105-122
    d = MergingDigest(100)
    d.add([1.0])
    d.add([2.0])
    d.add([3.0])
    assert d.check_weights()
    assert d.cdf(1) == 0.5 / 3
    assert d.cdf(1 + 1e-10) == 1 / 3
    assert d.cdf(2 - 1e-10) == 1 / 3
    assert d.cdf(2) == 1.5 / 3
    assert d.cdf(2 + 1e-10) == 2 / 3
    assert d.cdf(3 - 1e-10) == 2 / 3
    assert d.cdf(3) == 2.5 / 3
    assert d.cdf(3 + 1e-10) == 1.0


def test_singleton_at_end():
    # special-cases.jl:130-223 (condensed)
    d = MergingDigest(100)
    d.add([1.0, 2.0, 3.0])
    assert d.check_weights()
    assert d.minimum() == 1
    assert d.maximum() == 3
    assert len(d) == 3
    assert d.cdf(0) == 0
    assert d.cdf(1 - 1e-9) == 0
    assert abs(d.cdf(1) - 0.5 / 3) < 1e-10
    assert abs(d.cdf(1 + 1e-10) - 1.0 / 3) < 1e-10
    assert abs(d.cdf(3 - 1e-9) - 2.0 / 3) < 1e-9
    assert abs(d.cdf(3) - 2.5 / 3) < 1e-10
    assert d.cdf(3 + 1e-9) == 1.0

    d.add([1.0])
    assert d.check_weights()
    assert abs(cdf_ref([1, 1, 2, 3], 1) - d.cdf(1)) < 1e-12

    # force multi-weight boundary with K_0 then add extremes
    d = MergingDigest(10, scale=K_0)
    data = [1.0, 1, 2, 3]
    d.add(data)
    assert d.check_weights()
    for _ in range(100):
        data.extend([1.0, 2, 3])
        d.add([1.0, 2, 3])
    assert d.check_weights()

    d.add([0.0])
    data.append(0)
    data.sort()
    assert len(d) > 0
    assert d.minimum() == 0.0
    assert d.counts[0] == 1
    assert d.cdf(0 - 1e-9) == 0
    assert abs(d.cdf(0) - cdf_ref(data, 0)) < 1e-10
    assert abs(d.cdf(1e-9) - cdf_ref(data, 1e-9)) < 1e-10
    assert d.quantile(0) == 0
    assert d.means[0] == 0.0

    d.add([4.0])
    assert d.check_weights()
    data.append(4)
    data.sort()
    x = d.maximum()
    assert d.counts[-1] == 1.0
    assert d.means[-1] == 4
    assert d.cdf(x + 1e-9) == cdf_ref(data, x + 1e-9)
    assert abs(d.cdf(x) - cdf_ref(data, x)) < 1e-12
    assert abs(d.cdf(x - 1e-9) - cdf_ref(data, x - 1e-9)) < 1e-12
    assert d.quantile(1) == 4.0


def test_issue_167_repeated_values():
    # special-cases.jl:228-249
    d = MergingDigest(100)
    data = []
    for _ in range(2):
        d.add([9000.0])
        data.append(9000)
    assert d.check_weights()
    for _ in range(11):
        d.add([3000.0])
        data.append(3000)
    assert d.check_weights()
    for _ in range(26):
        d.add([1000.0])
        data.append(1000)
    assert d.check_weights()
    assert d.quantile(0.9) == quantile_ref(data, 0.9)
    assert d.quantile(0.95) == quantile_ref(data, 0.95)


# ------------------------------------------------------------------- misc

def test_nan_rejected():
    d = MergingDigest(100)
    with pytest.raises(ValueError):
        d.add([1.0, float("nan")])
    with pytest.raises(ValueError):
        d.cdf(float("nan"))
    with pytest.raises(ValueError):
        d.quantile(1.5)


def test_empty_digest():
    d = MergingDigest(100)
    assert np.isnan(d.quantile(0.5))
    assert np.isnan(d.cdf(1.0))
    assert d.check_weights()


def test_compression_clamped():
    d = MergingDigest(3)
    assert d.public_compression == 10
    assert d.max_size == 2 * 10 + 50


def test_min_max():
    d = MergingDigest(100)
    vals = RNG.normal(size=10_000)
    d.add(vals)
    assert d.minimum() == vals.min()
    assert d.maximum() == vals.max()


def test_accuracy_vs_delta():
    """Published bound: relative rank error ~O(1/delta), exact at q->0/1."""
    vals = RNG.normal(size=100_000)
    svals = np.sort(vals)
    for delta in [50, 100, 200]:
        d = MergingDigest(delta)
        d.add(vals)
        d.compress()
        for q in [0.0001, 0.001, 0.01, 0.1, 0.5, 0.9, 0.99, 0.999, 0.9999]:
            est = d.quantile(q)
            # rank error: |rank(est)/n - q|
            rank = np.searchsorted(svals, est) / svals.size
            err = abs(rank - q)
            scale_err = min(q, 1 - q)
            assert err <= max(10.0 / delta * max(scale_err, 0.01), 3e-4), (
                delta, q, err)
        assert d.quantile(0) == svals[0]
        assert d.quantile(1) == svals[-1]


def test_trimmed_mean_singleton_exact():
    vals = np.arange(10, dtype=np.float64)
    d = MergingDigest(100)
    d.add(vals)
    # window [1,9) over ranks -> mean of sorted[1..8]
    assert d.trimmed_mean(0.1, 0.9) == np.mean(vals[1:9])
    assert d.trimmed_mean(0.0, 1.0) == np.mean(vals)


def test_trimmed_mean_approx():
    vals = RNG.normal(size=50_000)
    d = MergingDigest(200)
    d.add(vals)
    svals = np.sort(vals)
    lo, hi = int(0.05 * len(svals)), int(0.95 * len(svals))
    exact = svals[lo:hi].mean()
    assert abs(d.trimmed_mean(0.05, 0.95) - exact) < 0.01


def test_merge_all():
    parts = []
    allv = []
    for i in range(8):
        v = RNG.uniform(size=1000)
        allv.append(v)
        p = MergingDigest(100)
        p.add(v)
        parts.append(p)
    merged = merge_all(parts)
    assert merged.check_weights()
    assert merged.total_weight == 8000
    allv = np.concatenate(allv)
    assert abs(merged.quantile(0.5) - np.quantile(allv, 0.5)) < 0.02


class TestLogData:
    """Per-centroid sample log (TDigest.jl:52-69, 148-151, 256-315):
    debug feature tracking which raw samples each centroid absorbed."""

    def test_log_partition_of_inputs(self):
        import numpy as np
        from tdigest_spark.core import MergingDigest

        rng = np.random.default_rng(11)
        vals = rng.uniform(0, 100, 5000)
        d = MergingDigest(100, log_data=True)
        d.add(vals)
        d.compress()
        assert d.check_weights()
        # the logs partition the input multiset exactly
        logged = np.sort(np.concatenate([np.asarray(e) for e in d.log]))
        assert np.array_equal(logged, np.sort(vals))
        # per-centroid: log size == centroid weight, log mean == centroid mean
        for mean, cnt, entry in zip(d.means, d.counts, d.log):
            assert len(entry) == int(cnt)
            assert abs(np.mean(entry) - mean) < 1e-9

    def test_log_merge(self):
        import numpy as np
        from tdigest_spark.core import MergingDigest

        a = MergingDigest(100, log_data=True)
        b = MergingDigest(100, log_data=True)
        a.add(np.arange(500.0))
        b.add(np.arange(500.0, 1000.0))
        a.merge(b)
        a.compress()
        assert a.check_weights()
        logged = sorted(x for e in a.log for x in e)
        assert logged == [float(x) for x in range(1000)]

    def test_log_merge_requires_both_logging(self):
        import numpy as np
        import pytest
        from tdigest_spark.core import MergingDigest

        a = MergingDigest(100, log_data=True)
        b = MergingDigest(100)
        b.add(np.arange(10.0))
        with pytest.raises(ValueError, match="logged"):
            a.merge(b)

    def test_disabled_by_default(self):
        import numpy as np
        from tdigest_spark.core import MergingDigest

        d = MergingDigest(100)
        d.add(np.arange(100.0))
        assert d.log is None


class TestFastCompactionPath:
    """The ingest fast path (sort-pending + stable two-run merge) must be
    bit-identical to the stable-argsort path (which the log_data=True
    debug mode still uses) on every input shape, including the 1-ulp
    non-monotone cluster means produced by duplicate-heavy data and the
    -0.0/+0.0 stability corner."""

    def _differential(self, vals, delta):
        import numpy as np
        from tdigest_spark.core import MergingDigest

        a = MergingDigest(delta)
        b = MergingDigest(delta, log_data=True)
        for lo in range(0, vals.size, 33333):
            a.add(vals[lo:lo + 33333])
            b.add(vals[lo:lo + 33333])
        assert a.to_bytes() == b.to_bytes()
        assert a.to_bytes(small=True) == b.to_bytes(small=True)

    def test_uniform(self):
        import numpy as np
        rng = np.random.default_rng(1)
        self._differential(rng.uniform(0, 1, 150_000), 100.0)

    def test_duplicate_heavy_triggers_ulp_fallback(self):
        import numpy as np
        rng = np.random.default_rng(2)
        for delta in (20.0, 100.0, 500.0):
            self._differential(rng.integers(0, 50, 150_000).astype(float), delta)
            self._differential(np.full(60_000, 3.14), delta)

    def test_signed_zero_stability(self):
        import numpy as np
        rng = np.random.default_rng(3)
        vals = np.concatenate([
            rng.uniform(-1, 1, 80_000),
            np.full(4000, 0.0), np.full(4000, -0.0),
            rng.choice([0.0, -0.0], 8000),
        ])
        self._differential(vals, 100.0)

    def test_merge_interleaved_with_ingest(self):
        import numpy as np
        from tdigest_spark.core import MergingDigest
        rng = np.random.default_rng(4)
        a = MergingDigest(100)
        b = MergingDigest(100, log_data=True)
        for _ in range(5):
            part = rng.uniform(0, 1, 30_000)
            pa = MergingDigest(100); pa.add(part)
            pb = MergingDigest(100, log_data=True); pb.add(part)
            a.merge(pa); b.merge(pb)
            extra = rng.uniform(0, 1, 12_000)
            a.add(extra); b.add(extra)
        assert a.to_bytes() == b.to_bytes()


class TestDiscreteHeavyTies:
    """Regression: a 60k-row stream over 11 distinct values (TPC-H
    l_discount shape) broke the boundary-singleton invariant before the
    cluster-mean clamp — sum/weight for a run of identical values drifts
    1 ulp (15*0.1/15 > 0.1), and the drifted multi-weight cluster sorted
    ABOVE the true max singleton on the next (descending) pass.  The
    reference never drifts because weightedAverageSorted clamps into
    [x1, x2] (TDigest.jl:632-657)."""

    def test_discrete_ties_keep_boundary_singletons(self):
        rng = np.random.default_rng(23)
        vals = rng.integers(0, 11, size=60_000).astype(np.float64) / 100.0
        d = MergingDigest(100.0)
        for i in range(0, vals.size, 10_000):
            d.add(vals[i : i + 10_000])
        d.compress()
        assert d.check_weights()
        assert d.quantile(0.0) == 0.0
        assert d.quantile(1.0) == 0.10
        # no ulp drift: every cluster mean stays inside the value grid's
        # hull and the sorted centroid means are monotone
        means = np.asarray(d.means)
        assert means.min() == 0.0 and means.max() == 0.10
        assert bool(np.all(np.diff(means) >= 0))
        # tie-robust rank check (the bare 1/delta rank bound cannot hold
        # on heavy ties — the reference claims only 0.2 absolute error on
        # repeated values): q within the estimate's exact rank interval
        # widened by 1/delta + the largest tie mass
        sv = np.sort(vals)
        mass = max(np.bincount((vals * 100).astype(int))) / sv.size
        slack = 0.01 + mass
        for q in (0.1, 0.5, 0.9):
            est = d.quantile(q)
            rlo = float(np.searchsorted(sv, est, "left")) / sv.size
            rhi = float(np.searchsorted(sv, est, "right")) / sv.size
            assert rlo - slack <= q <= rhi + slack, (q, est, rlo, rhi)

    def test_cluster_means_monotone_after_ties(self):
        vals = np.tile(np.arange(7, dtype=np.float64), 1500)
        d = MergingDigest(100.0)
        for i in range(0, vals.size, 1000):
            d.add(vals[i : i + 1000])
        d.compress()
        means = d.means
        assert bool(np.all(np.diff(means) >= 0))
        assert d.check_weights()


class TestLazyBuffer:
    """Buffers are allocated lazily (capped at max_size + chunk slack):
    grouped Spark builds hold one digest per live group, so a small group
    — or a large singleton-regime delta — must cost memory proportional
    to its data, not to the worst-case pending buffer."""

    def test_small_group_small_buffer(self):
        d = MergingDigest(100.0)
        d.add(np.arange(200, dtype=np.float64))
        assert d._mean.size <= 1025  # not the 10701 hard cap

    def test_large_delta_buffer_tracks_data(self):
        d = MergingDigest(200_000.0)  # hard cap would be ~1.41M doubles
        d.add(np.arange(5000, dtype=np.float64))
        assert d._mean.size <= 16384
        assert d._n == 5000  # singleton regime: nothing compacted
        d.compress()
        assert (np.asarray(d.counts) == 1.0).all()

    def test_growth_capped_and_output_unchanged(self):
        rng = np.random.default_rng(3)
        x = rng.random(100_000)
        d = MergingDigest(100.0)
        d.add(x)
        assert d._mean.size <= d.max_size + 10_000 + 1
        # same samples through a fresh digest: identical centroids
        # (growth is invisible to the algebra)
        d2 = MergingDigest(100.0)
        for chunk in np.array_split(x, 7):   # uneven chunking exercises _grow
            d2.add(chunk)
        # different chunking -> different compaction batches is expected;
        # instead check invariants + scratch resize survived
        d2.check_weights()
        d.check_weights()

    def test_merge_grows_scratch(self):
        rng = np.random.default_rng(4)
        m = MergingDigest(100.0)
        m.add(rng.random(50))          # small: tiny buffer + maybe scratch
        big = MergingDigest(100.0)
        big.add(rng.random(30_000))    # forces add_weighted growth on merge
        m.merge(big)
        m.compress()
        m.check_weights()


# ---------------------------------------------------------- cdf_batch lane

class TestCdfBatch:
    """cdf_batch must be bit-identical to looping the scalar cdf —
    same branch precedence and IEEE operation order per branch."""

    def _assert_matches_scalar(self, d, xs):
        got = d.cdf_batch(xs)
        want = np.array([d.cdf(float(x)) for x in xs])
        assert got.shape == want.shape
        assert np.array_equal(got, want, equal_nan=True)

    def _probes(self, d, rng):
        means = d._mean[: d._n]
        mids = (means[:-1] + means[1:]) / 2.0 if d._n > 1 else np.array([])
        return np.concatenate([
            means,                        # exact centroid hits (eq branch)
            mids,                         # interpolation lane
            [means[0] - 1.0, means[-1] + 1.0, means[0], means[-1]],
            rng.uniform(means[0] - 0.5, means[-1] + 0.5, size=200),
        ])

    def test_continuous(self):
        rng = np.random.default_rng(7)
        d = MergingDigest(100)
        d.add(rng.normal(size=50_000))
        d.compress()
        self._assert_matches_scalar(d, self._probes(d, rng))

    def test_heavy_ties_and_singletons(self):
        rng = np.random.default_rng(8)
        d = MergingDigest(50)
        # discrete ties create equal-centroid runs + boundary singletons
        d.add(rng.integers(0, 12, size=20_000).astype(float))
        d.add(np.array([100.0, -100.0]))  # singleton extremes
        d.compress()
        self._assert_matches_scalar(d, self._probes(d, rng))

    def test_tiny_digests(self):
        for vals in ([3.0], [1.0, 2.0], [5.0, 5.0, 5.0]):
            d = MergingDigest(100)
            d.add(np.array(vals))
            xs = np.array([v for v in vals] + [min(vals) - 1, max(vals) + 1,
                                               (min(vals) + max(vals)) / 2.0])
            self._assert_matches_scalar(d, xs)

    def test_empty_and_invalid(self):
        d = MergingDigest(100)
        out = d.cdf_batch(np.array([1.0, 2.0]))
        assert np.isnan(out).all()
        d.add(np.array([1.0]))
        with pytest.raises(ValueError):
            d.cdf_batch(np.array([np.nan]))
        with pytest.raises(ValueError):
            d.cdf_batch(np.array([np.inf]))
        assert d.cdf_batch(np.array([])).size == 0


def test_merge_all_canonical_is_permutation_invariant():
    """canonical=True sorts inputs by serialized bytes: any permutation
    of the same digests merges byte-identically, even past the buffer
    bound where plain merge order matters."""
    import itertools

    import numpy as np

    from tdigest_spark.core import MergingDigest, merge_all

    rng = np.random.default_rng(3)
    parts = []
    for i in range(4):
        d = MergingDigest(50.0)
        d.add(rng.normal(i, 1.0, 2000))
        d.compress()
        parts.append(d)
    ref = None
    for perm in itertools.permutations(range(4)):
        m = merge_all([parts[i] for i in perm], canonical=True)
        b = m.to_bytes()
        if ref is None:
            ref = b
        assert b == ref
