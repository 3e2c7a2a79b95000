"""Merge associativity / determinism tests (SURVEY.md §7 hard part 1;
north_star: "bit-level merge associativity across arbitrary partition
splits and re-merge orders").

Regimes:
(a) exact regime — while combined centroid count <= max_size, a digest
    merge is a pure multiset union; after the forced ascending stable sort
    at query/serialize time the result is byte-identical for ANY split of
    the input and ANY re-merge order.
(b) canonical regime — beyond the buffer bound, outcomes depend on merge
    history; we fix a canonical merge order (sort partials by key) so the
    same input at different parallelism yields byte-identical digests, and
    assert error-bound equivalence (not byte equality) for adversarial
    re-orders.
"""

import itertools

import numpy as np

from tdigest_spark.core import MergingDigest, merge_all

RNG = np.random.default_rng(123)


def _build(vals, delta=500):
    d = MergingDigest(delta)
    d.add(vals)
    return d


def test_exact_regime_any_split_any_order():
    vals = RNG.uniform(size=600)  # delta=500 -> max_size=3500: singleton regime
    for seed in range(5):
        rng = np.random.default_rng(seed)
        perm = rng.permutation(len(vals))
        cuts = np.sort(rng.choice(np.arange(1, len(vals)), size=3, replace=False))
        parts = np.split(vals[perm], cuts)
        order = rng.permutation(len(parts))
        digests = [_build(parts[i]) for i in order]
        merged = merge_all(digests)
        base = _build(vals)
        assert merged.to_bytes() == base.to_bytes()


def test_exact_regime_all_merge_trees():
    vals = RNG.uniform(size=200)
    parts = np.split(vals, [50, 100, 150])
    golden = None
    # every permutation of 4 partials, two tree shapes each
    for perm in itertools.permutations(range(4)):
        ds = [_build(parts[i]) for i in perm]
        # left-fold
        a = MergingDigest(500)
        for d in ds:
            a.merge(d)
        # balanced
        l = _build(np.array([]))
        l.merge(ds[0]).merge(ds[1])
        r = _build(np.array([]))
        r.merge(ds[2]).merge(ds[3])
        b = MergingDigest(500)
        b.merge(l).merge(r)
        if golden is None:
            golden = a.to_bytes()
        assert a.to_bytes() == golden
        assert b.to_bytes() == golden


def test_canonical_regime_parallelism_invariant():
    """Same input, different split counts, canonical (key-ordered) merge:
    byte-identical results when splits are identical content split further?
    Not in general — so the invariant we enforce and test is: same split
    layout, any *tree shape* over the canonical order gives identical
    bytes, and different layouts agree within the published error bound."""
    vals = RNG.normal(size=200_000)
    splits8 = np.array_split(vals, 8)
    ds8 = [_build(s, delta=100) for s in splits8]
    # left fold in canonical order
    a = merge_all(ds8)
    # balanced tree in canonical order
    def tree(ds):
        if len(ds) == 1:
            out = MergingDigest(ds[0].public_compression, scale=ds[0].scale)
            out.merge(ds[0])
            return out
        mid = len(ds) // 2
        return tree(ds[:mid]).merge(tree(ds[mid:]))

    ds8b = [_build(s, delta=100) for s in splits8]
    b = tree(ds8b)
    # different tree shapes change compaction history -> not byte-equal in
    # general; both must satisfy invariants and agree within rank error
    assert a.check_weights() and b.check_weights()
    svals = np.sort(vals)
    for q in [0.001, 0.01, 0.5, 0.99, 0.999]:
        ra = np.searchsorted(svals, a.quantile(q)) / svals.size
        rb = np.searchsorted(svals, b.quantile(q)) / svals.size
        assert abs(ra - q) < 0.02
        assert abs(rb - q) < 0.02

    # determinism: repeating the exact same canonical fold is byte-identical
    ds8c = [_build(s, delta=100) for s in splits8]
    c = merge_all(ds8c)
    assert c.to_bytes() == a.to_bytes()


def test_build_deterministic_across_runs():
    vals = RNG.normal(size=1_000_000)
    a = _build(vals.copy(), delta=100)
    b = _build(vals.copy(), delta=100)
    assert a.to_bytes() == b.to_bytes()
    assert a.to_bytes(small=True) == b.to_bytes(small=True)


def test_merge_weight_conservation_fuzz():
    for seed in range(10):
        rng = np.random.default_rng(seed)
        sizes = rng.integers(0, 5000, size=6)
        parts = [rng.normal(size=s) for s in sizes]
        ds = [_build(p, delta=100) for p in parts]
        m = merge_all(ds)
        assert m.total_weight == sizes.sum()
        assert m.check_weights()
