"""Serialization round-trip + determinism tests (intent of
/root/reference/src/TDigest.jl:659-790, which is broken as written —
SURVEY.md §2.3; sizes match the published 16n+32 / 8n+30 accounting
modulo one scale-id byte)."""

import numpy as np

from tdigest_spark.core import MergingDigest
from tdigest_spark.scale import K_1, K_2

RNG = np.random.default_rng(7)


def test_verbose_round_trip():
    d = MergingDigest(100)
    vals = RNG.normal(size=50_000)
    d.add(vals)
    buf = d.to_bytes()
    d2 = MergingDigest.from_bytes(buf)
    assert d2.total_weight == d.total_weight
    np.testing.assert_array_equal(d2.means, d.means)
    np.testing.assert_array_equal(d2.counts, d.counts)
    assert d2.public_compression == d.public_compression
    assert d2.scale.name == d.scale.name
    for q in [0.01, 0.5, 0.99]:
        assert d2.quantile(q) == d.quantile(q)


def test_small_round_trip_lossy_f32():
    d = MergingDigest(100, scale=K_2)
    d.add(RNG.uniform(0, 1000, size=10_000))
    buf = d.to_bytes(small=True)
    d2 = MergingDigest.from_bytes(buf)
    assert d2.total_weight == d.total_weight
    assert d2.scale.name == "K_2"
    # f32 quantization: relative error ~1e-7
    for q in [0.1, 0.5, 0.9]:
        assert abs(d2.quantile(q) / d.quantile(q) - 1) < 1e-5


def test_byte_sizes_match_reference_accounting():
    d = MergingDigest(100)
    d.add(RNG.normal(size=100_000))
    d.compress()
    n = len(d)
    # reference accounting: verbose 16n+32, small 8n+30; ours adds a 1-byte
    # scale id, and verbose carries a u64 total-weight: 16n+41 / 8n+29
    assert d.byte_size() == 16 * n + 41
    assert d.small_byte_size() == 8 * n + 29
    # digests stay tiny: well under 4KB at delta=100
    assert d.small_byte_size() < 4096


def test_serialization_deterministic():
    a = MergingDigest(100)
    b = MergingDigest(100)
    vals = RNG.normal(size=30_000)
    a.add(vals)
    b.add(vals)
    assert a.to_bytes() == b.to_bytes()
    assert a.to_bytes(small=True) == b.to_bytes(small=True)


def test_empty_digest_round_trip():
    d = MergingDigest(100)
    d2 = MergingDigest.from_bytes(d.to_bytes())
    assert d2.total_weight == 0
    assert len(d2) == 0


def test_scale_preserved():
    d = MergingDigest(50, scale=K_1)
    d.add([1.0, 2.0, 3.0])
    d2 = MergingDigest.from_bytes(d.to_bytes())
    assert d2.scale.name == "K_1"
    assert d2.public_compression == 50
