"""Simple64/32 codec tests, mirroring the reference suite
(/root/reference/test/SimpleCompression.jl:1180-... round-trips and
test/histogram.jl:61-76 histogram-counts compression)."""

from __future__ import annotations

import numpy as np
import pytest

from tdigest_spark.codec import Simple32, Simple64
from tdigest_spark.histogram import LogHistogram


@pytest.mark.parametrize("cls", [Simple64, Simple32])
def test_round_trip_small_values(cls):
    rng = np.random.default_rng(7)
    for _ in range(20):
        n = int(rng.integers(1, 500))
        max_bits = 28 if cls is Simple32 else 40
        vals = rng.integers(0, 2 ** int(rng.integers(1, max_bits)), size=n)
        codec = cls()
        words = codec.compress(vals)
        back = codec.decompress(words, n=n)
        assert np.array_equal(back, vals.astype(np.uint64))
        # flush zero-padding only ever appends zeros
        full = codec.decompress(words)
        assert len(full) >= n
        assert np.all(full[n:] == 0)


@pytest.mark.parametrize("cls,limit", [(Simple64, 60), (Simple32, 28)])
def test_max_width_values(cls, limit):
    vals = [(1 << limit) - 1, 0, 1, (1 << limit) - 1]
    codec = cls()
    back = codec.decompress(codec.compress(vals), n=len(vals))
    assert back.tolist() == vals


@pytest.mark.parametrize("cls,limit", [(Simple64, 60), (Simple32, 28)])
def test_too_wide_rejected(cls, limit):
    with pytest.raises(ValueError, match="bits"):
        cls().compress([1 << limit])


def test_word_layout_selector_in_low_bits():
    """One 60-bit value -> one word with code 14 in the low nibble and the
    value at bit offset 4 (the reference layout)."""
    codec = Simple64()
    v = (1 << 59) | 12345
    words = codec.compress([v])
    assert len(words) == 1
    assert int(words[0]) & 0xF == 14
    assert int(words[0]) >> 4 == v


def test_all_ones_pack_60_per_word():
    codec = Simple64()
    words = codec.compress([1] * 120)
    # 120 1-bit values = exactly two full words at width 1 (code 1)
    assert len(words) == 2
    assert all(int(w) & 0xF == 1 for w in words)


def test_histogram_counts_compress():
    """The reference's testCompression case (test/histogram.jl:61-76):
    10^6 uniform samples into LogHistogram(1e-3, 10) -> counts vector
    compresses to < 45 words and round-trips exactly."""
    rng = np.random.default_rng(42)
    h = LogHistogram(1e-3, 10.0)
    h.add(rng.random(1_000_000))
    counts = h.counts.astype(np.uint64)
    codec = Simple64()
    words = codec.compress(counts)
    assert len(words) < 45
    back = codec.decompress(words)
    assert len(back) >= len(counts)
    assert np.array_equal(back[: len(counts)], counts)


# ---------------------------------------------------------- property-based


from hypothesis import given, settings, strategies as st


@settings(max_examples=200, deadline=None)
@given(
    st.lists(st.integers(min_value=0, max_value=(1 << 60) - 1),
             min_size=1, max_size=400),
    st.sampled_from([Simple64, Simple32]),
)
def test_roundtrip_arbitrary_sequences(vals, cls):
    """Any in-range sequence survives compress->decompress bit-exactly
    (the reference pins this with ~1,000 unrolled cases,
    test/SimpleCompression.jl:75-1176; hypothesis sweeps the same space
    adversarially — selector boundaries, runs of zeros, width jumps)."""
    limit = 60 if cls is Simple64 else 28
    vals = np.array([v & ((1 << limit) - 1) for v in vals], dtype=np.uint64)
    codec = cls()
    back = codec.decompress(codec.compress(vals), n=len(vals))
    assert np.array_equal(back, vals)


def test_wide_value_poisons_packing_like_reference():
    """Reference parity pin: maxCode is NEVER reset after emitting a word
    (SimpleCompression.jl resets it only in empty!, :158-159), so one
    wide value makes every later small value emit its own word until
    reset().  This wastes space but is the reference's wire behavior —
    an 'optimized' encoder that recomputes maxCode would stop being
    bit-identical.  (codec.py add() docstring documents the choice.)"""
    codec = Simple64()
    poisoned = codec.compress(np.array([2**59] + [1] * 30, dtype=np.uint64))
    assert len(poisoned) == 31  # 1 wide word + 30 one-value words
    codec2 = Simple64()
    clean = codec2.compress(np.array([1] * 30, dtype=np.uint64))
    assert len(clean) == 1  # fresh encoder packs 30 ones into one word
    # round-trip stays exact in both regimes
    assert list(codec.decompress(poisoned, n=31)) == [2**59] + [1] * 30
