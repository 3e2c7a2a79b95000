"""Property-based tests (hypothesis): digest invariants under adversarial
inputs — duplicates, constants, sorted/reverse-sorted, tiny/huge values —
and merge associativity in the exact regime."""

from __future__ import annotations

import numpy as np
from hypothesis import given, settings, strategies as st

from tdigest_spark import MergingDigest
from tdigest_spark.scale import K_1, K_2, K_3

finite = st.floats(
    allow_nan=False, allow_infinity=False, min_value=-1e12, max_value=1e12
)
value_lists = st.lists(finite, min_size=1, max_size=2000)


@settings(max_examples=60, deadline=None)
@given(vals=value_lists, scale=st.sampled_from([K_1, K_2, K_3]))
def test_invariants_hold(vals, scale):
    d = MergingDigest(100.0, scale=scale)
    d.add(vals)
    d.compress()
    assert d.check_weights()
    assert d.total_weight == len(vals)
    assert d.quantile(0.0) == min(vals)
    assert d.quantile(1.0) == max(vals)


@settings(max_examples=40, deadline=None)
@given(vals=value_lists)
def test_quantile_monotone_and_bounded(vals):
    d = MergingDigest(100.0)
    d.add(vals)
    qs = np.linspace(0, 1, 31)
    est = [d.quantile(float(q)) for q in qs]
    assert all(a <= b + 1e-12 for a, b in zip(est, est[1:]))
    assert min(vals) <= est[0] and est[-1] <= max(vals)


@settings(max_examples=40, deadline=None)
@given(vals=value_lists)
def test_cdf_monotone_and_bounded(vals):
    d = MergingDigest(100.0)
    d.add(vals)
    lo, hi = min(vals), max(vals)
    xs = np.linspace(lo, hi, 23)
    est = [d.cdf(float(x)) for x in xs]
    assert all(0.0 <= e <= 1.0 for e in est)
    assert all(a <= b + 1e-12 for a, b in zip(est, est[1:]))


@settings(max_examples=40, deadline=None)
@given(
    vals=st.lists(finite, min_size=2, max_size=180),
    cut=st.integers(min_value=1, max_value=10),
)
def test_merge_exact_in_singleton_regime(vals, cut):
    """Below the buffer bound, merging arbitrary splits is a pure multiset
    union: serialized bytes equal the single-shot digest's bytes."""
    whole = MergingDigest(500.0)
    whole.add(vals)

    k = min(cut, len(vals))
    parts = np.array_split(np.asarray(vals, dtype=np.float64), k)
    merged = MergingDigest(500.0)
    for p in parts:
        dp = MergingDigest(500.0)
        if p.size:
            dp.add(p)
        merged.merge(dp)
    assert merged.to_bytes() == whole.to_bytes()


@settings(max_examples=30, deadline=None)
@given(vals=st.lists(finite, min_size=50, max_size=2000))
def test_rank_error_within_bound(vals):
    """Mid-range rank error stays bounded.  The published ~O(1/delta)
    bound assumes continuous-ish data; adversarial duplicate-heavy inputs
    (hypothesis finds e.g. 90 copies of one value) shift interpolation by
    up to the duplicated mass share — the reference's own repeated-values
    suite tolerates 0.2 there (test/special-cases.jl:72-73), so the
    property asserts 0.1."""
    d = MergingDigest(100.0)
    d.add(vals)
    sv = np.sort(np.asarray(vals, dtype=np.float64))
    n = sv.size
    for q in (0.1, 0.25, 0.5, 0.75, 0.9):
        est = d.quantile(q)
        lo = np.searchsorted(sv, est, side="left") / n
        hi = np.searchsorted(sv, est, side="right") / n
        err = 0.0 if lo <= q <= hi else min(abs(q - lo), abs(q - hi))
        assert err <= 0.1, (q, err)


@settings(max_examples=30, deadline=None)
@given(vals=st.lists(finite, min_size=1, max_size=500))
def test_serde_roundtrip_stable(vals):
    d = MergingDigest(100.0)
    d.add(vals)
    b1 = d.to_bytes()
    d2 = MergingDigest.from_bytes(b1)
    assert d2.to_bytes() == b1
    for q in (0.0, 0.3, 0.9, 1.0):
        assert d2.quantile(q) == d.quantile(q)


# values designed to stress the fast compaction path: duplicates, signed
# zeros, infinities, tiny/huge magnitudes
_stress = st.one_of(
    st.floats(allow_nan=False, allow_infinity=True, width=64),
    st.sampled_from([0.0, -0.0, 1.0, -1.0, float("inf"), float("-inf"), 3.14]),
    st.integers(min_value=-5, max_value=5).map(float),
)


@settings(max_examples=60, deadline=None)
@given(
    vals=st.lists(_stress, min_size=2, max_size=3000),
    delta=st.sampled_from([10.0, 37.0, 100.0]),
    chunk=st.sampled_from([7, 100, 997]),
)
def test_fast_compaction_bit_equals_stable(vals, delta, chunk):
    """Property form of TestFastCompactionPath: the sort-pending+merge
    fast path is byte-identical to the stable-argsort path (log_data=True
    forces it) for arbitrary float streams and chunkings."""
    a = MergingDigest(delta)
    b = MergingDigest(delta, log_data=True)
    arr = np.asarray(vals, dtype=np.float64)
    for lo in range(0, arr.size, chunk):
        a.add(arr[lo : lo + chunk])
        b.add(arr[lo : lo + chunk])
    assert a.to_bytes() == b.to_bytes()


# --------------------------------------------------- rolling-hash core


def _naive_window_hashes(tok_lists, k, short_whole, include_empty):
    """Definition-level reference for _rolling_core: hash each token with
    pandas hash_array, then compute each k-window's polynomial hash
    DIRECTLY as sum(th[j] * BASE^(k-1-(j-p))) mod 2^64 — no prefix sum,
    no modular inverse."""
    import numpy as np
    import pandas as pd

    from tdigest_spark.operators.dedup import _ROLL_BASE

    M = 1 << 64
    out = []
    for toks in tok_lists:
        th = (
            pd.util.hash_array(np.array(toks, dtype=object)).tolist()
            if toks
            else []
        )

        def poly(vals):
            h = 0
            for v in vals:
                h = (h * _ROLL_BASE + int(v)) % M
            return h

        n = len(toks)
        if n >= k:
            out.append([poly(th[p : p + k]) for p in range(n - k + 1)])
        elif short_whole and (n > 0 or include_empty):
            out.append([poly(th)])
        else:
            out.append([])
    return out


@settings(max_examples=60, deadline=None)
@given(
    st.lists(
        st.lists(st.sampled_from([f"t{i}" for i in range(9)]), max_size=12),
        max_size=8,
    ),
    st.integers(min_value=1, max_value=6),
    st.booleans(),
    st.booleans(),
)
def test_rolling_core_matches_naive_polynomial(
    tok_lists, k, short_whole, include_empty
):
    # the prefix-sum + modular-inverse trick must equal the direct
    # per-window polynomial for every doc-length/k combination,
    # including empty docs, short docs, and len == k boundaries
    import numpy as np
    import pandas as pd

    from tdigest_spark.operators.dedup import _rolling_core

    counts, seg_h, seg_starts = _rolling_core(
        np, pd, tok_lists, k, short_whole=short_whole,
        include_empty=include_empty,
    )
    got = [
        seg_h[s : s + c].tolist()
        for s, c in zip(seg_starts.tolist(), counts.tolist())
    ]
    want = _naive_window_hashes(tok_lists, k, short_whole, include_empty)
    assert got == want


# ---------------------------------------------------------------- PQ kernel

int_floats = st.integers(min_value=-512, max_value=512).map(float)


@settings(max_examples=60, deadline=None)
@given(data=st.data())
def test_pq_argmin_kernel_matches_bruteforce(data):
    """The cache-blocked (|c|^2 - 2 x.c) argmin kernel == brute-force
    |x-c|^2 argmin with first-minimum tie-break.  Integer-valued floats
    keep every product/sum exact in f64, so the two formulas are
    bit-identical and the differential is exact — including on
    duplicate codebook rows (exact ties -> lowest code id wins)."""
    from tdigest_spark.operators.similarity import (
        _pq_argmin_codes,
        _pq_kernel_tables,
    )

    n_sub = data.draw(st.integers(1, 3))
    dsub = data.draw(st.integers(1, 4))
    ksub = data.draw(st.integers(1, 6))
    n = data.draw(st.integers(1, 40))
    dim = n_sub * dsub
    X = np.array(
        data.draw(
            st.lists(
                st.lists(int_floats, min_size=dim, max_size=dim),
                min_size=n, max_size=n,
            )
        )
    )
    books = data.draw(
        st.lists(
            st.lists(
                st.lists(int_floats, min_size=dsub, max_size=dsub),
                min_size=ksub, max_size=ksub,
            ),
            min_size=n_sub, max_size=n_sub,
        )
    )
    CT, cnorms = _pq_kernel_tables(books)
    got = _pq_argmin_codes(X, CT, cnorms, dsub)
    for i in range(n):
        for s in range(n_sub):
            xs = X[i, s * dsub : (s + 1) * dsub]
            d2 = [((xs - np.array(c)) ** 2).sum() for c in books[s]]
            want = int(np.argmin(d2))  # first minimum = lowest j
            assert got[i, s] == want, (i, s, d2)


@settings(max_examples=12, deadline=None)
@given(data=st.data())
def test_crawl_diff_matches_python_model(data, spark):
    """crawl_diff (the actual Spark operator) == a Python dict model on
    arbitrary key/content assignments, including duplicate keys
    (min-hash collapse) and NULL contents."""
    import hashlib

    keys = st.integers(0, 8)
    content = st.one_of(st.none(), st.sampled_from(["a", "b", "c"]))
    old_rows = data.draw(st.lists(st.tuples(keys, content), min_size=1, max_size=10))
    new_rows = data.draw(st.lists(st.tuples(keys, content), min_size=1, max_size=10))

    def h(c):
        return "#null#" if c is None else hashlib.md5(c.encode()).hexdigest()

    def side(rows):
        out = {}
        for k, c in rows:
            out[k] = min(out[k], h(c)) if k in out else h(c)
        return out

    o, n = side(old_rows), side(new_rows)
    expect = {}
    for k in set(o) | set(n):
        if k not in o:
            expect[k] = "new"
        elif k not in n:
            expect[k] = "gone"
        elif o[k] == n[k]:
            expect[k] = "same"
        else:
            expect[k] = "changed"

    from tdigest_spark.operators.dedup import crawl_diff

    df_o = spark.createDataFrame(old_rows, "url long, text string")
    df_n = spark.createDataFrame(new_rows, "url long, text string")
    got = {r["url"]: r["status"] for r in crawl_diff(df_o, df_n).collect()}
    assert got == expect
