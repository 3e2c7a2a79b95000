"""Log-spaced histograms (LogHistogram / SignedLogHistogram).

Behavioral re-implementation of the reference's sibling sketch
(`/root/reference/src/LogHistogram.jl`): fixed log-spaced bins whose widths
track an approximate log2 computed from the IEEE-754 representation with a
quadratic mantissa correction (error <= ~0.01, exact at powers of two, with
an exact inverse `pow2` so bin bounds are reproducible bit-for-bit).

Mergeable by element-wise count-vector addition when "conformal" (same
bounds/precision) — which in Spark is just an `ArrayType(LongType)` column
summed with `F.zip_with` or NumPy (LogHistogram.jl:92-122).

The reference's `cdf` is defective as written (LogHistogram.jl:76-83 passes
`x` where the histogram belongs); we implement the documented intent:
fraction of counts in bins strictly below x's bin plus half of x's bin.
"""

from __future__ import annotations

import numpy as np

_LN2 = np.log(2.0)


def approx_log2(value):
    """Bit-twiddled approximate log2 (LogHistogram.jl:187-192 semantics).

    Exponent from the IEEE-754 representation, mantissa corrected with a
    quadratic; error bounded by ~±0.01, zero at powers of two, monotone.
    Vectorized over NumPy arrays.
    """
    v = np.asarray(value, dtype=np.float64)
    bits = v.view(np.int64)
    exponent = ((bits & 0x7FF0_0000_0000_0000) >> 52) - 1024
    m = ((bits & np.int64(-0x7FF0_0000_0000_0001)) | 0x3FF0_0000_0000_0000).view(
        np.float64
    )
    return m * (2.0 - (1.0 / 3.0) * m) + exponent - 2.0 / 3.0


def pow2(x):
    """Exact inverse of approx_log2 (LogHistogram.jl:198-203)."""
    x = np.asarray(x, dtype=np.float64)
    exponent = np.floor(x) - 1
    frac = x - exponent
    m = 3.0 - np.sqrt(7.0 - 3.0 * frac)
    return np.exp2(exponent + 1) * m


def _bucket_index(log_factor, log_offset, x):
    return np.ceil(approx_log2(x) * log_factor - log_offset).astype(np.int64)


class LogHistogram:
    """Log-spaced histogram over positive samples (LogHistogram.jl:25-38)."""

    def __init__(self, min_value: float, max_value: float, epsilon: float = 0.1):
        if max_value <= 2 * min_value:
            raise ValueError(f"Illegal/nonsensical min, max ({min_value}, {max_value})")
        if min_value <= 0 or max_value <= 0:
            raise ValueError("Min and max must be positive")
        if epsilon < 1e-6 or epsilon > 0.5:
            raise ValueError(
                f"Unreasonable number of bins per decade {epsilon}; expected [1e-6, 0.5]"
            )
        self.min = float(min_value)
        self.max = float(max_value)
        self.log_factor = _LN2 / np.log1p(epsilon)
        self.log_offset = float(approx_log2(self.min) * self.log_factor)
        bin_count = int(_bucket_index(self.log_factor, self.log_offset, self.max)) + 1
        if bin_count > 10_000:
            raise ValueError(
                f"Excessive number of bins {bin_count} from min,max = {min_value},{max_value}"
            )
        self.counts = np.zeros(bin_count, dtype=np.int64)

    # 1-based bucket semantics of the reference mapped to 0-based arrays
    def bucket(self, x) -> np.ndarray:
        x = np.asarray(x, dtype=np.float64)
        idx = _bucket_index(self.log_factor, self.log_offset, np.maximum(x, self.min))
        idx = idx - 1  # reference buckets are 1-based
        idx = np.where(x <= self.min, 0, idx)
        idx = np.where(x >= self.max, len(self.counts) - 1, idx)
        return np.clip(idx, 0, len(self.counts) - 1)

    def add(self, values) -> None:
        """Vectorized fit! (LogHistogram.jl:66): counts[bucket(v)] += 1.

        NaN is rejected like `KLL.add` (and like the reference, where
        the NaN-derived bucket index raises an InexactError): silently
        accepted, NaN's IEEE exponent (0x7FF) reads as a huge log2 and
        each NaN would increment the TOP bin, skewing cdf/quantile
        toward max with no signal."""
        v = np.asarray(values, dtype=np.float64).ravel()
        if v.size == 0:
            return
        if np.isnan(v).any():
            raise ValueError("Cannot add NaN to LogHistogram")
        np.add.at(self.counts, self.bucket(v), 1)

    def lower_bound(self, k) -> np.ndarray:
        """Lower bound of 0-based bin k (LogHistogram.jl:131, shifted)."""
        k = np.asarray(k)
        return pow2((k + self.log_offset) / self.log_factor)

    def bounds(self) -> np.ndarray:
        return self.lower_bound(np.arange(len(self.counts)))

    def conformal(self, other: "LogHistogram") -> bool:
        return (
            type(self) is type(other)
            and (self.min, self.max) == (other.min, other.max)
            and len(self.counts) == len(other.counts)
        )

    def merge(self, *others: "LogHistogram") -> "LogHistogram":
        for other in others:
            if not self.conformal(other):
                raise ValueError(
                    "Can only merge histograms with identical bounds and precision"
                )
            self.counts += other.counts
        return self

    def cdf(self, x: float) -> float:
        """Intent-corrected cdf: mass strictly below x's bin + half its bin."""
        n = self.counts.sum()
        if n == 0:
            return float("nan")
        b = int(self.bucket(x))
        below = self.counts[:b].sum()
        return float(below + self.counts[b] / 2.0) / float(n)

    def quantile(self, q: float) -> float:
        """Bin-midpoint quantile (LogHistogram.jl:86-90)."""
        n = self.counts.sum()
        if n == 0:
            return float("nan")
        cum = np.cumsum(self.counts) / n
        idx = int(np.searchsorted(cum, q, side="left"))
        idx = min(idx, len(self.counts) - 1)
        lo = float(self.lower_bound(idx))
        hi = float(self.lower_bound(idx + 1))
        return (lo + hi) / 2.0


class SignedLogHistogram:
    """Two-sided variant: separate positive/negative count vectors
    (LogHistogram.jl:47-61; the reference's convenience ctor is broken,
    we implement the documented intent)."""

    def __init__(self, min_value: float, max_value: float, epsilon: float = 0.1):
        self.positive = LogHistogram(min_value, max_value, epsilon)
        self.negative = LogHistogram(min_value, max_value, epsilon)

    def add(self, values) -> None:
        v = np.asarray(values, dtype=np.float64).ravel()
        # explicit: NaN fails BOTH sign comparisons and would silently
        # vanish; reject like LogHistogram.add / KLL.add
        if np.isnan(v).any():
            raise ValueError("Cannot add NaN to SignedLogHistogram")
        self.positive.add(v[v >= 0])
        neg = v[v < 0]
        if neg.size:
            self.negative.add(-neg)

    def conformal(self, other: "SignedLogHistogram") -> bool:
        return type(self) is type(other) and self.positive.conformal(other.positive)

    def merge(self, *others: "SignedLogHistogram") -> "SignedLogHistogram":
        for other in others:
            if not self.conformal(other):
                raise ValueError(
                    "Can only merge histograms with identical bounds and precision"
                )
            self.positive.counts += other.positive.counts
            self.negative.counts += other.negative.counts
        return self

    @property
    def counts(self):
        return self.positive.counts, self.negative.counts
