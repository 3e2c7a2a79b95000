"""Oracle functions ported from the reference test utilities
(/root/reference/test/utility.jl:2-12)."""

from __future__ import annotations

import numpy as np


def cdf_ref(data, x) -> float:
    data = np.asarray(data, dtype=np.float64)
    return float((np.sum(data < x) + np.sum(data == x) / 2.0) / data.size)


def quantile_ref(data, q) -> float:
    data = np.sort(np.asarray(data, dtype=np.float64))
    if q <= 0:
        return float(data[0])
    if q >= 1:
        return float(data[-1])
    return float(data[int(np.floor(q * data.size))])
