"""t-digest scale functions K_0..K_3 as vectorized NumPy ufunc-style callables.

Semantics match the reference scale-function family (tdunning/TDigest,
``src/scale.jl:39-166``): each scale function provides

- ``k(q, norm)``        : forward map quantile -> k coordinate (normalized form)
- ``q(k, norm)``        : inverse map k -> quantile (normalized form)
- ``k_cn(q, delta, n)`` : forward map, (compression, n) form
- ``q_cn(k, delta, n)`` : inverse map, (compression, n) form
- ``max_step(q, norm)`` : largest dq at q keeping dk <= 1
- ``normalizer(delta, n)``: precomputed norm so that k(q, norm) == k_cn(q, delta, n)

All q inputs are clamped to [1e-15, 1 - 1e-15] exactly as the reference's
``limit`` helper does (``src/scale.jl:36``).  Functions accept scalars or
NumPy arrays and always compute in float64.

K_2 / K_3 use Z = 4*ln(n/delta) + 24 (resp. +21) per ``src/scale.jl:87,129``.
"""

from __future__ import annotations

import numpy as np

_Q_LO = 1e-15
_Q_HI = 1.0 - 1e-15


def _clip_q(q):
    return np.clip(np.asarray(q, dtype=np.float64), _Q_LO, _Q_HI)


class ScaleFunction:
    """Base class; subclasses are stateless singletons."""

    name = "base"

    # -- normalized forms ---------------------------------------------------
    def k(self, q, norm):  # pragma: no cover - abstract
        raise NotImplementedError

    def q(self, k, norm):  # pragma: no cover - abstract
        raise NotImplementedError

    def max_step(self, q, norm):  # pragma: no cover - abstract
        raise NotImplementedError

    def normalizer(self, delta, n):  # pragma: no cover - abstract
        raise NotImplementedError

    # -- (compression, n) forms --------------------------------------------
    def k_cn(self, q, delta, n):
        return self.k(q, self.normalizer(delta, n))

    def q_cn(self, k, delta, n):
        return self.q(k, self.normalizer(delta, n))

    def max_step_cn(self, q, delta, n):
        return self.max_step(q, self.normalizer(delta, n))

    def limit(self, q0, norm):
        """q(k(q0) + 1): the next-cluster quantile limit of the merge walk
        (TDigest.jl:284-299 computes this per cluster; core._compact
        evaluates it vectorized over every cumulative weight).

        ``q0`` MUST be ascending — subclasses exploit sortedness to
        evaluate each algebraic branch on its contiguous segment instead
        of paying every transcendental on every lane (the former single
        largest cost of the ingest hot path).  Results may differ from
        the literal q(k(q0)+1) composition by ~1 ulp (log/exp round-trip
        replaced by its closed form); cluster boundaries are searchsorted
        against these limits, so a 1-ulp shift only matters on an exact
        tie between a limit and a cumulative weight — inputs the rank
        bound is indifferent to.
        """
        return self.q(self.k(q0, norm) + 1.0, norm)

    def __repr__(self):
        return self.name


class K0(ScaleFunction):
    """Uniform cluster sizes (comparison only). k = norm*q, norm = delta/2."""

    name = "K_0"

    def k(self, q, norm):
        return np.asarray(q, dtype=np.float64) * norm

    def q(self, k, norm):
        return np.asarray(k, dtype=np.float64) / norm

    def max_step(self, q, norm):
        return np.asarray(q, dtype=np.float64) * 0 + 1.0 / norm

    def limit(self, q0, norm):
        # q((q0*norm + 1)/norm) == q0 + 1/norm up to 1 ulp
        return np.asarray(q0, dtype=np.float64) + 1.0 / norm

    def normalizer(self, delta, n):
        return delta / 2.0


class K1(ScaleFunction):
    """Cluster sizes ~ sqrt(q(1-q)). k = norm*asin(2q-1), norm = delta/(2*pi)."""

    name = "K_1"

    def k(self, q, norm):
        qq = _clip_q(q)
        return norm * np.arcsin(2.0 * qq - 1.0)

    def q(self, k, norm):
        kk = np.clip(np.asarray(k, dtype=np.float64), -np.pi / 2 * norm, np.pi / 2 * norm)
        return (np.sin(kk / norm) + 1.0) / 2.0

    def max_step(self, q, norm):
        qq = np.clip(np.asarray(q, dtype=np.float64), 0.0, 1.0)
        return 2.0 * np.sin(0.5 / norm) * np.sqrt(qq * (1.0 - qq))

    def limit(self, q0, norm):
        # sin(asin(2q0-1) + c) expanded via the angle-addition identity:
        # sin a = 2q0-1, cos a = sqrt((1-s)(1+s)); the k-clip at pi/2*norm
        # becomes the contiguous tail q0 > (cos c + 1)/2 where limit == 1.
        c = 1.0 / norm
        if not c < np.pi / 2:          # tiny norm: angle algebra degenerates
            return super().limit(q0, norm)
        q0 = _clip_q(q0)
        sin_c = float(np.sin(c))
        cos_c = float(np.cos(c))
        cut = int(np.searchsorted(q0, (cos_c + 1.0) / 2.0, side="right"))
        out = np.empty_like(q0)
        s = 2.0 * q0[:cut] - 1.0
        out[:cut] = (s * cos_c + np.sqrt((1.0 - s) * (1.0 + s)) * sin_c + 1.0) / 2.0
        out[cut:] = 1.0
        return out

    def normalizer(self, delta, n):
        return delta / (2.0 * np.pi)

    def k_cn(self, q, delta, n):
        # reference clamps to [1e-15, 1e15] here (a typo for 1-1e-15 upstream,
        # but asin clamps naturally); we keep the safe [1e-15, 1-1e-15] clamp.
        qq = _clip_q(q)
        return delta * np.arcsin(2.0 * qq - 1.0) / (2.0 * np.pi)

    def q_cn(self, k, delta, n):
        kk = np.clip(np.asarray(k, dtype=np.float64), -delta / 4.0, delta / 4.0)
        return (np.sin(kk * (2.0 * np.pi / delta)) + 1.0) / 2.0


class K2(ScaleFunction):
    """Cluster sizes ~ q(1-q); k = norm*log(q/(1-q)); Z = 4 ln(n/delta) + 24.

    Intent correction vs the reference (scale.jl:87, unguarded): for
    n < delta*exp(-6) the raw Z goes negative, inverting k()/q() and
    making the check_weights size bound vacuously true.  The ln term is
    floored at 0 (treat sub-delta populations as n = delta): in that
    regime every centroid is a singleton so any positive normalizer is
    valid, the clamp is continuous at n = delta, and the formula is
    bit-identical to the reference for all n >= delta (the only regime
    test/ref.csv covers)."""

    name = "K_2"

    def _z(self, delta, n):
        return 4.0 * max(np.log(n / delta), 0.0) + 24.0

    def k(self, q, norm):
        qq = _clip_q(q)
        return np.log(qq / (1.0 - qq)) * norm

    def q(self, k, norm):
        w = np.exp(np.asarray(k, dtype=np.float64) / norm)
        return w / (1.0 + w)

    def max_step(self, q, norm):
        qq = np.asarray(q, dtype=np.float64)
        return qq * (1.0 - qq) / norm

    def limit(self, q0, norm):
        # q(k+1) in odds space: w' = (q0/(1-q0)) * e^{1/norm}, limit = w'/(1+w')
        # — one exp total instead of log+exp per lane, no branches.
        q0 = _clip_q(q0)
        w = (q0 / (1.0 - q0)) * float(np.exp(1.0 / norm))
        return w / (1.0 + w)

    def normalizer(self, delta, n):
        return delta / self._z(delta, n)

    def k_cn(self, q, delta, n):
        if n <= 1:
            # degenerate digest: reference pins k to {-10, 0, 10}
            q = np.asarray(q, dtype=np.float64)
            return np.where(q <= 0, -10.0, np.where(q >= 1, 10.0, 0.0))
        return self.k(q, self.normalizer(delta, n))


class K3(ScaleFunction):
    """Cluster sizes ~ min(q, 1-q); Z = 4 ln(n/delta) + 21.  Default scale.

    Same negative-Z guard as K2 (reference scale.jl:129 is unguarded:
    n < delta*exp(-21/4) would invert k()/q()); ln floored at 0,
    bit-identical to the reference for n >= delta."""

    name = "K_3"

    def _z(self, delta, n):
        return 4.0 * max(np.log(n / delta), 0.0) + 21.0

    def k(self, q, norm):
        qq = _clip_q(q)
        return np.where(
            qq <= 0.5,
            np.log(2.0 * qq) * norm,
            -np.log(2.0 * (1.0 - qq)) * norm,
        )

    def q(self, k, norm):
        kk = np.asarray(k, dtype=np.float64)
        return np.where(
            kk <= 0,
            np.exp(kk / norm) / 2.0,
            1.0 - np.exp(-kk / norm) / 2.0,
        )

    def max_step(self, q, norm):
        qq = np.asarray(q, dtype=np.float64)
        return np.minimum(qq, 1.0 - qq) / norm

    def limit(self, q0, norm):
        # Closed form of q(k(q0)+1) with E = e^{1/norm}; three contiguous
        # segments of the ASCENDING q0 (branch cuts at 1/(2E) and 1/2):
        #   q0 <= 1/(2E)      -> q0 * E            (k+1 still <= 0)
        #   1/(2E) < q0 <= .5 -> 1 - 1/(4*E*q0)    (k <= 0, k+1 > 0)
        #   q0 > .5           -> 1 - (1-q0)/E
        # One scalar exp instead of a log+exp ufunc pass per lane.
        q0 = _clip_q(q0)
        E = float(np.exp(1.0 / norm))
        i1 = int(np.searchsorted(q0, 0.5 / E, side="right"))
        i2 = int(np.searchsorted(q0, 0.5, side="right"))
        out = np.empty_like(q0)
        np.multiply(q0[:i1], E, out=out[:i1])
        np.subtract(1.0, 1.0 / (4.0 * E * q0[i1:i2]), out=out[i1:i2])
        np.subtract(1.0, (1.0 - q0[i2:]) / E, out=out[i2:])
        return out

    def normalizer(self, delta, n):
        return delta / self._z(delta, n)


K_0 = K0()
K_1 = K1()
K_2 = K2()
K_3 = K3()

SCALES = {"K_0": K_0, "K_1": K_1, "K_2": K_2, "K_3": K_3}
SCALE_CODES = {"K_0": 0, "K_1": 1, "K_2": 2, "K_3": 3}
SCALE_BY_CODE = {v: SCALES[k] for k, v in SCALE_CODES.items()}


def get_scale(name_or_scale) -> ScaleFunction:
    if isinstance(name_or_scale, ScaleFunction):
        return name_or_scale
    return SCALES[str(name_or_scale)]
