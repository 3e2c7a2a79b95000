"""MergingDigest: the buffered merging t-digest over NumPy buffers.

A from-scratch implementation of the merging t-digest (Dunning & Ertl,
"Computing Extremely Accurate Quantiles Using t-Digests", arXiv:1902.04023)
whose *behavior* matches the reference library tdunning/TDigest
(`/root/reference/src/TDigest.jl`).  The code is not a port: the reference
keeps a Julia Vector{Centroid} and merges with a scalar while-loop; here the
digest holds two flat float64 arrays (means, counts) and compaction walks
*output clusters* (<= working compression of them) using cumsum+searchsorted,
so per-sample cost is vectorized NumPy.

Behavioral contract (cited against the reference):

- construction: delta clamped to >=10; max_size = 2*delta + max(50, 5*delta);
  two-level working compression delta' = sqrt(max_size/(2*delta))*delta
  (TDigest.jl:110-121).
- add(): batches chunked at 10_000; NaN rejected; appended as unit-weight
  centroids; compaction on a temp copy when buffer would exceed max_size
  (TDigest.jl:130-167).
- compaction: stable sort, alternating direction on non-forced merges,
  watermark-prefix reversal for repeated-value stability, greedy k-limit
  pass that never merges into the first cluster and forces the last
  centroid to stay a singleton (TDigest.jl:211-333).
- merge(): weight add + concat; forced ascending compaction at the private
  compression when oversized (TDigest.jl:184-209; the reference call is
  mis-arity'd — we implement the documented intent).
- quantile()/cdf(): boundary conventions and singleton-exclusion
  interpolation per TDigest.jl:430-630; exact (== rank oracle) while the
  digest holds only singletons.
- serialization: the *intended* layouts of TDigest.jl:659-790 (the
  reference code paths are broken as written); deterministic bytes.
"""

from __future__ import annotations

import struct

import numpy as np

from .scale import K_3, SCALE_BY_CODE, SCALE_CODES, ScaleFunction, get_scale

_CHUNK = 10_000  # reference ingestion chunk (TDigest.jl:134-138)


class MergingDigest:
    __slots__ = (
        "public_compression",
        "private_compression",
        "scale",
        "max_size",
        "total_weight",
        "_mean",
        "_count",
        "_n",
        "merge_count",
        "use_alternating_sort",
        "watermark",
        "is_reversed",
        "log",
        "_pending_unit",
        "_scratch_m",
        "_scratch_c",
    )

    def __init__(
        self,
        compression: float = 100.0,
        scale: ScaleFunction | str = K_3,
        max_pending: float | None = None,
        use_two_level_compression: bool = True,
        log_data: bool = False,
    ):
        compression = float(compression)
        if compression < 10:
            compression = 10.0
        if max_pending is None:
            max_pending = 5 * compression
        max_size = int(2 * compression + max(50, max_pending))

        self.public_compression = compression
        if use_two_level_compression:
            self.private_compression = float(
                np.sqrt(max_size / (2 * compression)) * compression
            )
        else:
            self.private_compression = compression
        self.scale = get_scale(scale)
        self.max_size = max_size
        self.total_weight = 0.0
        # The buffer's HARD cap is max_size + _CHUNK + 1 (+1 slack: scalar
        # add appends before checking overflow), but it is allocated lazily:
        # grouped Spark builds hold one digest per live group, and a small
        # group (or a large delta chosen for the singleton regime) should
        # cost memory proportional to its data, not to the worst-case
        # pending buffer (22 MB at delta=200k; 171 KB even at delta=100).
        cap = min(max_size + _CHUNK, 1024) + 1
        self._mean = np.empty(cap, dtype=np.float64)
        self._count = np.empty(cap, dtype=np.float64)
        self._n = 0
        self.merge_count = 0
        self.use_alternating_sort = True
        self.watermark = 0
        self.is_reversed = False
        # per-centroid sample log (TDigest.jl:68-69): debug feature, one
        # list of raw samples per centroid, regrouped on every compaction.
        # None when disabled (the at-scale default — SURVEY §2.1 documents
        # why a sample log cannot survive 10^12 rows); never serialized.
        self.log: list[list[float]] | None = [] if log_data else None
        # True while every pending (post-watermark) centroid has unit weight
        # — the ingest fast path; add_weighted clears it, compaction restores
        # it.  Scratch buffers for the two-run merge are lazily allocated.
        self._pending_unit = True
        self._scratch_m: np.ndarray | None = None
        self._scratch_c: np.ndarray | None = None

    # ------------------------------------------------------------------ state

    def __len__(self) -> int:
        return self._n

    @property
    def means(self) -> np.ndarray:
        return self._mean[: self._n]

    @property
    def counts(self) -> np.ndarray:
        return self._count[: self._n]

    # ------------------------------------------------------------------ ingest

    def add(self, values) -> None:
        """Add a batch of samples (vectorized fit!, TDigest.jl:130-167)."""
        vals = np.asarray(values, dtype=np.float64).ravel()
        if vals.size == 0:
            return
        if np.isnan(vals).any():
            raise ValueError("Cannot add NaN to t-digest")
        for lo in range(0, vals.size, _CHUNK):
            self._add_chunk(vals[lo : lo + _CHUNK])

    def _grow(self, need: int) -> None:
        """Geometric buffer growth, capped at the reference's merge-on-temp
        working-set bound (max_size + chunk slack)."""
        cap = self._mean.size
        while cap < need:
            cap *= 2
        cap = max(min(cap, self.max_size + _CHUNK + 1), need)
        self._mean = np.resize(self._mean[: self._n], cap)
        self._count = np.resize(self._count[: self._n], cap)

    def _add_chunk(self, vals: np.ndarray) -> None:
        b = vals.size
        if self._n + b > self._mean.size:
            self._grow(self._n + b)
        self.total_weight += b
        if self.log is not None:
            # one singleton log entry per appended sample (TDigest.jl:148-151)
            self.log.extend([x] for x in vals.tolist())
        if self._n + b > self.max_size:
            # merge on a logically-temporary tail region: append then compact
            # (the preallocated buffer has chunk slack, so this mirrors the
            # reference's merge-on-temp-copy without allocation)
            self._mean[self._n : self._n + b] = vals
            self._count[self._n : self._n + b] = 1.0
            self._n += b
            self._compact(force=False, compression=self.private_compression)
        else:
            self._mean[self._n : self._n + b] = vals
            self._count[self._n : self._n + b] = 1.0
            self._n += b

    def add_weighted(self, means, counts) -> None:
        """Append pre-weighted centroids (used by digest merge)."""
        means = np.asarray(means, dtype=np.float64).ravel()
        counts = np.asarray(counts, dtype=np.float64).ravel()
        b = means.size
        if b == 0:
            return
        if self.log is not None and len(self.log) != self._n + b:
            raise ValueError(
                "weighted centroids carry no sample log — merge() logging "
                "digests instead of calling add_weighted directly"
            )
        self.total_weight += float(counts.sum())
        if self._n + b > self._mean.size:
            grow = max(self._mean.size * 2, self._n + b)
            self._mean = np.resize(self._mean[: self._n], grow)
            self._count = np.resize(self._count[: self._n], grow)
        self._mean[self._n : self._n + b] = means
        self._count[self._n : self._n + b] = counts
        self._n += b
        self._pending_unit = False
        if self._n > self.max_size:
            self._compact(force=True, compression=self.private_compression)

    def merge(self, other: "MergingDigest") -> "MergingDigest":
        """Absorb another digest (TDigest.jl:184-209).

        Digest-digest merges always compact ascending (forced) when the
        combined buffer would exceed max_size — intent of TDigest.jl:197.
        """
        if self.log is not None:
            if other.log is None:
                raise ValueError(
                    "Can't merge a digest that hasn't logged samples to one "
                    "that has"  # TDigest.jl:185-187
                )
            self.log.extend(list(entry) for entry in other.log)
        self.add_weighted(other.means, other.counts)
        return self

    # -------------------------------------------------------------- compaction

    def _compact(self, force: bool, compression: float) -> None:
        """mergeNewValues! (TDigest.jl:228-333), cluster-walk formulation."""
        n = self._n
        if n <= 1:
            return
        if not (force or n > self.max_size):
            return

        reverse_order = (
            not force and self.use_alternating_sort and self.merge_count % 2 == 1
        )
        means = self._mean[:n]
        counts = self._count[:n]

        if self.is_reversed != reverse_order and self.watermark > 0:
            # keep established equal-mean centroids stable across direction
            # flips (TDigest.jl:238-243)
            means[: self.watermark] = means[: self.watermark][::-1]
            counts[: self.watermark] = counts[: self.watermark][::-1]
            if self.log is not None:
                self.log[: self.watermark] = self.log[: self.watermark][::-1]

        wm = self.watermark
        fast = self.log is None and self._pending_unit
        if fast and wm > 1:
            # cluster means are weighted averages whose rounding can break
            # monotonicity by ~1 ulp (visible with heavy duplicates); the
            # two-run merge needs a truly sorted prefix, so verify (O(wm),
            # wm <= max_size) and fall back to the full stable sort if not.
            # The prefix is already reversal-normalized to the TARGET
            # direction at this point, so test against reverse_order.
            pfx_chk = self._mean[:wm]
            if reverse_order:
                fast = bool(np.all(pfx_chk[1:] <= pfx_chk[:-1]))
            else:
                fast = bool(np.all(pfx_chk[1:] >= pfx_chk[:-1]))
        if fast:
            # Ingest fast path (the former hot spot): the prefix [0:wm] is
            # already sorted in the target direction (watermark invariant +
            # the reversal above) and every pending centroid has unit
            # weight, so a full stable argsort of the buffer is equivalent
            # to sort(new values) + one stable two-run merge — ~8x cheaper.
            # Bit-exactness vs the stable argsort: equal-comparing doubles
            # are bit-identical (NaN is rejected at add) EXCEPT -0.0/+0.0,
            # so quicksort is used unless the pending run mixes signed
            # zeros (then stable sort keeps their original order, which is
            # observable through order-sensitive cluster sums).
            key_p = -means[:wm] if reverse_order else means[:wm]
            raw = means[wm:n]
            key_s = -raw if reverse_order else raw
            z = key_s == 0.0
            if z.any():
                sb = np.signbit(key_s[z])
                stable_needed = sb.any() and not sb.all()
            else:
                stable_needed = False
            key_s = np.sort(key_s, kind="stable" if stable_needed else None)
            if wm == 0:
                if reverse_order:
                    np.negative(key_s, out=means)
                else:
                    means[:] = key_s
                counts[:] = 1.0
            else:
                # stable merge: prefix elements precede equal pending ones.
                # The pending run's positions are exactly the complement of
                # the prefix positions (the two position maps form a
                # bijection onto [0, n)), so one boolean mask replaces the
                # second searchsorted (n needles into the prefix).
                pos_p = np.arange(wm) + key_s.searchsorted(key_p, "left")
                if self._scratch_m is None or self._scratch_m.size < n:
                    self._scratch_m = np.empty_like(self._mean)
                    self._scratch_c = np.empty_like(self._count)
                sm = self._scratch_m[:n]
                sc = self._scratch_c[:n]
                mask = np.ones(n, dtype=bool)
                mask[pos_p] = False
                sm[pos_p] = key_p
                sc[pos_p] = counts[:wm]
                sm[mask] = key_s
                sc[mask] = 1.0
                if reverse_order:
                    np.negative(sm, out=means)
                else:
                    means[:] = sm
                counts[:] = sc
        else:
            # stable sort; descending = stable ascending sort of negated keys
            if reverse_order:
                order = np.argsort(-means, kind="stable")
            else:
                order = np.argsort(means, kind="stable")
            means[:] = means[order]
            counts[:] = counts[order]
            if self.log is not None:  # permute!(log, order), TDigest.jl:256-258
                self.log = [self.log[i] for i in order.tolist()]
        self.is_reversed = reverse_order

        if not reverse_order and n < compression:
            # freshly sorted and small: already a trivial t-digest
            self.watermark = n
            self._pending_unit = True
            return

        self.merge_count += 1

        total = self.total_weight
        norm = self.scale.normalizer(compression, total)

        cw = np.cumsum(counts)
        # Vectorized limits: the cluster starting right after prefix i may
        # absorb while cumulative weight stays <= W*q(k(cw[i]/W)+1)
        # (TDigest.jl:284-299).  scale.limit computes all candidate limits
        # in one segmented closed-form pass over the ascending quantiles —
        # cheaper than composing the k/q ufuncs (which paid a log+exp per
        # lane), and cheaper than per-cluster scalar calls in the walk.
        limit_w = total * self.scale.limit(cw / total, norm)

        # Greedy boundary walk: pure index hopping (searchsorted per
        # cluster). Cluster 0 is the first centroid alone (never merged
        # into, TDigest.jl:309-311); the final centroid always survives as
        # its own cluster (bounded by cw[:n-1]).
        bounds = [0, 1]
        s = 1
        nm1 = n - 1
        cw_head = cw[:nm1]
        ss = cw_head.searchsorted  # bound method: skips the ufunc dispatch
        while s < nm1:
            e = int(ss(limit_w[s - 1], "right")) - 1
            if e < s:
                e = s
            bounds.append(e + 1)
            s = e + 1
        if s == nm1:
            bounds.append(n)

        b = np.asarray(bounds, dtype=np.int64)
        to = b.size - 1
        seg_w = np.add.reduceat(counts, b[:-1])
        seg_mw = np.add.reduceat(means * counts, b[:-1])
        # Clamp every cluster mean into its members' range — the reference
        # merges pairwise through weightedAverageSorted, which clamps into
        # [x1, x2] (TDigest.jl:632-657, A12).  Without it, sum/weight for a
        # run of IDENTICAL values drifts ~1 ulp (15*0.1/15 =
        # 0.10000000000000002), so a drifted multi-weight cluster can sort
        # ABOVE the true max singleton on the next pass and surface as a
        # non-singleton boundary centroid (observed on a 60k-row column
        # with 11 distinct values).  The buffer is sorted in the walk's
        # direction here, so each cluster's range is just its endpoint
        # pair — and clipping pins singletons and equal-value clusters to
        # exactly their value (range [m, m]), so no singleton branch is
        # needed.
        first_m = means[b[:-1]]
        last_m = means[b[1:] - 1]
        lo, hi = (last_m, first_m) if reverse_order else (first_m, last_m)
        out_mean = seg_mw / seg_w
        np.clip(out_mean, lo, hi, out=out_mean)
        self._mean[:to] = out_mean
        self._count[:to] = seg_w
        if self.log is not None:
            # regroup sample lists along the same cluster boundaries
            # (append! of member logs, TDigest.jl:303-315)
            bl = b.tolist()
            self.log = [
                [x for member in self.log[s:e] for x in member]
                for s, e in zip(bl[:-1], bl[1:])
            ]
        self._n = to
        self.watermark = to
        self._pending_unit = True
        if not to < compression:
            raise AssertionError(
                f"Merging was ineffective: {to} clusters at compression {compression}"
            )

    def max_step(self, q: float, private: bool = True) -> float:
        """Largest dq at q keeping dk <= 1, at the digest's compression
        (TDigest.jl:125-128: dispatches to the scale's (compression, n)
        form with n = current centroid count)."""
        compression = self.private_compression if private else self.public_compression
        return float(self.scale.max_step_cn(q, compression, self._n))

    def _force_ascending(self) -> None:
        self._compact(force=True, compression=self.private_compression)

    def compress(self) -> None:
        """Full merge at the *public* compression (TDigest.jl:421-426)."""
        self._compact(force=True, compression=self.public_compression)

    # ------------------------------------------------------------------ checks

    def check_weights(self) -> bool:
        """Invariant verifier (TDigest.jl:366-419)."""
        if self._n == 0:
            return True
        if self._n > self.max_size:
            raise AssertionError("Digest sketch is oversized")
        if not np.isclose(self.counts.sum(), self.total_weight):
            raise AssertionError("Digest has lost track of size")
        if self.log is not None:
            # TDigest.jl:381-383: every ingested sample is logged somewhere
            if not np.isclose(
                sum(len(entry) for entry in self.log), self.total_weight
            ):
                raise AssertionError("Digest has lost track of logged samples")
        means = self.means[::-1] if self.is_reversed else self.means
        counts = self.counts[::-1] if self.is_reversed else self.counts
        order = np.argsort(means, kind="stable")
        means = means[order]
        counts = counts[order]
        if not (counts[0] == 1 and counts[-1] == 1):
            raise AssertionError("Boundary centroid not singleton")
        norm = self.scale.normalizer(self.public_compression, self.total_weight)
        q2 = np.cumsum(counts) / self.total_weight
        q1 = np.concatenate(([0.0], q2[:-1]))
        k1 = self.scale.k(q1, norm)
        k2 = self.scale.k(q2, norm)
        bad = (counts != 1) & (k2 - k1 > 1.0 + 1e-10)
        if bad.any():
            i = int(np.argmax(bad))
            raise AssertionError(
                f"Weight too large at centroid {i}: q=({q1[i]},{q2[i]}) "
                f"k=({k1[i]},{k2[i]}) count={counts[i]}"
            )
        return True

    # ----------------------------------------------------------------- queries

    def minimum(self) -> float:
        self._force_ascending()
        return float(self._mean[0]) if self._n else float("nan")

    def maximum(self) -> float:
        self._force_ascending()
        return float(self._mean[self._n - 1]) if self._n else float("nan")

    def quantile(self, q: float) -> float:
        """Inverse-CDF estimate (TDigest.jl:546-630)."""
        if q < 0 or q > 1:
            raise ValueError(f"q should be in [0,1], got {q}")
        self._force_ascending()
        n = self._n
        if n == 0:
            return float("nan")
        if n == 1:
            return float(self._mean[0])

        means = self._mean[:n]
        counts = self._count[:n]
        total = self.total_weight
        index = q * total

        if counts[0] != 1 or counts[n - 1] != 1:
            raise AssertionError("Boundary centroid not singleton")
        if index < 1:
            return float(means[0])
        if index > total - 1:
            return float(means[n - 1])

        # weight_so_far[i] = count[0]/2 + sum of pairwise half-weights
        # through bracket i; find first bracket with w_so_far + dw > index
        half = (counts[:-1] + counts[1:]) / 2.0  # dw for brackets 0..n-2
        wsf = np.concatenate(([counts[0] / 2.0], counts[0] / 2.0 + np.cumsum(half[:-1])))
        # bracket i satisfies wsf[i] + half[i] > index; take the first
        ends = wsf + half
        i = int(np.searchsorted(ends, index, side="right"))
        if i >= n - 1:
            i = n - 2
        weight_so_far = float(wsf[i])
        dw = float(half[i])

        left_unit = 0.0
        if counts[i] == 1:
            if index - weight_so_far < 0.5:
                return float(means[i])
            left_unit = 0.5
        right_unit = 0.0
        if counts[i + 1] == 1:
            if weight_so_far + dw - index <= 0.5:
                return float(means[i + 1])
            right_unit = 0.5
        z1 = index - weight_so_far - left_unit
        z2 = weight_so_far + dw - index - right_unit
        return _weighted_average_sorted(float(means[i]), z2, float(means[i + 1]), z1)

    def quantiles(self, qs) -> np.ndarray:
        return np.array([self.quantile(float(q)) for q in np.atleast_1d(qs)])

    def cdf(self, x: float) -> float:
        """Empirical CDF estimate (TDigest.jl:430-544; defect-corrected)."""
        if np.isnan(x) or np.isinf(x):
            raise ValueError(f"Invalid value: {x}")
        self._force_ascending()
        n = self._n
        if n == 0:
            return float("nan")
        means = self._mean[:n]
        counts = self._count[:n]
        total = self.total_weight
        if n == 1:
            # reference branch is broken (.center); intent: step at the mean
            v = float(means[0])
            return 0.0 if x < v else (1.0 if x > v else 0.5)

        mn = float(means[0])
        mx = float(means[n - 1])
        if x < mn:
            return 0.0
        if x == mn:
            w = float(counts[means <= x].sum())
            return w / 2.0 / total
        if x > mx:
            return 1.0
        if x == mx:
            return 1.0 - 0.5 / total

        # x strictly inside (min, max): either a run of centroids == x, or
        # bracketed by c_i < x < c_{i+1} (runs handled by summing equals)
        lt = means < x
        eq = means == x
        weight_so_far = float(counts[lt].sum())
        if eq.any():
            dw = float(counts[eq].sum())
            return (weight_so_far + dw / 2.0) / total
        i = int(np.searchsorted(means, x, side="left")) - 1  # c_i < x < c_{i+1}
        c1m, c1c = float(means[i]), float(counts[i])
        c2m, c2c = float(means[i + 1]), float(counts[i + 1])
        weight_so_far -= c1c  # weight before c1
        left_excl = 0.0
        right_excl = 0.0
        if c1c == 1:
            if c2c == 1:
                return (weight_so_far + 1.0) / total
            left_excl = 0.5
        elif c2c == 1:
            right_excl = 0.5
        dw = (c1c + c2c) / 2.0
        dw_no_single = dw - left_excl - right_excl
        base = weight_so_far + c1c / 2.0 + left_excl
        return (base + dw_no_single * (x - c1m) / (c2m - c1m)) / total

    def cdf_batch(self, xs: np.ndarray) -> np.ndarray:
        """Vectorized `cdf` over an array of probe values (one
        searchsorted pass instead of a Python loop per value — the shape
        per-row percentile enrichment needs at Arrow-batch granularity).

        Value-identical to looping `cdf(x)` — same branch precedence
        (below-min, ==min, above-max, ==max, equal-centroid run,
        two-centroid interpolation) and the same IEEE operation order in
        each branch; the only internal difference is prefix sums instead
        of per-call masked sums, which cannot split a ulp for the
        integer-valued sample weights every pipeline path produces
        (asserted exactly in tests/test_core.py against the scalar).
        NaN/Inf probes raise, matching `cdf`; an empty digest yields NaN.
        """
        xs = np.asarray(xs, dtype=np.float64)
        if xs.size and not np.isfinite(xs).all():
            raise ValueError("Invalid value in xs (NaN/Inf)")
        self._force_ascending()
        n = self._n
        if n == 0:
            return np.full(xs.shape, np.nan)
        means = self._mean[:n]
        counts = self._count[:n]
        total = self.total_weight
        if n == 1:
            v = means[0]
            return np.where(xs < v, 0.0, np.where(xs > v, 1.0, 0.5))
        mn = means[0]
        mx = means[n - 1]
        cumpad = np.concatenate(([0.0], np.cumsum(counts)))
        il = np.searchsorted(means, xs, side="left")
        ir = np.searchsorted(means, xs, side="right")
        w_lt = cumpad[il]
        w_le = cumpad[ir]
        has_eq = ir > il

        # interpolation lane (c_i < x < c_{i+1}), computed everywhere and
        # masked: clip keeps the gather in-bounds for out-of-range probes,
        # errstate silences the equal-means division the mask discards.
        i = np.clip(il - 1, 0, n - 2)
        c1m, c1c = means[i], counts[i]
        c2m, c2c = means[i + 1], counts[i + 1]
        wsf = w_lt - c1c
        left_excl = np.where((c1c == 1) & (c2c != 1), 0.5, 0.0)
        right_excl = np.where((c2c == 1) & (c1c != 1), 0.5, 0.0)
        dw = (c1c + c2c) / 2.0
        dw_no = dw - left_excl - right_excl
        base = wsf + c1c / 2.0 + left_excl
        with np.errstate(divide="ignore", invalid="ignore"):
            interp = (base + dw_no * (xs - c1m) / (c2m - c1m)) / total
        out = np.where((c1c == 1) & (c2c == 1), (wsf + 1.0) / total, interp)
        # branch precedence, lowest to highest (mirrors the scalar's
        # first-match-wins ordering: <min, ==min, >max, ==max, eq, interp)
        out = np.where(has_eq, (w_lt + (w_le - w_lt) / 2.0) / total, out)
        out = np.where(xs == mx, 1.0 - 0.5 / total, out)
        out = np.where(xs > mx, 1.0, out)
        out = np.where(xs == mn, w_le / 2.0 / total, out)
        out = np.where(xs < mn, 0.0, out)
        return out

    def trimmed_mean(self, q1: float, q2: float) -> float:
        """Mean of the samples with rank in [q1*W, q2*W].

        Not in the reference (north_star addition).  Each centroid spans the
        cumulative-weight interval [cum_before, cum_before+count]; its
        contribution is its overlap with the rank window.  In the
        all-singleton regime this is the exact mean of the rank slice.
        """
        if not (0 <= q1 < q2 <= 1):
            raise ValueError(f"need 0 <= q1 < q2 <= 1, got ({q1}, {q2})")
        self._force_ascending()
        if self._n == 0:
            return float("nan")
        counts = self.counts
        means = self.means
        hi_w = self.total_weight * q2
        lo_w = self.total_weight * q1
        cr = np.cumsum(counts)
        cl = cr - counts
        overlap = np.minimum(cr, hi_w) - np.maximum(cl, lo_w)
        overlap = np.clip(overlap, 0.0, None)
        wsum = float(overlap.sum())
        if wsum <= 0:
            return float("nan")
        return float(np.dot(overlap, means)) / wsum

    # ------------------------------------------------------------------- serde

    VERBOSE_CODE = 1
    SMALL_CODE = 2

    def to_bytes(self, small: bool = False) -> bytes:
        """Deterministic serialization (intent of TDigest.jl:659-790).

        VERBOSE: u32 code | u8 scale | f64 min,max | f64 delta | u32 n |
                 n x (f64 count, f64 mean)           -> 16*n + 32 bytes? no:
                 16*n + 33 with the scale byte; the published 16n+32 metric
                 counts the reference header without a scale id.
        SMALL:   u32 code | u8 scale | f64 min,max | f32 delta | u16 n |
                 u16 max_size_lo | n x (f32 count, f32 mean)
        Digests are compressed to the public compression first, so bytes are
        a pure function of the compacted centroid set.
        """
        self.compress()
        n = self._n
        mn = float(self._mean[0]) if n else float("nan")
        mx = float(self._mean[n - 1]) if n else float("nan")
        scode = SCALE_CODES[self.scale.name]
        if small:
            head = struct.pack(
                "<IBddfHH",
                self.SMALL_CODE,
                scode,
                mn,
                mx,
                np.float32(self.public_compression),
                n,
                min(self.max_size, 0xFFFF),
            )
            body = np.empty(2 * n, dtype="<f4")
            body[0::2] = self._count[:n]
            body[1::2] = self._mean[:n]
            return head + body.tobytes()
        head = struct.pack(
            "<IBdddIQ",
            self.VERBOSE_CODE,
            scode,
            mn,
            mx,
            self.public_compression,
            n,
            int(self.total_weight),
        )
        body = np.empty(2 * n, dtype="<f8")
        body[0::2] = self._count[:n]
        body[1::2] = self._mean[:n]
        return head + body.tobytes()

    @classmethod
    def from_bytes(cls, buf: bytes) -> "MergingDigest":
        (code,) = struct.unpack_from("<I", buf, 0)
        if code == cls.VERBOSE_CODE:
            code, scode, mn, mx, delta, n, _tw = struct.unpack_from("<IBdddIQ", buf, 0)
            off = struct.calcsize("<IBdddIQ")
            body = np.frombuffer(buf, dtype="<f8", offset=off, count=2 * n)
            d = cls(delta, scale=SCALE_BY_CODE[scode])
            d.add_weighted(body[1::2], body[0::2])
            return d
        if code == cls.SMALL_CODE:
            code, scode, mn, mx, delta, n, _ms = struct.unpack_from("<IBddfHH", buf, 0)
            off = struct.calcsize("<IBddfHH")
            body = np.frombuffer(buf, dtype="<f4", offset=off, count=2 * n)
            d = cls(float(delta), scale=SCALE_BY_CODE[scode])
            d.add_weighted(body[1::2].astype(np.float64), body[0::2].astype(np.float64))
            return d
        raise ValueError(f"Invalid format for serialized t-digest: code={code}")

    def byte_size(self) -> int:
        self.compress()
        return len(self.to_bytes(small=False))

    def small_byte_size(self) -> int:
        self.compress()
        return len(self.to_bytes(small=True))


def _weighted_average_sorted(x1: float, w1: float, x2: float, w2: float) -> float:
    """Clamped interpolation (TDigest.jl:653-657)."""
    if x1 > x2:
        raise AssertionError("Out of order values")
    x = (x1 * w1 + x2 * w2) / (w1 + w2)
    return max(x1, min(x, x2))


def merge_all(
    digests, compression=None, scale=None, canonical: bool = False
) -> MergingDigest:
    """Merge an iterable of digests into a fresh one, deterministically.

    The result digest adopts the first input's parameters (pre-sort)
    unless overridden.  While total centroids stay within the buffer
    bound this is a pure multiset union (associative, order-insensitive
    after the forced query-time sort); beyond that the merge order
    matters for byte-determinism — `canonical=True` fixes it by sorting
    the inputs by their serialized bytes, so any permutation of the same
    digests merges byte-identically (the distributed paths instead sort
    by split/salt id, same idea)."""
    digests = list(digests)
    if not digests:
        return MergingDigest(compression or 100.0, scale=scale or K_3)
    out = MergingDigest(
        compression or digests[0].public_compression,
        scale=scale or digests[0].scale,
    )
    if canonical:
        digests = sorted(digests, key=lambda d: d.to_bytes())
    for d in digests:
        out.merge(d)
    return out
