"""KLL quantile sketch (Karnin-Lang-Liberty) — the rank-error-uniform
counterpart to the t-digest, completing the north-rule sketch family.

A from-scratch implementation of the compactor-stack sketch
(Karnin, Lang, Liberty, "Optimal Quantile Approximation in Streams",
FOCS 2016): level i holds items of weight 2^i; a level over capacity is
sorted and every other item is promoted one level up.  Capacities decay
geometrically (ratio 2/3) below the top level, giving O(k) total space
and ~O(1/k) uniform rank error.

Determinism: the compaction offset alternates per level via a counter
(the deterministic-KLL variant) instead of drawing random bits, so a
given build/merge sequence is bit-reproducible — the same discipline the
t-digest core follows (fixed tie-breaks, canonical merge order).

While no compaction has happened (n <= k at a single level) every item
is retained: rank/quantile answers equal the exact rank oracle, which is
the regime the oracle-checked driver query runs in.

Spark distribution mirrors operators.digest: per-partition/group partials
via applyInPandas, level-wise-concat merge + recompress, serialized state
in a BinaryType column.
"""

from __future__ import annotations

import struct
from typing import Iterable, Sequence

import numpy as np
import pandas as pd

from .pdkeys import emit_key_column, unhelp_key, with_string_key_helpers

_C = 2.0 / 3.0


class KLL:
    __slots__ = ("k", "n", "levels", "offsets", "_caps", "_tcap", "_stored")

    def __init__(self, k: int = 200):
        if k < 8:
            raise ValueError("k must be >= 8")
        self.k = int(k)
        self.n = 0
        self.levels: list[np.ndarray] = [np.empty(0, dtype=np.float64)]
        self.offsets: list[int] = [0]
        self._stored = 0
        self._recaps()

    # ------------------------------------------------------------------ sizing

    def _cap(self, i: int, height: int) -> int:
        return max(2, int(np.ceil(self.k * _C ** (height - 1 - i))))

    def _recaps(self) -> None:
        # capacities depend only on the stack height — cache them (the
        # per-call ceil/pow was ~40% of single-core ingest cost)
        h = len(self.levels)
        self._caps = [self._cap(i, h) for i in range(h)]
        self._tcap = sum(self._caps)

    def _total_cap(self) -> int:
        return self._tcap

    def __len__(self) -> int:
        return self._stored

    # ------------------------------------------------------------------ ingest

    def add(self, values) -> None:
        vals = np.asarray(values, dtype=np.float64).ravel()
        if vals.size == 0:
            return
        if np.isnan(vals).any():
            raise ValueError("Cannot add NaN to KLL sketch")
        self.levels[0] = np.concatenate([self.levels[0], vals])
        self.n += int(vals.size)
        self._stored += int(vals.size)
        self._compress()

    def merge(self, other: "KLL") -> "KLL":
        if other.k != self.k:
            raise ValueError("can only merge KLL sketches with equal k")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.offsets.append(0)
        self._recaps()
        for i, lv in enumerate(other.levels):
            if lv.size:
                self.levels[i] = np.concatenate([self.levels[i], lv])
        self.n += other.n
        self._stored += other._stored
        self._compress()
        return self

    def _compress(self) -> None:
        while self._stored > self._tcap:
            caps = self._caps
            for i, lv in enumerate(self.levels):
                if len(lv) >= caps[i]:
                    self._compact_level(i)
                    break
            else:
                break

    def _compact_level(self, i: int) -> None:
        x = self.levels[i]
        # quicksort where bit-exactness permits: equal-comparing doubles
        # are bit-identical (NaN rejected at add) except -0.0/+0.0, whose
        # relative order decides which copies get promoted — keep the
        # stable sort only for levels mixing signed zeros (same discipline
        # as core.MergingDigest's fast compaction path).
        z = x == 0.0
        if z.any():
            sb = np.signbit(x[z])
            stable = bool(sb.any() and not sb.all())
        else:
            stable = False
        lv = np.sort(x, kind="stable" if stable else None)
        off = self.offsets[i] & 1
        self.offsets[i] += 1
        # weight conservation: an odd-length level keeps one survivor at
        # level i (only the even-length prefix compacts), so stored_weight
        # always equals n exactly — the standard KLL leftover rule.  The
        # retained end alternates with the offset so no tail bias builds up.
        if len(lv) & 1:
            if off:
                leftover, lv = lv[:1], lv[1:]
            else:
                leftover, lv = lv[-1:], lv[:-1]
        else:
            leftover = np.empty(0, dtype=np.float64)
        promoted = lv[off::2]
        self.levels[i] = leftover
        if i + 1 == len(self.levels):
            self.levels.append(np.empty(0, dtype=np.float64))
            self.offsets.append(0)
            self._recaps()
        self.levels[i + 1] = np.concatenate([self.levels[i + 1], promoted])
        # each compaction drops half the compacted items from storage
        self._stored -= promoted.size

    # ----------------------------------------------------------------- queries

    def _items_weights(self) -> tuple[np.ndarray, np.ndarray]:
        xs, ws = [], []
        for i, lv in enumerate(self.levels):
            if lv.size:
                xs.append(lv)
                ws.append(np.full(lv.size, float(1 << i)))
        if not xs:
            return np.empty(0), np.empty(0)
        x = np.concatenate(xs)
        w = np.concatenate(ws)
        order = np.argsort(x, kind="stable")
        return x[order], w[order]

    @property
    def stored_weight(self) -> float:
        return float(
            sum(len(lv) * (1 << i) for i, lv in enumerate(self.levels))
        )

    def quantile(self, q: float) -> float:
        if not 0 <= q <= 1:
            raise ValueError(f"q should be in [0,1], got {q}")
        x, w = self._items_weights()
        if x.size == 0:
            return float("nan")
        if q == 0:
            return float(x[0])
        if q == 1:
            return float(x[-1])
        cw = np.cumsum(w)
        index = q * cw[-1]
        j = int(np.searchsorted(cw, index, side="right"))
        return float(x[min(j, x.size - 1)])

    def rank(self, v: float) -> float:
        """Estimated number of items < v."""
        x, w = self._items_weights()
        if x.size == 0:
            return float("nan")
        j = int(np.searchsorted(x, v, side="left"))
        return float(w[:j].sum())

    def cdf(self, v: float) -> float:
        x, w = self._items_weights()
        if x.size == 0:
            return float("nan")
        lt = float(w[x < v].sum())
        eq = float(w[x == v].sum())
        return (lt + eq / 2.0) / float(w.sum())

    # ------------------------------------------------------------------- serde

    MAGIC = 0x4B4C4C31  # "KLL1"

    def to_bytes(self) -> bytes:
        head = struct.pack(
            "<IIQB", self.MAGIC, self.k, self.n, len(self.levels)
        )
        parts = [head]
        for lv, off in zip(self.levels, self.offsets):
            parts.append(struct.pack("<II", len(lv), off))
            parts.append(np.sort(lv, kind="stable").astype("<f8").tobytes())
        return b"".join(parts)

    @classmethod
    def from_bytes(cls, buf: bytes) -> "KLL":
        magic, k, n, nlev = struct.unpack_from("<IIQB", buf, 0)
        if magic != cls.MAGIC:
            raise ValueError("not a KLL1 sketch")
        off = struct.calcsize("<IIQB")
        sk = cls(k)
        sk.n = n
        sk.levels = []
        sk.offsets = []
        for _ in range(nlev):
            ln, comp_off = struct.unpack_from("<II", buf, off)
            off += 8
            sk.levels.append(
                np.frombuffer(buf, dtype="<f8", offset=off, count=ln).copy()
            )
            sk.offsets.append(comp_off)
            off += 8 * ln
        sk._stored = sum(len(lv) for lv in sk.levels)
        sk._recaps()
        return sk


# ------------------------------------------------------------------ spark


def kll_by(
    df,
    value_col,
    by: Sequence[str] = (),
    k: int = 200,
    salt: int = 0,
    combine: str = "map",
):
    """Grouped KLL build+merge over a DataFrame (same two-stage shape as
    operators.digest.digest_by).  Returns (by..., kll binary, n_rows long).

    `combine="map"` (default): stage 1 is mapInPandas keeping a dict
    group→sketch per input partition — the raw rows NEVER shuffle, only
    (group, KB-sketch) partials do.  `combine="shuffle"`: salted
    groupBy build, the fallback for cardinality-explosive group keys
    (per-partition dict state would exceed memory).  `salt` only applies
    to the shuffle path; mix of repeated values is irrelevant on the map
    path because partitioning, not value hashing, spreads hot groups.
    """
    from typing import Iterator

    from pyspark.sql import functions as F

    keys = list(by)
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    sdf = df.select(*[F.col(c) for c in keys], value.cast("double").alias("__v"))

    key_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in sdf.schema.fields
        if f.name in keys
    )
    part_schema = ", ".join(
        x for x in (key_schema, "__s int, kll binary, n_rows long") if x
    )
    out_schema = ", ".join(x for x in (key_schema, "kll binary, n_rows long") if x)

    if combine == "map":
        mdf = sdf.withColumn("__pid", F.spark_partition_id())
        # lossless integer group keys across the pandas boundary (pdkeys)
        mdf, helper, group_cols = with_string_key_helpers(mdf, keys)

        def build_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
            sks: dict[tuple, KLL] = {}
            rows: dict[tuple, int] = {}
            pid = 0
            for pdf in batches:
                if len(pdf):
                    pid = int(pdf["__pid"].iloc[0])
                vals = pdf["__v"].to_numpy(dtype=np.float64)
                ok = ~np.isnan(vals)
                if keys:
                    idx_by_group = pdf.groupby(
                        group_cols, sort=False, dropna=False
                    ).indices
                else:
                    idx_by_group = {(): np.arange(len(pdf))}
                for g, idx in idx_by_group.items():
                    g = g if isinstance(g, tuple) else (g,)
                    sk = sks.get(g)
                    if sk is None:
                        sk = sks[g] = KLL(k)
                        rows[g] = 0
                    v = vals[idx]
                    v = v[ok[idx]]
                    if v.size:
                        sk.add(v)
                        rows[g] += int(v.size)
            if sks:
                out = {
                    c: emit_key_column(
                        helper, c, [unhelp_key(helper, c, g[i]) for g in sks]
                    )
                    for i, c in enumerate(keys)
                }
                out["__s"] = [pid] * len(sks)
                out["kll"] = [sk.to_bytes() for sk in sks.values()]
                out["n_rows"] = [rows[g] for g in sks]
                yield pd.DataFrame(out)

        partials = mdf.select(*group_cols, "__v", "__pid").mapInPandas(
            build_partition, schema=part_schema
        )
    else:
        if salt and salt > 1:
            sdf = sdf.withColumn(
                "__s", F.pmod(F.xxhash64(F.col("__v")), F.lit(salt)).cast("int")
            )
        else:
            sdf = sdf.withColumn("__s", F.lit(0))

        def build(pdf: pd.DataFrame) -> pd.DataFrame:
            sk = KLL(k)
            vals = pdf["__v"].to_numpy(dtype=np.float64)
            vals = vals[~np.isnan(vals)]
            if vals.size:
                sk.add(vals)
            row = {c: [pdf[c].iloc[0]] for c in keys}
            row["__s"] = [int(pdf["__s"].iloc[0])]
            row["kll"] = [sk.to_bytes()]
            row["n_rows"] = [int(vals.size)]
            return pd.DataFrame(row)

        partials = sdf.groupBy(*keys, "__s").applyInPandas(build, schema=part_schema)

    def merge(pdf: pd.DataFrame) -> pd.DataFrame:
        pdf = pdf.sort_values("__s", kind="stable")
        sks = [KLL.from_bytes(b) for b in pdf["kll"]]
        out = sks[0]
        for s in sks[1:]:
            out.merge(s)
        row = {c: [pdf[c].iloc[0]] for c in keys}
        row["kll"] = [out.to_bytes()]
        row["n_rows"] = [int(pdf["n_rows"].sum())]
        return pd.DataFrame(row)

    return partials.groupBy(*keys).applyInPandas(merge, schema=out_schema)


def kll_stored_weight_udf():
    """Sum of level weights inside the sketch — equals n exactly (the
    odd-compaction leftover rule conserves weight), which makes weight
    conservation a driver-gateable integer."""
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import LongType

    @pandas_udf(LongType())
    def _w(blob: pd.Series) -> pd.Series:
        return pd.Series(
            [
                int(KLL.from_bytes(bytes(b)).stored_weight) if b is not None else 0
                for b in blob
            ]
        )

    return _w


def kll_quantile_udf():
    from pyspark.sql.functions import pandas_udf
    from pyspark.sql.types import DoubleType

    @pandas_udf(DoubleType())
    def _q(blob: pd.Series, q: pd.Series) -> pd.Series:
        cache: dict[bytes, KLL] = {}
        out = []
        for b, qq in zip(blob, q):
            if b is None:
                out.append(float("nan"))
                continue
            bb = bytes(b)
            if bb not in cache:
                cache[bb] = KLL.from_bytes(bb)
            out.append(cache[bb].quantile(float(qq)))
        return pd.Series(out)

    return _q
