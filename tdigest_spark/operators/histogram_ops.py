"""Distributed LogHistogram aggregation.

Histogram merge is element-wise addition of conformal count vectors
(LogHistogram.jl:92-122) — fully expressible with built-in Spark
operators, no Python on the merge path:

    stage 1: applyInPandas builds one count vector per (group, salt)
    stage 2: posexplode → groupBy(keys, pos).sum → re-assemble with
             sort_array(collect_list(struct(pos, cnt)))  — all JVM-side

At 100 TB the stage-2 shuffle carries (groups × bins) longs, independent
of row count.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
from pyspark.sql import DataFrame, functions as F

from ..pdkeys import emit_key_column, unhelp_key, with_string_key_helpers

from ..histogram import LogHistogram

_VALUE = "__lh_value"


def histogram_by(
    df: DataFrame,
    value_col,
    min_value: float,
    max_value: float,
    by: Sequence[str] = (),
    epsilon: float = 0.1,
) -> DataFrame:
    """Grouped log-histogram: returns (by..., counts array<long>, n_rows)."""
    keys = list(by)
    value = F.col(value_col) if isinstance(value_col, str) else value_col
    sdf = df.select(*[F.col(k) for k in keys], value.cast("double").alias(_VALUE))
    # lossless integer group keys across the pandas boundary (pdkeys)
    sdf, helper, group_cols = with_string_key_helpers(sdf, keys)

    key_schema = ", ".join(
        f"`{f.name}` {f.dataType.simpleString()}"
        for f in sdf.schema.fields
        if f.name in keys
    )
    part_schema = ", ".join(
        x for x in (key_schema, "counts array<bigint>, n_rows bigint") if x
    )

    from typing import Iterator

    def build_partition(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        # one histogram per group seen in THIS partition: narrow (no
        # shuffle of the raw rows), skew-immune (a hot group is spread
        # across every input split), bounded state (groups x n_bins longs)
        hists: dict[tuple, LogHistogram] = {}
        rows: dict[tuple, int] = {}
        for pdf in batches:
            vals = pdf[_VALUE].to_numpy(dtype=np.float64)
            ok = ~np.isnan(vals) & (vals > 0)
            # groupby().indices: one pass over the batch, index arrays per
            # group — not a per-group boolean scan of the whole batch —
            # and dropna=False keeps NULL group keys (SQL GROUP BY
            # semantics; a NaN key never satisfies == comparisons, so the
            # mask formulation silently dropped those rows entirely).
            # Mirrors digest.build_partials_grouped.
            if not keys:
                grp_iter = [((), np.arange(len(pdf)))]
            else:
                grp_iter = [
                    (g if isinstance(g, tuple) else (g,), idx)
                    for g, idx in pdf.groupby(
                        group_cols, sort=False, dropna=False
                    ).indices.items()
                ]
            for g, idx in grp_iter:
                h = hists.get(g)
                if h is None:
                    h = hists[g] = LogHistogram(min_value, max_value, epsilon)
                    rows[g] = 0
                v = vals[idx]
                v = v[ok[idx]]
                if v.size:
                    h.add(v)
                    rows[g] += int(v.size)
        if hists:
            out = {
                k: emit_key_column(
                    helper, k, [unhelp_key(helper, k, g[i]) for g in hists]
                )
                for i, k in enumerate(keys)
            }
            out["counts"] = [h.counts.tolist() for h in hists.values()]
            out["n_rows"] = [rows[g] for g in hists]
            yield pd.DataFrame(out)

    # stage 1: per (group, input-partition) partial vectors via mapInPandas
    # ship only (group helpers, value): see pdkeys note in digest.py
    partials = sdf.select(*group_cols, _VALUE).mapInPandas(
        build_partition, schema=part_schema
    )

    # stage 2: JVM-side vector sum via posexplode + re-assembly.  n_rows
    # is counted exactly once per partial (at pos 0) — summing the
    # replicated column and dividing by n_bins would go through a double
    # and lose exactness past 2^53 total weight
    exploded = partials.select(
        *keys,
        F.col("n_rows"),
        F.posexplode("counts").alias("pos", "cnt"),
    ).select(
        *keys,
        F.when(F.col("pos") == 0, F.col("n_rows")).otherwise(F.lit(0)).alias("__nr1"),
        "pos",
        "cnt",
    )
    summed = exploded.groupBy(*keys, "pos").agg(
        F.sum("cnt").alias("cnt"), F.sum("__nr1").alias("nr")
    )
    out = summed.groupBy(*keys).agg(
        F.transform(
            F.sort_array(F.collect_list(F.struct("pos", "cnt"))), lambda s: s["cnt"]
        ).alias("counts"),
        F.sum("nr").cast("bigint").alias("n_rows"),
    )
    return out


def histogram_quantile(counts: list, min_value: float, max_value: float,
                       q: float, epsilon: float = 0.1) -> float:
    """Driver-side quantile from a counts row."""
    h = LogHistogram(min_value, max_value, epsilon)
    h.counts = np.asarray(counts, dtype=np.int64)
    return h.quantile(q)
