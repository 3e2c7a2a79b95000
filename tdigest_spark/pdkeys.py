"""Lossless integer group keys across the pandas/Arrow boundary.

pandas corrupts int64 group keys two independent ways:

- an int64 column sharing an Arrow batch with a NULL arrives in the
  Python worker as float64, so keys above 2**53 (hash-derived bigints)
  round onto each other and DISTINCT groups merge silently;
- emitting keys back via ``pd.DataFrame({"k": [big_int, None]})`` floats
  the column at CONSTRUCTION, re-rounding keys the grouping preserved.

The repo-wide discipline (first applied in
``operators/digest.build_partials_grouped``): group on STRING helper
columns projected JVM-side (Spark's long->string cast is plain decimal,
identical to Python ``str(int)``, so the round trip is exact) and emit
integer keys as nullable ``pd.array(dtype="Int64")``.  This module is
that discipline as shared machinery so every mapInPandas operator that
groups pandas-side uses the same code path.
"""

from __future__ import annotations

from collections.abc import Sequence

from typing import TYPE_CHECKING

import numpy as np
import pandas as pd

if TYPE_CHECKING:  # pyspark deferred: fd.py keeps `import tdigest_spark`
    from pyspark.sql import DataFrame  # NumPy-only, and this rides along


def with_string_key_helpers(
    sdf: "DataFrame", keys: Sequence[str], prefix: str = "__gk_"
) -> "tuple[DataFrame, dict[str, str], list[str]]":
    """Project a lossless string helper column per INTEGER key column.

    Returns ``(sdf, helper, group_cols)`` where ``helper`` maps original
    key name -> helper column name (only integer-typed keys appear) and
    ``group_cols`` is the pandas-side grouping list (helper name for
    integer keys, original name otherwise).  Non-integer keys pass
    through untouched."""
    from pyspark.sql import functions as F, types as T

    int_types = (T.ByteType, T.ShortType, T.IntegerType, T.LongType)
    ftypes = {f.name: f.dataType for f in sdf.schema.fields}
    taken = set(sdf.columns)

    def _fresh(i: int) -> str:
        # collision-safe: a data column already named __gk_N would
        # otherwise duplicate the label and break the pandas groupby
        name = f"{prefix}{i}"
        while name in taken:
            name += "_"
        taken.add(name)
        return name

    helper = {
        k: _fresh(i)
        for i, k in enumerate(keys)
        if isinstance(ftypes.get(k), int_types)
    }
    if helper:
        sdf = sdf.select(
            "*",
            *[F.col(k).cast("string").alias(h) for k, h in helper.items()],
        )
    return sdf, helper, [helper.get(k, k) for k in keys]


def unhelp_key(helper: dict[str, str], k: str, v):
    """One grouped value back to its original type: string helper ->
    int (NULL-safe); everything else passes through."""
    if k not in helper:
        return v
    if v is None or (isinstance(v, float) and np.isnan(v)):
        return None
    return int(v)


def emit_key_column(helper: dict[str, str], k: str, values: list):
    """Output column for a key: nullable Int64 extension array for
    integer keys (NEVER a plain list — ints+None floats at DataFrame
    construction), the values as-is otherwise."""
    if k in helper:
        return pd.array(values, dtype="Int64")
    return list(values)
