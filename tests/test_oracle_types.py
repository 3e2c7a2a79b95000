"""Guard every oracle's OUTPUT column types against driver-side fetch mangling.

The driver compares Spark vs DuckDB results by value-hash.  Our local gate
fetches DuckDB rows with ``fetchall()`` (int128 -> Python int, lossless),
but a driver that fetches via Arrow/pandas converts HUGEINT to float64 /
object — so an oracle whose FINAL projection is e.g. ``sum(BIGINT)``
(DuckDB widens integer sums to HUGEINT) hashes differently on the driver
while matching locally at every SF.  That was round 3's only red row
(``bpe_merge_candidates``; ``gram_embeddings`` carried the same latent bug).

Rule enforced here: no oracle output column may be HUGEINT/UHUGEINT —
wrap final integer sums in ``CAST(... AS BIGINT)``.  DECIMAL/DOUBLE/BIGINT
outputs are fine (driver-green since round 1).  Pure DuckDB ``DESCRIBE``
— no Spark, no data scan — so the whole battery checks in milliseconds.
"""

from __future__ import annotations

import os

import duckdb
import pytest

from tdigest_spark import queries as Q

SF_DIRS = [
    d
    for d in (
        "/root/testdata/sf0.001",
        "/root/testdata/sf0.01",
    )
    if os.path.isdir(d)
]

pytestmark = pytest.mark.skipif(not SF_DIRS, reason="driver testdata absent")

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()

BANNED = ("HUGEINT", "UHUGEINT", "INT128")


# Why the ban below is a TYPE list rather than a generic fetch-path
# differential: the driver runs BOTH engines' results through the same
# client stack, so a divergence needs the two engines' dtypes to map
# DIFFERENTLY into it — unobservable from DuckDB alone.  Probed on this
# stack: HUGEINT fetches as Python int (fetchall), Decimal (arrow), and
# float64 (pandas .df()) while Spark's BIGINT stays integral everywhere
# — the one asymmetric pair, hence the ban.  DECIMAL/DATE/NULL-int all
# go lossy in .df() too (float64 / Timestamp / NaN), but their SPARK
# counterparts map the same way, which is why those queries have been
# driver-green since round 1.


def test_no_oracle_output_column_is_hugeint():
    sf_dir = SF_DIRS[0]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    offenders = {}
    for name, sql in Q.oracle_sql().items():
        cols = con.execute("DESCRIBE " + sql).fetchall()
        flagged = [
            (c[0], c[1])
            for c in cols
            if any(b in c[1].upper() for b in BANNED)
        ]
        if flagged:
            offenders[name] = flagged
    assert not offenders, (
        "oracle output columns wider than 64-bit integers (driver fetch "
        f"mangles int128; CAST to BIGINT): {offenders}"
    )


def test_no_oracle_output_column_is_nested():
    """Round 4's only red driver row: the driver canonicalizes results by
    sorting all output columns in pandas, and ``sort_values`` cannot
    factorize list cells (``TypeError: unhashable type: 'list'``) — so an
    ArrayType/Struct/Map output column is local-green / driver-red even
    when values are identical (``random_project``, since flattened to
    (vec_id, dim, value) rows).  Ban the CLASS: no oracle output column
    may be a LIST (``T[]`` / ``T[n]``), STRUCT, MAP, or UNION type.
    Every queries() entry has an oracle and must column-match it, so the
    DuckDB-side DESCRIBE covers the Spark side too — in milliseconds."""
    sf_dir = SF_DIRS[0]
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"read_parquet('{sf_dir}/{t}.parquet')"
        )
    offenders = {}
    for name, sql in Q.oracle_sql().items():
        cols = con.execute("DESCRIBE " + sql).fetchall()
        flagged = [
            (c[0], c[1])
            for c in cols
            if "[" in c[1]
            or any(k in c[1].upper() for k in ("STRUCT", "MAP(", "UNION("))
        ]
        if flagged:
            offenders[name] = flagged
    assert not offenders, (
        "nested oracle output columns (driver pandas sort_values cannot "
        f"hash list/struct/map cells; flatten the query face): {offenders}"
    )
