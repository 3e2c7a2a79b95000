"""Local stand-in for the driver's correctness gate.

Runs every __spark_entry__.queries() entry on Spark at sf0.01 and the
matching oracle_sql() in DuckDB over the same parquet, then compares
row count, column names, and an order-insensitive value hash (columns
sorted by name, rows sorted, floats via repr).

In addition to the exact fetchall() compare, every query also goes
through a DRIVER-PARITY pass that canonicalizes through the driver's
fetch path — pandas frames + ``sort_values`` over all columns — because
both historical local-green/driver-red rows were fetch-path divergences
invisible to fetchall():

- round 3 ``bpe_merge_candidates``: DuckDB widens integer sums to
  HUGEINT (int128); ``fetchall()`` yields exact Python ints, but the
  pandas fetch mangles int128 to float64/object while Spark's BIGINT
  stays integral -> silent value-hash mismatch on the driver only.
- round 4 ``random_project``: ArrayType output; pandas ``sort_values``
  cannot factorize list cells -> driver ``err`` while local tuples
  compare fine.

The parity pass fetches DuckDB via ``res.df()`` (the real lossy path)
and rebuilds the Spark side as a pandas frame from the already-collected
rows (pandas applies the same ints-with-None -> float64 inference the
driver's Arrow fetch does, and list cells break ``sort_values``
identically — without re-running the Spark job).  Pass ``--no-parity``
to skip it.

Usage: python tools/check_correctness.py [--no-parity] [query_name ...]
"""

from __future__ import annotations

import os
import sys
import time

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.01")
TABLES = (
    "region nation customer supplier part orders lineitem events documents embeddings"
).split()


def norm_cell(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if v != v:
            return "NaN"
        return repr(v)
    if isinstance(v, bool):
        return str(int(v))
    return str(v)


def canon(rows, cols):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = list(r)
        out.append(tuple(norm_cell(vals[i]) for i in order))
    return sorted(out)


def _canon_pandas(pdf):
    """The driver's canonicalization: reorder columns by name, sort rows
    by ALL columns (raises TypeError on list/struct cells — exactly like
    the driver did on round 4's ArrayType output), then normalize cells
    through the pandas dtypes the lossy fetch produced."""
    import pandas as pd

    cols = sorted(pdf.columns)
    pdf = pdf[cols].sort_values(by=cols, kind="mergesort").reset_index(drop=True)
    out = []
    for row in pdf.itertuples(index=False, name=None):
        out.append(tuple(_norm_pandas_cell(v) for v in row))
    return out


def _norm_pandas_cell(v):
    import datetime as dt
    from decimal import Decimal

    import numpy as np
    import pandas as pd

    if v is None or v is pd.NaT:
        return "NULL"
    # DATE columns: Spark rows carry datetime.date, DuckDB's .df() carries
    # midnight datetime64 — on the real driver BOTH sides go through the
    # same Arrow/pandas mapping, so fold them to one form here
    if isinstance(v, pd.Timestamp):
        v = v.to_pydatetime()
    if isinstance(v, dt.datetime):
        if (
            v.tzinfo is None
            and v.hour == v.minute == v.second == v.microsecond == 0
        ):
            return v.date().isoformat()
        return v.isoformat(sep=" ")
    if isinstance(v, dt.date):
        return v.isoformat()
    # DECIMAL: Spark-side rows carry Decimal objects, DuckDB .df() carries
    # float64 — the driver treats the pair as equal (decimal queries have
    # been driver-green since round 1), so float both.  Exactness is still
    # enforced by the fetchall() compare; parity only hunts dtype mangles.
    if isinstance(v, Decimal):
        return repr(float(v))
    if isinstance(v, (float, np.floating)):
        f = float(v)
        # NaN folds to NULL in PARITY mode only: an all-None column stays
        # object (None) on the from-rows Spark side but materializes as
        # float64 NaN through DuckDB's .df() — the driver treats the pair
        # as equal, and the exact fetchall() compare still distinguishes
        # genuine NaN values from NULLs
        return "NULL" if f != f else repr(f)
    if isinstance(v, (bool, np.bool_)):
        return str(int(v))
    if isinstance(v, np.integer):
        return str(int(v))
    return str(v)


def driver_parity_check(spark_rows, spark_cols, duck_res):
    """Compare through the driver's fetch path; returns a problem string
    or None.  Spark side: pandas frame built from the collected rows
    (same ints-with-None -> float64 inference as the driver's Arrow
    fetch).  DuckDB side: ``res.df()`` — the path that turns HUGEINT
    into float64/object and NULL-able ints into float64."""
    import pandas as pd

    try:
        spdf = pd.DataFrame(spark_rows, columns=spark_cols)
        ddf = duck_res.df()
        a = _canon_pandas(spdf)
        b = _canon_pandas(ddf)
    except Exception as e:
        return f"parity canonicalization error ({type(e).__name__}: {e})"
    if a != b:
        diffs = [(x, y) for x, y in zip(a, b) if x != y][:3]
        return f"parity values differ; first diffs={diffs}"
    return None


def main():
    import __spark_entry__ as se
    from tdigest_spark.plans import get_spark

    args = sys.argv[1:]
    parity = "--no-parity" not in args
    only = {a for a in args if not a.startswith("--")}
    spark = get_spark(master="local[8]", app_name="oracle-check", shuffle_partitions=8)
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{SF_DIR}/{t}.parquet')"
        )

    qs = se.queries()
    oracles = se.oracle_sql()
    failures = []
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = fn(spark, SF_DIR)
            spark_cols = df.columns
            spark_rows = [tuple(r) for r in df.collect()]
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            failures.append(name)
            continue
        if name not in oracles:
            print(f"ok   {name}: rows-only ({len(spark_rows)} rows, "
                  f"{time.time()-t0:.1f}s)")
            continue
        try:
            res = con.execute(oracles[name])
            duck_cols = [d[0] for d in res.description]
            duck_rows = res.fetchall()
        except Exception as e:
            print(f"FAIL {name}: duckdb error: {e}")
            failures.append(name)
            continue
        problems = []
        if len(spark_rows) != len(duck_rows):
            problems.append(f"rowcount spark={len(spark_rows)} duck={len(duck_rows)}")
        if sorted(spark_cols) != sorted(duck_cols):
            problems.append(f"cols spark={sorted(spark_cols)} duck={sorted(duck_cols)}")
        if not problems:
            a = canon(spark_rows, spark_cols)
            b = canon(duck_rows, duck_cols)
            if a != b:
                diffs = [
                    (x, y) for x, y in zip(a, b) if x != y
                ][:3]
                extra_a = [r for r in a if r not in set(b)][:2]
                extra_b = [r for r in b if r not in set(a)][:2]
                problems.append(f"values differ; first diffs={diffs} "
                                f"spark-only={extra_a} duck-only={extra_b}")
        if not problems and parity:
            p = driver_parity_check(
                spark_rows, spark_cols, con.execute(oracles[name])
            )
            if p:
                problems.append(p)
        if problems:
            print(f"FAIL {name}: {'; '.join(problems)}")
            failures.append(name)
        else:
            print(f"ok   {name}: exact match ({len(spark_rows)} rows, "
                  f"{time.time()-t0:.1f}s)")

    print()
    if failures:
        print(f"{len(failures)} FAILURES: {failures}")
        sys.exit(1)
    print("all queries match")


if __name__ == "__main__":
    main()
