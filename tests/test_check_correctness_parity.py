"""The driver-parity fetch mode in tools/check_correctness.py exists to
catch local-green/driver-red fetch-path divergences BEFORE submission.
Both historical driver reds are reproduced here against the parity
checker directly (no Spark needed — the Spark side is the plain Python
rows the collect path yields):

- round 3 (``bpe_merge_candidates``): DuckDB HUGEINT sum fetches as
  exact Python int via fetchall() but mangles through the pandas path
  while Spark's BIGINT stays integral.
- round 4 (``random_project``): ArrayType output crashes the driver's
  pandas ``sort_values`` canonicalization.

Plus the false-positive guards: DATE (date objects vs midnight
datetime64) and NULL-able ints (object vs float64 inference) must NOT
trip the parity check — those pairs map identically on the real driver.
"""

from __future__ import annotations

import importlib.util
import os
import sys

import duckdb

_TOOLS = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))), "tools")
_spec = importlib.util.spec_from_file_location(
    "check_correctness", os.path.join(_TOOLS, "check_correctness.py")
)
cc = importlib.util.module_from_spec(_spec)
sys.modules["check_correctness"] = cc
_spec.loader.exec_module(cc)


def test_parity_catches_hugeint_mangle():
    """A HUGEINT oracle column (integer sum left uncast) must FAIL parity
    even though fetchall() values are identical."""
    con = duckdb.connect()
    big = 2**63 + 11  # overflows BIGINT -> float64/object through pandas
    res = con.execute(f"SELECT 1 AS k, {big}::HUGEINT AS s")
    # fetchall side would agree exactly:
    assert con.execute(f"SELECT {big}::HUGEINT").fetchone()[0] == big
    problem = cc.driver_parity_check([(1, big)], ["k", "s"], res)
    assert problem is not None, "HUGEINT mangle not detected"


def test_parity_catches_array_output():
    """An ArrayType/LIST output column must FAIL parity (the driver's
    sort_values cannot factorize list cells)."""
    con = duckdb.connect()
    res = con.execute("SELECT 1 AS k, [1.0, 2.0] AS a")
    problem = cc.driver_parity_check([(1, [1.0, 2.0])], ["k", "a"], res)
    assert problem is not None and "canonicalization error" in problem


def test_parity_green_on_bigint_cast():
    """The actual fix — CAST(... AS BIGINT) — passes parity."""
    con = duckdb.connect()
    res = con.execute("SELECT 1 AS k, CAST(12345678901234::HUGEINT AS BIGINT) AS s")
    assert cc.driver_parity_check([(1, 12345678901234)], ["k", "s"], res) is None


def test_parity_no_false_positive_on_dates_and_null_ints():
    """DATE and NULL-able-int columns go lossy through pandas on BOTH
    engines the same way — driver-green since round 1; parity must agree."""
    import datetime as dt

    con = duckdb.connect()
    res = con.execute(
        "SELECT * FROM (VALUES (DATE '2024-01-01', 1), "
        "(DATE '2024-02-03', NULL)) t(d, n)"
    )
    rows = [(dt.date(2024, 1, 1), 1), (dt.date(2024, 2, 3), None)]
    assert cc.driver_parity_check(rows, ["d", "n"], res) is None


def test_parity_no_false_positive_on_timestamps_and_decimals():
    import datetime as dt
    from decimal import Decimal

    con = duckdb.connect()
    res = con.execute(
        "SELECT TIMESTAMP '2024-01-01 00:00:07.179575' AS ts, "
        "CAST(12.34 AS DECIMAL(18,2)) AS m"
    )
    rows = [(dt.datetime(2024, 1, 1, 0, 0, 7, 179575), Decimal("12.34"))]
    assert cc.driver_parity_check(rows, ["ts", "m"], res) is None


def test_parity_no_false_positive_on_all_null_numeric_column():
    """An ANSI 0/0 guard can yield an ALL-NULL numeric column at some SF:
    the from-rows Spark frame keeps object None while DuckDB's .df()
    materializes float64 NaN — the driver treats the pair as equal, so
    parity must too (the fetchall() compare still distinguishes genuine
    NaN values from NULLs)."""
    con = duckdb.connect()
    res = con.execute(
        "SELECT * FROM (VALUES (1, CAST(NULL AS DOUBLE)), "
        "(2, CAST(NULL AS DOUBLE))) t(k, v)"
    )
    rows = [(1, None), (2, None)]
    assert cc.driver_parity_check(rows, ["k", "v"], res) is None
