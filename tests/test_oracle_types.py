"""Guard the driver's hash gate against DuckDB HUGEINT typing.

DuckDB types SUM over integers as HUGEINT (INT128); the driver's
pandas-style fetch materializes HUGEINT as float64, so an oracle column
that Spark emits as long hashes "0.0" vs "0" and fails the gate even
when every value matches (the exact q_profile / q_drift_tv failure in
round 4).  The repo convention is to CAST every exposed integer
SUM/window-SUM to BIGINT (or use COUNT ... FILTER); this test makes a
violation a local failure instead of a driver-only surprise.
"""

from __future__ import annotations

import pytest

import __spark_entry__ as entry

_ORACLES = entry.oracle_sql()


# Types whose pandas materialization diverges from their typed value:
# HUGEINT/UHUGEINT -> float64 ("0" becomes "0.0"), DECIMAL -> float64
# (loses the scale Spark's DecimalType string keeps).  The repo bridges
# every exposed decimal through CAST(CAST(x AS VARCHAR) AS DOUBLE); this
# test keeps both conventions honest.
_RISKY = ("HUGEINT", "DECIMAL")


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_has_no_pandas_divergent_columns(duck, name):
    rel = duck.sql(_ORACLES[name])
    bad = [
        (col, str(t))
        for col, t in zip(rel.columns, rel.types)
        if any(r in str(t).upper() for r in _RISKY)
    ]
    assert not bad, (
        f"{name}: oracle exposes pandas-divergent column(s) {bad} — the "
        f"driver fetch renders these as float64 and the hash gate fails; "
        f"CAST(... AS BIGINT), COUNT(*) FILTER (...), or the "
        f"VARCHAR->DOUBLE decimal bridge"
    )


def test_portable_hash_overflow_safe_for_any_int64_id(spark, duck):
    """ADVICE r5: the multiplicative sampling hash must stay inside
    int64 for EVERY int64 doc_id — DuckDB raises on BIGINT overflow
    while non-ANSI Spark wraps silently, so an overflowing expression
    silently diverges the engines past doc_id ~ 3.5e9."""
    expr = "((doc_id % 2147483648) * 2654435761) % 4294967296"
    for doc_id in (0, 1, 2**31 - 1, 2**31, 3_500_000_000, 2**63 - 1):
        expected = ((doc_id % 2147483648) * 2654435761) % 4294967296
        d = duck.execute(
            f"SELECT {expr} FROM (SELECT CAST({doc_id} AS BIGINT) AS doc_id)"
        ).fetchone()[0]
        s = spark.sql(
            f"SELECT {expr} FROM (SELECT CAST({doc_id} AS BIGINT) AS doc_id)"
        ).collect()[0][0]
        assert d == s == expected, (doc_id, d, s, expected)
