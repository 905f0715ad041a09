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


@pytest.mark.parametrize("name", sorted(_ORACLES))
def test_oracle_has_no_hugeint_columns(duck, name):
    rel = duck.sql(_ORACLES[name])
    bad = [
        (col, str(t))
        for col, t in zip(rel.columns, rel.types)
        if "HUGEINT" in str(t).upper()
    ]
    assert not bad, (
        f"{name}: oracle exposes HUGEINT column(s) {bad} — the driver "
        f"fetch renders these as float64 and the hash gate fails; "
        f"CAST(... AS BIGINT) or use COUNT(*) FILTER (...)"
    )
