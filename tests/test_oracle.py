"""Replay the driver's oracle gate locally at sf0.001: every registered
query with an oracle must hash-match DuckDB (SURVEY.md §5 test plan #1).

Execution shape (r8 verdict #8, suite-runtime discipline): the ~134
comparisons are each dominated by FIXED per-call overhead (Spark job
launch + DuckDB run + pandas fetch), so the module batch-runs them on a
small thread pool ONCE (Spark actions and DuckDB both release the GIL;
every thread gets its own DuckDB connection) and the parametrized tests
assert their own query's stored verdict — per-query failure
attribution, `-x` behavior, and the exact compare semantics are all
unchanged, only the wall-clock serialization is gone.  Set
SPARK_GRAFT_SERIAL_ORACLE=1 to fall back to one-at-a-time execution
when debugging a single query's comparison."""

from __future__ import annotations

import os
import traceback
from concurrent.futures import ThreadPoolExecutor

import duckdb
import pytest

from pulsar_sync_java_spark.queries import all_oracles, all_queries
from pulsar_sync_java_spark.sources.tables import TABLES
from tests.conftest import SF_DIR, compare_frames

_QUERIES = all_queries()
_ORACLES = all_oracles()


def _compare_one(spark, name: str) -> tuple[bool, str]:
    try:
        df = _QUERIES[name](spark, SF_DIR)
        if name not in _ORACLES:
            # rows-only check, mirroring the driver's weaker gate
            return df.count() >= 0, "rows-only"
        con = duckdb.connect()
        try:
            for t in TABLES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
                )
            rel = con.sql(_ORACLES[name])
            return compare_frames(
                df.columns, df.toPandas(), rel.columns, rel.df()
            )
        finally:
            con.close()
    except Exception:
        return False, traceback.format_exc()


@pytest.fixture(scope="module")
def oracle_results(spark):
    names = sorted(_QUERIES)
    if os.environ.get("SPARK_GRAFT_SERIAL_ORACLE"):
        return {n: _compare_one(spark, n) for n in names}
    with ThreadPoolExecutor(max_workers=6) as pool:
        results = pool.map(lambda n: _compare_one(spark, n), names)
        return dict(zip(names, results))


@pytest.mark.parametrize("name", sorted(_QUERIES))
def test_query_matches_oracle(name, oracle_results):
    ok, detail = oracle_results[name]
    assert ok, detail


def test_scd2_intervals_are_consistent(spark):
    """Semantic invariants of q_scd2_history beyond the oracle hash:
    per user, versions are consecutive from 1, each interval's
    valid_to equals the next interval's valid_from (contiguity at
    change points), exactly one open (is_current) interval per user,
    and adjacent intervals never share an event_type (else they would
    have been merged)."""
    from collections import defaultdict

    rows = _QUERIES["q_scd2_history"](spark, SF_DIR).collect()
    by_user = defaultdict(list)
    for r in rows:
        by_user[r["user_id"]].append(r)
    assert by_user
    for user, ivals in by_user.items():
        ivals.sort(key=lambda r: r["version"])
        assert [r["version"] for r in ivals] == list(
            range(1, len(ivals) + 1)
        ), user
        assert sum(r["is_current"] for r in ivals) == 1, user
        assert ivals[-1]["is_current"] and ivals[-1]["valid_to"] is None, user
        for a, b in zip(ivals, ivals[1:]):
            assert a["valid_to"] == b["valid_from"], (user, a, b)
            assert a["event_type"] != b["event_type"], (user, a, b)


def test_gap_fill_spine_is_dense_and_locf_consistent(spark):
    """q_gap_fill invariants: every (type, hour) in the global range
    appears exactly once; filled <=> n_events == 0; value_locf is
    never null and is constant across a filled gap (carries the last
    observed mean)."""
    from collections import defaultdict

    rows = _QUERIES["q_gap_fill"](spark, SF_DIR).collect()
    by_type = defaultdict(list)
    for r in rows:
        by_type[r["event_type"]].append(r)
    n_buckets = {t: len(v) for t, v in by_type.items()}
    assert len(set(n_buckets.values())) == 1, n_buckets  # same dense range
    for t, v in by_type.items():
        assert len({r["bucket"] for r in v}) == len(v), t  # no dup buckets
        v.sort(key=lambda r: r["bucket"])
        last = None
        for r in v:
            assert r["filled"] == (r["n_events"] == 0), r
            assert r["value_locf"] is not None, r
            if r["filled"] and last is not None:
                assert r["value_locf"] == last, r
            last = r["value_locf"]
