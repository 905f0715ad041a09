"""Declared query registry (SURVEY.md §2.2).

Each query is registered with BOTH a PySpark implementation
``(spark, sf_dir) -> DataFrame`` and (when SQL-expressible) a DuckDB
oracle SQL string computing the same result with the same column names.
The driver hash-compares the two at sf=0.01; `tests/` replays the same
comparison at sf=0.001.

Determinism rules applied everywhere (SURVEY.md §7 hard parts):
- every computed column aliased identically in Spark and SQL;
- double aggregations go through exact DECIMAL accumulation, cast back
  to double (identical bits in both engines regardless of partial-agg
  order — see functions/numeric.py);
- timestamps in outputs are string-formatted in both engines;
- every top-k / row_number has a total-order tie-break.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkQuery] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[SparkQuery], SparkQuery]:
    """Register a declared query and (optionally) its DuckDB oracle SQL."""

    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load_all() -> None:
    """Import every query module so registration side-effects run."""
    from pulsar_sync_java_spark.queries import (  # noqa: F401
        aggregates,
        behavior,
        clustering,
        dedup_scale,
        extras,
        joins,
        pipeline,
        reference,
        scalar,
        scans,
        stats,
        subqueries,
        timeseries,
        training,
        windows,
    )


def all_queries() -> dict[str, SparkQuery]:
    """The declared queries in REGISTRATION order — deterministic for a
    given checkout, independent of any benchmark/driver artifacts.  The
    driver-facing coverage-age rotation lives in the tooling layer
    (``tools/coverage_rotation.py``, applied by ``__spark_entry__``), so
    importing the library never couples its behavior to repo-root state.
    """
    load_all()
    return dict(QUERIES)


def all_oracles() -> dict[str, str]:
    load_all()
    return dict(ORACLE)
