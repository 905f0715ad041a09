"""Driver contract for the spark-graft builder (PySpark target).

- ``entry(spark)``    — smoke: flagship q_cursor_translate at sf0.001.
- ``queries()``       — every declared query from SURVEY.md §2.2,
                        implemented in pulsar_sync_java_spark/queries/.
- ``oracle_sql()``    — matching DuckDB SQL per query (same column
                        names / aliases, so the driver's sorted-column
                        value-hash comparison lines up).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from pulsar_sync_java_spark.queries import all_oracles, all_queries


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0.

    q_cursor_translate composes the reference's hardest semantics in one
    plan: sparse 60-s sampling (PulsarPartitionSyncWorker.java:236-239),
    cursor snapshot (:126-147), and floor/as-of resolution
    (SparseMap.java:55-62) — see pulsar_sync_java_spark/queries/reference.py.
    """
    return all_queries()["q_cursor_translate"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2.

    Ordered oldest-driver-coverage-first (tools/coverage_rotation.py):
    the driver verifies the first 50 entries, so rotation keeps every
    query's latest CORRECTNESS row fresh across rounds.  The core
    registry itself is deterministic; the rotation is applied only here,
    at the driver boundary.
    """
    import importlib.util
    from pathlib import Path

    root = Path(__file__).resolve().parent
    # load by file path, not `import tools...`: "tools" is a generic
    # top-level name the host process may already have imported, and
    # sys.modules would shadow the repo's module
    spec = importlib.util.spec_from_file_location(
        "_spark_graft_coverage_rotation",
        root / "tools" / "coverage_rotation.py",
    )
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    rotate_by_coverage_age = mod.rotate_by_coverage_age

    reg = all_queries()
    order = rotate_by_coverage_age(list(reg), all_oracles(), root)
    return {n: reg[n] for n in order}


def oracle_sql() -> dict[str, str]:
    """DuckDB oracle SQL for each SQL-expressible query."""
    return all_oracles()
