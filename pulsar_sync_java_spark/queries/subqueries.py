"""SQL subquery surface: correlated EXISTS / NOT EXISTS and scalar
subqueries, expressed through the engine's SQL front-end
(`spark.sql` over registered views) — the same Catalyst plans as the
DataFrame API (EXISTS rewrites to a semi join, NOT EXISTS to an
anti join, an uncorrelated scalar subquery to a broadcast one-row
join), declared here so the SQL entry path itself is oracle-covered.

Reference analogue: the dedup-guard existence checks (R22
`PulsarPartitionSyncWorker.java:158-176`) and skip-if-present cursor
logic (R23 `:180-192`) are EXISTS/NOT EXISTS shapes.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession

from pulsar_sync_java_spark.queries import query
from pulsar_sync_java_spark.sources.tables import load_table

_EXISTS_SQL = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders o
WHERE EXISTS (
        SELECT 1 FROM lineitem l
        WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity > 45
      )
  AND NOT EXISTS (
        SELECT 1 FROM lineitem l2
        WHERE l2.l_orderkey = o.o_orderkey AND l2.l_returnflag = 'R'
      )
"""


def _with_views(spark: SparkSession, sf_dir: str, *names: str) -> None:
    for n in names:
        load_table(spark, sf_dir, n).createOrReplaceTempView(n)


@query("q_exists_subquery", oracle=_EXISTS_SQL)
def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS + NOT EXISTS (R22 dedup-guard / R23
    skip-if-present shapes).  Catalyst rewrites these to a left-semi
    and a left-anti hash join — no per-row subquery execution."""
    _with_views(spark, sf_dir, "orders", "lineitem")
    return spark.sql(_EXISTS_SQL)


_SCALAR_SQL = """
SELECT p_partkey, p_retailprice,
       ROUND(p_retailprice - (SELECT AVG(p_retailprice) FROM part), 4) AS above_avg
FROM part
WHERE p_retailprice > (SELECT AVG(p_retailprice) FROM part) + 5
"""


@query("q_scalar_subquery", oracle=_SCALAR_SQL)
def q_scalar_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery in both the projection and the
    predicate; Catalyst executes it once and broadcasts the single-row
    result — the corpus-wide-statistic filter every quality pipeline
    uses (e.g. 'docs longer than 1.2x the mean')."""
    _with_views(spark, sf_dir, "part")
    return spark.sql(_SCALAR_SQL)


_CORRELATED_SQL = """
SELECT l.l_partkey,
       CAST(COUNT(*) AS BIGINT) AS n_small,
       CAST(SUM(CAST(l.l_extendedprice AS DECIMAL(38,6))) AS DOUBLE)
         AS small_revenue
FROM lineitem l
WHERE l.l_quantity < (
        SELECT 0.5 * AVG(l2.l_quantity) FROM lineitem l2
        WHERE l2.l_partkey = l.l_partkey
      )
GROUP BY l.l_partkey
"""


@query("q_correlated_subquery", oracle=_CORRELATED_SQL)
def q_correlated_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape — the CORRELATED scalar subquery (per-part
    average quantity threshold) Catalyst must DECORRELATE into an
    aggregate + join; a naive per-row re-execution is O(rows x
    groups).  Declared through the SQL front-end so the rewrite
    itself is the thing under test; the oracle runs the identical
    text, so the hash gate proves the decorrelated plan computes the
    textbook semantics.  AVG(integer quantity) divides exact integer
    sums by a count — deterministic in both engines — and the
    comparison is on exact values, so no float-order hazard; revenue
    goes through the exact-decimal sum."""
    _with_views(spark, sf_dir, "lineitem")
    return spark.sql(_CORRELATED_SQL)
