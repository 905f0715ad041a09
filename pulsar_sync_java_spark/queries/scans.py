"""Scan / projection / filter queries (SURVEY.md §2.2: q_scan_project,
q_filter_predicate).

Reference analogues: the per-message projection R15
(`PulsarPartitionSyncWorker.java:220-231` copies value/key/event-time
conditionally) and the non-partitioned topic name filter R10
(`PulsarTopicSyncManager.java:72-74` drops names containing
'-partition').

Scale notes: both plans must show PushedFilters + pruned ReadSchema in
`.explain("formatted")` — Catalyst pushes the compound predicate and the
column list into the parquet scan, so at 100 TB only the needed columns
and row groups are read.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_sync_java_spark.queries import query
from pulsar_sync_java_spark.sources.tables import load_table

_SCAN_PROJECT_SQL = """
SELECT l_orderkey, l_linenumber, l_quantity,
       l_extendedprice * (1 - l_discount) AS revenue,
       l_extendedprice * (1 - l_discount) * (1 + l_tax) AS charge
FROM lineitem
"""


@query("q_scan_project", oracle=_SCAN_PROJECT_SQL)
def q_scan_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pure projection with computed columns (R15's conditional-copy
    shape, minus side effects).  Row-level double arithmetic is
    IEEE-deterministic, so no decimal guard is needed here."""
    li = load_table(spark, sf_dir, "lineitem")
    revenue = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    return li.select(
        "l_orderkey",
        "l_linenumber",
        "l_quantity",
        revenue.alias("revenue"),
        (revenue * (1 + F.col("l_tax"))).alias("charge"),
    )


_FILTER_SQL = """
SELECT o_orderkey, o_custkey, o_orderstatus, o_totalprice, o_orderpriority
FROM orders
WHERE o_orderstatus <> 'F'
  AND o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate <  TIMESTAMP '1999-01-01'
  AND o_orderpriority NOT LIKE '%URGENT%'
  AND o_totalprice > 1000.0
"""


@query("q_filter_predicate", oracle=_FILTER_SQL)
def q_filter_predicate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound boolean predicate over scalar types: equality, range,
    negated LIKE (R10's name filter `PulsarTopicSyncManager.java:72-74`),
    numeric threshold.  All four conjuncts push into the parquet scan."""
    o = load_table(spark, sf_dir, "orders")
    return o.filter(
        (F.col("o_orderstatus") != "F")
        & (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1999-01-01").cast("timestamp"))
        & (~F.col("o_orderpriority").like("%URGENT%"))
        & (F.col("o_totalprice") > 1000.0)
    ).select(
        "o_orderkey", "o_custkey", "o_orderstatus", "o_totalprice", "o_orderpriority"
    )
