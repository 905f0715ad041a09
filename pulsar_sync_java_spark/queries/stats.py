"""Statistical aggregates: z-score anomaly flagging and Pearson
correlation — the data-QC family (outlier screens, drift checks) a
pipeline runs alongside the quality gates.

Determinism discipline (the reason these can be hash-gated at all):
never use the engines' native variance/corr aggregates — their partial
aggregation order changes the floating-point sum, so Spark and DuckDB
(and two runs of Spark) disagree in the last bits.  Instead every
moment (Σx, Σx², Σxy) is an EXACT decimal sum — inputs are 2-decimal
values, so casts and decimal×decimal products are exact, and decimal
addition is order-independent — and only the final constant-count
arithmetic (divide, sqrt) runs in IEEE doubles, which is bit-identical
given bit-identical inputs.  Same pattern as functions/numeric.dsum.

Oracle gotcha (measured): DuckDB's DECIMAL→DOUBLE cast divides the
int128 unscaled value by 10^scale in floating point — off by an ulp
once the unscaled value exceeds 2^53 (bit Σ(price²) here; Spark's
BigDecimal.doubleValue() is correctly rounded).  The oracle SQL
bridges through VARCHAR (`CAST(CAST(sum AS VARCHAR) AS DOUBLE)`),
whose parse IS correctly rounded, so both engines emit the same bits.

Scale: moments are ordinary partial+final hash aggregates (shuffle
carries one row of sums per group); the per-row z-score join broadcasts
the tiny per-group moment table back onto the scan.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_sync_java_spark.queries import query
from pulsar_sync_java_spark.sources.tables import load_table

_D6 = "decimal(19,6)"  # exact for the 2-decimal synthetic measures


def _moments(col: str):
    """(Σx, Σx²) as exact decimal sums, emitted as doubles."""
    x = F.col(col).cast(_D6)
    return (
        F.sum(x).cast("double").alias("s1"),
        F.sum(x * x).cast("double").alias("s2"),
        F.count(F.lit(1)).alias("n"),
    )


_ZSCORE_SQL = """
WITH m AS (
  SELECT event_type,
         CAST(CAST(SUM(CAST(value AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS s1,
         CAST(CAST(SUM(CAST(value AS DECIMAL(19,6)) * CAST(value AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS s2,
         COUNT(*) AS n
  FROM events GROUP BY event_type
), s AS (
  SELECT event_type, s1 / n AS mean,
         sqrt((s2 - s1 * s1 / n) / (n - 1)) AS sd
  FROM m WHERE n > 1
)
SELECT e.event_id, e.event_type, e.value,
       (e.value - s.mean) / s.sd AS zscore,
       abs((e.value - s.mean) / s.sd) > 3.0 AS is_anomaly
FROM events e JOIN s ON e.event_type = s.event_type
"""


@query("q_anomaly_zscore", oracle=_ZSCORE_SQL)
def q_anomaly_zscore(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group z-score outlier screen over the event stream: every
    event scored against its type's mean/stddev, |z| > 3 flagged.

    Two-pass shape (the only scale-correct one): pass 1 is a moments
    aggregate — one row of exact decimal sums per event_type crosses
    the shuffle; pass 2 re-scans and joins the (tiny, broadcast)
    moment table onto every row.  Sample stddev from the exact sums:
    sqrt((Σx² − (Σx)²/n)/(n−1)) — all-double arithmetic on
    bit-identical inputs, so the z-scores hash-match the oracle."""
    e = load_table(spark, sf_dir, "events")
    m = e.groupBy("event_type").agg(*_moments("value"))
    s = m.filter(F.col("n") > 1).select(
        "event_type",
        (F.col("s1") / F.col("n")).alias("mean"),
        F.sqrt(
            (F.col("s2") - F.col("s1") * F.col("s1") / F.col("n"))
            / (F.col("n") - 1)
        ).alias("sd"),
    )
    z = (F.col("value") - F.col("mean")) / F.col("sd")
    return (
        e.join(F.broadcast(s), "event_type")
        .select(
            "event_id",
            "event_type",
            "value",
            z.alias("zscore"),
            (F.abs(z) > 3.0).alias("is_anomaly"),
        )
    )


_CORR_SQL = """
WITH m AS (
  SELECT l_returnflag,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_quantity AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(CAST(l_extendedprice AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS syy,
         CAST(CAST(SUM(CAST(l_quantity AS DECIMAL(19,6)) * CAST(l_extendedprice AS DECIMAL(19,6))) AS VARCHAR) AS DOUBLE) AS sxy,
         COUNT(*) AS n
  FROM lineitem GROUP BY l_returnflag
)
SELECT l_returnflag, n,
       (n * sxy - sx * sy)
         / sqrt((n * sxx - sx * sx) * (n * syy - sy * sy)) AS corr_qty_price
FROM m WHERE n > 1
"""


@query("q_corr_pearson", oracle=_CORR_SQL)
def q_corr_pearson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation of quantity vs extended price per return
    flag, from exact decimal moment sums (Σx, Σy, Σx², Σy², Σxy) —
    ONE partial+final aggregate, one row of sums per group through the
    shuffle, the correlation itself a constant-time double expression
    per group.  The native corr() aggregate is the same shuffle shape
    but float-summation-order-dependent; this formulation is the
    deterministic twin."""
    li = load_table(spark, sf_dir, "lineitem")
    x = F.col("l_quantity").cast(_D6)
    y = F.col("l_extendedprice").cast(_D6)
    m = li.groupBy("l_returnflag").agg(
        F.sum(x).cast("double").alias("sx"),
        F.sum(y).cast("double").alias("sy"),
        F.sum(x * x).cast("double").alias("sxx"),
        F.sum(y * y).cast("double").alias("syy"),
        F.sum(x * y).cast("double").alias("sxy"),
        F.count(F.lit(1)).alias("n"),
    )
    corr = (F.col("n") * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (F.col("n") * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return m.filter(F.col("n") > 1).select(
        "l_returnflag", "n", corr.alias("corr_qty_price")
    )


_HISTOGRAM_SQL = """
WITH b AS (
  SELECT event_type,
         CAST(least(floor(value / 10.0), 9) AS INT) AS bucket
  FROM events WHERE value IS NOT NULL AND value >= 0
), c AS (
  SELECT event_type, bucket, COUNT(*) AS n FROM b GROUP BY 1, 2
)
SELECT event_type, bucket, n,
       CAST(n AS DOUBLE)
         / SUM(n) OVER (PARTITION BY event_type) AS share
FROM c
"""


@query("q_histogram", oracle=_HISTOGRAM_SQL)
def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width value histogram per event type (10-unit buckets,
    top bucket open) with within-type shares — the distribution
    profile a drift monitor compares release-over-release.

    Fixed widths on purpose: data-dependent bucket edges (equi-depth,
    min/max-scaled) need an extra full pass AND make two corpora's
    histograms incomparable.  One partial+final count aggregate
    (shuffle carries (type, bucket, n) rows), one tiny window for the
    shares; the bucket expression is a single floor/least over the
    scan.  share = n / Σn is one IEEE division on exact integers —
    bit-identical in both engines."""
    e = load_table(spark, sf_dir, "events")
    b = e.where(F.col("value").isNotNull() & (F.col("value") >= 0)).select(
        "event_type",
        F.least(F.floor(F.col("value") / 10.0), F.lit(9)).cast("int").alias("bucket"),
    )
    c = b.groupBy("event_type", "bucket").agg(F.count(F.lit(1)).alias("n"))
    from pyspark.sql import Window

    w = Window.partitionBy("event_type")
    return c.select(
        "event_type",
        "bucket",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(w)).alias("share"),
    )
