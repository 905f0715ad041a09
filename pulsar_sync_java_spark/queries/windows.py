"""Window-function and time-window queries (SURVEY.md §2.2:
q_window_rank, q_window_analytic, q_window_tumbling, q_window_session).

Reference analogues: top-1-per-key is the floor-resolution shape (R21);
the 60-s sampling interval (R17, `PulsarPartitionSyncWorker.java:236-239`)
is a tumbling window; the per-partition ordered stream (R13) is what
sessionization assumes.  The tumbling/session queries are the batch
analogues of the streaming layer's windowed aggregations
(streaming/replicate.py); identical grouping logic runs under
`readStream` with watermarks.

Scale notes: all four are single-shuffle plans (partitionBy/groupBy
key); running sums use decimal accumulation inside the frame so the
oracle hash is exact.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulsar_sync_java_spark.functions.numeric import DEC, dsum, sql_dsum
from pulsar_sync_java_spark.queries import query
from pulsar_sync_java_spark.queries.reference import TS_FMT_DUCK, fmt_ts
from pulsar_sync_java_spark.sources.tables import load_table

_RANK_SQL = """
SELECT o_custkey, rnk, o_orderkey, o_totalprice
FROM (
  SELECT o_custkey, o_orderkey, o_totalprice,
         row_number() OVER (
           PARTITION BY o_custkey
           ORDER BY o_totalprice DESC, o_orderkey ASC) AS rnk
  FROM orders) t
WHERE rnk <= 3
"""


@query("q_window_rank", oracle=_RANK_SQL)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (row_number, deterministic
    tie-break).  Spark 3.5+ pushes the rnk<=3 limit into the sort as a
    group-limit, so no full per-key sort materializes."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), F.col("o_orderkey").asc()
    )
    return (
        o.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= 3)
        .select("o_custkey", "rnk", "o_orderkey", "o_totalprice")
    )


_ANALYTIC_SQL = f"""
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '{TS_FMT_DUCK}') AS o_orderdate,
       o_totalprice,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
         PARTITION BY o_custkey
         ORDER BY o_orderdate ASC, o_orderkey ASC
         ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS running_revenue,
       lag(o_totalprice) OVER (
         PARTITION BY o_custkey
         ORDER BY o_orderdate ASC, o_orderkey ASC) AS prev_totalprice
FROM orders
"""


@query("q_window_analytic", oracle=_ANALYTIC_SQL)
def q_window_analytic(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Analytic frame functions: per-customer running revenue
    (unbounded-preceding frame, exact decimal accumulation) and lag —
    the R17 'last sample seen' semantics relationally."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_orderdate").asc(), F.col("o_orderkey").asc()
    )
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    return o.select(
        "o_custkey",
        "o_orderkey",
        fmt_ts(F.col("o_orderdate")).alias("o_orderdate"),
        "o_totalprice",
        F.sum(F.col("o_totalprice").cast(DEC)).over(frame).cast("double").alias("running_revenue"),
        F.lag("o_totalprice").over(w).alias("prev_totalprice"),
    )


_TUMBLING_SQL = f"""
SELECT event_type,
       strftime(date_trunc('hour', ts), '{TS_FMT_DUCK}') AS window_start,
       COUNT(*) AS n_events,
       {sql_dsum('value')} AS sum_value
FROM events
GROUP BY event_type, date_trunc('hour', ts)
"""


@query("q_window_tumbling", oracle=_TUMBLING_SQL)
def q_window_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """1-hour tumbling windows per event_type — the batch analogue of
    the streaming `groupBy(window('ts','1 hour'))` aggregation (R17's
    sampling interval generalized; streaming twin in
    streaming/replicate.py)."""
    ev = load_table(spark, sf_dir, "events")
    win = F.window("ts", "1 hour")
    return (
        ev.groupBy("event_type", win.alias("w"))
        .agg(
            F.count(F.lit(1)).alias("n_events"),
            dsum("value").alias("sum_value"),
        )
        .select(
            "event_type",
            fmt_ts(F.col("w.start")).alias("window_start"),
            "n_events",
            "sum_value",
        )
    )


_SESSION_SQL = f"""
WITH ordered AS (
  SELECT user_id, ts, event_id,
         CASE WHEN lag(ts) OVER w IS NULL
                OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 1800 * 1000000
              THEN 1 ELSE 0 END AS is_new
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
), sessions AS (
  SELECT user_id, ts, event_id,
         CAST(SUM(is_new) OVER (
           PARTITION BY user_id ORDER BY ts ASC, event_id ASC
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT) AS session_id
  FROM ordered
)
SELECT user_id, session_id,
       COUNT(*) AS n_events,
       strftime(MIN(ts), '{TS_FMT_DUCK}') AS session_start,
       strftime(MAX(ts), '{TS_FMT_DUCK}') AS session_end,
       epoch_us(MAX(ts)) - epoch_us(MIN(ts)) AS duration_us
FROM sessions
GROUP BY user_id, session_id
"""


@query("q_window_session", oracle=_SESSION_SQL)
def q_window_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Sessionization with a 30-minute inactivity gap: lag -> new-session
    flag -> cumulative sum as session id -> per-session aggregates.
    Batch analogue of Structured Streaming's `session_window` (the
    streaming layer uses the native operator; this formulation is the
    oracle-checkable twin).  Duration in integer microseconds — exact."""
    ev = load_table(spark, sf_dir, "events").select("user_id", "ts", "event_id")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    frame = w.rowsBetween(Window.unboundedPreceding, Window.currentRow)
    gap_us = 1800 * 1_000_000
    with_flag = ev.withColumn(
        "is_new",
        F.when(
            F.lag("ts").over(w).isNull()
            | (F.unix_micros(F.col("ts")) - F.unix_micros(F.lag("ts").over(w)) > gap_us),
            1,
        ).otherwise(0),
    )
    with_session = with_flag.withColumn("session_id", F.sum("is_new").over(frame))
    return with_session.groupBy("user_id", "session_id").agg(
        F.count(F.lit(1)).alias("n_events"),
        fmt_ts(F.min("ts")).alias("session_start"),
        fmt_ts(F.max("ts")).alias("session_end"),
        (F.unix_micros(F.max("ts")) - F.unix_micros(F.min("ts"))).alias("duration_us"),
    )


_RANGE_FRAME_SQL = f"""
SELECT o_custkey, o_orderkey,
       strftime(o_orderdate, '{TS_FMT_DUCK}') AS o_orderdate,
       CAST(SUM(CAST(o_totalprice AS DECIMAL(38,6))) OVER (
         PARTITION BY o_custkey
         ORDER BY epoch(o_orderdate)
         RANGE BETWEEN 30 * 86400 PRECEDING AND CURRENT ROW) AS DOUBLE)
         AS revenue_30d,
       CAST(COUNT(*) OVER (
         PARTITION BY o_custkey
         ORDER BY epoch(o_orderdate)
         RANGE BETWEEN 30 * 86400 PRECEDING AND CURRENT ROW) AS BIGINT)
         AS n_orders_30d
FROM orders
"""


@query("q_window_range_frame", oracle=_RANGE_FRAME_SQL)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RANGE frame over event time: per order, that customer's rolling
    30-day revenue and order count.  Unlike a ROWS frame, RANGE bounds
    select by ORDER-BY *value* distance (all time-peers included), so
    the result is deterministic under ties without a tie-break column.
    Ordering is by epoch seconds — a numeric range frame plans
    identically in both engines."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.unix_timestamp("o_orderdate"))
        .rangeBetween(-30 * 86400, Window.currentRow)
    )
    return o.select(
        "o_custkey",
        "o_orderkey",
        fmt_ts(F.col("o_orderdate")).alias("o_orderdate"),
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("double").alias("revenue_30d"),
        F.count(F.lit(1)).over(w).alias("n_orders_30d"),
    )


# --------------------------------------------- rolling exact quantiles

# Median/p90 are HOLISTIC aggregates: no bounded mergeable partial
# exists, so a rolling version must materialize its frame.  The frame
# here is BOUNDED (last 10 events per user), which is what makes this
# scale-legal: each row carries <= 10 values regardless of corpus size,
# and the window key (user_id) is high-cardinality, so the single
# shuffle is key-parallel.  An UNBOUNDED rolling median would be the
# anti-pattern (per-key state growing with history) — that family is
# served by q_approx_percentiles' mergeable GK sketch instead.
#
# Index arithmetic is pure-integer ((k+1)//2 etc.), and the even-count
# median (a+b)/2.0 is one IEEE op on two parquet-exact doubles — both
# engines evaluate the identical expression tree, so the hash gates.
_ROLLQ_SQL = """
WITH f AS (
  SELECT user_id, event_id, value,
         list_sort(list(value) OVER (
           PARTITION BY user_id ORDER BY ts, event_id
           ROWS BETWEEN 9 PRECEDING AND CURRENT ROW)) AS frame
  FROM events
)
SELECT user_id, event_id, value,
       CAST(len(frame) AS INT) AS n_frame,
       (frame[(len(frame) + 1) // 2] + frame[(len(frame) + 2) // 2]) / 2.0
         AS roll_median,
       frame[(9 * len(frame) + 9) // 10] AS roll_p90
FROM f
"""


@query("q_rolling_quantile", oracle=_ROLLQ_SQL)
def q_rolling_quantile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact rolling median + p90 of each user's last 10 event values —
    the per-entity SLO/spend envelope a monitoring pipeline keeps next
    to the global sketch percentiles (q_approx_percentiles).

    Plan: ONE (user_id) shuffle feeding a collect_list window over the
    bounded 10-row frame, then zero-shuffle array expressions
    (array_sort + element_at with integer-only index arithmetic).
    Ordering inside the frame is the total order (ts, event_id), so
    frame contents — and therefore the quantiles — are deterministic
    under timestamp ties."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(-9, 0)
    )
    frame = F.array_sort(F.collect_list("value").over(w))
    out = e.select(
        "user_id",
        "event_id",
        "value",
        frame.alias("frame"),
    ).select(
        "user_id",
        "event_id",
        "value",
        F.size("frame").cast("int").alias("n_frame"),
        (
            (
                F.element_at("frame", ((F.size("frame") + 1) / 2).cast("int"))
                + F.element_at("frame", ((F.size("frame") + 2) / 2).cast("int"))
            )
            / F.lit(2.0)
        ).alias("roll_median"),
        F.element_at(
            "frame", ((F.size("frame") * 9 + 9) / 10).cast("int")
        ).alias("roll_p90"),
    )
    return out


# ------------------------------------------- distribution rank functions

_CUME_SQL = """
WITH r AS (
  SELECT o_custkey, o_orderkey, o_totalprice,
         CAST(RANK() OVER w AS BIGINT) AS rnk,
         CAST(COUNT(*) OVER (PARTITION BY o_custkey) AS BIGINT) AS n,
         CAST(
           (SELECT COUNT(*) FROM orders i
            WHERE i.o_custkey = o.o_custkey
              AND i.o_totalprice <= o.o_totalprice) AS BIGINT) AS n_le
  FROM orders o
  WINDOW w AS (PARTITION BY o_custkey ORDER BY o_totalprice)
)
SELECT o_custkey, o_orderkey, o_totalprice,
       CAST(n_le AS DOUBLE) / n AS cume_dist,
       CASE WHEN n = 1 THEN CAST(0 AS DOUBLE)
            ELSE CAST(rnk - 1 AS DOUBLE) / (n - 1) END AS pct_rank
FROM r
"""


@query("q_window_cume", oracle=_CUME_SQL)
def q_window_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution rank functions — cume_dist and percent_rank of
    each order's total within its customer — completing the window
    ranking surface (row_number/rank/ntile elsewhere).  Both are the
    NATIVE Spark window functions; the oracle restates their
    definitions from first principles (cume_dist = peers-at-or-below /
    n via a correlated count, percent_rank = (rank-1)/(n-1)), so a
    hash-green row pins Spark's implementation TO the definition —
    both reduce to single divisions of exact integers.

    Scale: one (custkey) window shuffle evaluates both functions plus
    the peer counts in a single Window operator; the oracle's
    correlated subquery is the definitional restatement only — the
    engine never self-joins."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy("o_totalprice")
    return o.select(
        "o_custkey",
        "o_orderkey",
        "o_totalprice",
        F.cume_dist().over(w).alias("cume_dist"),
        F.percent_rank().over(w).alias("pct_rank"),
    )
