"""Time-series analytics over the orders/events calendars: changepoint
detection (CUSUM), exponential smoothing (EWMA), autocorrelation and
day-of-week seasonality — the monitoring family that sits downstream of
a replicated event stream (the reference's ordered per-partition
delivery, PulsarPartitionSyncWorker.java:224-231, exists precisely so a
consumer can compute order-sensitive series like these).

Shared determinism devices (queries/__init__ rules):

- **integer cents**: money series go through
  ``CAST(CAST(x AS DECIMAL(19,2)) * 100 AS BIGINT)`` — the synthetic
  prices are 2-decimal values, so the decimal cast recovers them
  exactly and every prefix/total/cross-product below is exact integer
  arithmetic in BOTH engines (the q_corr_pearson moment-sum discipline,
  taken all the way to integers).
- **scaled CUSUM**: the textbook s_t = prefix_t - t*mean needs a
  division per row; n*prefix_t - t*total is the same argmax in exact
  integers with NO division at all.
- **sequential fold for EWMA**: the recurrence e_t = 0.75 e_{t-1}
  + 0.25 x_t is an ordered left fold; Spark's ``F.aggregate`` over a
  day-sorted array and DuckDB's ``list_reduce`` over
  ``list(x ORDER BY day)`` execute the identical IEEE op sequence
  (mul, mul, add per step), so the floats match bit-for-bit.

Scale shapes: every query collapses the raw table to a CALENDAR-grain
aggregate first (months/days/day-of-week — thousands of rows at any
corpus size), so the windows, folds and argmaxes below the first
aggregate are metadata-sized.  The only full-corpus work is one
partial+final hash aggregate per query.  The BIGINT cent products are
sized for the tested SFs (documented per query); a 100 TB deployment
widens them to DECIMAL(38,0) — same plan shape.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulsar_sync_java_spark.queries import query
from pulsar_sync_java_spark.sources.tables import load_table

# exact integer cents from the 2-decimal double prices (see module doc)
_CENTS = "CAST(CAST(o_totalprice AS DECIMAL(19,2)) * 100 AS BIGINT)"


def _spark_cents() -> F.Column:
    return (F.col("o_totalprice").cast("decimal(19,2)") * 100).cast("long")


# ------------------------------------------------------ CUSUM changepoint

_CUSUM_SQL = f"""
WITH m AS (
  SELECT o_orderpriority,
         strftime(o_orderdate, '%Y-%m') AS month,
         CAST(SUM({_CENTS}) AS BIGINT) AS cents
  FROM orders GROUP BY 1, 2
), w AS (
  SELECT o_orderpriority, month, cents,
         CAST(ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                 ORDER BY month) AS BIGINT) AS t,
         CAST(SUM(cents) OVER (PARTITION BY o_orderpriority
                               ORDER BY month) AS BIGINT) AS prefix,
         CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT) AS n,
         CAST(SUM(cents) OVER (PARTITION BY o_orderpriority) AS BIGINT)
           AS total
  FROM m
), s AS (
  SELECT o_orderpriority, month, t, n, prefix, total,
         n * prefix - t * total AS s_scaled
  FROM w WHERE t < n
), r AS (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                               ORDER BY abs(s_scaled) DESC, t) AS rk
  FROM s
)
SELECT o_orderpriority, month AS cp_month, CAST(t AS BIGINT) AS t_index,
       n AS n_months, s_scaled,
       prefix / t AS mean_before_cents,
       (total - prefix) / (n - t) AS mean_after_cents
FROM r WHERE rk = 1
"""


@query("q_cusum_changepoint", oracle=_CUSUM_SQL)
def q_cusum_changepoint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM changepoint detection on the monthly revenue series per
    order priority: the month t maximizing |Σ_{i<=t}(x_i - mean)| is
    the strongest single level-shift candidate — the screening pass a
    monitoring pipeline runs before a full segmentation.

    Exactness device: the textbook CUSUM divides by n per row; the
    SCALED cusum s_t = n*prefix_t - t*total has the same argmax and is
    pure BIGINT arithmetic on integer cents (exact in both engines,
    any aggregation order).  t = n is excluded (s_n ≡ 0); ties break
    to the earliest month.  The before/after means are one exact
    BIGINT / BIGINT -> double division each.

    Scale: one partial+final hash aggregate collapses the corpus to
    (priority, month) rows — ~10^3 per priority even at 100 TB; the
    prefix windows, argmax and divisions run on that aggregate only.
    BIGINT cent products hold to ~sf100 (n_months * total_cents <<
    2^63 at every tested SF); past that, widen to DECIMAL(38,0) —
    identical plan."""
    o = load_table(spark, sf_dir, "orders")
    m = (
        o.groupBy(
            "o_orderpriority",
            F.date_format("o_orderdate", "yyyy-MM").alias("month"),
        )
        .agg(F.sum(_spark_cents()).alias("cents"))
    )
    by_p = Window.partitionBy("o_orderpriority")
    ordered = by_p.orderBy("month")
    w = m.select(
        "o_orderpriority",
        "month",
        "cents",
        F.row_number().over(ordered).cast("long").alias("t"),
        F.sum("cents").over(ordered).alias("prefix"),
        F.count(F.lit(1)).over(by_p).alias("n"),
        F.sum("cents").over(by_p).alias("total"),
    )
    s = w.filter(F.col("t") < F.col("n")).withColumn(
        "s_scaled", F.col("n") * F.col("prefix") - F.col("t") * F.col("total")
    )
    rk = F.row_number().over(
        by_p.orderBy(F.abs(F.col("s_scaled")).desc(), "t")
    )
    return (
        s.withColumn("rk", rk)
        .filter(F.col("rk") == 1)
        .select(
            "o_orderpriority",
            F.col("month").alias("cp_month"),
            F.col("t").alias("t_index"),
            F.col("n").alias("n_months"),
            "s_scaled",
            (F.col("prefix") / F.col("t")).alias("mean_before_cents"),
            (
                (F.col("total") - F.col("prefix")) / (F.col("n") - F.col("t"))
            ).alias("mean_after_cents"),
        )
    )


# ------------------------------------------------------------ EWMA smooth

_EWMA_SQL = """
WITH d AS (
  SELECT event_type, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
), l AS (
  SELECT event_type,
         CAST(COUNT(*) AS BIGINT) AS n_days,
         list(CAST(cnt AS DOUBLE) ORDER BY day) AS xs
  FROM d GROUP BY event_type
)
SELECT event_type, n_days,
       CAST(xs[-1] AS BIGINT) AS x_last,
       CASE WHEN n_days > 1 THEN
         CAST(list_reduce(xs[1:CAST(n_days AS INT) - 1],
              (a, b) -> a * CAST(0.75 AS DOUBLE)
                        + b * CAST(0.25 AS DOUBLE)) AS DOUBLE)
       ELSE xs[1] END AS ewma_prev,
       CAST(list_reduce(xs,
            (a, b) -> a * CAST(0.75 AS DOUBLE)
                      + b * CAST(0.25 AS DOUBLE)) AS DOUBLE) AS ewma_last
FROM l
"""


@query("q_ewma_smooth", oracle=_EWMA_SQL)
def q_ewma_smooth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted moving average of the daily event count
    per type (α = 0.25): e_1 = x_1, e_t = 0.75 e_{t-1} + 0.25 x_t —
    the standard smoothed-baseline/alerting series.  Emits the final
    smoothed level and the one-step-back level (what an alert compares
    the newest observation against).

    Determinism: the recurrence is an ordered LEFT FOLD; Spark
    ``F.aggregate`` over the day-sorted count array and DuckDB
    ``list_reduce`` over ``list(x ORDER BY day)`` run the identical
    IEEE sequence (a*0.75 and b*0.25 each correctly rounded, one add)
    — bit-equal without any decimal bridge.  α = 0.25 and 0.75 are
    exact binary doubles.

    Scale: the corpus collapses to (type, day) counts in one
    partial+final aggregate; the fold runs on calendar-sized arrays
    (one per type).  An unbounded-history deployment would window the
    array (EWMA forgets geometrically — 120 days at α=0.25 is < 1e-15
    of weight) rather than carry years of days."""
    e = load_table(spark, sf_dir, "events")
    d = e.groupBy("event_type", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    l = d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_days"),
        F.transform(
            F.sort_array(F.collect_list(F.struct("day", "cnt"))),
            lambda s: s["cnt"].cast("double"),
        ).alias("xs"),
    )

    def fold(arr: F.Column, n: F.Column) -> F.Column:
        return F.aggregate(
            F.slice(arr, 2, (n - 1).cast("int")),
            F.element_at(arr, 1),
            lambda acc, x: acc * F.lit(0.75) + x * F.lit(0.25),
        )

    xs, nd = F.col("xs"), F.col("n_days")
    return l.select(
        "event_type",
        "n_days",
        F.element_at(xs, -1).cast("long").alias("x_last"),
        F.when(nd > 1, fold(F.slice(xs, 1, (nd - 1).cast("int")), nd - 1))
        .otherwise(F.element_at(xs, 1))
        .alias("ewma_prev"),
        fold(xs, nd).alias("ewma_last"),
    )


# ---------------------------------------------------------- autocorrelation

_ACF_LAGS = (1, 12)

_ACF_SQL = f"""
WITH m AS (
  SELECT o_orderpriority, strftime(o_orderdate, '%Y-%m') AS month,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM orders GROUP BY 1, 2
), t AS (
  SELECT o_orderpriority, cnt,
         ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                            ORDER BY month) AS t
  FROM m
), pairs AS (
  SELECT a.o_orderpriority, l.lag, a.cnt AS x, b.cnt AS y
  FROM t a
  JOIN (VALUES {", ".join(f"({k})" for k in _ACF_LAGS)}) l(lag)
    ON TRUE
  JOIN t b ON b.o_orderpriority = a.o_orderpriority
          AND b.t = a.t + l.lag
), mo AS (
  SELECT o_orderpriority, lag,
         CAST(COUNT(*) AS BIGINT) AS n_pairs,
         CAST(CAST(SUM(x) AS VARCHAR) AS DOUBLE) AS sx,
         CAST(CAST(SUM(y) AS VARCHAR) AS DOUBLE) AS sy,
         CAST(CAST(SUM(x * x) AS VARCHAR) AS DOUBLE) AS sxx,
         CAST(CAST(SUM(y * y) AS VARCHAR) AS DOUBLE) AS syy,
         CAST(CAST(SUM(x * y) AS VARCHAR) AS DOUBLE) AS sxy
  FROM pairs GROUP BY 1, 2
)
SELECT o_orderpriority, CAST(lag AS INT) AS lag, n_pairs,
       (n_pairs * sxy - sx * sy)
         / sqrt((n_pairs * sxx - sx * sx) * (n_pairs * syy - sy * sy))
         AS acf
FROM mo WHERE n_pairs > 1
"""


@query("q_autocorr", oracle=_ACF_SQL)
def q_autocorr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Lag-k autocorrelation (k = 1 and 12) of the monthly order-count
    series per priority — the month-over-month persistence and
    annual-seasonality probes a forecaster checks before picking a
    model.  Pairs are formed on consecutive POSITIONS of the observed
    series (row_number over months), the standard gap-tolerant ACF on
    irregular calendars; the correlation itself is the q_corr_pearson
    exact-moment device (integer sums over pairs, five doubles, one
    IEEE expression per group).

    Scale: corpus -> (priority, month) counts in one aggregate; the
    lag self-join, moment sums and formula all run on the month-grain
    frame (thousands of rows forever).  The lag join is within the
    priority partition — co-partitioned, never corpus-sized."""
    o = load_table(spark, sf_dir, "orders")
    m = o.groupBy(
        "o_orderpriority",
        F.date_format("o_orderdate", "yyyy-MM").alias("month"),
    ).agg(F.count(F.lit(1)).alias("cnt"))
    t = m.select(
        "o_orderpriority",
        "cnt",
        F.row_number()
        .over(Window.partitionBy("o_orderpriority").orderBy("month"))
        .alias("t"),
    )
    lags = spark.range(1).select(
        F.explode(F.array(*[F.lit(k) for k in _ACF_LAGS])).alias("lag")
    )
    a = t.alias("a").crossJoin(F.broadcast(lags))
    b = t.alias("b")
    pairs = a.join(
        b,
        (F.col("a.o_orderpriority") == F.col("b.o_orderpriority"))
        & (F.col("b.t") == F.col("a.t") + F.col("lag")),
    ).select(
        F.col("a.o_orderpriority").alias("o_orderpriority"),
        "lag",
        F.col("a.cnt").alias("x"),
        F.col("b.cnt").alias("y"),
    )
    mo = pairs.groupBy("o_orderpriority", "lag").agg(
        F.count(F.lit(1)).alias("n_pairs"),
        F.sum("x").cast("double").alias("sx"),
        F.sum("y").cast("double").alias("sy"),
        F.sum(F.col("x") * F.col("x")).cast("double").alias("sxx"),
        F.sum(F.col("y") * F.col("y")).cast("double").alias("syy"),
        F.sum(F.col("x") * F.col("y")).cast("double").alias("sxy"),
    )
    n = F.col("n_pairs")
    acf = (n * F.col("sxy") - F.col("sx") * F.col("sy")) / F.sqrt(
        (n * F.col("sxx") - F.col("sx") * F.col("sx"))
        * (n * F.col("syy") - F.col("sy") * F.col("sy"))
    )
    return mo.filter(n > 1).select(
        "o_orderpriority",
        F.col("lag").cast("int").alias("lag"),
        "n_pairs",
        acf.alias("acf"),
    )


# ------------------------------------------------------- dow seasonality

_SEASON_SQL = f"""
WITH d AS (
  SELECT o_orderpriority, dayofweek(o_orderdate) AS dow,
         CAST(COUNT(*) AS BIGINT) AS n_orders,
         CAST(SUM({_CENTS}) AS BIGINT) AS revenue_cents
  FROM orders GROUP BY 1, 2
)
SELECT o_orderpriority, CAST(dow AS INT) AS dow, n_orders, revenue_cents,
       CAST(n_orders * 7 AS DOUBLE)
         / SUM(n_orders) OVER (PARTITION BY o_orderpriority) AS order_share,
       CAST(revenue_cents
              * SUM(n_orders) OVER (PARTITION BY o_orderpriority) AS DOUBLE)
         / CAST(n_orders
              * SUM(revenue_cents) OVER (PARTITION BY o_orderpriority)
              AS DOUBLE) AS aov_index
FROM d
"""


@query("q_seasonality", oracle=_SEASON_SQL)
def q_seasonality(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonal profile per order priority: order volume
    share (x7, so 1.0 = flat) and the average-order-value index (AOV
    on that weekday / overall AOV).  The ratio-of-ratios is computed
    as a cross-product of EXACT integers — (rev_dow * n_total) /
    (n_dow * rev_total) — so the only float work is two int->double
    casts and one division, deterministic in both engines even when
    the products exceed 2^53 (both cast the same exact integer).

    dow convention: Sunday = 0 (DuckDB's dayofweek; Spark's is
    shifted by one and aligned here).

    Scale: one partial+final aggregate to 35 rows; everything after
    is constant work.  The BIGINT cross products hold to ~sf10
    (rev_cents * n_orders < 2^63); past that, DECIMAL(38,0) — same
    plan."""
    o = load_table(spark, sf_dir, "orders")
    d = o.groupBy(
        "o_orderpriority",
        (F.dayofweek("o_orderdate") - 1).cast("int").alias("dow"),
    ).agg(
        F.count(F.lit(1)).alias("n_orders"),
        F.sum(_spark_cents()).alias("revenue_cents"),
    )
    by_p = Window.partitionBy("o_orderpriority")
    n_tot = F.sum("n_orders").over(by_p)
    rev_tot = F.sum("revenue_cents").over(by_p)
    return d.select(
        "o_orderpriority",
        "dow",
        "n_orders",
        "revenue_cents",
        ((F.col("n_orders") * 7).cast("double") / n_tot).alias("order_share"),
        (
            (F.col("revenue_cents") * n_tot).cast("double")
            / (F.col("n_orders") * rev_tot).cast("double")
        ).alias("aov_index"),
    )


# ------------------------------------------------ decayed leaderboard

_DECAY_TOPN = 10
_DECAY_FP_BITS = 30  # weights in 2^-30 fixed point; k > 30 days -> 0

_DECAY_SQL = f"""
WITH ref AS (
  SELECT MAX(CAST(ts AS DATE)) AS ref_day FROM events
), d AS (
  SELECT user_id, CAST(ts AS DATE) AS day,
         CAST(COUNT(*) AS BIGINT) AS cnt
  FROM events GROUP BY 1, 2
), w AS (
  SELECT d.user_id, d.cnt,
         datediff('day', d.day, ref.ref_day) AS k
  FROM d CROSS JOIN ref
), s AS (
  SELECT user_id,
         CAST(SUM(CASE WHEN k <= {_DECAY_FP_BITS}
                       THEN cnt * (CAST(1 AS BIGINT)
                                   << ({_DECAY_FP_BITS} - k))
                       ELSE 0 END) AS BIGINT) AS score_fp,
         CAST(SUM(cnt) AS BIGINT) AS n_events,
         CAST(MIN(k) AS BIGINT) AS days_since_last
  FROM w GROUP BY user_id
)
SELECT user_id, score_fp,
       CAST(score_fp AS DOUBLE) / {1 << _DECAY_FP_BITS} AS score,
       n_events, days_since_last
FROM s ORDER BY score_fp DESC, user_id LIMIT {_DECAY_TOPN}
"""


@query("q_decay_topk", oracle=_DECAY_SQL)
def q_decay_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially time-decayed activity leaderboard: each event
    contributes 0.5^k where k = whole days before the newest event
    (one-day half-life), top-10 users by decayed score — the
    recency-weighted ranking every engagement dashboard runs, and the
    aggregation shape behind decayed heavy-hitters.

    The exactness device: a ONE-DAY half-life makes every weight an
    exact binary power, so the whole score is computed in 2^-30
    FIXED POINT — cnt << (30 - k) summed as plain BIGINTs, exact in
    any order; the float score is one cast + one division at the end.
    Events older than 30 days contribute 0 (a documented cutoff 1e9x
    below the newest day's weight).  An arbitrary half-life λ runs
    the same plan with 31 Python-precomputed literal weights (the
    q_benford injection trick) and the floor(x*1e12) fixed-point sum
    (the q_hits device).

    Scale: the corpus collapses to (user, day) counts in one
    partial+final aggregate; the decay arithmetic and the second
    (user) aggregate run on those rows; the 1-row ref-day aggregate
    broadcasts; top-10 is a TakeOrdered.  Decayed scores are also
    SUM-mergeable across slices (the weight depends only on the day),
    which is what lets per-day partials roll up without replay."""
    e = load_table(spark, sf_dir, "events")
    ref = e.agg(F.max(F.to_date("ts")).alias("ref_day"))
    d = e.groupBy("user_id", F.to_date("ts").alias("day")).agg(
        F.count(F.lit(1)).alias("cnt")
    )
    w = d.crossJoin(F.broadcast(ref)).select(
        "user_id",
        "cnt",
        F.datediff("ref_day", "day").alias("k"),
    )
    # python-API shiftleft takes a literal bit count; the SQL form
    # accepts a column expression for it
    weight = F.expr(
        f"shiftleft(CAST(1 AS BIGINT), CAST({_DECAY_FP_BITS} - k AS INT))"
    )
    s = w.groupBy("user_id").agg(
        F.sum(
            F.when(F.col("k") <= _DECAY_FP_BITS, F.col("cnt") * weight)
            .otherwise(F.lit(0).cast("long"))
        ).alias("score_fp"),
        F.sum("cnt").alias("n_events"),
        F.min("k").cast("long").alias("days_since_last"),
    )
    return (
        s.select(
            "user_id",
            "score_fp",
            (F.col("score_fp").cast("double") / (1 << _DECAY_FP_BITS)).alias(
                "score"
            ),
            "n_events",
            "days_since_last",
        )
        .orderBy(F.col("score_fp").desc(), "user_id")
        .limit(_DECAY_TOPN)
    )
