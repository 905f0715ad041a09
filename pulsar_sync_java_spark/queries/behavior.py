"""User-behavior analytics over the events stream: ordered funnels and
cohort retention — the two aggregate shapes every event warehouse runs
daily, and the natural read-side complement to the reference's
per-partition ordered delivery (PulsarPartitionSyncWorker.java:224-231
preserves per-key order precisely so consumers can compute
order-sensitive aggregates like these downstream).

Both queries are oracle-checked (hash gate), and both are shaped for
100 TB event volumes: every stage is a per-user partial+final aggregate
or a key join — no windows over the raw stream, no cross products, and
each funnel stage's table can only shrink (stage N users ⊆ stage N-1
users), so AQE turns the later joins into broadcasts exactly when that
becomes profitable.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from pulsar_sync_java_spark.queries import query
from pulsar_sync_java_spark.queries.reference import TS_FMT_DUCK, fmt_ts
from pulsar_sync_java_spark.sources.tables import load_table

# ------------------------------------------------------------------ funnel

_FUNNEL_SQL = f"""
WITH v AS (
  SELECT user_id, MIN(ts) AS t_view
  FROM events WHERE event_type = 'view' GROUP BY user_id
), c AS (
  SELECT e.user_id, MIN(e.ts) AS t_click
  FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.t_view
  WHERE e.event_type = 'click' GROUP BY e.user_id
), p AS (
  SELECT e.user_id, MIN(e.ts) AS t_purchase
  FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.t_click
  WHERE e.event_type = 'purchase' GROUP BY e.user_id
)
SELECT v.user_id,
       strftime(v.t_view, '{TS_FMT_DUCK}') AS t_view,
       strftime(c.t_click, '{TS_FMT_DUCK}') AS t_click,
       strftime(p.t_purchase, '{TS_FMT_DUCK}') AS t_purchase,
       CAST(1 + CAST(c.user_id IS NOT NULL AS INT)
              + CAST(p.user_id IS NOT NULL AS INT) AS INT) AS reached
FROM v
LEFT JOIN c ON v.user_id = c.user_id
LEFT JOIN p ON v.user_id = p.user_id
"""


@query("q_funnel_steps", oracle=_FUNNEL_SQL)
def q_funnel_steps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered three-stage funnel (view -> click -> purchase): for each
    user who viewed, the earliest view, the earliest click strictly
    AFTER that view, and the earliest purchase strictly after that
    click — `reached` counts completed stages (1-3).

    Scale shape: each stage is one per-user min-aggregate over a
    type-filtered scan (filter pushed to parquet) joined to the
    previous stage's (user, ts) table.  Stage tables only shrink —
    users who clicked ⊆ users who viewed — so the join's build side
    gets smaller every stage and AQE converts it to a broadcast the
    moment it fits; nothing in the plan ever carries more than one row
    per (user, stage)."""
    e = load_table(spark, sf_dir, "events").select("user_id", "event_type", "ts")
    v = (
        e.filter(F.col("event_type") == "view")
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_view"))
    )
    c = (
        e.filter(F.col("event_type") == "click")
        .join(v, "user_id")
        .where(F.col("ts") > F.col("t_view"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_click"))
    )
    p = (
        e.filter(F.col("event_type") == "purchase")
        .join(c, "user_id")
        .where(F.col("ts") > F.col("t_click"))
        .groupBy("user_id")
        .agg(F.min("ts").alias("t_purchase"))
    )
    reached = (
        F.lit(1)
        + F.col("t_click").isNotNull().cast("int")
        + F.col("t_purchase").isNotNull().cast("int")
    )
    return (
        v.join(c, "user_id", "left")
        .join(p, "user_id", "left")
        .select(
            "user_id",
            fmt_ts(F.col("t_view")).alias("t_view"),
            fmt_ts(F.col("t_click")).alias("t_click"),
            fmt_ts(F.col("t_purchase")).alias("t_purchase"),
            reached.cast("int").alias("reached"),
        )
    )


# ---------------------------------------------------------------- retention

_RETENTION_SQL = """
WITH f AS (
  SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
  FROM events GROUP BY user_id
), a AS (
  SELECT DISTINCT user_id, CAST(ts AS DATE) AS active_day FROM events
)
SELECT strftime(f.cohort_day, '%Y-%m-%d') AS cohort_day,
       CAST(datediff('day', f.cohort_day, a.active_day) AS INT) AS day_offset,
       COUNT(*) AS n_users
FROM a JOIN f ON a.user_id = f.user_id
GROUP BY 1, 2
"""


@query("q_retention_cohort", oracle=_RETENTION_SQL)
def q_retention_cohort(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by their first active day
    (UTC), counted on each later day they return — the (cohort_day,
    day_offset) -> n_users triangle behind every retention chart.

    Scale shape: one distinct on (user, day) — partial+final, shuffle
    carries at most users x active-days rows — and one per-user min.
    Counting rows after the join is exact-distinct for free: a user
    contributes exactly one row per (cohort, offset) because offset is
    a function of their active day.  No COUNT(DISTINCT) expand, no
    window over raw events."""
    e = load_table(spark, sf_dir, "events")
    f = e.groupBy("user_id").agg(F.min(F.to_date("ts")).alias("cohort_day"))
    a = e.select("user_id", F.to_date("ts").alias("active_day")).distinct()
    return (
        a.join(f, "user_id")
        .groupBy(
            F.date_format("cohort_day", "yyyy-MM-dd").alias("cohort_day"),
            F.datediff("active_day", "cohort_day").cast("int").alias("day_offset"),
        )
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


# ------------------------------------------------------ markov transitions

_MARKOV_SQL = """
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (
           PARTITION BY user_id ORDER BY ts, event_id) AS next_type
  FROM events
), t AS (
  SELECT event_type AS from_type, next_type AS to_type, COUNT(*) AS n
  FROM seq WHERE next_type IS NOT NULL
  GROUP BY 1, 2
)
SELECT from_type, to_type, n,
       CAST(n AS DOUBLE) / SUM(n) OVER (PARTITION BY from_type) AS p
FROM t
"""


@query("q_markov_transitions", oracle=_MARKOV_SQL)
def q_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix of user behavior: for every
    ordered pair of consecutive events of one user, the transition
    count and row-normalized probability — the session-modeling
    aggregate behind next-action prediction and anomaly screens.

    Shape: ONE (user, ts) window shuffle for the lag pairing, one hash
    aggregate of (from, to) pairs (25 groups here, event-type² in
    general), and a tiny window over the aggregate for normalization.
    p = count/total is a single double division on exact integers —
    deterministic bits on both engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("to_type"),
    ).filter(F.col("to_type").isNotNull())
    t = seq.groupBy("from_type", "to_type").agg(F.count(F.lit(1)).alias("n"))
    wt = Window.partitionBy("from_type")
    return t.select(
        "from_type",
        "to_type",
        "n",
        (F.col("n").cast("double") / F.sum("n").over(wt)).alias("p"),
    )
