"""Join strategy queries (SURVEY.md §2.2: anti, semi, broadcast,
sort-merge, range/theta, as-of).

Reference analogues: the catalog diff is an anti-join (create only what
dst lacks — R3/R6/R9/R11, e.g. `PulsarTenantSyncManager.java:75-84`);
the dedup guard is a semi-join existence check (R22,
`PulsarPartitionSyncWorker.java:158-176`); policies lookup is a small-dim
join (R5, `PulsarNamespaceSyncManager.java:74-78`); floor lookup is the
as-of join (R21, `SparseMap.java:55-62`).

Scale notes per query in docstrings; the broadcast join is explicitly
hinted, the sort-merge join is left to Catalyst (it picks SMJ for two
large fact tables), and the as-of join uses the single-shuffle
union-window operator instead of a range join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from pulsar_sync_java_spark.functions.numeric import dsum, sql_dsum
from pulsar_sync_java_spark.operators.asof import asof_join
from pulsar_sync_java_spark.operators.bloom import bloom_semi_join
from pulsar_sync_java_spark.queries import query
from pulsar_sync_java_spark.queries.reference import TS_FMT_DUCK, fmt_ts
from pulsar_sync_java_spark.sources.tables import load_table

_ANTI_SQL = """
SELECT c_custkey, c_name, c_acctbal
FROM customer c
WHERE NOT EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey
                    AND o.o_orderpriority = '1-URGENT')
"""


@query("q_anti_join", oracle=_ANTI_SQL)
def q_anti_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Customers with no URGENT-priority order — the catalog-diff
    primitive: the reference creates exactly the entities present on src
    and absent on dst (R3, `PulsarTenantSyncManager.java:75-84`).  The
    right side is pre-filtered (every customer has *some* order in the
    synthetic data, so the unfiltered variant is vacuously empty at
    every scale — a worthless check); the filter also reaches the
    orders scan as a pushed predicate.  At scale: Spark rewrites
    left_anti with a broadcast when the right side's distinct keys are
    small; otherwise a shuffled hash anti-join — no change needed
    here."""
    c = load_table(spark, sf_dir, "customer")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_custkey")
    )
    return c.join(o, c.c_custkey == o.o_custkey, "left_anti").select(
        "c_custkey", "c_name", "c_acctbal"
    )


_SEMI_SQL = """
SELECT p_partkey, p_name, p_retailprice
FROM part p
WHERE EXISTS (SELECT 1 FROM lineitem l WHERE l.l_partkey = p.p_partkey)
"""


@query("q_semi_join", oracle=_SEMI_SQL)
def q_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Parts that appear in lineitem — existence check, the shape of the
    reference's created-cursor guard (R22 memo at
    `PulsarPartitionSyncWorker.java:174`)."""
    p = load_table(spark, sf_dir, "part")
    li = load_table(spark, sf_dir, "lineitem").select("l_partkey")
    return p.join(li, p.p_partkey == li.l_partkey, "left_semi").select(
        "p_partkey", "p_name", "p_retailprice"
    )


_BROADCAST_SQL = """
SELECT c.c_custkey, c.c_name, n.n_name AS nation, r.r_name AS region
FROM customer c
JOIN nation n ON c.c_nationkey = n.n_nationkey
JOIN region r ON n.n_regionkey = r.r_regionkey
"""


@query("q_join_broadcast", oracle=_BROADCAST_SQL)
def q_join_broadcast(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Small-dim lookup join, explicitly broadcast (R5 policies lookup).
    At 100 TB the fact side streams through map-side hash joins with
    ZERO shuffle of the big table — the one non-negotiable plan shape
    for dim enrichment."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region")
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select(
            "c_custkey",
            "c_name",
            F.col("n_name").alias("nation"),
            F.col("r_name").alias("region"),
        )
    )


_SORTMERGE_SQL = f"""
SELECT o.o_orderpriority,
       COUNT(*) AS n_items,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue
FROM lineitem l JOIN orders o ON l.l_orderkey = o.o_orderkey
GROUP BY o.o_orderpriority
"""


@query("q_join_sortmerge", oracle=_SORTMERGE_SQL)
def q_join_sortmerge(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Large-fact equi-join (lineitem x orders) + aggregation.  Catalyst
    picks sort-merge for two large sides; AQE converts to broadcast when
    one side turns out small at runtime.  The aggregate is partial
    (map-side) before the final shuffle — one shuffle per side for the
    join, one for the 5-group agg."""
    li = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders")
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.count(F.lit(1)).alias("n_items"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias("revenue"),
        )
    )


_RANGE_SQL = f"""
SELECT p.p_brand,
       COUNT(*) AS n_matched,
       {sql_dsum('l.l_extendedprice')} AS matched_price
FROM lineitem l
JOIN part p ON l.l_partkey = p.p_partkey
           AND l.l_extendedprice >= 0.5 * p.p_retailprice
           AND l.l_extendedprice <= 2.0 * p.p_retailprice
GROUP BY p.p_brand
"""


@query("q_join_range", oracle=_RANGE_SQL)
def q_join_range(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi + range (theta) join: the equi key keeps it a hash/SMJ join
    with the range conjuncts evaluated as residual predicates — NOT a
    nested-loop.  (A pure theta join would fall back to
    BroadcastNestedLoopJoin; keeping an equi conjunct is the scale
    discipline.)"""
    li = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part")
    cond = (
        (li.l_partkey == p.p_partkey)
        & (li.l_extendedprice >= 0.5 * p.p_retailprice)
        & (li.l_extendedprice <= 2.0 * p.p_retailprice)
    )
    return (
        li.join(p, cond)
        .groupBy("p_brand")
        .agg(
            F.count(F.lit(1)).alias("n_matched"),
            dsum("l_extendedprice").alias("matched_price"),
        )
    )


_CROSS_SQL = """
SELECT r.r_name, n.n_name, n.n_nationkey
FROM region r CROSS JOIN nation n
"""


@query("q_cross_join", oracle=_CROSS_SQL)
def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit cross join (nested-loop strategy): region x nation.
    With a broadcastable side Spark plans BroadcastNestedLoopJoin —
    never CartesianProduct (plan-asserted in test_plan_shape).  The
    legitimate cross-join use is exactly this shape: a deliberate
    small-dim expansion (parameter grids, calendar scaffolds), where
    the broadcast keeps it one narrow stage; unbounded cross joins stay
    forbidden by the no-cartesian plan gate."""
    r = load_table(spark, sf_dir, "region").select("r_name")
    n = load_table(spark, sf_dir, "nation").select("n_name", "n_nationkey")
    return r.crossJoin(n)


_ASOF_SQL = f"""
WITH ranked AS (
  SELECT e.event_id, e.user_id, e.ts,
         o.o_orderkey, o.o_orderdate, o.o_totalprice,
         row_number() OVER (
           PARTITION BY e.event_id
           ORDER BY o.o_orderdate DESC, o.o_orderkey DESC) AS rn
  FROM events e
  LEFT JOIN orders o
    ON o.o_custkey = e.user_id AND o.o_orderdate <= e.ts
)
SELECT event_id, user_id,
       strftime(ts, '{TS_FMT_DUCK}') AS ts,
       o_orderkey,
       strftime(o_orderdate, '{TS_FMT_DUCK}') AS o_orderdate,
       o_totalprice
FROM ranked
WHERE rn = 1 OR rn IS NULL
"""


@query("q_asof_join", oracle=_ASOF_SQL)
def q_asof_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Backward as-of join: each event resolves to the user's latest
    order at-or-before the event time — exactly the reference's floor
    lookup (R21, `SparseMap.java:55-62`) with orders as the sampled map.
    Uses the union-window operator: one shuffle on user_id, no range
    explosion (operators/asof.py)."""
    ev = (
        load_table(spark, sf_dir, "events")
        .select("event_id", F.col("user_id"), F.col("ts"))
    )
    o = load_table(spark, sf_dir, "orders").select(
        F.col("o_custkey").alias("user_id"),
        F.col("o_orderdate").alias("ts"),
        "o_orderkey",
        F.col("o_orderdate"),
        "o_totalprice",
    )
    joined = asof_join(
        ev, o, on="ts", by="user_id", right_tiebreak=["o_orderkey"]
    )
    return joined.select(
        "event_id",
        "user_id",
        fmt_ts(F.col("ts")).alias("ts"),
        "o_orderkey",
        fmt_ts(F.col("o_orderdate")).alias("o_orderdate"),
        "o_totalprice",
    )


_BLOOM_SEMI_SQL = f"""
SELECT l_returnflag, COUNT(*) AS n_items,
       {sql_dsum("l_extendedprice * (1 - l_discount)")} AS revenue
FROM lineitem l
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_orderkey = l.l_orderkey
                AND o.o_orderpriority = '1-URGENT')
GROUP BY l_returnflag
"""


@query("q_bloom_semi_join", oracle=_BLOOM_SEMI_SQL)
def q_bloom_semi_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue of lineitems belonging to URGENT orders, with the semi
    join routed through `operators/bloom.py:bloom_semi_join`: a compact
    bit-set of the urgent order keys is built in one bounded aggregate,
    inlined as a binary literal, and drops non-urgent lineitems IN THE
    SCAN STAGE — the oracle is the PLAIN semi join, because the bloom
    admits only a superset that the exact join then trims (no false
    negatives, property-tested).

    The reference's analogous shape is work discovery: only topics
    listed in the source catalog get partition workers at all
    (`PulsarPartitionTopicSyncManager.java:93-104`).  At 100 TB this is
    the difference between shuffling the full fact table into the semi
    join and shuffling ~selectivity% of it."""
    li = load_table(spark, sf_dir, "lineitem")
    o = (
        load_table(spark, sf_dir, "orders")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    joined = bloom_semi_join(li, o, "l_orderkey", "o_orderkey")
    return joined.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n_items"),
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount"))).alias(
            "revenue"
        ),
    )


_ASOF_FWD_SQL = f"""
WITH v AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
), p AS (
  SELECT event_id AS p_event_id, user_id, ts AS p_ts, value AS p_value
  FROM events WHERE event_type = 'purchase'
), ranked AS (
  SELECT v.event_id, v.user_id, v.ts,
         p.p_event_id, p.p_ts, p.p_value,
         ROW_NUMBER() OVER (
           PARTITION BY v.event_id
           ORDER BY p.p_ts ASC, p.p_event_id DESC) AS rn
  FROM v LEFT JOIN p ON p.user_id = v.user_id AND p.p_ts >= v.ts
)
SELECT event_id, user_id,
       strftime(ts, '{TS_FMT_DUCK}') AS ts,
       p_event_id,
       strftime(p_ts, '{TS_FMT_DUCK}') AS p_ts,
       p_value
FROM ranked
WHERE rn = 1 OR rn IS NULL
"""


@query("q_asof_forward", oracle=_ASOF_FWD_SQL)
def q_asof_forward(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FORWARD as-of join: each view event resolves to the same user's
    EARLIEST purchase at-or-after it — the ceiling companion to the
    reference's floor lookup (R21): where the floor gives the
    conservative replay position, the ceiling bounds how far ahead the
    next sampled mapping lies.  Same single-shuffle union-window
    operator, direction='forward'; at equal timestamps the larger
    event id wins (the operator's documented tie convention, mirrored
    in the oracle's ORDER BY ... DESC)."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "event_id", F.col("user_id"), F.col("ts")
    )
    p = ev.filter(F.col("event_type") == "purchase").select(
        F.col("user_id"),
        F.col("ts"),
        F.col("event_id").alias("p_event_id"),
        F.col("ts").alias("p_ts"),
        F.col("value").alias("p_value"),
    )
    joined = asof_join(
        v, p, on="ts", by="user_id",
        right_tiebreak=["p_event_id"], direction="forward",
    )
    return joined.select(
        "event_id",
        "user_id",
        fmt_ts(F.col("ts")).alias("ts"),
        "p_event_id",
        fmt_ts(F.col("p_ts")).alias("p_ts"),
        "p_value",
    )


_ASOF_NEAREST_SQL = f"""
WITH v AS (
  SELECT event_id, user_id, ts FROM events WHERE event_type = 'view'
), p AS (
  SELECT event_id AS p_event_id, user_id, ts AS p_ts, value AS p_value
  FROM events WHERE event_type = 'purchase'
), b AS (
  SELECT event_id, p_event_id, p_ts, p_value FROM (
    SELECT v.event_id, p.p_event_id, p.p_ts, p.p_value,
           ROW_NUMBER() OVER (PARTITION BY v.event_id
                              ORDER BY p.p_ts DESC, p.p_event_id ASC) AS rn
    FROM v JOIN p ON p.user_id = v.user_id AND p.p_ts <= v.ts) t
  WHERE rn = 1
), f AS (
  SELECT event_id, p_event_id, p_ts, p_value FROM (
    SELECT v.event_id, p.p_event_id, p.p_ts, p.p_value,
           ROW_NUMBER() OVER (PARTITION BY v.event_id
                              ORDER BY p.p_ts ASC, p.p_event_id DESC) AS rn
    FROM v JOIN p ON p.user_id = v.user_id AND p.p_ts >= v.ts) t
  WHERE rn = 1
), chosen AS (
  SELECT v.event_id, v.user_id, v.ts,
         CASE WHEN b.p_ts IS NOT NULL AND (f.p_ts IS NULL OR
                epoch_us(v.ts) - epoch_us(b.p_ts)
                  <= epoch_us(f.p_ts) - epoch_us(v.ts))
              THEN 'backward'
              WHEN f.p_ts IS NOT NULL THEN 'forward' END AS side,
         b.p_event_id AS b_event_id, b.p_ts AS b_ts, b.p_value AS b_value,
         f.p_event_id AS f_event_id, f.p_ts AS f_ts, f.p_value AS f_value
  FROM v LEFT JOIN b ON v.event_id = b.event_id
         LEFT JOIN f ON v.event_id = f.event_id
)
SELECT event_id, user_id,
       strftime(ts, '{TS_FMT_DUCK}') AS ts,
       side,
       CASE side WHEN 'backward' THEN b_event_id
                 WHEN 'forward' THEN f_event_id END AS p_event_id,
       strftime(CASE side WHEN 'backward' THEN b_ts
                          WHEN 'forward' THEN f_ts END,
                '{TS_FMT_DUCK}') AS p_ts,
       CASE side WHEN 'backward' THEN b_value
                 WHEN 'forward' THEN f_value END AS p_value
FROM chosen
"""


@query("q_asof_nearest", oracle=_ASOF_NEAREST_SQL)
def q_asof_nearest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST as-of join — each view event resolves to the same
    user's closest purchase in either time direction (ties prefer the
    backward/earlier match, pandas merge_asof 'nearest' parity) —
    completing the direction family over the reference's floor lookup
    (R21): backward = conservative replay position, forward = next
    sample, nearest = best positional estimate.

    Composition, not a new operator: one backward + one forward
    union-window as-of join over the SAME (user_id) key — two
    single-shuffle passes, no range-join explosion — then a per-row
    constant-time chooser on exact integer microsecond deltas.  The
    oracle composes the same two window formulations, so the tie
    conventions (backward: later purchase wins, smaller id on equal
    ts; forward: earlier purchase wins, larger id on equal ts;
    equal-delta: backward) are pinned on both engines."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.filter(F.col("event_type") == "view").select(
        "event_id", "user_id", "ts"
    )

    def purchases(pre: str) -> DataFrame:
        return ev.filter(F.col("event_type") == "purchase").select(
            F.col("user_id"),
            F.col("ts"),
            F.col("event_id").alias(f"{pre}_event_id"),
            F.col("ts").alias(f"{pre}_ts"),
            F.col("value").alias(f"{pre}_value"),
        )

    # backward tie convention here: ascending tiebreak, LAST wins ->
    # to match the oracle's "smaller id on equal ts" we order by the
    # NEGATED id (operator keeps the last of the ascending order)
    pb = purchases("b").withColumn("__neg_id", -F.col("b_event_id"))
    j1 = asof_join(
        v, pb, on="ts", by="user_id", right_tiebreak=["__neg_id"]
    ).drop("__neg_id")
    j2 = asof_join(
        j1,
        purchases("f"),
        on="ts",
        by="user_id",
        right_tiebreak=["f_event_id"],
        direction="forward",
    )
    db = F.unix_micros(F.col("ts")) - F.unix_micros(F.col("b_ts"))
    df_ = F.unix_micros(F.col("f_ts")) - F.unix_micros(F.col("ts"))
    use_b = F.col("b_ts").isNotNull() & (F.col("f_ts").isNull() | (db <= df_))
    side = (
        F.when(use_b, "backward")
        .when(F.col("f_ts").isNotNull(), "forward")
        .cast("string")
    )
    pick = lambda col: (  # noqa: E731
        F.when(side == "backward", F.col(f"b_{col}"))
        .when(side == "forward", F.col(f"f_{col}"))
    )
    return j2.select(
        "event_id",
        "user_id",
        fmt_ts(F.col("ts")).alias("ts"),
        side.alias("side"),
        pick("event_id").alias("p_event_id"),
        fmt_ts(pick("ts")).alias("p_ts"),
        pick("value").alias("p_value"),
    )


_STAR_SQL = f"""
SELECT n.n_name AS nation,
       {sql_dsum('l.l_extendedprice * (1 - l.l_discount)')} AS revenue,
       CAST(COUNT(*) AS BIGINT) AS n_lineitems
FROM customer c
JOIN orders o    ON o.o_custkey = c.c_custkey
JOIN lineitem l  ON l.l_orderkey = o.o_orderkey
JOIN supplier s  ON s.s_suppkey = l.l_suppkey
                AND s.s_nationkey = c.c_nationkey
JOIN nation n    ON n.n_nationkey = s.s_nationkey
JOIN region r    ON r.r_regionkey = n.n_regionkey
WHERE r.r_name = 'ASIA'
  AND o.o_orderdate >= DATE '1996-01-01'
  AND o.o_orderdate <  DATE '1998-01-01'
GROUP BY n.n_name
"""


@query("q_star_join", oracle=_STAR_SQL)
def q_star_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5 shape — the 6-table star the optimizer has to
    REORDER: local-supplier revenue by nation for one region and a
    2-year window, with the supplier⋈customer same-nation predicate
    that makes naive left-deep order quadratic.  Declared through the
    SQL front-end so Catalyst owns join order: the two facts join
    first (orderkey), the three dims broadcast onto the result, and
    the region filter prunes nations BEFORE any fact row is touched —
    the plan every warehouse engine is judged on.  Exact-decimal
    revenue (dsum discipline)."""
    for t in ("customer", "orders", "lineitem", "supplier", "nation", "region"):
        load_table(spark, sf_dir, t).createOrReplaceTempView(t)
    return spark.sql(_STAR_SQL)


# ------------------------------------------- incremental join view

# IVM for JOIN views (the join-side twin of q_rollup_incremental's
# aggregate IVM): with A = A_old ⊎ ΔA and B = B_old ⊎ ΔB, the view
# delta is the DISJOINT union  ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB — history
# is never re-joined against itself.  The oracle computes the same
# delta the expensive way (new view state MINUS old view state, both
# from scratch), so a hash-green row proves the delta algebra exactly,
# including the decimal-exact revenue subtraction.
_JOIN_INCR_SQL = """
WITH pairs AS (
  SELECT o.o_orderkey, o.o_orderpriority, l.l_linenumber, l.l_returnflag,
         CAST(l.l_extendedprice * (1 - l.l_discount) AS DECIMAL(38,6)) AS r
  FROM orders o JOIN lineitem l ON o.o_orderkey = l.l_orderkey
), newv AS (
  SELECT o_orderpriority, l_returnflag, COUNT(*) AS n, SUM(r) AS s
  FROM pairs GROUP BY 1, 2
), oldv AS (
  SELECT o_orderpriority, l_returnflag, COUNT(*) AS n, SUM(r) AS s
  FROM pairs
  WHERE o_orderkey % 11 <> 5
    AND NOT (l_linenumber >= 5 AND o_orderkey % 19 = 3)
  GROUP BY 1, 2
)
SELECT n.o_orderpriority, n.l_returnflag,
       CAST(n.n - COALESCE(o.n, 0) AS BIGINT) AS d_pairs,
       CAST(CAST(n.s - COALESCE(o.s, CAST(0 AS DECIMAL(38,6))) AS VARCHAR)
            AS DOUBLE) AS d_revenue
FROM newv n LEFT JOIN oldv o
  ON n.o_orderpriority = o.o_orderpriority
 AND n.l_returnflag = o.l_returnflag
WHERE n.n - COALESCE(o.n, 0) > 0
"""


@query("q_join_incremental", oracle=_JOIN_INCR_SQL)
def q_join_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental maintenance of a JOIN view: a revenue-per-
    (priority, returnflag) view over orders ⋈ lineitem receives a
    batch of new orders (ΔA = o_orderkey%11==5) and late lineitems
    (ΔB = l_linenumber>=5 AND l_orderkey%19==3 — a bounded ~1.5%
    order-slice stand-in for a micro-batch; the r8 ADVICE fix: the
    earlier ΔB = all l_linenumber>=5 was a constant ~2/7 of the fact
    table, which no forced broadcast survives at scale); the query
    emits the view INCREMENT.

    Scale shape — the reason IVM exists: the increment is the disjoint
    union ΔA⋈B_old ∪ A_old⋈ΔB ∪ ΔA⋈ΔB, and the DELTA side of every
    term broadcasts (in production the delta IS a micro-batch of
    bounded absolute size; the modulus slice only simulates that on
    static test data), so each history side is scanned once and NEVER
    shuffled for a join — maintenance cost is O(history scan + delta),
    not O(history join history).  A delta too big to broadcast belongs
    on the other side of the trade: drop the hint and let AQE pick the
    shuffle join.  The oracle recomputes both view states from scratch
    and subtracts (decimal-exact), so the hash gate proves delta
    ∪-algebra == state difference bit-for-bit."""
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority"
    )
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey",
        "l_linenumber",
        "l_returnflag",
        (F.col("l_extendedprice") * (1 - F.col("l_discount")))
        .cast("decimal(38,6)")
        .alias("r"),
    )
    d_a = o.filter(F.col("o_orderkey") % 11 == 5)
    old_a = o.filter(F.col("o_orderkey") % 11 != 5)
    is_d_b = (F.col("l_linenumber") >= 5) & (F.col("l_orderkey") % 19 == 3)
    d_b = l.filter(is_d_b)
    old_b = l.filter(~is_d_b)
    on = F.col("o_orderkey") == F.col("l_orderkey")
    delta_pairs = (
        F.broadcast(d_a)
        .join(old_b, on)
        .unionByName(old_a.join(F.broadcast(d_b), on))
        .unionByName(F.broadcast(d_a).join(d_b, on))
    )
    return (
        delta_pairs.groupBy("o_orderpriority", "l_returnflag")
        .agg(
            F.count(F.lit(1)).alias("d_pairs"),
            F.sum("r").alias("s"),
        )
        .select(
            "o_orderpriority",
            "l_returnflag",
            "d_pairs",
            F.col("s").cast("double").alias("d_revenue"),
        )
    )
