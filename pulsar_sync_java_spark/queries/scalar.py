"""Scalar function surface (SURVEY.md §2.2: string / date / math / json
/ map / array functions + q_udf_roundtrip).

Reference analogues: MessageId parse/format (R20,
`PulsarPartitionSyncWorker.java:150-157`), partition-name construction
(R12, `Const.java:24` '-partition-' suffix), policies-as-JSON
round-trip (R6), message `properties` MapType (R15).

All expressions are JVM-side built-ins inside whole-stage codegen; the
single row-at-a-time Python UDF (q_udf_roundtrip) exists to declare the
UDF surface and is deliberately NOT the pattern for hot paths (Pandas
UDFs in operators/ are).
"""

from __future__ import annotations

import numpy as np
import pandas as pd

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

from pulsar_sync_java_spark.queries import query
from pulsar_sync_java_spark.sources.tables import load_table

_STRING_SQL = """
WITH paths AS (
  SELECT p_partkey,
         'persistent://' || lower(p_type) || '/' || lower(p_brand) || '/' ||
           replace(p_name, ' ', '-') AS topic_path
  FROM part
)
SELECT p_partkey, topic_path,
       string_split(topic_path, '/')[3] AS tenant,
       string_split(topic_path, '/')[4] AS namespace,
       string_split(topic_path, '/')[5] AS topic,
       upper(string_split(topic_path, '/')[5]) AS topic_upper,
       substring(topic_path, 1, 13) AS scheme,
       regexp_extract(topic_path, '([0-9]+)', 1) AS brand_num,
       length(topic_path) AS path_len
FROM paths
WHERE topic_path LIKE 'persistent://%' AND topic_path NOT LIKE '%-partition-%'
"""


@query("q_string_funcs", oracle=_STRING_SQL)
def q_string_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Build and re-parse persistent://tenant/ns/topic paths (R12 name
    construction + R20 parse + R10 '-partition' name filter), exercising
    concat/lower/replace/split/substring/upper/regexp_extract/length/
    LIKE."""
    p = load_table(spark, sf_dir, "part")
    path = F.concat(
        F.lit("persistent://"),
        F.lower(F.col("p_type")),
        F.lit("/"),
        F.lower(F.col("p_brand")),
        F.lit("/"),
        F.replace(F.col("p_name"), F.lit(" "), F.lit("-")),
    )
    df = p.select("p_partkey", path.alias("topic_path"))
    parts = F.split(F.col("topic_path"), "/")
    return df.filter(
        F.col("topic_path").like("persistent://%")
        & ~F.col("topic_path").like("%-partition-%")
    ).select(
        "p_partkey",
        "topic_path",
        parts.getItem(2).alias("tenant"),
        parts.getItem(3).alias("namespace"),
        parts.getItem(4).alias("topic"),
        F.upper(parts.getItem(4)).alias("topic_upper"),
        F.substring("topic_path", 1, 13).alias("scheme"),
        F.regexp_extract("topic_path", "([0-9]+)", 1).alias("brand_num"),
        F.length("topic_path").alias("path_len"),
    )


_DATE_SQL = """
SELECT strftime(date_trunc('month', l_shipdate), '%Y-%m-%d') AS ship_month,
       CAST(year(l_shipdate) AS INT) AS ship_year,
       CAST(month(l_shipdate) AS INT) AS ship_mon,
       CAST(dayofweek(l_shipdate) AS INT) AS ship_dow,
       COUNT(*) AS n_shipped,
       CAST(COUNT(CASE WHEN l_shipdate + INTERVAL 90 DAY < TIMESTAMP '1998-01-01'
                       THEN 1 END) AS BIGINT) AS shipped_before_cutoff
FROM lineitem
GROUP BY 1, 2, 3, 4
"""


@query("q_date_funcs", oracle=_DATE_SQL)
def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time functions: truncation, field extraction, interval
    arithmetic (R17/R24 time-window and TTL semantics relationally).
    dayofweek is 1=Sunday in both Spark and DuckDB... almost: DuckDB
    dayofweek is 0=Sunday, so the Spark side subtracts 1."""
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.groupBy(
            F.date_format(F.date_trunc("month", F.col("l_shipdate")), "yyyy-MM-dd").alias("ship_month"),
            F.year("l_shipdate").alias("ship_year"),
            F.month("l_shipdate").alias("ship_mon"),
            (F.dayofweek("l_shipdate") - 1).alias("ship_dow"),
        )
        .agg(
            F.count(F.lit(1)).alias("n_shipped"),
            F.count(
                F.when(
                    F.col("l_shipdate") + F.expr("INTERVAL 90 DAYS")
                    < F.lit("1998-01-01").cast("timestamp"),
                    1,
                )
            ).alias("shipped_before_cutoff"),
        )
    )


_MATH_SQL = """
SELECT l_orderkey, l_linenumber,
       round(l_extendedprice / 7.0, 2) AS price_per_week,
       abs(l_extendedprice - l_quantity * 100.0) AS abs_diff,
       CAST(floor(l_extendedprice / 100.0) AS BIGINT) AS price_bucket,
       CAST(ceil(l_quantity / 3.0) AS BIGINT) AS qty_ceil,
       CAST(power(1 + l_tax, 2) AS DOUBLE) AS tax_sq,
       sqrt(l_extendedprice) AS price_sqrt,
       CAST(l_quantity AS BIGINT) % 7 AS qty_mod
FROM lineitem
"""


@query("q_math_funcs", oracle=_MATH_SQL)
def q_math_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Arithmetic + rounding scalar functions (R15 transform shape).

    Determinism note: round() is applied to a /7 quotient, which can
    never sit exactly on a .xx5 boundary (q/7 = x.xx5 has no dyadic
    solution), so both engines' conventions agree; rounding a
    price*(1-disc) product would NOT be stable (those land on exact
    decimal ties where Spark HALF_UP and DuckDB diverge).  floor/ceil
    are cast to BIGINT in the oracle because Spark returns long where
    DuckDB returns double."""
    li = load_table(spark, sf_dir, "lineitem")
    price = F.col("l_extendedprice")
    qty = F.col("l_quantity")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        F.round(price / 7.0, 2).alias("price_per_week"),
        F.abs(price - qty * 100.0).alias("abs_diff"),
        F.floor(price / 100.0).alias("price_bucket"),
        F.ceil(qty / 3.0).alias("qty_ceil"),
        F.pow(1 + F.col("l_tax"), 2).cast("double").alias("tax_sq"),
        F.sqrt(price).alias("price_sqrt"),
        (qty.cast("bigint") % 7).alias("qty_mod"),
    )


_JSON_SQL = """
SELECT event_id, event_type,
       CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_value
FROM events
WHERE CAST(json_extract_string(props, '$.k') AS BIGINT) >= 50
"""


@query("q_json_funcs", oracle=_JSON_SQL)
def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction + predicate on the extracted value — the
    policies-as-JSON round-trip (R6, `PulsarNamespaceSyncManager.java:74-79`
    fetches a policies object and re-applies it opaquely)."""
    ev = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("bigint")
    return (
        ev.select("event_id", "event_type", k.alias("k_value"))
        .filter(F.col("k_value") >= 50)
    )


_MAP_SQL = """
SELECT user_id, event_type AS k, CAST(COUNT(*) AS BIGINT) AS v
FROM events
GROUP BY user_id, event_type
"""


@query("q_map_funcs", oracle=_MAP_SQL)
def q_map_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType round-trip: build map(event_type -> count) per user (the
    message `properties` map, R15), then explode back to rows — the
    oracle compares the exploded form since map ordering is undefined."""
    ev = load_table(spark, sf_dir, "events")
    counts = ev.groupBy("user_id", "event_type").agg(F.count(F.lit(1)).alias("cnt"))
    as_map = counts.groupBy("user_id").agg(
        F.map_from_entries(
            F.collect_list(F.struct(F.col("event_type"), F.col("cnt")))
        ).alias("type_counts")
    )
    exploded = as_map.select(
        "user_id", F.explode(F.col("type_counts")).alias("k", "v")
    )
    return exploded


_ARRAY_SQL = """
SELECT vec_id,
       CAST(len(embedding) AS INT) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_val,
       CAST(embedding[len(embedding)] AS DOUBLE) AS last_val,
       sqrt(CAST((SELECT SUM(CAST(CAST(x AS DOUBLE) * CAST(x AS DOUBLE) AS DECIMAL(38,12)))
                  FROM UNNEST(embedding) AS t(x)) AS DOUBLE)) AS l2_norm
FROM embeddings
"""


@query("q_array_funcs", oracle=_ARRAY_SQL)
def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order array functions over embeddings: size, element
    access, L2 norm via fold with an exact decimal accumulator (so the
    sum is order-independent and hash-stable vs the oracle)."""
    e = load_table(spark, sf_dir, "embeddings")
    # Accumulate in DECIMAL(30,12), re-casting after each add: Spark
    # widens (30,12)+(30,12) to (31,12); the cast back is scale-
    # preserving (no rounding), so the fold stays exact and the lambda
    # return type matches the accumulator as Spark requires.
    dec = "decimal(30,12)"
    x_sq = lambda acc, x: (  # noqa: E731
        acc + (x.cast("double") * x.cast("double")).cast(dec)
    ).cast(dec)
    norm_sq = F.aggregate(F.col("embedding"), F.lit(0).cast(dec), x_sq)
    return e.select(
        "vec_id",
        F.size("embedding").alias("dim"),
        F.col("embedding").getItem(0).cast("double").alias("first_val"),
        F.element_at("embedding", -1).cast("double").alias("last_val"),
        F.sqrt(norm_sq.cast("double")).alias("l2_norm"),
    )


_UDF_SQL = """
SELECT l_orderkey, l_linenumber,
       CAST(l_orderkey AS VARCHAR) || ':' || CAST(l_linenumber AS VARCHAR)
         || ':' || CAST(l_orderkey % 32 AS VARCHAR) AS msg_id
FROM lineitem
WHERE l_linenumber <= 3
"""


@query("q_udf_roundtrip", oracle=_UDF_SQL)
def q_udf_roundtrip(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDF surface: format a `ledger:entry:partition`-style id
    (R20's MessageId encode, `PulsarPartitionSyncWorker.java:150-157`
    parses the inverse).  The oracle is plain string concat — the UDF
    must agree with it exactly."""
    li = load_table(spark, sf_dir, "lineitem").filter(F.col("l_linenumber") <= 3)

    @F.udf(T.StringType())
    def format_msg_id(orderkey, linenumber):
        return f"{orderkey}:{linenumber}:{orderkey % 32}"

    return li.select(
        "l_orderkey",
        "l_linenumber",
        format_msg_id(F.col("l_orderkey"), F.col("l_linenumber")).alias("msg_id"),
    )


_UDTF_SQL = """
WITH p AS (
  SELECT doc_id,
         list_filter(string_split_regex(text, '\\.\\s+'), x -> x <> '') AS parts
  FROM documents
), dims AS (
  SELECT unnest(generate_series(1, (SELECT MAX(len(parts)) FROM p))) AS i
)
SELECT doc_id,
       CAST(d.i - 1 AS INT) AS sent_idx,
       parts[d.i] AS sentence,
       CAST(length(parts[d.i]) AS INT) AS n_chars
FROM p, dims d WHERE d.i <= len(parts)
"""


@query("q_udtf_sentences", oracle=_UDTF_SQL)
def q_udtf_sentences(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Python UDTF surface (table function): split each document into
    sentences, one output ROW per non-empty piece with its index and
    length — the row-generating API q_udf_roundtrip's scalar UDF cannot
    express, applied via SQL LATERAL.

    Like the scalar UDF query this exists to DECLARE the API surface:
    UDTFs evaluate row-at-a-time in Python, so the hot-path rule stands
    (a production sentence splitter would be `posexplode(split(...))`,
    all JVM-side — that equivalent IS the DuckDB oracle here, which the
    UDTF must match exactly)."""
    import re

    from pyspark.sql.functions import udtf

    @udtf(returnType="sent_idx int, sentence string, n_chars int")
    class SplitSentences:
        def eval(self, text: str):
            if text is None:
                return
            i = 0
            # re.ASCII: the DuckDB oracle's RE2 \s+ is ASCII-only, while
            # Python's \s is Unicode-aware (NBSP, ideographic space...).
            # Both engines must agree on what counts as whitespace.
            for piece in re.split(r"\.\s+", text, flags=re.ASCII):
                if piece != "":
                    yield i, piece, len(piece)
                    i += 1

    spark.udtf.register("split_sentences", SplitSentences)
    d = load_table(spark, sf_dir, "documents").select("doc_id", "text")
    d.createOrReplaceTempView("__udtf_docs")
    return spark.sql(
        "SELECT d.doc_id, s.sent_idx, s.sentence, s.n_chars "
        "FROM __udtf_docs d, LATERAL split_sentences(d.text) s"
    )


# ---------------------------------------------------------- UDAF surface

_UDAF_SQL = """
SELECT l_returnflag,
       COUNT(*) AS n,
       mad(l_extendedprice) AS mad_price,
       quantile_cont(l_extendedprice, 0.5) AS median_price
FROM lineitem
GROUP BY l_returnflag
"""


@query("q_grouped_udaf", oracle=_UDAF_SQL)
def q_grouped_udaf(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declared UDAF surface: a GROUPED_AGG pandas UDF computing the
    median absolute deviation per return flag, next to the JVM-side
    exact median (`percentile` ≡ DuckDB quantile_cont, bit-exact — see
    q_percentiles) so both custom-aggregate paths are exercised in one
    result.

    Determinism: numpy's median sorts and averages the two middle
    DOUBLES — bit-identical to DuckDB's quantile_cont(0.5)/mad chain
    on the same values; the |x - median| subtraction is one IEEE op
    per element.  Scale note: a grouped-agg pandas UDF materializes
    each GROUP in one Arrow batch (fine for bounded group counts like
    flags/categories; unbounded-cardinality aggregates belong in the
    partial+final JVM path — the hot-path twin here is the built-in
    `percentile`/`approx_percentile` family)."""
    from pyspark.sql.functions import pandas_udf

    @pandas_udf("double")
    def mad_udaf(v: pd.Series) -> float:
        vals = v.values
        med = float(np.median(vals))
        return float(np.median(np.abs(vals - med)))

    li = load_table(spark, sf_dir, "lineitem")
    # Spark forbids mixing a GROUPED_AGG pandas UDF with JVM aggregates
    # in one pass (INVALID_PANDAS_UDF_PLACEMENT), so the two paths run
    # as separate aggregations joined on the tiny flag key (3 groups —
    # AQE broadcasts the join)
    jvm = li.groupBy("l_returnflag").agg(
        F.count(F.lit(1)).alias("n"),
        F.percentile("l_extendedprice", F.lit(0.5)).alias("median_price"),
    )
    pnd = li.groupBy("l_returnflag").agg(
        mad_udaf("l_extendedprice").alias("mad_price")
    )
    return jvm.join(pnd, "l_returnflag").select(
        "l_returnflag", "n", "mad_price", "median_price"
    )


# ----------------------------------------------------- JSON salvage

_JSON_SALVAGE_SQL = """
WITH m AS (
  SELECT event_type,
         CASE WHEN event_id % 23 = 0
              THEN substr(props, 1, length(props) - 1)
              ELSE props END AS p
  FROM events
)
SELECT event_type,
       CAST(COUNT(*) AS BIGINT) AS n_total,
       CAST(COUNT(*) FILTER (json_valid(p)) AS BIGINT) AS n_valid,
       CAST(COUNT(*) FILTER (NOT json_valid(p)) AS BIGINT) AS n_corrupt,
       CAST(SUM(CASE WHEN json_valid(p)
                     THEN CAST(json_extract_string(p, '$.k') AS BIGINT)
                END) AS BIGINT) AS sum_k_valid,
       CAST(COUNT(*) FILTER (json_valid(p)) AS DOUBLE) / COUNT(*) AS valid_rate
FROM m GROUP BY event_type
"""


@query("q_json_salvage", oracle=_JSON_SALVAGE_SQL)
def q_json_salvage(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Corrupt-tolerant JSON ingestion audit — the schema-drift reality
    of any long-lived feed: a deterministic slice of `props` payloads
    is truncated (planted corruption, the q_fk_integrity idiom), and
    the parse goes through Spark's REAL corrupt-record channel —
    `from_json` in PERMISSIVE mode with `columnNameOfCorruptRecord` —
    rather than a fragile null-check on one extracted field (which
    cannot tell a malformed document from a valid one missing the
    key).  Per event_type: totals, valid/corrupt splits, the exact sum
    of the salvaged field over VALID rows only, and the valid rate.

    Non-circular validation: the oracle decides validity with DuckDB's
    independent `json_valid`, so the hash gate cross-checks two
    unrelated JSON parsers' notions of malformed.  Scale shape: one
    projection + one partial+final aggregate — corrupt handling adds
    zero extra passes, and PERMISSIVE parsing quarantines bad payloads
    per-row instead of failing the 100 TB job (the salvage contract a
    pipeline needs when 0.001% of a feed is garbage)."""
    ev = load_table(spark, sf_dir, "events")
    p = F.when(
        F.col("event_id") % 23 == 0,
        F.expr("substring(props, 1, length(props) - 1)"),
    ).otherwise(F.col("props"))
    parsed = F.from_json(
        p,
        "k bigint, _corrupt_record string",
        {"mode": "PERMISSIVE", "columnNameOfCorruptRecord": "_corrupt_record"},
    )
    d = ev.select("event_type", parsed.alias("j"))
    valid = F.col("j._corrupt_record").isNull()
    n_valid = F.count_if(valid)
    return d.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n_total"),
        n_valid.alias("n_valid"),
        F.count_if(~valid).alias("n_corrupt"),
        F.sum(F.when(valid, F.col("j.k"))).alias("sum_k_valid"),
        (n_valid.cast("double") / F.count(F.lit(1))).alias("valid_rate"),
    )
