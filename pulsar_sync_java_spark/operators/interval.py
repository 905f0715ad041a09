"""Interval-overlap join without an equi-key: bucketize time so the
overlap predicate rides an equi join, never a nested loop.

Spark plans a pure inequality join (``a.s <= b.e AND b.s <= a.e``) as
BroadcastNestedLoopJoin or CartesianProduct — O(|L|·|R|) comparisons
and a plan shape this repo hard-forbids.  The standard fix (the same
idea as Databricks' binned range-join optimization, built here from
public primitives) is to quantize the timeline: every interval explodes
to the buckets it touches, candidates equi-join on the bucket id, and
the exact overlap predicate then prunes false candidates.  Two
overlapping intervals ALWAYS share at least one bucket (the bucket
containing the later start), so the rewrite loses nothing; the
dropDuplicates guards the pairs that share several.

Cost: |rows| x (interval_len/bucket_width + 1) bucket rows into one
equi-join shuffle; Σ per-bucket |L_b|·|R_b| candidate pairs.  Pick
``bucket_width`` near the TYPICAL interval length — too fine explodes
bucket rows, too coarse piles unrelated intervals into one bucket
(the same census trade-off as the shingle index's max_bucket).  A
degenerate interval spanning the whole timeline fans out
timeline/width buckets; clamp such outliers upstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def interval_overlap_join(
    left: DataFrame,
    right: DataFrame,
    left_id: str,
    right_id: str,
    start: str = "s",
    end: str = "e",
    bucket_width: int = 600_000_000,
) -> DataFrame:
    """Pairs of overlapping [start, end] intervals (inclusive bounds,
    integer units — e.g. epoch micros) across two tables, plus the
    exact overlap length.

    Returns (``left_id``, ``right_id``, overlap) where overlap =
    min(ends) - max(starts) >= 0 in the same units.  Equi-join on
    bucket -> dedupe -> exact verify; result-identical to the
    inequality join (tested against it in tests/test_interval.py).
    """
    if bucket_width <= 0:
        raise ValueError("bucket_width must be positive")
    if left_id == right_id:
        raise ValueError("left_id and right_id must differ (output columns)")

    def bucketed(df: DataFrame, id_col: str, tag: str) -> DataFrame:
        b0 = F.floor(F.col(start) / F.lit(bucket_width)).cast("long")
        b1 = F.floor(F.col(end) / F.lit(bucket_width)).cast("long")
        return df.select(
            F.col(id_col).alias(f"{tag}_id"),
            F.col(start).alias(f"{tag}_s"),
            F.col(end).alias(f"{tag}_e"),
            F.explode(F.sequence(b0, b1)).alias("bucket"),
        )

    lb = bucketed(left, left_id, "a")
    rb = bucketed(right, right_id, "b")
    cand = lb.join(rb, "bucket").dropDuplicates(["a_id", "b_id"])
    overlap = F.least("a_e", "b_e") - F.greatest("a_s", "b_s")
    return (
        cand.filter((F.col("a_s") <= F.col("b_e")) & (F.col("b_s") <= F.col("a_e")))
        .select(
            F.col("a_id").alias(left_id),
            F.col("b_id").alias(right_id),
            overlap.alias("overlap"),
        )
    )
