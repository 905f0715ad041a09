"""Interval-overlap join (operators/interval.py): the bucketed rewrite
must equal the plain inequality join exactly, and must never plan a
nested loop."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pulsar_sync_java_spark.operators.interval import interval_overlap_join


def _pairs(df):
    return {(r[0], r[1], r[2]) for r in df.collect()}


def test_overlap_join_equals_inequality_join(spark):
    rows_a = [(i, i * 7 % 50, i * 7 % 50 + i % 13) for i in range(120)]
    rows_b = [(i, i * 11 % 60, i * 11 % 60 + i % 7) for i in range(90)]
    a = spark.createDataFrame(rows_a, "aid long, s long, e long")
    b = spark.createDataFrame(rows_b, "bid long, s long, e long")
    got = _pairs(interval_overlap_join(a, b, "aid", "bid", bucket_width=8))
    bb = b.select(F.col("bid"), F.col("s").alias("s2"), F.col("e").alias("e2"))
    want = _pairs(
        a.join(bb, (F.col("s") <= F.col("e2")) & (F.col("s2") <= F.col("e")))
        .select(
            "aid",
            "bid",
            (F.least("e", "e2") - F.greatest("s", "s2")).alias("overlap"),
        )
    )
    assert got == want and want  # equal and non-vacuous


def test_overlap_join_handles_boundary_touch_and_disjoint(spark):
    a = spark.createDataFrame([(1, 0, 10)], "aid long, s long, e long")
    b = spark.createDataFrame(
        [(1, 10, 20), (2, 11, 20), (3, 5, 7)], "bid long, s long, e long"
    )
    got = _pairs(interval_overlap_join(a, b, "aid", "bid", bucket_width=4))
    # touching endpoints overlap (inclusive bounds), disjoint do not
    assert got == {(1, 1, 0), (1, 3, 2)}


def test_overlap_join_is_equi_join_not_nested_loop(spark):
    a = spark.createDataFrame([(1, 0, 10)], "aid long, s long, e long")
    b = spark.createDataFrame([(1, 5, 15)], "bid long, s long, e long")
    plan = (
        interval_overlap_join(a, b, "aid", "bid", bucket_width=4)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert "NestedLoop" not in plan and "CartesianProduct" not in plan


def test_overlap_join_validates_args(spark):
    a = spark.createDataFrame([(1, 0, 1)], "x long, s long, e long")
    with pytest.raises(ValueError):
        interval_overlap_join(a, a, "x", "x")
    with pytest.raises(ValueError):
        interval_overlap_join(a, a, "x", "y", bucket_width=0)
