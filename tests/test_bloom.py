"""Bloom-prefilter join pruning (operators/bloom.py): the filter must
admit a SUPERSET of true matches (never drop one), so the composed
semi join is result-identical to the plain join; the probe must stay a
map-side Filter (no extra join in the plan)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pulsar_sync_java_spark.operators.bloom import (
    bloom_build,
    bloom_semi_join,
    might_contain,
)
from tests.conftest import SF_DIR


def test_bloom_semi_join_equals_plain_semi_join(spark):
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    got = bloom_semi_join(li, o, "l_orderkey", "o_orderkey")
    want = li.join(o, li.l_orderkey == o.o_orderkey, "left_semi")
    assert got.count() == want.count()
    assert (
        got.select("l_orderkey", "l_linenumber")
        .exceptAll(want.select("l_orderkey", "l_linenumber"))
        .count()
        == 0
    )


def test_bloom_has_no_false_negatives_and_bounded_false_positives(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select("o_orderkey")
    member = o.filter(F.col("o_orderkey") % 3 == 0)
    words = bloom_build(member, "o_orderkey")
    probed = o.filter(might_contain("o_orderkey", words))
    n_member = member.count()
    n_probed = probed.count()
    # superset: every true member passes
    assert probed.join(member, "o_orderkey", "left_semi").count() == n_member
    assert n_probed >= n_member
    # the default (max-size) filter keeps false positives sub-percent;
    # 20% is the generous ceiling that still proves pruning works
    n_total = o.count()
    fp = (n_probed - n_member) / max(n_total - n_member, 1)
    assert fp < 0.20, f"false-positive rate {fp:.3f} out of bounds"


def test_bloom_empty_build_side_rejects_everything(spark):
    o = spark.read.parquet(f"{SF_DIR}/orders.parquet").select("o_orderkey")
    empty = o.filter(F.lit(False))
    words = bloom_build(empty, "o_orderkey")
    assert all(w == 0 for w in words)
    assert o.filter(might_contain("o_orderkey", words)).count() == 0
    assert bloom_semi_join(o, empty, "o_orderkey", "o_orderkey").count() == 0


def test_bloom_build_validates_num_bits(spark):
    o = spark.range(1)
    with pytest.raises(ValueError):
        bloom_build(o, "id", num_bits=100)  # not a power of two


def test_bloom_probe_is_filter_not_join(spark):
    """The probe side must contribute zero joins/shuffles: the composed
    plan has exactly ONE join (the exact semi join) and the bloom check
    appears as a Filter condition, not an operator."""
    li = spark.read.parquet(f"{SF_DIR}/lineitem.parquet")
    o = (
        spark.read.parquet(f"{SF_DIR}/orders.parquet")
        .filter(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    plan = (
        bloom_semi_join(li, o, "l_orderkey", "o_orderkey")
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    assert plan.count("Join") == plan.count("BroadcastHashJoin") + plan.count(
        "SortMergeJoin"
    ) + plan.count("ShuffledHashJoin")
    n_joins = (
        plan.count("BroadcastHashJoin")
        + plan.count("SortMergeJoin")
        + plan.count("ShuffledHashJoin")
    )
    assert n_joins == 1, plan
    assert "shiftleft" in plan  # the inlined bit test rides in a Filter


def test_bloom_auto_sizing_tracks_build_cardinality(spark):
    from pulsar_sync_java_spark.operators.bloom import (
        MAX_NUM_BITS,
        sized_num_bits,
    )

    assert sized_num_bits(0) == 1024
    assert sized_num_bits(7_500) == 1 << 17       # ~16 bits/key, pow2
    assert sized_num_bits(30_000) == 1 << 19
    assert sized_num_bits(10**9) == MAX_NUM_BITS  # capped
    from pulsar_sync_java_spark.operators.bloom import MAX_NUM_BITS as _M

    o = spark.range(30_000).select(F.col("id").alias("k"))
    words = bloom_build(o, "k", num_bits=None)  # default: ceiling, no count job
    assert len(words) * 8 == _M  # bytes -> bits
    # fp at the auto size stays ~1e-3, not the sf-rotted tens of percent
    probe = spark.range(30_000, 300_000).select(F.col("id").alias("k"))
    fp = probe.filter(might_contain("k", words)).count() / 270_000
    assert fp < 0.01, fp
