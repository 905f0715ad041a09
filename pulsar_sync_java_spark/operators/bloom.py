"""Bloom-filter join pruning: broadcast a compact bit-set of the small
side's join keys and drop non-matching big-side rows MAP-SIDE, before
any shuffle.

This is the planning-time form of what Spark's runtime row-level
filtering (``spark.sql.optimizer.runtime.bloomFilter.enabled``) injects
automatically for some shuffle joins — expressed explicitly so it (a)
also applies when the exact join is an aggregation-fused semi join the
injector skips, and (b) is portable to any sink-side prefilter (e.g.
pruning a 100 TB scan against a catalog diff, the reference's
work-discovery shape: only topics present in the source catalog need
their message partitions read at all —
`PulsarPartitionTopicSyncManager.java:93-104` lists topics first and
only then spawns per-partition workers).

Why not ``bloom_filter_agg``: Spark ships that aggregate for its
internal runtime filter but does not register it for user queries
(UNRESOLVED_ROUTINE in 4.x), so the filter is built from public
primitives instead: k positions per key via seeded ``xxhash64``, OR-ed
into a fixed array of 64-bit words with a ``bit_or`` aggregate.

Scale contract:
- The filter build is ONE aggregation job over the small side whose
  output is bounded by construction — ``num_bits/64`` rows (words) —
  independent of data volume, so the driver-side collect is safe (same
  bound discipline as the control-plane collects in engine.py).
- The probe is a pure map-side Filter of literal-array bit tests: zero
  shuffle, zero extra scan of the big side, whole-stage-codegen'd.
  Only rows passing the bloom (true matches + ~1% false positives at
  the default sizing) reach the exact join's shuffle, so shuffled bytes
  shrink by the join's selectivity.
- The bloom NEVER changes results: it admits a superset of matching
  rows (no false negatives — every true key's bits are all set), and
  the exact semi join downstream removes the false positives.  The
  equivalence is property-tested in tests/test_bloom.py.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_BITS = 1 << 16
DEFAULT_NUM_HASHES = 5


def _positions(key: Column, num_bits: int, num_hashes: int) -> list[Column]:
    """The k bit positions of a key: xxhash64 seeded by hashing the
    seed ordinal as a leading tuple element (xxhash64's native seed is
    not column-exposed), reduced mod num_bits.  pmod keeps positions
    non-negative."""
    return [
        F.pmod(F.xxhash64(F.lit(i), key), F.lit(num_bits))
        for i in range(num_hashes)
    ]


def _mask(pos: Column) -> Column:
    """1L << (pos % 64) — dynamic shift via call_function (the PySpark
    ``shiftleft`` wrapper only takes a literal shift amount)."""
    return F.call_function(
        "shiftleft", F.lit(1).cast("long"), (pos % 64).cast("int")
    )


def bloom_build(
    df: DataFrame,
    key: Column | str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> list[int]:
    """Build the filter: returns the dense word list (len num_bits/64).

    One partial+final ``bit_or`` aggregate: each row contributes k
    (word_index, mask) pairs; the shuffle carries at most num_bits/64
    groups regardless of input size.
    """
    if num_bits < 64 or num_bits & (num_bits - 1):
        raise ValueError("num_bits must be a power of two >= 64")
    k = F.col(key) if isinstance(key, str) else key
    pairs = df.select(
        F.explode(F.array(*_positions(k, num_bits, num_hashes))).alias("pos")
    ).select(
        F.shiftright("pos", 6).cast("int").alias("w"),
        _mask(F.col("pos")).alias("m"),
    )
    rows = pairs.groupBy("w").agg(F.expr("bit_or(m)").alias("word")).collect()
    words = [0] * (num_bits // 64)
    for r in rows:
        words[r["w"]] = r["word"]
    return words


def might_contain(
    key: Column | str,
    words: list[int],
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> Column:
    """Membership predicate against a built filter: all k bits set.

    The words ride along as ONE array literal (num_bits/64 longs) inside
    the task binary — no join, no broadcast variable plumbing — so the
    predicate evaluates entirely inside the scan stage's codegen.
    """
    k = F.col(key) if isinstance(key, str) else key
    arr = F.lit(words)
    checks = [
        F.element_at(arr, F.shiftright(pos, 6).cast("int") + 1)
        .bitwiseAND(_mask(pos))
        != 0
        for pos in _positions(k, num_bits, num_hashes)
    ]
    out = checks[0]
    for c in checks[1:]:
        out = out & c
    return out


def bloom_semi_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    num_bits: int = DEFAULT_NUM_BITS,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> DataFrame:
    """Semi join with a bloom prefilter on the left (big) side.

    Result-identical to ``left.join(right, left_semi)``: the bloom
    admits a superset (false positives only), and the exact semi join
    removes them.  What changes is the physical shape — the big side is
    filtered in its scan stage, so the exact join shuffles (or hashes)
    only the surviving sliver.
    """
    words = bloom_build(right, right_key, num_bits, num_hashes)
    pre = left.filter(might_contain(left_key, words, num_bits, num_hashes))
    # private alias keeps the condition unambiguous even when left and
    # right share lineage (self-join) or column names
    keys = right.select(F.col(right_key).alias("__bloom_rk"))
    return pre.join(keys, pre[left_key] == keys["__bloom_rk"], "left_semi")
