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
primitives instead.

Design — a BLOCKED bloom filter (Putze/Sanders' cache-efficient
variant) carried as ONE binary literal:

- h1 picks one 32-bit block per key; h2's 5-bit chunks pick the k bit
  positions WITHIN that block.  The probe is a single constant-time
  lookup (substring of the binary constant -> hex -> conv) + one mask
  compare; the build needs no explode — each key contributes one
  (block, mask) row straight into the ``bit_or`` aggregate.
- Why one binary scalar and not an array literal, measured on this
  repo: ``F.lit(list)`` builds CreateArray with a child node per
  element and every optimizer pass re-walks the 16k-node tree (3-5 s
  of DRIVER planning per query); ``F.lit(ndarray)`` is a single node
  but py4j marshals the 16k elements one-by-one (~3 s per Column
  CREATION).  A bytes literal crosses py4j as one java byte[] (ms) and
  is a single plan node.
- Cost of blocking: ~2-4x the classic k-independent-positions fp rate
  at equal m (bits cluster in one word).  The default sizing
  overshoots to compensate.

Scale contract:
- The filter build is ONE aggregation job over the small side whose
  output is bounded by construction — ``num_bits/32`` rows (words) —
  independent of data volume, so the driver-side collect is safe (same
  bound discipline as the control-plane collects in engine.py).
- The probe is a pure map-side Filter: zero shuffle, zero extra scan
  of the big side.  Only rows passing the bloom (true matches + a
  sub-percent false-positive sliver at default sizing) reach the exact
  join's shuffle, so shuffled bytes shrink by the join's selectivity.
- The bloom NEVER changes results: it admits a superset of matching
  rows (no false negatives — every true key's bits are all set), and
  the exact semi join downstream removes the false positives.  The
  equivalence is property-tested in tests/test_bloom.py.
"""

from __future__ import annotations

import struct

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

DEFAULT_NUM_HASHES = 5     # <= 12 (5-bit chunks of one 64-bit h2)
BITS_PER_KEY = 16          # explicit-sizing target (blocked fp penalty)
MAX_NUM_BITS = 1 << 20     # filter-literal ceiling (128 KB of plan)


def sized_num_bits(n_keys: int) -> int:
    """Power-of-two filter size for ~BITS_PER_KEY bits per key, capped
    at the filter-literal ceiling.  Past the cap (~65k keys) the fp
    rate degrades gracefully; a build side that big is usually better
    served by a broadcast hash join or a bucketed layout anyway."""
    target = max(BITS_PER_KEY * max(n_keys, 1), 1024)
    return min(1 << (target - 1).bit_length(), MAX_NUM_BITS)


def _block(key: Column, num_words: int) -> Column:
    """Which 32-bit block a key's bits live in: h1 mod blocks (pmod
    keeps it non-negative)."""
    return F.pmod(F.xxhash64(key), F.lit(num_words))


def _block_mask(key: Column, num_hashes: int) -> Column:
    """The key's k-bit mask WITHIN its block: k 5-bit chunks of an
    independent second hash pick bit positions in [0, 32), OR-ed into
    one long.  Dynamic shifts go through call_function (the PySpark
    ``shiftleft`` wrapper only takes a literal shift amount)."""
    h2 = F.xxhash64(F.lit(-1), key)
    mask = F.lit(0).cast("long")
    for i in range(num_hashes):
        j = F.shiftright(h2, 5 * i).bitwiseAND(F.lit(31)).cast("int")
        mask = mask.bitwiseOR(
            F.call_function("shiftleft", F.lit(1).cast("long"), j)
        )
    return mask


def bloom_build(
    df: DataFrame,
    key: Column | str,
    num_bits: int | None = None,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> bytes:
    """Build the filter: returns the dense bit-set as bytes (4 bytes
    per 32-bit block, big-endian); the probe recovers the size from the
    length, so a probe can never disagree with its build about m.

    ``num_bits=None`` uses MAX_NUM_BITS outright: a filter hand-sized
    for one scale factor quietly rots at the next — measured at sf0.1,
    an sf0.01-sized filter passed 67% of the big side instead of ~20%
    true matches — and pre-counting the build side to size precisely
    costs an extra Spark job per query.  At the 128 KB ceiling the fp
    rate only improves, the ``bit_or`` shuffle grows to a still-trivial
    32k groups, and the sizing pass disappears; callers with many
    filters in flight can pass ``sized_num_bits(n)`` explicitly to
    trade fp for memory.

    One partial+final ``bit_or`` aggregate: each key contributes ONE
    (block, mask) row — no explode — and the shuffle carries at most
    num_bits/32 groups regardless of input size.
    """
    if num_bits is None:
        num_bits = MAX_NUM_BITS
    if num_bits < 32 or num_bits & (num_bits - 1):
        raise ValueError("num_bits must be a power of two >= 32")
    if not 1 <= num_hashes <= 12:
        raise ValueError("num_hashes must be in [1, 12] (5-bit chunks)")
    k = F.col(key) if isinstance(key, str) else key
    num_words = num_bits // 32
    pairs = df.select(
        _block(k, num_words).cast("int").alias("w"),
        _block_mask(k, num_hashes).alias("m"),
    )
    rows = pairs.groupBy("w").agg(F.expr("bit_or(m)").alias("word")).collect()
    words = [0] * num_words
    for r in rows:
        words[r["w"]] = r["word"]
    return struct.pack(f">{num_words}I", *words)


def might_contain(
    key: Column | str,
    filter_bytes: bytes,
    num_hashes: int = DEFAULT_NUM_HASHES,
) -> Column:
    """Membership predicate against a built filter: the key's whole
    mask present in its block — ``word & mask == mask``.

    The filter rides along as ONE binary literal; the block lookup is
    ``substring`` (constant-time slice of the constant) -> ``hex`` ->
    ``conv`` -> long.  Values stay below 2^32, so the long cast is
    ANSI-safe.
    """
    num_words = len(filter_bytes) // 4
    if num_words == 0 or num_words & (num_words - 1):
        raise ValueError("filter length must be a power of two >= 4 bytes")
    k = F.col(key) if isinstance(key, str) else key
    blob = F.lit(bytearray(filter_bytes))
    # call_function("substring", ...) takes a COLUMN start offset (the
    # F.substring wrapper historically wanted literals)
    start = _block(k, num_words).cast("int") * 4 + 1
    word = F.conv(
        F.hex(F.call_function("substring", blob, start, F.lit(4))), 16, 10
    ).cast("long")
    mask = _block_mask(k, num_hashes)
    return word.bitwiseAND(mask) == mask


def bloom_semi_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    num_bits: int | None = None,
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
    pre = left.filter(might_contain(left_key, words, num_hashes))
    # private alias keeps the condition unambiguous even when left and
    # right share lineage (self-join) or column names
    keys = right.select(F.col(right_key).alias("__bloom_rk"))
    return pre.join(keys, pre[left_key] == keys["__bloom_rk"], "left_semi")
