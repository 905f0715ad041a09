"""Shared operator plumbing."""

from __future__ import annotations

from pyspark.sql import DataFrame


def spread(df: DataFrame) -> DataFrame:
    """Round-robin repartition to the cluster's default parallelism,
    for CPU-bound per-row projections (sketch signatures, fingerprints,
    Python codec batches).

    Why this exists: Spark's scan parallelism comes from input splits.
    A small parquet file (or one with a single row group) is ONE split,
    so an expensive projection downstream runs in one task no matter
    how many cores exist — measured 32x under-parallelism on the local
    test tables.  On a 1000-executor cluster reading 100 TB the scan
    has plenty of splits and this exchange is ~free relative to the
    projection it feeds (raw rows cross the wire once, before any
    explode amplification).  It also acts as a materialization barrier:
    ReuseExchange shares the shuffled result across the multiple
    subtree copies a self-join DAG creates, instead of recomputing the
    projection per branch.
    """
    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism)


def spread_by(df: DataFrame, *cols: str) -> DataFrame:
    """Hash repartition on `cols` with an EXPLICIT partition count.

    `repartition(col)` without a count is a REPARTITION_BY_COL shuffle,
    which AQE freely coalesces by size — on small inputs it collapses
    to ONE partition and serializes every downstream stage (measured:
    the whole self-join pipeline ran single-task).  An explicit count
    (REPARTITION_BY_NUM) is exempt from coalescing, so the barrier
    keeps both its ReuseExchange role and its parallelism."""
    from pyspark.sql import functions as F

    sc = df.sparkSession.sparkContext
    return df.repartition(sc.defaultParallelism, *[F.col(c) for c in cols])
