"""Stream-side dimension enrichment with PER-MICRO-BATCH dim refresh.

The reference's control plane continuously re-reads catalog state
(policies fetched fresh on every namespace pass,
`PulsarNamespaceSyncManager.java:74-78`) while its data plane runs —
the Spark analogue is a stream ⋈ slowly-changing-dimension join where
the dimension must be RE-READ as it changes, not frozen at plan time.

A plain `stream.join(spark.read.parquet(dim))` freezes the dim's FILE
LISTING when the query starts: Spark's stream-static join re-executes
the static subplan per micro-batch, but against the snapshot of files
resolved at planning, so a dimension overwritten mid-stream keeps
enriching with stale rows (and a vanished file fails the task).  The
production pattern is `foreachBatch`: each micro-batch re-reads the
dimension path — fresh listing, fresh footers — broadcast-joins it
onto the batch, and appends through the keyed idempotent sink so
checkpoint replays stay exactly-once.

STALENESS, not atomicity (r8 ADVICE): the per-batch re-read bounds
staleness to one micro-batch, but a plain `mode('overwrite')` parquet
rewrite is NOT atomic — an overwrite landing between a batch's file
listing and the join's execution can still hit vanished part files and
fail that task (Spark retries the batch; exactly-once holds via the
keyed sink, but the failure is real).  Publishers of `dim_path` should
use a versioned-directory swap — write `dim_v{N+1}` completely, then
flip a small pointer (symlink / manifest file / table-format commit) —
so every listing resolves an immutable directory; or use an ACID table
format, which is exactly this protocol productized.

Scale posture: the dim is re-read once per micro-batch (a metadata
listing + pruned column scan of a broadcast-sized table — the same
cadence cost the reference pays calling the admin API per tick, R25);
the join itself is a BroadcastHashJoin, so the stream side never
shuffles.  A dimension too big to broadcast belongs on the other side
of this trade: pre-partition both sides and accept the shuffle, or
push the enrichment into the sink table with a MERGE (operators/
merge.py).  Equivalence + mid-stream-refresh + restart tests:
tests/test_enrich.py.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter


def enrich_stream(
    stream: DataFrame,
    dim_path: str,
    on: str,
    sink_dir: str,
    checkpoint_dir: str,
    keys: list[str],
    how: str = "left",
) -> DataStreamWriter:
    """Enrich a stream against the parquet dimension at `dim_path`,
    re-reading the dimension at every micro-batch so dim updates take
    effect mid-stream.  `on` is the equi-key; `keys` is the row
    identity for the exactly-once sink (sinks/writers.py:
    idempotent_append).  `how='left'` keeps unmatched stream rows with
    null dim columns (an enrichment must never DROP facts because the
    dim row hasn't arrived yet — the additive-only discipline)."""
    from pulsar_sync_java_spark.sinks.writers import idempotent_append

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        dim = spark.read.parquet(dim_path)
        enriched = batch_df.join(F.broadcast(dim), on, how)
        idempotent_append(enriched, sink_dir, keys)

    return (
        stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
