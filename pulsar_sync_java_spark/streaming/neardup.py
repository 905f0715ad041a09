"""Streaming near-duplicate ingestion: each micro-batch of documents is
deduplicated against the ALREADY-ACCEPTED corpus with the asymmetric
banded-LSH join (operators/dedup.py:lsh_pairs_against_corpus), and the
batch's surviving signatures are appended to the corpus index so later
batches dedupe against them — the always-on form of the
`q_incremental_dedup` nightly-delta path.

This is the streaming composition the reference's replication loop
implies for a data pipeline: an unbounded source (R13), a per-batch
set-membership decision against accumulated state (R22's create-once
guard, scaled from exact cursor identity to NEAR-duplicate identity),
and convergent idempotent sinks (R3 conflict tolerance —
`PulsarTenantSyncManager.java:79`).

Dedup rule (deterministic, distributed — no sequential scan):
a batch doc is DROPPED iff it near-duplicates (est_jaccard >= the
threshold) an accepted corpus doc, or ANY batch-mate with a smaller
doc_id — whether or not that batch-mate itself survives.  On a chain
A~B~C (A<B<C, A!~C) this keeps only A: B falls to A and C falls to B
even though B is dropped — the same outcome as q_dedup_keepers'
transitive component-minimum there.  The rules differ on FORKED
chains (2~9, 9~4, 2!~4): this keeps {2, 4} where component-minimum
keeps only {2}, and a sequential first-wins scan would keep a doc
whose smaller near-dups were all themselves dropped (C in the chain
above).  The local rule needs one pair pass instead of a per-batch
connected-components round; the exact drop set is pinned against an
independent pair derivation in tests/test_neardup_stream.py.

Exactly-once discipline: both sinks go through
sinks/writers.py:idempotent_append keyed on doc_id, so a replayed
micro-batch (crash between sink write and checkpoint commit, or a
rebuilt checkpoint) re-derives the same keeper set — the corpus
signatures it appended the first time are now visible, every keeper
key already exists, and the replay is a no-op.

Scale: per batch, the corpus contributes one bucket aggregation over
its signature table (or a pre-materialized bucket index for a standing
corpus); the batch side is delta-sized and broadcastable; batch
signatures are computed once per batch (zero-shuffle Arrow kernel) and
reused for both the corpus probe and the batch self-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from pulsar_sync_java_spark.operators.dedup import (
    lsh_candidate_pairs,
    lsh_pairs_against_corpus,
    minhash_signatures,
)
from pulsar_sync_java_spark.sinks.writers import _sink_exists, idempotent_append


def ingest_batch(
    batch_df: DataFrame,
    corpus_sig_dir: str,
    sink_dir: str,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    bands: int = 16,
) -> int:
    """Process one batch of documents; returns keepers appended.

    Exposed separately from the stream wiring so the decision kernel is
    unit-testable (and usable for one-shot delta ingestion without a
    streaming query).
    """
    spark = batch_df.sparkSession
    sigs = minhash_signatures(
        batch_df, id_col=id_col, text_col=text_col,
        num_hashes=num_hashes, portable=True,
    ).persist()
    try:
        dropped = None
        if _sink_exists(spark, corpus_sig_dir):
            corpus = spark.read.parquet(corpus_sig_dir)
            vs_corpus = (
                lsh_pairs_against_corpus(
                    sigs, corpus, id_col=id_col,
                    bands=bands, num_hashes=num_hashes,
                )
                .filter(F.col("est_jaccard") >= threshold)
                .select(F.col("new_id").alias(id_col))
            )
            dropped = vs_corpus
        within = (
            lsh_candidate_pairs(
                sigs, id_col=id_col, bands=bands, num_hashes=num_hashes
            )
            .filter(F.col("est_jaccard") >= threshold)
            # pair keeps its min-id member: the larger id is dropped
            .select(F.greatest("doc_a", "doc_b").alias(id_col))
        )
        dropped = within if dropped is None else dropped.unionByName(within)
        dropped = dropped.distinct()

        keeper_sigs = sigs.join(dropped, id_col, "left_anti")
        # docs the signature kernel skipped (< n tokens, no shingles)
        # are trivially unique — kept, but never indexed
        keepers = batch_df.join(dropped, id_col, "left_anti")
        n = idempotent_append(keepers, sink_dir, [id_col])
        idempotent_append(keeper_sigs, corpus_sig_dir, [id_col])
        return n
    finally:
        sigs.unpersist()


def neardup_ingest_stream(
    doc_stream: DataFrame,
    corpus_sig_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    **kwargs,
) -> DataStreamWriter:
    """Wire `ingest_batch` into a foreachBatch streaming query."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        ingest_batch(
            batch_df, corpus_sig_dir, sink_dir, threshold=threshold, **kwargs
        )

    return (
        doc_stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


def gated_ingest_batch(
    batch_df: DataFrame,
    weights: DataFrame,
    corpus_sig_dir: str,
    sink_dir: str,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> int:
    """Quality-gated ingestion of one batch (r9 verdict #6): the FROZEN
    classifier (operators/quality.py — the q_classifier_score model,
    trained ONCE on a reference corpus, never on the arriving batch)
    gates the batch first, then the survivors run the near-dup decision
    against the accumulated corpus and append — gate → near-dup →
    append, the streaming twin of the batch corpus-materialization
    composition.

    Order matters twice over: gating first means dropped-quality docs
    never enter the signature index (they must not suppress later
    GOOD near-copies of themselves), and a frozen model means the gate
    is a pure per-row function — so it commutes with micro-batching
    and the stream equals the batch pipeline on the same rows
    (tests/test_neardup_stream.py).  Returns keepers appended."""
    from pulsar_sync_java_spark.operators.quality import classifier_gate

    gated = classifier_gate(batch_df, weights, id_col, text_col)
    return ingest_batch(
        gated, corpus_sig_dir, sink_dir, threshold=threshold,
        id_col=id_col, text_col=text_col, **kwargs,
    )


def gated_ingest_batch_monitored(
    batch_df: DataFrame,
    weights: DataFrame,
    corpus_sig_dir: str,
    sink_dir: str,
    monitor_dir: str,
    batch_id: int,
    threshold: float = 0.5,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> int:
    """`gated_ingest_batch` plus a per-batch HEALTH ROW appended to
    `monitor_dir` — the ingest-observability leg of the r10 OOV
    advice: the gate's drop decisions are now countable per batch
    (total in, `score IS NULL` OOV drops, scored gate drops, near-dup
    survivors appended), so `ingest_drift_alarm` can separate "the
    classifier is rejecting more" from "the corpus stopped being
    tokenizable" — two failures that look identical as a row-count
    dip.

    The classifier runs ONCE (classifier_scores), feeding both the
    gate decision and the counters — not the classifier_gate +
    recount double pass.  The health row is keyed by batch_id through
    `idempotent_append`, so a checkpoint replay is a no-op and the
    FIRST processing's numbers stand (the decision-level counts —
    n_in, n_oov, n_gated — are pure functions of the batch under the
    frozen model; n_appended is sink-state-dependent by nature, which
    is exactly why replays must not rewrite it).  One extra 1-row
    control-plane append per batch; the counters ride the same
    aggregate scan the gate already pays."""
    from pulsar_sync_java_spark.operators.quality import (
        classifier_gate,
        classifier_scores,
    )

    spark = batch_df.sparkSession
    scores = classifier_scores(batch_df, weights, id_col, text_col).persist()
    try:
        n_in = batch_df.count()
        row = scores.agg(
            F.sum(F.when(F.col("score").isNull(), 1).otherwise(0))
            .cast("long")
            .alias("oov"),
            F.sum(F.when(F.col("keep"), 1).otherwise(0))
            .cast("long")
            .alias("gated"),
        ).collect()[0]
        n_oov = int(row["oov"] or 0)
        n_gated = int(row["gated"] or 0)
        # the keep rule lives in classifier_gate (scores= reuses the
        # one scoring pass the counters already paid)
        gated = classifier_gate(
            batch_df, weights, id_col, text_col, scores=scores
        )
        n_appended = ingest_batch(
            gated, corpus_sig_dir, sink_dir, threshold=threshold,
            id_col=id_col, text_col=text_col, **kwargs,
        )
    finally:
        scores.unpersist()
    health = spark.createDataFrame(
        [
            (
                int(batch_id),
                int(n_in),
                n_oov,
                int(n_in) - n_gated,
                n_gated,
                int(n_appended),
            )
        ],
        "batch_id long, n_in long, n_oov long, n_gate_dropped long, "
        "n_gated long, n_appended long",
    )
    idempotent_append(health, monitor_dir, ["batch_id"])
    return n_appended


def ingest_drift_alarm(
    spark,
    monitor_dir: str,
    trailing: int = 8,
    spike_mult: float = 3.0,
    min_batches: int = 3,
    floor: float = 0.05,
) -> DataFrame:
    """Per-batch drift flags over the ingest health table: a batch
    alarms when its OOV rate or gate-drop rate exceeds
    max(floor, spike_mult x the trailing-`trailing`-batch mean) — the
    self-calibrating spike rule the streaming EWMA monitor uses,
    framed over the table so it needs no state and replays
    deterministically.  `min_batches` prior batches are required
    before a flag can fire (no baseline, no alarm), and `floor`
    absorbs tiny-denominator noise (a 0.1% baseline must not page on
    0.4%).

    The health table is control-plane sized (one row per micro-batch),
    so the unpartitioned ordering window is a deliberate single-task
    frame — same class as the staleness report, not a data-path
    window."""
    from pyspark.sql.window import Window

    m = spark.read.parquet(monitor_dir)
    nz = F.greatest(F.col("n_in"), F.lit(1)).cast("double")
    rated = m.select(
        "batch_id",
        "n_in",
        "n_appended",
        (F.col("n_oov").cast("double") / nz).alias("oov_rate"),
        (F.col("n_gate_dropped").cast("double") / nz).alias("drop_rate"),
    )
    w = Window.orderBy("batch_id").rowsBetween(-trailing, -1)
    base_oov = F.avg("oov_rate").over(w)
    base_drop = F.avg("drop_rate").over(w)
    n_prior = F.count(F.lit(1)).over(w)
    thr = lambda b: F.greatest(  # noqa: E731
        F.lit(floor), F.lit(spike_mult) * b
    )
    return rated.select(
        "batch_id",
        "n_in",
        "n_appended",
        "oov_rate",
        "drop_rate",
        base_oov.alias("baseline_oov"),
        base_drop.alias("baseline_drop"),
        (
            (n_prior >= min_batches) & (F.col("oov_rate") > thr(base_oov))
        ).alias("oov_alarm"),
        (
            (n_prior >= min_batches) & (F.col("drop_rate") > thr(base_drop))
        ).alias("drop_alarm"),
    )


def gated_neardup_ingest_stream(
    doc_stream: DataFrame,
    weights_path: str,
    corpus_sig_dir: str,
    sink_dir: str,
    checkpoint_dir: str,
    threshold: float = 0.5,
    compact_every: int = 0,
    compact_target_rows: int = 1 << 20,
    compact_under_rows: int = 1 << 19,
    monitor_dir: str | None = None,
    **kwargs,
) -> DataStreamWriter:
    """Wire `gated_ingest_batch` into a foreachBatch streaming query.
    The weight table is read from `weights_path` (the persisted,
    immutable model artifact) inside each batch — every micro-batch,
    and every restart from the same checkpoint, gates under the
    identical frozen model; retraining is an explicit redeploy to a
    NEW path, never a side effect of ingestion.

    `compact_every` > 0 completes the production pipeline with
    standing sink maintenance: every compact_every-th batch runs one
    `sinks/writers.py:compact_table_files` tick over BOTH landing
    tables — the accepted corpus (keyed/sorted by id) and the
    signature index (same key) — folding trigger-sized append files
    toward compact_target_rows.  Compaction is a pure file-layout
    rewrite (the manifest commit protocol guarantees the row set is
    untouched through crash/replay), so gate/near-dup decisions are
    identical with it on or off, and the batch/stream equivalence
    tests hold under maintenance; it just stops a long-running ingest
    from dissolving its own corpus into millions of micro-batch
    files."""

    def apply(batch_df: DataFrame, batch_id: int) -> None:
        weights = batch_df.sparkSession.read.parquet(weights_path)
        if monitor_dir is not None:
            gated_ingest_batch_monitored(
                batch_df, weights, corpus_sig_dir, sink_dir,
                monitor_dir, batch_id, threshold=threshold, **kwargs,
            )
        else:
            gated_ingest_batch(
                batch_df, weights, corpus_sig_dir, sink_dir,
                threshold=threshold, **kwargs,
            )
        if compact_every and batch_id % compact_every == compact_every - 1:
            from pulsar_sync_java_spark.sinks.writers import (
                compact_table_files,
            )

            id_col = kwargs.get("id_col", "doc_id")
            for table in (sink_dir, corpus_sig_dir):
                compact_table_files(
                    batch_df.sparkSession, table, id_col,
                    compact_target_rows, compact_under_rows,
                )

    return (
        doc_stream.writeStream.foreachBatch(apply)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
