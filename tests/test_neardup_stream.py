"""Streaming near-duplicate ingestion (streaming/neardup.py): batch
docs dedupe against the accumulated corpus index, keepers extend the
index for later batches, and replays are no-ops (SURVEY.md §5 test
plan #3 spirit — observable convergence on the sinks)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pulsar_sync_java_spark.sources.tables import load_table
from pulsar_sync_java_spark.streaming.neardup import (
    ingest_batch,
    neardup_ingest_stream,
)
from tests.conftest import SF_DIR


@pytest.fixture()
def doc_batches(spark):
    """Two batches with planted cross-batch and within-batch dups:
    batch 1 = even doc_ids; batch 2 = odd doc_ids PLUS near-copies of
    two batch-1 docs and a within-batch near-pair."""
    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    b1 = docs.filter(F.col("doc_id") % 2 == 0)
    src = {
        r["doc_id"]: r["text"]
        for r in docs.filter(F.col("doc_id").isin([0, 2])).collect()
    }
    extra = spark.createDataFrame(
        [
            (100001, src[0] + " trailing token"),   # near-dup of kept doc 0
            (100003, src[2] + " another tail"),     # near-dup of kept doc 2
            (100005, "zq yx wv ut sr qp on ml kj ih gf ed"),
            (100007, "zq yx wv ut sr qp on ml kj ih gf ed extra"),  # ~ 100005
        ],
        "doc_id long, text string",
    )
    b2 = docs.filter(F.col("doc_id") % 2 == 1).unionByName(extra)
    return b1, b2


def test_ingest_batches_drop_cross_and_within_batch_dups(
    spark, tmp_path, doc_batches
):
    b1, b2 = doc_batches
    sig_dir = str(tmp_path / "sigs")
    sink = str(tmp_path / "corpus")

    n1 = ingest_batch(b1, sig_dir, sink)
    kept1 = {r["doc_id"] for r in spark.read.parquet(sink).collect()}
    assert n1 == len(kept1)
    assert {0, 2} <= kept1

    ingest_batch(b2, sig_dir, sink)
    kept = {r["doc_id"] for r in spark.read.parquet(sink).collect()}
    # cross-batch dups of accepted docs are dropped
    assert 100001 not in kept and 100003 not in kept
    # within-batch pair keeps its min id
    assert 100005 in kept and 100007 not in kept
    # no accepted doc is ever retracted
    assert kept1 <= kept


@pytest.mark.slow
def test_ingest_batch_replay_is_noop(spark, tmp_path, doc_batches):
    b1, b2 = doc_batches
    sig_dir = str(tmp_path / "sigs")
    sink = str(tmp_path / "corpus")
    ingest_batch(b1, sig_dir, sink)
    ingest_batch(b2, sig_dir, sink)
    kept = sorted(r["doc_id"] for r in spark.read.parquet(sink).collect())
    n_sigs = spark.read.parquet(sig_dir).count()
    # replay the second batch wholesale (rebuilt checkpoint scenario)
    n = ingest_batch(b2, sig_dir, sink)
    assert n == 0
    assert sorted(r["doc_id"] for r in spark.read.parquet(sink).collect()) == kept
    assert spark.read.parquet(sig_dir).count() == n_sigs


def test_neardup_stream_matches_batch_kernel(spark, tmp_path, doc_batches):
    """The wired streaming query applies the same kernel per
    micro-batch: one file-source batch through the stream equals one
    ingest_batch call on the same rows."""
    b1, _ = doc_batches
    src = str(tmp_path / "src")
    b1.repartition(1).write.parquet(src)
    stream = spark.readStream.schema("doc_id long, text string").parquet(src)
    sig_dir = str(tmp_path / "sigs_s")
    sink = str(tmp_path / "corpus_s")
    q = (
        neardup_ingest_stream(
            stream, sig_dir, sink, checkpoint_dir=str(tmp_path / "ckpt")
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    sig_dir_b = str(tmp_path / "sigs_b")
    sink_b = str(tmp_path / "corpus_b")
    ingest_batch(b1, sig_dir_b, sink_b)
    got = sorted(r["doc_id"] for r in spark.read.parquet(sink).collect())
    want = sorted(r["doc_id"] for r in spark.read.parquet(sink_b).collect())
    assert got == want


def test_ingest_batch_drop_rule_matches_pair_derivation(spark, tmp_path):
    """Pins the documented within-batch rule — a doc is dropped iff it
    pairs (est >= threshold) with ANY smaller-id batch-mate, kept or
    dropped — by deriving the expected keeper set independently from
    the same deterministic sketch pairs and comparing exactly."""
    from pulsar_sync_java_spark.operators.dedup import (
        lsh_candidate_pairs,
        minhash_signatures,
    )

    docs = load_table(spark, SF_DIR, "documents").select("doc_id", "text")
    sigs = minhash_signatures(docs, num_hashes=64, portable=True)
    pairs = [
        (r["doc_a"], r["doc_b"])
        for r in lsh_candidate_pairs(sigs)
        .filter(F.col("est_jaccard") >= 0.5)
        .collect()
    ]
    assert pairs, "no within-batch pairs — fixture vacuous"
    dropped = {max(a, b) for a, b in pairs}
    all_ids = {r["doc_id"] for r in docs.select("doc_id").collect()}

    sink = str(tmp_path / "corpus")
    ingest_batch(docs, str(tmp_path / "sigs"), sink, threshold=0.5)
    kept = {r["doc_id"] for r in spark.read.parquet(sink).collect()}
    assert kept == all_ids - dropped


@pytest.mark.slow
def test_gated_stream_matches_batch_composition_across_restart(
    spark, tmp_path, doc_batches
):
    """The quality-gated ingest twin (r9 verdict #6): a checkpointed
    stream that gates each micro-batch with the FROZEN classifier and
    near-dups the survivors must equal the batch composition
    (classifier_gate -> sequential ingest_batch) on the same rows —
    including across a stop/restart between the two batches, the
    failure point where a drifting model or a re-derived keeper set
    would diverge."""
    from pulsar_sync_java_spark.operators.quality import (
        classifier_gate,
        classifier_weights,
    )
    from pulsar_sync_java_spark.streaming.neardup import (
        gated_ingest_batch,
        gated_neardup_ingest_stream,
    )

    b1, b2 = doc_batches
    # the frozen model: trained once on the reference corpus, persisted
    ref = load_table(spark, SF_DIR, "documents")
    weights_path = str(tmp_path / "weights")
    classifier_weights(ref).write.parquet(weights_path)
    weights = spark.read.parquet(weights_path)

    # the gate must actually cut something, or the test is vacuous
    n_b1 = b1.count()
    n_gated = classifier_gate(b1, weights).count()
    assert 0 < n_gated < n_b1

    # streaming side: batch 1, stop, RESTART from checkpoint, batch 2
    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sig_s = str(tmp_path / "sigs_s")
    sink_s = str(tmp_path / "corpus_s")
    stream_df = lambda: spark.readStream.schema(  # noqa: E731
        "doc_id long, text string"
    ).parquet(src)
    b1.repartition(1).write.mode("append").parquet(src)
    q = (
        gated_neardup_ingest_stream(
            stream_df(), weights_path, sig_s, sink_s, checkpoint_dir=ckpt
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    b2.repartition(1).write.mode("append").parquet(src)
    q = (
        gated_neardup_ingest_stream(
            stream_df(), weights_path, sig_s, sink_s, checkpoint_dir=ckpt
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)

    # batch side: same frozen weights, same batch order
    sig_b = str(tmp_path / "sigs_b")
    sink_b = str(tmp_path / "corpus_b")
    gated_ingest_batch(b1, weights, sig_b, sink_b)
    gated_ingest_batch(b2, weights, sig_b, sink_b)

    got = sorted(r["doc_id"] for r in spark.read.parquet(sink_s).collect())
    want = sorted(r["doc_id"] for r in spark.read.parquet(sink_b).collect())
    assert got == want and got
    # every accepted doc passed the gate
    gated_all = {
        r["doc_id"]
        for r in classifier_gate(b1.unionByName(b2), weights)
        .select("doc_id")
        .collect()
    }
    assert set(got) <= gated_all


def test_gated_stream_with_maintenance_same_rows_fewer_files(
    spark, tmp_path, doc_batches
):
    """The full production pipeline in one checkpointed stream (r11):
    gate -> near-dup -> append -> periodic compaction.  Maintenance is
    a pure layout rewrite, so the accepted row set must be IDENTICAL
    to the unmaintained stream across a restart, while the corpus and
    signature sinks converge to compacted files instead of one file
    per micro-batch."""
    import glob
    import os

    from pulsar_sync_java_spark.operators.quality import classifier_weights
    from pulsar_sync_java_spark.streaming.neardup import (
        gated_neardup_ingest_stream,
    )

    b1, b2 = doc_batches
    ref = load_table(spark, SF_DIR, "documents")
    weights_path = str(tmp_path / "weights")
    classifier_weights(ref).write.parquet(weights_path)

    def run(tag: str, compact_every: int):
        src = str(tmp_path / f"src_{tag}")
        ckpt = str(tmp_path / f"ckpt_{tag}")
        sigs = str(tmp_path / f"sigs_{tag}")
        sink = str(tmp_path / f"corpus_{tag}")
        stream_df = lambda: spark.readStream.schema(  # noqa: E731
            "doc_id long, text string"
        ).parquet(src)
        for b in (b1, b2):
            b.repartition(4).write.mode("append").parquet(src)
            q = (
                gated_neardup_ingest_stream(
                    stream_df(), weights_path, sigs, sink,
                    checkpoint_dir=ckpt,
                    compact_every=compact_every,
                    compact_target_rows=4096,
                    compact_under_rows=4096,
                )
                .trigger(availableNow=True)
                .start()
            )
            q.awaitTermination(120)
        return sink, sigs

    sink_plain, _ = run("plain", 0)
    sink_maint, sigs_maint = run("maint", 1)

    got = sorted(r["doc_id"] for r in spark.read.parquet(sink_maint).collect())
    want = sorted(r["doc_id"] for r in spark.read.parquet(sink_plain).collect())
    assert got == want and got

    def files(p):
        return [
            f
            for f in glob.glob(os.path.join(p, "*.parquet"))
            if os.path.basename(f) != "_SUCCESS"
        ]

    # both sinks folded to compacted files (4 writer tasks x 2 batches
    # would otherwise leave ~8 files each)
    for p in (sink_maint, sigs_maint):
        fl = files(p)
        assert len(fl) <= 2, fl
        assert any("compacted-" in f for f in fl), fl


def test_monitored_gate_health_table_and_drift_alarm(
    spark, tmp_path, doc_batches
):
    """Ingest observability end to end: the monitored gated stream
    writes one health row per micro-batch (in / OOV / gate-dropped /
    gated / appended) whose decision counters PARTITION the batch,
    steady same-distribution batches raise no alarm, and an injected
    OOV burst (documents in an unseen vocabulary — encoding glitch /
    new language) trips the OOV alarm and ONLY the OOV alarm on
    exactly that batch — gate drops count scored rejections only
    (r11 advice), so a pure OOV event no longer double-fires the
    drop alarm.  A checkpoint-wipe replay
    re-processes every batch but the keyed health append is
    first-write-wins, so the table is unchanged — monitoring never
    double-counts."""
    from pulsar_sync_java_spark.operators.quality import classifier_weights
    from pulsar_sync_java_spark.streaming.neardup import (
        gated_neardup_ingest_stream,
        ingest_drift_alarm,
    )

    b1, b2 = doc_batches
    ref = load_table(spark, SF_DIR, "documents")
    weights_path = str(tmp_path / "weights")
    classifier_weights(ref).write.parquet(weights_path)

    src = str(tmp_path / "src")
    ckpt = str(tmp_path / "ckpt")
    sigs = str(tmp_path / "sigs")
    sink = str(tmp_path / "corpus")
    monitor = str(tmp_path / "health")
    # 4 steady batches sliced from the same distribution, then the
    # garbage burst as batch 5 (maxFilesPerTrigger=1 -> one batch per
    # file, in landing order)
    for i in range(4):
        # b1 holds the EVEN doc_ids, so slice on doc_id % 8 == 2i to
        # get four non-empty same-distribution batches
        b1.filter((F.col("doc_id") % 8) == 2 * i).repartition(1).write.mode(
            "append"
        ).parquet(src)
    garbage = spark.createDataFrame(
        [(900_000 + i, f"zzqq{i} xxyy{i} wwvv{i} uutt{i}") for i in range(30)],
        "doc_id long, text string",
    )
    garbage.repartition(1).write.mode("append").parquet(src)

    def run(ck):
        q = (
            gated_neardup_ingest_stream(
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(src),
                weights_path, sigs, sink, checkpoint_dir=ck,
                monitor_dir=monitor,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        exc = q.exception()
        if exc is not None:
            raise exc

    run(ckpt)
    health = {
        r["batch_id"]: r for r in spark.read.parquet(monitor).collect()
    }
    assert sorted(health) == [0, 1, 2, 3, 4]
    for b, r in health.items():
        assert r["n_in"] > 0
        # the decision counters partition the batch
        assert r["n_oov"] + r["n_gate_dropped"] + r["n_gated"] == r["n_in"]
        assert r["n_gate_dropped"] >= 0
        assert r["n_appended"] <= r["n_gated"]
        # per-stage timing columns (r12 verdict #6): the stages that
        # ran carry positive wall seconds; no ticks are scheduled in
        # this stream so sec_tick is exactly 0
        assert r["sec_gate"] > 0 and r["sec_neardup"] > 0
        assert r["sec_append"] > 0
        assert r["sec_tick"] == 0.0
    # the garbage batch: every doc OOV, nothing survives the gate,
    # and ZERO scored rejections — OOV is not a gate drop
    g = health[4]
    assert g["n_oov"] == 30 and g["n_gated"] == 0 and g["n_appended"] == 0
    assert g["n_gate_dropped"] == 0

    alarms = {
        r["batch_id"]: r
        for r in ingest_drift_alarm(spark, monitor, min_batches=3).collect()
    }
    assert alarms[4]["oov_alarm"] and not alarms[4]["drop_alarm"]
    for b in (0, 1, 2, 3):
        assert not alarms[b]["oov_alarm"], alarms[b]
    # batches 0-2 have fewer than min_batches priors: never alarmed
    assert not alarms[0]["drop_alarm"] and not alarms[1]["drop_alarm"]

    # checkpoint-wipe replay: same source, fresh checkpoint — the
    # keyed health rows are first-write-wins, the table is unchanged
    import shutil

    shutil.rmtree(ckpt)
    run(str(tmp_path / "ckpt2"))
    again = {
        r["batch_id"]: r for r in spark.read.parquet(monitor).collect()
    }
    assert sorted(again) == [0, 1, 2, 3, 4]
    assert {b: tuple(r) for b, r in again.items()} == {
        b: tuple(r) for b, r in health.items()
    }


def test_sketch_calibration_tick_banding_drift_alarm(
    spark, tmp_path, doc_batches
):
    """The dedup calibration loop closed in-stream (r11 verdict #3):
    the gated ingest stream runs a `sketch_calibration_batch` tick per
    micro-batch, healthy word-salad batches keep `banding_drift_alarm`
    quiet (no exact near-dup pairs -> band_miss_rate 0), and an
    injected drift burst — doc pairs whose TRUE Jaccard (~0.52) sits
    at the banding S-curve knee, the "systematically longer/shifted
    docs" failure — yields exact pairs the banded LSH provably misses
    at a rate the healthy baseline never shows, tripping miss_alarm on
    exactly that batch.  A checkpoint-wipe replay reprocesses every
    batch; the keyed health append is first-write-wins, so the
    calibration table (and the alarm replay) is unchanged."""
    from pulsar_sync_java_spark.operators.quality import classifier_weights
    from pulsar_sync_java_spark.streaming.neardup import (
        banding_drift_alarm,
        gated_neardup_ingest_stream,
    )

    b1, _ = doc_batches
    ref = load_table(spark, SF_DIR, "documents")
    weights_path = str(tmp_path / "weights")
    classifier_weights(ref).write.parquet(weights_path)

    src = str(tmp_path / "src")
    calib = str(tmp_path / "calib")
    for i in range(4):
        b1.filter((F.col("doc_id") % 8) == 2 * i).repartition(1).write.mode(
            "append"
        ).parquet(src)
    # drift burst: 30 pairs of 40-token docs with unique vocabularies;
    # the variant replaces the last 12 tokens, so the 3-shingle sets
    # share 26 of 50 distinct shingles -> exact Jaccard 26/50 = 0.52,
    # right at the 16-band/4-row S-curve knee (collision prob
    # 1-(1-0.52^4)^16 ~ 0.70) — a deterministic corpus the banding
    # dials no longer fit
    rows = []
    for i in range(30):
        base = [f"w{i}x{j}" for j in range(40)]
        variant = base[:28] + [f"v{i}x{j}" for j in range(12)]
        rows.append((800_000 + 2 * i, " ".join(base)))
        rows.append((800_001 + 2 * i, " ".join(variant)))
    spark.createDataFrame(
        rows, "doc_id long, text string"
    ).repartition(1).write.mode("append").parquet(src)

    def run(ck):
        q = (
            gated_neardup_ingest_stream(
                spark.readStream.schema("doc_id long, text string")
                .option("maxFilesPerTrigger", 1)
                .parquet(src),
                weights_path,
                str(tmp_path / "sigs"),
                str(tmp_path / "corpus"),
                checkpoint_dir=ck,
                calibrate_every=1,
                calib_dir=calib,
                monitor_dir=str(tmp_path / "health"),
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        exc = q.exception()
        if exc is not None:
            raise exc

    run(str(tmp_path / "ckpt"))
    # every batch runs a calibration tick (calibrate_every=1) and the
    # monitored health row attributes its wall time (r12 verdict #6)
    for r in spark.read.parquet(str(tmp_path / "health")).collect():
        assert r["sec_tick"] > 0, r
    health = {
        r["batch_id"]: r for r in spark.read.parquet(calib).collect()
    }
    assert sorted(health) == [0, 1, 2, 3, 4]
    for b in (0, 1, 2, 3):
        # the word-salad corpus carries a few REAL high-jaccard
        # near-dup pairs — banding at 16x4 catches all of them, so
        # the healthy baseline miss rate stays under the alarm floor
        assert health[b]["band_miss_rate"] < 0.05, health[b]
    burst = health[4]
    # every injected pair is a genuine exact near-dup at the knee...
    assert burst["n_exact_pairs"] == 30
    # ...and the banding misses a material fraction of them
    assert burst["band_miss_rate"] > 0.05, burst

    alarms = {
        r["batch_id"]: r
        for r in banding_drift_alarm(spark, calib, min_batches=3).collect()
    }
    assert alarms[4]["miss_alarm"], alarms[4]
    for b in (0, 1, 2, 3):
        assert not alarms[b]["miss_alarm"], alarms[b]

    # checkpoint-wipe replay: first-write-wins keyed health rows
    run(str(tmp_path / "ckpt2"))
    again = {
        r["batch_id"]: r for r in spark.read.parquet(calib).collect()
    }
    assert {b: tuple(r) for b, r in again.items()} == {
        b: tuple(r) for b, r in health.items()
    }


def test_sketch_calibration_tick_requires_calib_dir(spark, tmp_path):
    import pytest

    from pulsar_sync_java_spark.streaming.neardup import (
        gated_neardup_ingest_stream,
    )

    with pytest.raises(ValueError, match="calib_dir"):
        gated_neardup_ingest_stream(
            spark.readStream.schema("doc_id long, text string").parquet(
                str(tmp_path)
            ),
            "w", "s", "c", checkpoint_dir="ck", calibrate_every=2,
        )


def test_banding_drift_alarm_err_floor_absorbs_sketch_noise(
    spark, tmp_path
):
    """The err floor sits above the 64-hash sketch's own standard
    error (~0.06): a healthy tick measuring mean_abs_err 0.052 over a
    near-zero baseline must NOT page (the false alarm the r12 sf1
    streaming run exposed under a shared 0.05 floor), while a
    genuinely mis-estimating sketch (0.2) still trips, and the miss
    alarm keeps its tighter rate floor."""
    from pulsar_sync_java_spark.streaming.neardup import (
        banding_drift_alarm,
    )

    rows = [
        # batch_id, n_in/audited, exact, cand, miss_rate, mean, max
        (b, 100, 100, 5, 20, 0.0, 0.0, 0.0) for b in range(4)
    ] + [
        (4, 100, 100, 5, 20, 0.0, 0.052, 0.08),  # sketch-noise tick
        (5, 100, 100, 5, 20, 0.0, 0.200, 0.40),  # broken sketch
        (6, 100, 100, 5, 20, 0.060, 0.0, 0.0),   # miss-rate spike
    ]
    calib = str(tmp_path / "calib")
    spark.createDataFrame(
        [(b, n, a, e, c, mr, me, mx) for b, n, a, e, c, mr, me, mx in rows],
        "batch_id long, n_in long, n_audited long, n_exact_pairs long, "
        "n_band_candidates long, band_miss_rate double, "
        "mean_abs_err double, max_abs_err double",
    ).write.parquet(calib)

    flags = {
        r["batch_id"]: r
        for r in banding_drift_alarm(spark, calib, min_batches=3).collect()
    }
    assert not flags[4]["err_alarm"], flags[4]   # noise absorbed
    assert flags[5]["err_alarm"], flags[5]       # real failure pages
    assert flags[6]["miss_alarm"], flags[6]      # rate floor is tighter
    assert not flags[6]["err_alarm"]


def test_monitored_gate_counts_distinct_ids_under_duplicate_rows(
    spark, tmp_path, doc_batches
):
    """An at-least-once source can duplicate rows INSIDE one
    micro-batch; the pipeline is keyed on doc_id throughout, so the
    health counters must count distinct documents — a duplicated
    healthy batch must not misreport its duplicates as OOV (the
    false-oov_alarm review catch)."""
    from pulsar_sync_java_spark.operators.quality import classifier_weights
    from pulsar_sync_java_spark.streaming.neardup import (
        gated_ingest_batch_monitored,
    )

    b1, _ = doc_batches
    ref = load_table(spark, SF_DIR, "documents")
    weights = classifier_weights(ref)
    doubled = b1.unionByName(b1)  # every row twice

    monitor = str(tmp_path / "health")
    gated_ingest_batch_monitored(
        doubled, weights, str(tmp_path / "sigs"), str(tmp_path / "corpus"),
        monitor, batch_id=0,
    )
    r = spark.read.parquet(monitor).collect()[0]
    n_docs = b1.count()
    assert r["n_in"] == n_docs           # distinct ids, not 2x rows
    assert r["n_oov"] == 0               # duplicates are NOT oov
    assert r["n_oov"] + r["n_gate_dropped"] + r["n_gated"] == r["n_in"]
    assert r["n_gated"] > 0
