"""Streaming ANN serving (streaming/ann_serve.py): per-micro-batch
probes must equal the batch `ivf_topk_indexed` answer against the
ACTIVE index version — including across an in-stream refresh boundary
where the staleness contract rebuilds the index and swaps the pointer
mid-stream — and checkpoint replays must stay exactly-once."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pulsar_sync_java_spark.operators.similarity import (
    ivf_index_write,
    ivf_topk_indexed,
)
from pulsar_sync_java_spark.streaming.ann_serve import (
    IvfServer,
    probe_queries,
    serve_ann_stream,
)

QUERY_SCHEMA = "query_id long, qvec array<double>"
K = 5
NPROBE = 3


def _emb(spark):
    return spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")


def _query_rows(spark, vec_ids, first_qid):
    rows = _emb(spark).filter(F.col("vec_id").isin(vec_ids)).orderBy("vec_id").collect()
    return [
        (first_qid + i, [float(v) for v in r["embedding"]])
        for i, r in enumerate(rows)
    ]


def _run(spark, src, server, sink, ckpt, staging):
    stream = (
        spark.readStream.schema(QUERY_SCHEMA)
        .option("maxFilesPerTrigger", 1)
        .parquet(src)
    )
    q = (
        serve_ann_stream(
            stream,
            server,
            sink_dir=sink,
            checkpoint_dir=ckpt,
            k=K,
            nprobe=NPROBE,
            delta_staging=staging,
            refresh_kwargs={"drift_tv_threshold": 0.25},
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    exc = q.exception()
    if exc is not None:
        raise exc


def _expected_ids(spark, path, cents, qrows):
    out = {}
    for qid, vec in qrows:
        out[qid] = [
            r["vec_id"]
            for r in ivf_topk_indexed(
                spark, path, cents, vec, k=K, nprobe=NPROBE
            ).collect()
        ]
    return out


@pytest.mark.slow
def test_serving_matches_batch_probe_across_refresh_boundary(spark, tmp_path):
    idx = str(tmp_path / "ivf_v0")
    src = str(tmp_path / "queries")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    staging = str(tmp_path / "staging")

    emb = _emb(spark)
    cents0 = ivf_index_write(emb, idx, n_centroids=8, iters=2)
    server = IvfServer(idx, cents0)

    # ---- batch 1: no delta staged, probe the v0 index
    q1 = _query_rows(spark, [0, 1, 2], first_qid=1000)
    spark.createDataFrame(q1, QUERY_SCHEMA).coalesce(1).write.parquet(src)
    _run(spark, src, server, sink, ckpt, staging)

    expect1 = _expected_ids(spark, idx, cents0, q1)
    got = (
        spark.read.parquet(sink)
        .orderBy("query_id", "rank")
        .collect()
    )
    got1 = {}
    for r in got:
        got1.setdefault(r["query_id"], []).append(r["vec_id"])
    assert got1 == expect1

    # ---- stage a DRIFTED delta: many copies of one vector -> the
    # assignment TV trips the contract and forces a rebuild in-stream
    base = emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"]
    delta = spark.createDataFrame(
        [(100000 + i, [float(v) for v in base]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    delta.coalesce(1).write.parquet(staging)

    q2 = _query_rows(spark, [5, 6], first_qid=2000)
    spark.createDataFrame(q2, QUERY_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    # q3 (a query ON the drift point) lands as a SECOND file in the
    # same run: maxFilesPerTrigger=1 makes it a separate micro-batch
    # that must be served by the index REBUILT in q2's batch
    q3 = [(3000, [float(v) for v in base])]
    spark.createDataFrame(q3, QUERY_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    _run(spark, src, server, sink, ckpt, staging)

    # the contract rebuilt: new active path, staging consumed — the
    # data files moved into the consumed marker (the directory itself
    # stays: only the files the batch actually READ are moved, so
    # concurrent late arrivals are never swept away unread)
    path2, cents2 = server.snapshot()
    assert path2 != idx
    from pulsar_sync_java_spark.streaming.ann_serve import _consume_staging

    leftover, leftover_files = _consume_staging(spark, staging)
    assert leftover is None and leftover_files == []
    consumed = staging + "_consumed"
    assert os.path.isdir(consumed) and any(
        e.endswith(".parquet") for e in os.listdir(consumed)
    )
    assert spark.read.parquet(path2).count() == emb.count() + 60

    # batch-2 queries were answered against the REBUILT index
    expect2 = _expected_ids(spark, path2, cents2, q2)
    rows = (
        spark.read.parquet(sink)
        .filter((F.col("query_id") >= 2000) & (F.col("query_id") < 3000))
        .collect()
    )
    got2 = {}
    for r in sorted(rows, key=lambda r: (r["query_id"], r["rank"])):
        got2.setdefault(r["query_id"], []).append(r["vec_id"])
    assert got2 == expect2
    # the drifted clones dominate near their own vector: q3 (served in
    # its own micro-batch after the rebuild) must retrieve the clones
    top = [
        r["vec_id"]
        for r in spark.read.parquet(sink)
        .filter(F.col("query_id") == 3000)
        .orderBy("rank")
        .collect()
    ]
    assert len(top) == K and any(v >= 100000 for v in top)

    # ---- batch-1 history untouched by the refresh
    rows1 = spark.read.parquet(sink).filter(F.col("query_id") < 2000).collect()
    got1b = {}
    for r in sorted(rows1, key=lambda r: (r["query_id"], r["rank"])):
        got1b.setdefault(r["query_id"], []).append(r["vec_id"])
    assert got1b == expect1

    # ---- restart with a reconstructed server (pointer persisted by
    # the caller): full source replay appends nothing new
    import shutil

    n_before = spark.read.parquet(sink).count()
    shutil.rmtree(ckpt)
    server2 = IvfServer(path2, cents2)
    _run(spark, src, server2, sink, str(tmp_path / "ckpt2"), staging)
    assert spark.read.parquet(sink).count() == n_before


def test_consume_staging_snapshots_listing_and_keeps_late_arrivals(
    spark, tmp_path
):
    """r9 ADVICE: files landing in delta_staging AFTER the batch's file
    listing must stay staged for the next batch (the old whole-dir
    rename swept them into the consumed marker unread — silent vector
    loss), and a replayed batch id must not make the move raise
    (checkpoint wipe restarts batch ids at 0)."""
    import glob
    import shutil

    from pulsar_sync_java_spark.streaming.ann_serve import _consume_staging

    staging = str(tmp_path / "staging")
    spark.createDataFrame(
        [(1, [0.25])], "vec_id long, embedding array<float>"
    ).coalesce(1).write.parquet(staging)
    df, files = _consume_staging(spark, staging)
    assert df is not None and df.count() == 1 and len(files) == 1

    # a producer lands another file AFTER the snapshot was taken
    late_src = str(tmp_path / "late")
    spark.createDataFrame(
        [(2, [0.5])], "vec_id long, embedding array<float>"
    ).coalesce(1).write.parquet(late_src)
    late = os.path.join(staging, "late.parquet")
    shutil.copy(glob.glob(late_src + "/*.parquet")[0], late)

    # post-refresh move of ONLY the snapshot files (what apply_batch does)
    consumed = staging + "_consumed"
    os.makedirs(consumed, exist_ok=True)
    for fp in files:
        os.replace(fp, os.path.join(consumed, f"b0_{os.path.basename(fp)}"))

    # the late arrival is still consumable by the next batch
    df2, files2 = _consume_staging(spark, staging)
    assert [os.path.basename(f) for f in files2] == ["late.parquet"]
    assert df2.count() == 1 and df2.collect()[0]["vec_id"] == 2

    # checkpoint-wipe replay: same batch id, same file name — the move
    # must overwrite the identical prior content, not raise
    for fp in files2:
        target = os.path.join(consumed, f"b0_{os.path.basename(fp)}")
        shutil.copy(fp, target)  # pre-existing target from the first run
        os.replace(fp, target)
    assert _consume_staging(spark, staging) == (None, [])


def test_probe_queries_single_job_matches_per_query_probe(spark, tmp_path):
    """The batched router (one pruned scan + broadcast join + window)
    must equal per-query ivf_topk_indexed for every query in the
    batch."""
    idx = str(tmp_path / "ivf")
    emb = _emb(spark)
    cents = ivf_index_write(emb, idx, n_centroids=8, iters=2)
    qrows = _query_rows(spark, [10, 11, 12, 13], first_qid=0)
    got = {}
    for r in probe_queries(
        spark, idx, cents, qrows, k=K, nprobe=NPROBE
    ).collect():
        got.setdefault(r["query_id"], []).append((r["rank"], r["vec_id"]))
    expect = _expected_ids(spark, idx, cents, qrows)
    assert {q: [v for _, v in sorted(rs)] for q, rs in got.items()} == expect


def test_pq_probe_queries_matches_indexed_per_query(spark, tmp_path):
    """probe_queries_pq (one-plan batch routing over the coded index)
    must equal ivf_pq_topk_indexed per query bit-for-bit — same probe
    ranking, LUT math, ADC candidate cut and cosine tie-breaks."""
    from pulsar_sync_java_spark.operators.similarity import (
        ivf_pq_index_write,
        ivf_pq_topk_indexed,
    )
    from pulsar_sync_java_spark.streaming.ann_serve import probe_queries_pq

    emb = _emb(spark)
    idx = str(tmp_path / "pq_v0")
    cents, books = ivf_pq_index_write(
        emb, idx, n_centroids=8, m=16, k_sub=64, iters=1
    )
    qrows = _query_rows(spark, [0, 1, 2, 3, 4], first_qid=500)
    got = {}
    for r in probe_queries_pq(
        spark, idx, cents, books, qrows, k=K, nprobe=NPROBE, rerank=32
    ).collect():
        got.setdefault(r["query_id"], []).append(
            (r["rank"], r["vec_id"], r["cos_sim"])
        )
    assert set(got) == {qid for qid, _ in qrows}
    for qid, vec in qrows:
        want = [
            (i + 1, r["vec_id"], r["cos_sim"])
            for i, r in enumerate(
                ivf_pq_topk_indexed(
                    spark, idx, cents, books, vec, k=K,
                    nprobe=NPROBE, rerank=32,
                ).collect()
            )
        ]
        assert sorted(got[qid]) == want, qid


@pytest.mark.slow
def test_pq_serving_stream_with_in_stream_append(spark, tmp_path):
    """The PQ serving loop end-to-end: batch 1 probes the v0 coded
    index; a staged same-distribution delta is consumed by batch 2's
    refresh gate (append path — codes ride the keyed append) and the
    batch's own queries immediately see the appended vector."""
    from pulsar_sync_java_spark.operators.similarity import (
        ivf_pq_index_write,
    )
    from pulsar_sync_java_spark.streaming.ann_serve import (
        IvfPqServer,
        probe_queries_pq,
        serve_ann_stream_pq,
    )

    emb = _emb(spark)
    idx = str(tmp_path / "pq_v0")
    src = str(tmp_path / "queries")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    staging = str(tmp_path / "staging")
    cents, books = ivf_pq_index_write(
        emb, idx, n_centroids=8, m=16, k_sub=64, iters=1
    )
    server = IvfPqServer(idx, cents, books)

    def run():
        stream = (
            spark.readStream.schema(QUERY_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            serve_ann_stream_pq(
                stream, server, sink_dir=sink, checkpoint_dir=ckpt,
                k=K, nprobe=NPROBE, rerank=32, delta_staging=staging,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        exc = q.exception()
        if exc is not None:
            raise exc

    q1 = _query_rows(spark, [0, 1, 2], first_qid=1000)
    spark.createDataFrame(q1, QUERY_SCHEMA).coalesce(1).write.parquet(src)
    run()
    got1 = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in spark.read.parquet(sink).collect()
    }
    want1 = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in probe_queries_pq(
            spark, idx, cents, books, q1, k=K, nprobe=NPROBE, rerank=32
        ).collect()
    }
    assert got1 == want1 and len(got1) == 3 * K

    # stage a delta: existing vectors under fresh ids (append path),
    # including a NEW vector that batch 2 then queries for
    os.makedirs(staging, exist_ok=True)
    delta = emb.filter(F.col("vec_id") < 40).select(
        (F.col("vec_id") + 900_000).alias("vec_id"), "embedding"
    )
    delta.coalesce(1).write.parquet(str(tmp_path / "delta_tmp"))
    import glob
    import shutil

    for f in glob.glob(str(tmp_path / "delta_tmp" / "*.parquet")):
        shutil.copy(f, os.path.join(staging, os.path.basename(f)))

    q2 = _query_rows(spark, [7], first_qid=2000)
    spark.createDataFrame(q2, QUERY_SCHEMA).coalesce(1).write.mode(
        "append"
    ).parquet(src)
    run()
    path2, cents2, books2 = server.snapshot()
    assert path2 == idx and cents2 == cents  # append kept the pointer
    # vec 7's duplicate under id 900_007 was appended and is findable:
    # it ties vec 7 at cosine 1.0 and ranks right after it by id
    rows2 = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in spark.read.parquet(sink).collect()
        if r["query_id"] == 2000
    }
    assert rows2[(2000, 1)] == 7 and rows2[(2000, 2)] == 900_007


def test_calibrated_swap_refuses_garbage_rebuild(spark, tmp_path):
    """The serving-lifecycle half of the r10 calibration lesson: a
    REBUILD decision only reaches the active pointer if the rebuilt
    model passes the PQ calibration gate.  A healthy rebuild swaps; a
    record carrying a zeroed codebook (reconstructions collapse to
    cell centroids) is refused with the server untouched and the
    per-probe flag rows returned for observability; an append record
    applies with no audit (the stored model is unchanged by
    contract)."""
    from pulsar_sync_java_spark.operators.similarity import (
        ivf_pq_index_write,
    )
    from pulsar_sync_java_spark.streaming.ann_serve import (
        IvfPqServer,
        calibrated_swap,
    )

    emb = _emb(spark)
    idx0 = str(tmp_path / "pq_v0")
    idx1 = str(tmp_path / "pq_v1")
    cents0, books0 = ivf_pq_index_write(
        emb, idx0, n_centroids=8, m=16, k_sub=64, iters=1
    )
    cents1, books1 = ivf_pq_index_write(
        emb, idx1, n_centroids=8, m=16, k_sub=64, iters=1, seed=7
    )
    probe_ids = [0, 101, 202]

    # healthy rebuild: audited, passes, pointer moves
    server = IvfPqServer(idx0, cents0, books0)
    rec = calibrated_swap(
        spark,
        server,
        {
            "action": "rebuild",
            "path": idx1,
            "centroids": cents1,
            "codebooks": books1,
        },
        probe_ids,
    )
    assert rec["swapped"] is True
    assert len(rec["calibration"]) == len(probe_ids)
    assert all(
        r["recall_pq_ok"] and r["rank_corr_ok"] and r["adc_err_ok"]
        for r in rec["calibration"]
    ), rec["calibration"]
    # paths=("pq",) audited ONLY the model under test — no lsh/ivf
    # flags in the audit rows
    assert "recall_lsh_ok" not in rec["calibration"][0]
    assert "recall_ivf_ok" not in rec["calibration"][0]
    assert server.snapshot()[0] == idx1

    # garbage rebuild: refused, server stays on the healthy index
    d_sub = len(books1[0][0])
    garbage = [
        [[0.0] * d_sub for _ in range(len(books1[0]))]
        for _ in range(len(books1))
    ]
    rec2 = calibrated_swap(
        spark,
        server,
        {
            "action": "rebuild",
            "path": idx0,
            "centroids": cents0,
            "codebooks": garbage,
        },
        probe_ids,
    )
    assert rec2["swapped"] is False
    assert any(not r["adc_err_ok"] for r in rec2["calibration"])
    assert server.snapshot()[0] == idx1  # pointer did NOT move

    # append record: no new model, applied without an audit
    rec3 = calibrated_swap(
        spark,
        server,
        {
            "action": "append",
            "path": idx0,
            "centroids": cents0,
            "codebooks": books0,
        },
        probe_ids,
    )
    assert rec3["swapped"] is True and rec3["calibration"] is None
    assert server.snapshot()[0] == idx0


def test_calibrated_swap_balance_audit_gates_plain_ivf(spark, tmp_path):
    """The plain-IVF half of the swap gate: a rebuilt COARSE layout is
    judged on cell balance, because a collapsed quantizer keeps
    perfect recall (one giant cell contains every neighbor) while
    destroying the pruning the index exists for.  A healthy rebuild
    swaps; a single-cell layout (max_cell_share == 1.0) is refused
    with the server untouched; a PQ record without probe_ids raises
    rather than passing a garbage codebook on balance alone."""
    from pulsar_sync_java_spark.operators.similarity import (
        ivf_index_write,
        ivf_pq_index_write,
    )
    from pulsar_sync_java_spark.streaming.ann_serve import (
        IvfPqServer,
        IvfServer,
        calibrated_swap,
    )

    emb = _emb(spark)
    idx0 = str(tmp_path / "v0")
    idx1 = str(tmp_path / "v1")
    idx_collapsed = str(tmp_path / "collapsed")
    cents0 = ivf_index_write(emb, idx0, n_centroids=8, iters=1)
    cents1 = ivf_index_write(emb, idx1, n_centroids=8, iters=2)
    # a 1-cell layout IS the collapsed-quantizer artifact: every
    # vector routed to the same cell, max_cell_share == 1.0
    cents_c = ivf_index_write(emb, idx_collapsed, n_centroids=1, iters=1)

    server = IvfServer(idx0, cents0)
    rec = calibrated_swap(
        spark,
        server,
        {"action": "rebuild", "path": idx1, "centroids": cents1},
    )
    assert rec["swapped"] is True and rec["calibration"] is None
    assert rec["balance_share"] <= 0.8
    assert server.snapshot()[0] == idx1

    rec2 = calibrated_swap(
        spark,
        server,
        {"action": "rebuild", "path": idx_collapsed, "centroids": cents_c},
    )
    assert rec2["swapped"] is False
    assert rec2["balance_share"] == 1.0
    assert server.snapshot()[0] == idx1  # pointer did NOT move

    # a PQ rebuild record must not be gateable on balance alone
    pq_idx = str(tmp_path / "pq")
    pcents, pbooks = ivf_pq_index_write(
        emb, pq_idx, n_centroids=8, m=16, k_sub=64, iters=1
    )
    pserver = IvfPqServer(pq_idx, pcents, pbooks)
    with pytest.raises(ValueError, match="probe_ids"):
        calibrated_swap(
            spark,
            pserver,
            {
                "action": "rebuild",
                "path": pq_idx,
                "centroids": pcents,
                "codebooks": pbooks,
            },
        )


@pytest.mark.slow
def test_pq_stream_gate_refuses_bad_rebuild_then_restart_retries(
    spark, tmp_path, monkeypatch
):
    """End-to-end exactly-once contract of the armed swap gate: a
    drifted delta forces an in-stream REBUILD whose retrain is
    sabotaged (codebooks zeroed at the trainer) — the gate must
    refuse, the stream must die loudly BEFORE the staging delta is
    consumed, and the server must keep serving the old index.  A
    restart with the trainer healed retries the SAME batch (nothing
    was acked), rebuilds healthy, swaps, consumes the delta, and
    answers the batch's queries against the new index."""
    import glob as _glob

    import pulsar_sync_java_spark.operators.similarity as sim
    from pulsar_sync_java_spark.operators.similarity import (
        ivf_pq_index_write,
    )
    from pulsar_sync_java_spark.streaming.ann_serve import (
        IvfPqServer,
        probe_queries_pq,
        serve_ann_stream_pq,
    )

    emb = _emb(spark)
    idx = str(tmp_path / "pq_v0")
    src = str(tmp_path / "queries")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    staging = str(tmp_path / "staging")
    cents, books = ivf_pq_index_write(
        emb, idx, n_centroids=8, m=16, k_sub=64, iters=1
    )
    server = IvfPqServer(idx, cents, books)

    def run():
        stream = (
            spark.readStream.schema(QUERY_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src)
        )
        q = (
            serve_ann_stream_pq(
                stream, server, sink_dir=sink, checkpoint_dir=ckpt,
                k=K, nprobe=NPROBE, rerank=32, delta_staging=staging,
                refresh_kwargs={"drift_tv_threshold": 0.25},
                calibration_probe_ids=[0, 101, 202],
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)
        exc = q.exception()
        if exc is not None:
            raise exc

    # a drifted delta (many clones of one vector) trips the rebuild
    base = emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"]
    delta = spark.createDataFrame(
        [(100000 + i, [float(v) for v in base]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    delta.coalesce(1).write.parquet(staging)
    q1 = _query_rows(spark, [0, 1, 2], first_qid=1000)
    spark.createDataFrame(q1, QUERY_SCHEMA).coalesce(1).write.parquet(src)

    # sabotage: the rebuild's codebook trainer returns zeroed books
    real_pq_train = sim.pq_train

    def bad_pq_train(df, centroids, id_col="vec_id", vec_col="embedding",
                     m=8, k_sub=256, iters=3, seed=42, sample=None):
        good = real_pq_train(df, centroids, id_col, vec_col, m, k_sub,
                             iters, seed, sample=sample)
        return [
            [[0.0] * len(good[0][0]) for _ in row] for row in good
        ]

    monkeypatch.setattr(sim, "pq_train", bad_pq_train)
    with pytest.raises(Exception, match="failed the calibration gate"):
        run()
    # nothing swapped, nothing acked, nothing consumed
    assert server.snapshot()[0] == idx
    assert _glob.glob(os.path.join(staging, "*.parquet"))
    assert not os.path.exists(sink) or not _glob.glob(
        os.path.join(sink, "*.parquet")
    )

    # heal the trainer; the SAME checkpoint retries the failed batch
    monkeypatch.setattr(sim, "pq_train", real_pq_train)
    run()
    path2, cents2, books2 = server.snapshot()
    assert path2 != idx  # healthy rebuild swapped in
    assert not _glob.glob(os.path.join(staging, "*.parquet"))  # consumed
    want = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in probe_queries_pq(
            spark, path2, cents2, books2, q1, k=K, nprobe=NPROBE,
            rerank=32,
        ).collect()
    }
    got = {
        (r["query_id"], r["rank"]): r["vec_id"]
        for r in spark.read.parquet(sink).collect()
    }
    assert got == want and len(got) == 3 * K


@pytest.mark.slow
def test_plain_ivf_stream_gated_rebuild_swaps_when_balanced(
    spark, tmp_path
):
    """The calibrate_rebuilds=True wiring on the PLAIN-IVF stream: a
    drifted delta forces an in-stream rebuild, the balance audit
    passes on the healthy retrain, the pointer swaps and the batch's
    queries are served from the rebuilt index — i.e. arming the gate
    changes nothing for healthy maintenance (the refusal side is
    pinned by the calibrated_swap unit test and the PQ stream's
    sabotage test)."""
    from pulsar_sync_java_spark.streaming.ann_serve import (
        IvfServer,
        serve_ann_stream,
    )

    emb = _emb(spark)
    idx = str(tmp_path / "v0")
    src = str(tmp_path / "queries")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")
    staging = str(tmp_path / "staging")
    cents0 = ivf_index_write(emb, idx, n_centroids=8, iters=2)
    server = IvfServer(idx, cents0)

    base = emb.filter(F.col("vec_id") == 7).collect()[0]["embedding"]
    delta = spark.createDataFrame(
        [(100000 + i, [float(v) for v in base]) for i in range(60)],
        "vec_id long, embedding array<float>",
    )
    delta.coalesce(1).write.parquet(staging)
    q1 = _query_rows(spark, [0, 1, 2], first_qid=1000)
    spark.createDataFrame(q1, QUERY_SCHEMA).coalesce(1).write.parquet(src)

    q = (
        serve_ann_stream(
            spark.readStream.schema(QUERY_SCHEMA)
            .option("maxFilesPerTrigger", 1)
            .parquet(src),
            server, sink_dir=sink, checkpoint_dir=ckpt, k=K,
            nprobe=NPROBE, delta_staging=staging,
            refresh_kwargs={"drift_tv_threshold": 0.25},
            calibrate_rebuilds=True,
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(180)
    exc = q.exception()
    if exc is not None:
        raise exc

    path2, cents2 = server.snapshot()
    assert path2 != idx  # the gated rebuild swapped
    expect = _expected_ids(spark, path2, cents2, q1)
    got = {}
    for r in sorted(
        spark.read.parquet(sink).collect(),
        key=lambda r: (r["query_id"], r["rank"]),
    ):
        got.setdefault(r["query_id"], []).append(r["vec_id"])
    assert got == expect


def test_durable_server_pointer_roundtrips_and_survives_refresh(
    spark, tmp_path
):
    """The last non-durable piece of the serving lifecycle: a server
    constructed with state_path persists its pointer atomically on
    every applied refresh, `load` reconstructs an equivalent server
    after a driver restart (model included, for the PQ kind), and a
    state file of the wrong kind refuses to load rather than serving
    with a silently missing codebook."""
    from pulsar_sync_java_spark.operators.similarity import (
        ivf_index_write,
        ivf_pq_index_write,
    )
    from pulsar_sync_java_spark.streaming.ann_serve import (
        IvfPqServer,
        IvfServer,
    )

    emb = _emb(spark)
    idx0 = str(tmp_path / "v0")
    idx1 = str(tmp_path / "v1")
    state = str(tmp_path / "pointer.json")
    cents0, books0 = ivf_pq_index_write(
        emb, idx0, n_centroids=8, m=16, k_sub=64, iters=1
    )
    cents1, books1 = ivf_pq_index_write(
        emb, idx1, n_centroids=8, m=16, k_sub=64, iters=2, seed=7
    )

    server = IvfPqServer(idx0, cents0, books0, state_path=state)
    assert IvfPqServer.load(state).snapshot() == server.snapshot()

    server.apply_refresh(
        {
            "action": "rebuild",
            "path": idx1,
            "centroids": cents1,
            "codebooks": books1,
        }
    )
    # the persisted pointer follows the swap; a "restarted driver"
    # reconstructs the post-refresh server, codebooks and all
    loaded = IvfPqServer.load(state)
    assert loaded.snapshot() == server.snapshot()
    assert loaded.snapshot()[0] == idx1

    # kind safety: a PQ state file must not load as a plain server
    with pytest.raises(ValueError, match="matching server class"):
        IvfServer.load(state)

    # plain kind roundtrip too
    state2 = str(tmp_path / "pointer_plain.json")
    cents_p = ivf_index_write(emb, str(tmp_path / "p0"), n_centroids=8)
    plain = IvfServer(str(tmp_path / "p0"), cents_p, state_path=state2)
    assert IvfServer.load(state2).snapshot() == plain.snapshot()
    with pytest.raises(ValueError, match="matching server class"):
        IvfPqServer.load(state2)


def test_durable_pointer_load_never_rewrites_and_appends_skip_io(
    spark, tmp_path
):
    """The durability review pins: (1) load() must NOT rewrite the
    state file it read — a forensics loader beside a live driver
    would otherwise race the driver's saves and regress the pointer
    past a consumed refresh; (2) append records (model unchanged by
    contract) skip the model-sized JSON rewrite; (3) a state file
    without a 'kind' key gets the diagnostic ValueError, not a bare
    KeyError."""
    import json

    from pulsar_sync_java_spark.operators.similarity import (
        ivf_pq_index_write,
    )
    from pulsar_sync_java_spark.streaming.ann_serve import IvfPqServer

    emb = _emb(spark)
    idx0 = str(tmp_path / "v0")
    idx1 = str(tmp_path / "v1")
    state = str(tmp_path / "pointer.json")
    cents0, books0 = ivf_pq_index_write(
        emb, idx0, n_centroids=8, m=16, k_sub=64, iters=1
    )
    cents1, books1 = ivf_pq_index_write(
        emb, idx1, n_centroids=8, m=16, k_sub=64, iters=2, seed=7
    )
    server = IvfPqServer(idx0, cents0, books0, state_path=state)

    # (1) a concurrent loader reads the file, the driver then swaps —
    # the loader's existence must not resurrect the old pointer
    before = open(state).read()
    loader = IvfPqServer.load(state)
    assert open(state).read() == before  # load wrote nothing
    server.apply_refresh(
        {
            "action": "rebuild",
            "path": idx1,
            "centroids": cents1,
            "codebooks": books1,
        }
    )
    assert json.load(open(state))["path"] == idx1
    assert loader.snapshot()[0] == idx0  # loader is a snapshot, fine

    # (2) an append record leaves the file byte-identical
    after_rebuild = open(state).read()
    server.apply_refresh(
        {
            "action": "append",
            "path": idx1,
            "centroids": cents1,
            "codebooks": books1,
        }
    )
    assert open(state).read() == after_rebuild

    # (3) foreign/truncated state file -> diagnostic error
    bad = str(tmp_path / "bad.json")
    with open(bad, "w") as fh:
        fh.write("{}")
    with pytest.raises(ValueError, match="matching server class"):
        IvfPqServer.load(bad)


def test_calibrated_swap_row_count_gate_catches_lossy_write(
    spark, tmp_path
):
    """r11 advice (medium): every other swap audit — balance, recall,
    rank-corr, ADC — is computed over the rows that SURVIVED the
    rebuild write, so a write that silently dropped vectors could
    pass them all.  The refresh record's `expected_rows` (counted
    from the rebuild's input before the write) is the independent
    expectation: a rebuilt layout missing rows is refused with the
    server untouched, and the same record against the intact layout
    swaps."""
    import glob

    from pulsar_sync_java_spark.operators.similarity import (
        ivf_pq_index_write,
    )
    from pulsar_sync_java_spark.streaming.ann_serve import (
        IvfPqServer,
        calibrated_swap,
    )

    emb = _emb(spark)
    n = emb.count()
    idx0 = str(tmp_path / "pq_v0")
    idx1 = str(tmp_path / "pq_v1")
    cents0, books0 = ivf_pq_index_write(
        emb, idx0, n_centroids=8, m=16, k_sub=64, iters=1
    )
    cents1, books1 = ivf_pq_index_write(
        emb, idx1, n_centroids=8, m=16, k_sub=64, iters=1, seed=7
    )
    probe_ids = [0, 101, 202]
    record = {
        "action": "rebuild",
        "path": idx1,
        "centroids": cents1,
        "codebooks": books1,
        "expected_rows": n,
    }

    # intact layout + truthful expectation: swaps
    server = IvfPqServer(idx0, cents0, books0)
    rec = calibrated_swap(spark, server, dict(record), probe_ids)
    assert rec["swapped"] is True and rec["rows_ok"] is True
    assert rec["current_rows"] == n

    # records without expected_rows (older producers) keep the
    # previous gate behavior on a HEALTHY layout rather than failing
    # closed on the missing key
    legacy = {k: v for k, v in record.items() if k != "expected_rows"}
    server3 = IvfPqServer(idx0, cents0, books0)
    rec3 = calibrated_swap(spark, server3, dict(legacy), probe_ids)
    assert rec3["rows_ok"] is True and rec3["swapped"] is True

    # simulate the botched write: drop one cell's data file from the
    # rebuilt layout — balance and the PQ flags over the survivors
    # can all still pass, only the row count can see the loss
    server2 = IvfPqServer(idx0, cents0, books0)
    victim = sorted(glob.glob(f"{idx1}/ivf_cell=*/*.parquet"))[0]
    os.remove(victim)
    rec2 = calibrated_swap(spark, server2, dict(record), probe_ids)
    assert rec2["swapped"] is False and rec2["rows_ok"] is False
    assert rec2["current_rows"] < n
    assert server2.snapshot()[0] == idx0  # pointer did NOT move

    # a LEGACY record against the lossy layout no longer passes
    # unseen either: if the loss touches the audit set, the coded
    # rank/ADC audit's row-count assertion raises (defense in depth
    # behind the expected_rows gate); if it does not, the audit only
    # judged survivors — exactly the blind spot expected_rows closes
    server4 = IvfPqServer(idx0, cents0, books0)
    try:
        rec4 = calibrated_swap(spark, server4, dict(legacy), probe_ids)
        # loss missed the audit ids: gate state must still be sane
        assert rec4["rows_ok"] is True
    except ValueError as exc:
        assert "missing" in str(exc)
        assert server4.snapshot()[0] == idx0


def test_ann_calibration_coded_path_raises_on_missing_audit_rows(
    spark, tmp_path
):
    """The coded_path rank/ADC audit inner-joins the audit set
    against the STORED codes — r11 advice: a layout missing audit
    ids used to silently drop them from the audit and pass.  Now the
    join row count is asserted against the audit-set row count and a
    shortfall raises instead of certifying a lossy write."""
    import glob
    import shutil

    from pulsar_sync_java_spark.operators.similarity import (
        ann_calibration,
        ivf_pq_index_write,
    )

    emb = _emb(spark)
    idx = str(tmp_path / "pq")
    cents, books = ivf_pq_index_write(
        emb, idx, n_centroids=8, m=16, k_sub=64, iters=1
    )
    probe_ids = [0, 101]

    # intact layout: audit runs clean
    flags = ann_calibration(
        emb, probe_ids, centroids=cents, codebooks=books,
        paths=("pq",), coded_path=idx,
    ).collect()
    assert len(flags) == len(probe_ids)

    # lossy layout: remove the cell holding probe id 0's stored codes
    # — id 0 is its own exact top-1 (cos = 1), so it is ALWAYS in the
    # audit set and its cell's loss must trip the shortfall check
    lossy = str(tmp_path / "pq_lossy")
    shutil.copytree(idx, lossy)
    cell0 = (
        spark.read.parquet(idx)
        .filter(F.col("vec_id") == 0)
        .select("ivf_cell")
        .collect()[0][0]
    )
    assert glob.glob(f"{lossy}/ivf_cell={cell0}")
    shutil.rmtree(f"{lossy}/ivf_cell={cell0}")
    with pytest.raises(ValueError, match="missing"):
        ann_calibration(
            emb, probe_ids, centroids=cents, codebooks=books,
            paths=("pq",), coded_path=lossy,
        ).collect()


def test_state_write_version_ordering_never_regresses_pointer(
    spark, tmp_path
):
    """r11 advice: two appliers racing through apply_refresh used to
    be ordered only by save-lock acquisition — a stale snapshot
    written LAST would leave the durable file regressed to the older
    pointer.  The pointer-change ordinal taken under the state lock
    now orders persistence: a write carrying an older version than
    the newest already persisted is skipped, in whichever order the
    disk writes land."""
    import json

    from pulsar_sync_java_spark.streaming.ann_serve import IvfServer

    state = str(tmp_path / "ptr.json")
    srv = IvfServer("/idx/v0", [[0.0, 1.0]], state_path=state)

    # simulate the race: the NEWER snapshot (version 2) reaches disk
    # first, then the stale version-1 snapshot tries to write late
    new_st = {"kind": "ivf", "path": "/idx/v2", "centroids": [[2.0, 2.0]]}
    old_st = {"kind": "ivf", "path": "/idx/v1", "centroids": [[1.0, 1.0]]}
    srv._write_state(new_st, 2)
    srv._write_state(old_st, 1)  # stale write: must be skipped
    assert json.load(open(state))["path"] == "/idx/v2"

    # and a genuinely newer version still lands
    srv._write_state({**new_st, "path": "/idx/v3"}, 3)
    assert json.load(open(state))["path"] == "/idx/v3"

    # the normal path keeps working after manual version injection
    srv.apply_refresh({"path": "/idx/v4", "centroids": [[4.0, 4.0]]})
    assert srv.snapshot()[0] == "/idx/v4"


def test_state_write_failure_leaves_version_unclaimed(
    spark, tmp_path, monkeypatch
):
    """Review-pass pin: the pointer-change version is claimed only
    AFTER os.replace lands.  A write that fails mid-I/O must leave
    the version unclaimed so a retry (or the next changed pointer)
    still persists — claiming it up front would skip the re-write
    and leave the durable file holding the superseded pointer."""
    import json
    import os as _os

    from pulsar_sync_java_spark.streaming import ann_serve

    state = str(tmp_path / "ptr.json")
    srv = IvfServer("/idx/v0", [[0.0, 1.0]], state_path=state)

    real_replace = _os.replace
    boom = {"armed": True}

    def flaky_replace(src, dst):
        if boom["armed"] and dst == state:
            boom["armed"] = False
            raise OSError(28, "No space left on device")
        return real_replace(src, dst)

    monkeypatch.setattr(ann_serve.os, "replace", flaky_replace)

    st1 = {"kind": "ivf", "path": "/idx/v1", "centroids": [[1.0, 1.0]]}
    with pytest.raises(OSError):
        srv._write_state(st1, 1)
    # durable file still holds v0; version 1 must NOT be claimed
    assert json.load(open(state))["path"] == "/idx/v0"
    # the retry persists the same version instead of being skipped
    srv._write_state(st1, 1)
    assert json.load(open(state))["path"] == "/idx/v1"


def test_cursor_advance_kernel_trims_consumed_samples(spark):
    """The keyed-state bound in action: once every tracked
    subscription has emitted, samples at-or-before the minimum
    emitted floor are trimmed from state — and trimming never starts
    while any tracked subscription has yet to emit."""
    import pandas as pd

    from pulsar_sync_java_spark.streaming.cursor_advance import _advancer
    from tests.test_cursor_advance_props import FakeState

    fn = _advancer(10_000)
    state = FakeState()

    def batch(rows):
        pdf = pd.DataFrame(
            rows, columns=["kind", "cursor", "ts", "event_id"]
        )
        return [
            tuple(r)
            for res in fn(("t", 0), [pdf], state)
            for r in res.itertuples(index=False)
        ]

    # 5 samples + one cursor at 250 and one cursor stuck before all
    # samples: NO trim while subB has not emitted
    rows = [("sample", None, ts, ts + 1) for ts in (100, 150, 200, 300, 400)]
    rows += [("cursor", "subA", 250, None), ("cursor", "subB", 50, None)]
    out = batch(rows)
    assert ("t", 0, "subA", 200, 201) in out
    samples, _, horizon = state.get
    assert len(samples) == 5  # subB pending: everything retained
    assert horizon < 0  # no trim has happened

    # subB advances and emits -> horizon = min(200, 100) = 100 trims
    # the 100-ts sample only
    out = batch([("cursor", "subB", 120, None)])
    assert out == [("t", 0, "subB", 100, 101)]
    samples, _, horizon = state.get
    assert sorted(s[0] for s in samples) == [150, 200, 300, 400]
    assert horizon == 100  # persisted: <=100 emissions now withheld

    # both advance past everything: every at-or-below-horizon sample
    # is dropped (the r13 fix removed the one-sample retention — the
    # persisted horizon, not a leftover sample, carries the bound)
    out = batch([("cursor", "subA", 500, None), ("cursor", "subB", 500, None)])
    assert {o[2] for o in out} == {"subA", "subB"}
    samples, _, horizon = state.get
    assert samples == [] and horizon == 400
