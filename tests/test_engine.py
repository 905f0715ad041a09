"""End-to-end SyncEngine convergence tests — the reference's own test
strategy (SURVEY.md §5: arrange on src -> run the system -> assert
observable state on dst), with `availableNow` + awaitTermination in
place of dual embedded brokers + Awaitility.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from pulsar_sync_java_spark.engine import SyncEngine, SyncEngineConfig
from tests.test_streaming import build_messages


def _write_catalog(spark, cluster: str, tenants, namespaces, topics, subs):
    spark.createDataFrame(tenants, "tenant string").coalesce(1).write.mode(
        "overwrite"
    ).parquet(os.path.join(cluster, "tenants.parquet"))
    spark.createDataFrame(
        namespaces, "tenant string, namespace string, policies string"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(cluster, "namespaces.parquet")
    )
    spark.createDataFrame(
        topics,
        "tenant string, namespace string, topic string, partitions int, "
        "properties map<string,string>",
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(cluster, "topics.parquet")
    )
    spark.createDataFrame(
        subs, "topic string, partition int, cursor string, ts timestamp, event_id long"
    ).coalesce(1).write.mode("overwrite").parquet(
        os.path.join(cluster, "subscriptions.parquet")
    )


@pytest.fixture(scope="module")
def clusters(spark, tmp_path_factory):
    root = tmp_path_factory.mktemp("clusters")
    src, dst = str(root / "src"), str(root / "dst")

    msgs = build_messages(spark)
    msgs.repartition(2).write.mode("overwrite").parquet(
        os.path.join(src, "messages")
    )
    # src subscriptions: one cursor per topic at that topic's latest
    # partition-0 event (renamed: the engine's subscription schema uses
    # ts/event_id like the mapping)
    latest = (
        msgs.filter(F.col("partition") == 0)
        .groupBy("topic")
        .agg(
            F.max_by(
                F.struct(
                    F.col("event_time").alias("ts"),
                    F.col("entry_id").alias("event_id"),
                ),
                F.struct("event_time", "entry_id"),
            ).alias("s")
        )
        .select(
            "topic", F.lit(0).alias("partition"), F.lit("sub-a").alias("cursor"),
            F.col("s.ts").alias("ts"), F.col("s.event_id").alias("event_id"),
        )
    )
    topics = [
        (r.topic,) for r in msgs.select("topic").distinct().collect()
    ]
    _write_catalog(
        spark,
        src,
        [("public",), ("analytics",)],
        [("public", "default", '{"retention": "1h"}'), ("analytics", "raw", "{}")],
        [("public", "default", t, 4, {"owner": "sync"}) for (t,) in topics],
        [
            (r.topic, r.partition, r.cursor, r.ts, r.event_id)
            for r in latest.collect()
        ],
    )
    # dst: partially-populated catalogs (one tenant already there),
    # empty messages/subscriptions
    _write_catalog(spark, dst, [("public",)], [], [], [])
    os.makedirs(os.path.join(dst, "messages"), exist_ok=True)
    return src, dst


@pytest.mark.slow
def test_engine_converges_and_is_idempotent(spark, clusters):
    src, dst = clusters
    engine = SyncEngine(spark, src, dst, SyncEngineConfig())

    created = engine.run_once()
    # catalog convergence: dst ⊇ src at every level, additive only
    for name in ("tenants", "namespaces", "topics"):
        s = spark.read.parquet(os.path.join(src, f"{name}.parquet"))
        d = spark.read.parquet(os.path.join(dst, f"{name}.parquet"))
        assert s.join(d, s.columns[:2], "left_anti").count() == 0, name
    assert created["tenants"] == 1  # 'analytics' was missing
    assert created["namespaces"] == 2 and created["topics"] > 0

    # message convergence: every src message replicated, none duplicated
    src_msgs = spark.read.parquet(os.path.join(src, "messages"))
    dst_msgs = spark.read.parquet(os.path.join(dst, "messages"))
    assert dst_msgs.count() == src_msgs.count()

    # cursors created at translated (floor) positions: ts <= src ts
    subs = spark.read.parquet(os.path.join(dst, "subscriptions.parquet"))
    src_subs = spark.read.parquet(os.path.join(src, "subscriptions.parquet"))
    assert created["cursors"] == subs.count() > 0
    j = subs.alias("d").join(
        src_subs.alias("s"), ["topic", "partition", "cursor"], "inner"
    )
    assert j.count() == subs.count()
    assert j.filter(F.col("d.ts") > F.col("s.ts")).count() == 0  # replay-only

    # second pass: fully idempotent — zero creates everywhere, no
    # message duplication (checkpoint: committed offsets not replayed)
    created2 = engine.run_once()
    assert created2 == {"tenants": 0, "namespaces": 0, "topics": 0, "cursors": 0}
    assert (
        spark.read.parquet(os.path.join(dst, "messages")).count()
        == src_msgs.count()
    )


@pytest.mark.slow
def test_engine_picks_up_new_src_entities(spark, clusters):
    """The reference's rescan loop: entities created on src AFTER the
    first sync appear on dst on the next tick (additive, exactly-once)."""
    src, dst = clusters
    engine = SyncEngine(spark, src, dst, SyncEngineConfig())
    engine.sync_catalog_once()

    tenants_path = os.path.join(src, "tenants.parquet")
    existing = spark.read.parquet(tenants_path).collect()
    spark.createDataFrame(
        existing + [("late-tenant",)], "tenant string"
    ).coalesce(1).write.mode("overwrite").parquet(tenants_path)

    created = engine.sync_catalog_once()
    assert created["tenants"] == 1
    d = spark.read.parquet(os.path.join(dst, "tenants.parquet"))
    assert d.filter(F.col("tenant") == "late-tenant").count() == 1
    # and once more: converged again
    assert engine.sync_catalog_once()["tenants"] == 0


@pytest.mark.slow
def test_deleted_dst_subscription_recreated_at_translated_position(
    spark, clusters
):
    """The one LIVE branch of the reference's R23 reset path
    (`PulsarPartitionSyncWorker.java:177-208`: reset only runs when the
    src position changed AND dst LACKS the subscription — i.e. after an
    external deletion on dst): if a dst subscription disappears between
    ticks, the next cursor tick must re-create it at the floor
    translation of the CURRENT src position, replay-only."""
    src, dst = clusters
    engine = SyncEngine(spark, src, dst, SyncEngineConfig())
    engine.run_once()  # converged baseline
    assert engine.sync_cursors_once() == 0  # create-once: nothing to do

    sub_path = os.path.join(dst, "subscriptions.parquet")
    before = spark.read.parquet(sub_path).collect()
    assert len(before) > 1
    victim = min(
        (r.topic, r.partition, r.cursor) for r in before
    )  # deterministic pick
    survivors = [r for r in before if (r.topic, r.partition, r.cursor) != victim]
    spark.createDataFrame(
        survivors, spark.read.parquet(sub_path).schema
    ).coalesce(1).write.mode("overwrite").parquet(sub_path)

    # external deletion observed -> exactly one re-create
    assert engine.sync_cursors_once() == 1
    after = {
        (r.topic, r.partition, r.cursor): (r.ts, r.event_id)
        for r in spark.read.parquet(sub_path).collect()
    }
    assert set(after) == {(r.topic, r.partition, r.cursor) for r in before}
    # re-created at the translated position: a floor (<=) of the src
    # cursor, and an actual sampled mapping entry
    src_ts = {
        (r.topic, r.partition, r.cursor): r.ts
        for r in spark.read.parquet(
            os.path.join(src, "subscriptions.parquet")
        ).collect()
    }
    assert after[victim][0] <= src_ts[victim]
    mapping = {
        (r.topic, r.partition, r.ts, r.event_id)
        for r in engine.build_mapping().collect()
    }
    assert (victim[0], victim[1], after[victim][0], after[victim][1]) in mapping
    # and the tick after that is a no-op again
    assert engine.sync_cursors_once() == 0


def test_control_plane_write_back_is_bounded(spark, clusters):
    """The driver write-back paths fail fast past control_plane_max_rows
    with a pointer at the partitioned-merge alternative, instead of
    collecting an unbounded table onto the driver."""
    src, dst = clusters
    engine = SyncEngine(
        spark, src, dst, SyncEngineConfig(control_plane_max_rows=2)
    )
    with pytest.raises(ValueError, match="control_plane_max_rows"):
        engine.sync_catalog_once()
    # the bound names the escape hatch, not just the failure
    try:
        engine.sync_catalog_once()
    except ValueError as e:
        assert "write_partitioned" in str(e)


@pytest.mark.slow
def test_cursor_advancement_opt_in(spark, clusters):
    """Opt-in improvement over the reference's frozen cursors: when new
    messages arrive and the src cursor progresses, the dst cursor
    follows forward — never backward, never past the src position
    (replay-only in both directions)."""
    src, dst = clusters
    engine = SyncEngine(spark, src, dst, SyncEngineConfig(advance_cursors=True))
    engine.run_once()  # ensure created + converged

    # produce NEW src messages two hours later, replicate them (the
    # checkpoint picks up only the new files), extending the mapping
    msgs_path = os.path.join(src, "messages")
    msgs = spark.read.parquet(msgs_path)
    newer = msgs.withColumn(
        "event_time", F.col("event_time") + F.expr("INTERVAL 2 HOURS")
    ).withColumn("entry_id", F.col("entry_id") + F.lit(1_000_000))
    newer.write.mode("append").parquet(msgs_path)
    engine.start_replication(available_now=True).awaitTermination(600)

    # src cursors jump to each partition's new latest message
    sub_path = os.path.join(src, "subscriptions.parquet")
    src_subs = spark.read.parquet(sub_path).collect()
    newest = (
        spark.read.parquet(msgs_path)
        .groupBy("topic", "partition")
        .agg(
            F.max_by(
                F.struct(
                    F.col("event_time").alias("ts"),
                    F.col("entry_id").alias("event_id"),
                ),
                F.struct("event_time", "entry_id"),
            ).alias("s")
        )
        .collect()
    )
    latest = {(r.topic, r.partition): r.s for r in newest}
    moved = [
        (r.topic, r.partition, r.cursor,
         latest[(r.topic, r.partition)].ts, latest[(r.topic, r.partition)].event_id)
        for r in src_subs
    ]
    spark.createDataFrame(
        moved, "topic string, partition int, cursor string, ts timestamp, event_id long"
    ).coalesce(1).write.mode("overwrite").parquet(sub_path)

    before = {
        (r.topic, r.partition, r.cursor): r.ts
        for r in spark.read.parquet(os.path.join(dst, "subscriptions.parquet")).collect()
    }
    n = engine.advance_cursors_once()
    after_rows = spark.read.parquet(os.path.join(dst, "subscriptions.parquet")).collect()
    after = {(r.topic, r.partition, r.cursor): r.ts for r in after_rows}
    assert n > 0
    assert set(after) == set(before)  # advancement never creates/drops
    src_ts = {(t, p, c): ts for (t, p, c, ts, _) in moved}
    moved_forward = 0
    for k, ts in after.items():
        assert ts >= before[k]          # monotone forward
        assert ts <= src_ts[k]          # floor: never past the true position
        moved_forward += ts > before[k]
    assert moved_forward == n
    # converged: a second pass moves nothing
    assert engine.advance_cursors_once() == 0


@pytest.mark.slow
def test_full_system_catalog_then_data_plane_convergence(spark, tmp_path):
    """The reference's complete story in ONE test — the 3-minute
    catalog rescan (PulsarPartitionTopicSyncManager) followed by
    per-topic message replication (PulsarMessageSyncTest.java:38-64) —
    with the data plane running through the LIVE format("pulsar")
    binding against fake brokers: after one catalog tick plus one
    replication sweep of every topic the converged catalog owns, the
    dst broker holds exactly the src broker's messages, per topic."""
    from pulsar_sync_java_spark.streaming.fake_pulsar import (
        STORAGE_ROOT_OPTION,
        register_fake_pulsar,
        topic_dir,
    )
    from pulsar_sync_java_spark.streaming.pulsar_connector import (
        PulsarEndpoint,
        read_pulsar_stream,
        write_pulsar_stream,
    )
    from pulsar_sync_java_spark.streaming.replicate import (
        message_projection,
    )

    register_fake_pulsar(spark)
    src_cat, dst_cat = str(tmp_path / "src-cat"), str(tmp_path / "dst-cat")
    src_broker, dst_broker = str(tmp_path / "src-b"), str(tmp_path / "dst-b")
    os.makedirs(src_broker)
    os.makedirs(dst_broker)

    # control plane: src knows both topics, dst starts empty-but-valid
    topic_rows = [
        ("public", "default", t, 4, {"owner": "sync"})
        for t in ("view", "click")
    ]
    _write_catalog(
        spark,
        src_cat,
        [("public",)],
        [("public", "default", "{}")],
        topic_rows,
        [],
    )
    _write_catalog(spark, dst_cat, [("public",)], [], [], [])

    # data plane: src broker holds each topic's messages
    msgs = build_messages(spark)
    for t in ("view", "click"):
        msgs.filter(F.col("topic") == t).coalesce(1).write.parquet(
            topic_dir(src_broker, f"persistent://public/default/{t}")
        )

    engine = SyncEngine(spark, src_cat, dst_cat)
    created = engine.sync_catalog_once()
    assert created["topics"] == 2  # catalog converged additively

    # replicate every topic the CONVERGED DST CATALOG now owns — the
    # catalog is the work list, exactly the reference's fan-out (R26)
    dst_topics = [
        f"persistent://{r.tenant}/{r.namespace}/{r.topic}"
        for r in spark.read.parquet(
            os.path.join(dst_cat, "topics.parquet")
        ).collect()
    ]
    assert len(dst_topics) == 2
    for i, full_topic in enumerate(sorted(dst_topics)):
        stream = read_pulsar_stream(
            spark,
            PulsarEndpoint("src-broker"),
            subscription_name="pulsar-sync",
            topics=full_topic,
            extra_options={STORAGE_ROOT_OPTION: src_broker},
        )
        q = (
            write_pulsar_stream(
                message_projection(stream),
                PulsarEndpoint("dst-broker"),
                full_topic,
                str(tmp_path / f"ckpt{i}"),
                extra_options={STORAGE_ROOT_OPTION: dst_broker},
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(180)

    # dual-plane convergence: per topic, dst broker == src broker
    for t in ("view", "click"):
        full_topic = f"persistent://public/default/{t}"
        want = msgs.filter(F.col("topic") == t).count()
        got = spark.read.parquet(topic_dir(dst_broker, full_topic))
        assert got.count() == want, t
        assert (
            got.select("ledger_id", "entry_id").distinct().count() == want
        ), t


@pytest.mark.slow
def test_cli_main_ticks_and_converges(spark, tmp_path, capsys):
    """`python -m pulsar_sync_java_spark SRC DST --ticks 2` — the
    working CLI the reference's broken `PulsarSyncStarter.main` never
    provided: tick 1 applies the full catalog/cursor diff, tick 2 is
    the all-zero idempotent pass, each reported as one JSON line."""
    import json

    from pulsar_sync_java_spark.__main__ import main

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    msgs = build_messages(spark)
    msgs.repartition(2).write.parquet(os.path.join(src, "messages"))
    _write_catalog(
        spark,
        src,
        [("public",)],
        [("public", "default", "{}")],
        [("public", "default", "view", 2, {"owner": "sync"})],
        [
            (r.topic, r.partition, r.cursor, r.ts, r.event_id)
            for r in msgs.filter(
                (F.col("topic") == "view") & (F.col("partition") == 0)
            )
            .groupBy("topic")
            .agg(
                F.max_by(
                    F.struct(
                        F.col("event_time").alias("ts"),
                        F.col("entry_id").alias("event_id"),
                    ),
                    F.struct("event_time", "entry_id"),
                ).alias("s")
            )
            .select(
                "topic",
                F.lit(0).alias("partition"),
                F.lit("sub-a").alias("cursor"),
                F.col("s.ts").alias("ts"),
                F.col("s.event_id").alias("event_id"),
            )
            .collect()
        ],
    )
    _write_catalog(spark, dst, [], [], [], [])
    os.makedirs(os.path.join(dst, "messages"), exist_ok=True)

    rc = main([src, dst, "--ticks", "2"])
    assert rc == 0
    lines = [
        json.loads(l)
        for l in capsys.readouterr().out.strip().splitlines()
        if l.startswith("{")
    ]
    assert len(lines) == 2
    t0, t1 = lines
    assert t0["tick"] == 0 and t0["tenants"] == 1 and t0["topics"] == 1
    assert t0["cursors"] == 1
    # second tick: converged — every apply count zero
    assert t1["tick"] == 1
    assert all(v == 0 for k, v in t1.items() if k != "tick"), t1
