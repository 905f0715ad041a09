"""Per-micro-batch dim refresh (streaming/enrich.py): the dimension is
re-read every batch, so an update lands mid-stream; the keyed sink
makes full replays no-ops (reference analogue: policies re-fetched per
pass, PulsarNamespaceSyncManager.java:74-78)."""

from __future__ import annotations

import shutil

from pulsar_sync_java_spark.streaming.enrich import enrich_stream

FACT_SCHEMA = "event_id long, user_id long, amount double"


def _run(spark, src, dim, sink, ckpt):
    stream = spark.readStream.schema(FACT_SCHEMA).option(
        "maxFilesPerTrigger", 1
    ).parquet(src)
    q = (
        enrich_stream(
            stream, dim, on="user_id", sink_dir=sink,
            checkpoint_dir=ckpt, keys=["event_id"],
        )
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)


def test_enrich_sees_dim_updates_and_replays_are_noops(spark, tmp_path):
    src = str(tmp_path / "facts")
    dim = str(tmp_path / "dim")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    spark.createDataFrame(
        [(1, "bronze"), (2, "silver")], "user_id long, tier string"
    ).write.parquet(dim)
    spark.createDataFrame(
        [(100, 1, 9.5), (101, 2, 3.0), (102, 7, 1.0)], FACT_SCHEMA
    ).coalesce(1).write.parquet(src)
    _run(spark, src, dim, sink, ckpt)

    got = {r.event_id: r.tier for r in spark.read.parquet(sink).collect()}
    # v1 enrichment, and the dim-less fact survives with null tier
    assert got == {100: "bronze", 101: "silver", 102: None}

    # dim UPDATE between batches: user 1 promoted, user 7 appears
    spark.createDataFrame(
        [(1, "gold"), (2, "silver"), (7, "bronze")],
        "user_id long, tier string",
    ).write.mode("overwrite").parquet(dim)
    spark.createDataFrame(
        [(103, 1, 2.0), (104, 7, 4.0)], FACT_SCHEMA
    ).coalesce(1).write.mode("append").parquet(src)
    _run(spark, src, dim, sink, ckpt)

    got = {r.event_id: r.tier for r in spark.read.parquet(sink).collect()}
    assert got[103] == "gold" and got[104] == "bronze"  # fresh dim used
    assert got[100] == "bronze" and got[102] is None    # history untouched
    assert len(got) == 5

    # checkpoint WIPE + full replay: the keyed sink appends nothing
    shutil.rmtree(ckpt)
    _run(spark, src, dim, sink, ckpt)
    rows = spark.read.parquet(sink).collect()
    assert len(rows) == 5
    assert {r.event_id: r.tier for r in rows} == got
