"""Sink-contract tests: file-count discipline, bucketed layout,
compaction row-preservation, idempotent append (§2 fine print:
conflict-tolerance / at-least-once replay safety)."""

from __future__ import annotations

import glob
import os

import pytest
from pyspark.sql import functions as F

from pulsar_sync_java_spark.sinks.writers import (
    compact,
    idempotent_append,
    write_bucketed,
    write_partitioned,
)


def _parquet_files(path: str) -> list[str]:
    return [
        f
        for f in glob.glob(os.path.join(path, "**", "*.parquet"), recursive=True)
        if os.path.basename(f) != "_SUCCESS"
    ]


@pytest.fixture()
def facts(spark):
    return spark.range(0, 10_000).select(
        F.col("id"),
        (F.col("id") % 7).alias("day"),
        (F.col("id") * 3).alias("v"),
    )


def test_write_partitioned_one_file_per_value(spark, facts, tmp_path):
    out = str(tmp_path / "t1")
    write_partitioned(facts, out, ["day"])
    files = _parquet_files(out)
    # 7 partition values -> exactly 7 files, not tasks x 7
    assert len(files) == 7
    got = spark.read.parquet(out)
    assert got.count() == 10_000
    assert got.groupBy("day").count().count() == 7


def test_write_partitioned_salted_splits_hot_value(spark, facts, tmp_path):
    out = str(tmp_path / "t2")
    write_partitioned(facts, out, ["day"], files_per_partition=4)
    by_part: dict[str, int] = {}
    for f in _parquet_files(out):
        part = os.path.basename(os.path.dirname(f))
        by_part[part] = by_part.get(part, 0) + 1
    assert set(by_part) == {f"day={d}" for d in range(7)}
    # the salt must actually split (AQE coalescing is pinned off for the
    # write — it would merge the salted groups back to one file here)
    assert all(2 <= n <= 4 for n in by_part.values()), by_part
    assert spark.read.parquet(out).count() == 10_000


def test_partition_cols_rejects_heterogeneous_layout(spark, facts, tmp_path):
    from pulsar_sync_java_spark.sinks.writers import _partition_cols

    out = str(tmp_path / "thet")
    facts.limit(10).write.partitionBy("day").parquet(out)
    facts.limit(10).withColumnRenamed("day", "hour").write.mode(
        "append"
    ).partitionBy("hour").parquet(out)
    with pytest.raises(ValueError, match="heterogeneous"):
        _partition_cols(spark, out)


def test_write_bucketed_join_has_no_exchange(spark, facts):
    write_bucketed(facts, "t_bucket_a", ["id"], 4, sort_cols=["id"])
    write_bucketed(
        facts.select("id", (F.col("v") * 2).alias("w")), "t_bucket_b", ["id"], 4,
        sort_cols=["id"],
    )
    # Force the shuffle-vs-bucket decision: with broadcast on the
    # table, the planner broadcasts and never consults bucketing (the
    # layout matters precisely when the dim does NOT fit in memory).
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        a = spark.table("t_bucket_a")
        b = spark.table("t_bucket_b")
        joined = a.join(b, "id")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange hashpartitioning" not in plan, plan
        assert "SortMergeJoin" in plan, plan
        assert joined.count() == 10_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS t_bucket_a")
        spark.sql("DROP TABLE IF EXISTS t_bucket_b")


def test_compact_merges_files_and_preserves_rows(spark, facts, tmp_path):
    out = str(tmp_path / "t3")
    # litter: 20 appends of 500 rows -> >= 20 files
    for i in range(20):
        facts.filter((F.col("id") >= i * 500) & (F.col("id") < (i + 1) * 500)).coalesce(
            1
        ).write.mode("append").parquet(out)
    assert len(_parquet_files(out)) >= 20
    before = sorted(r.id for r in spark.read.parquet(out).collect())

    n = compact(spark, out, target_file_bytes=10 * 1024 * 1024)
    files = _parquet_files(out)
    assert len(files) == n <= 3
    after = sorted(r.id for r in spark.read.parquet(out).collect())
    assert before == after
    assert not os.path.exists(out + "__compact_tmp")
    assert not os.path.exists(out + "__compact_old")


def test_compact_preserves_hive_partition_layout(spark, facts, tmp_path):
    """Compacting a partitioned sink must keep the key=value directory
    chain (flattening would break every partition-pruned consumer) and
    still merge the per-partition file litter."""
    out = str(tmp_path / "t3p")
    # litter: 6 appends, each partitioned by day -> ~42 files
    for i in range(6):
        facts.filter(
            (F.col("id") >= i * 500) & (F.col("id") < (i + 1) * 500)
        ).write.mode("append").partitionBy("day").parquet(out)
    assert len(_parquet_files(out)) >= 42
    before = sorted(r.id for r in spark.read.parquet(out).collect())

    n = compact(spark, out, target_file_bytes=10 * 1024 * 1024)
    files = _parquet_files(out)
    assert len(files) == n <= 7 * 2
    # layout intact: every file still lives under a day=<v> directory
    assert all("day=" in f for f in files), files[:3]
    after = spark.read.parquet(out)
    assert sorted(r.id for r in after.collect()) == before
    # and pruning still works on the compacted table
    pruned = after.where(F.col("day") == 3)
    pruned.collect()
    plan = pruned._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [" in plan and "day" in plan


def test_compact_splits_oversized_partition_value(spark, facts, tmp_path):
    """target_file_bytes applies PER PARTITION VALUE: a value bigger
    than the target is salted across ceil(bytes/target) files, not
    funneled through one task into one oversized file."""
    out = str(tmp_path / "t3h")
    # hot value: day 0 gets 50x the rows of the others
    hot = facts.withColumn("day", F.when(F.col("id") < 9000, 0).otherwise(F.col("day")))
    hot.write.mode("overwrite").partitionBy("day").parquet(out)
    sizes: dict[str, int] = {}
    for f in _parquet_files(out):
        part = os.path.basename(os.path.dirname(f))
        sizes[part] = sizes.get(part, 0) + os.path.getsize(f)
    # pick a target between the cold values and the hot one
    target = max(s for p, s in sizes.items() if p != "day=0") * 2
    assert sizes["day=0"] > 2 * target

    before = sorted(r.id for r in spark.read.parquet(out).collect())
    n = compact(spark, out, target_file_bytes=target)
    by_part: dict[str, int] = {}
    for f in _parquet_files(out):
        part = os.path.basename(os.path.dirname(f))
        by_part[part] = by_part.get(part, 0) + 1
    # hot value split across multiple writers; cold values stay at 1
    assert by_part["day=0"] > 1, by_part
    assert all(v == 1 for p, v in by_part.items() if p != "day=0"), by_part
    assert n == sum(by_part.values())
    assert sorted(r.id for r in spark.read.parquet(out).collect()) == before


def test_compact_preserves_partition_value_strings(spark, tmp_path):
    """Directory values round-trip verbatim through compaction: type
    inference is disabled for the rewrite pass, so `day=007` stays
    `day=007` (inference-enabled rewrite would canonicalize it to
    `day=7` and change downstream consumers' view of the table)."""
    out = str(tmp_path / "t3s")
    df = spark.createDataFrame(
        [(1, "007"), (2, "007"), (3, "1月"), (4, None)], "id long, day string"
    )
    df.write.mode("overwrite").partitionBy("day").parquet(out)
    dirs_before = {
        os.path.basename(os.path.dirname(f)) for f in _parquet_files(out)
    }
    compact(spark, out, target_file_bytes=10 * 1024 * 1024)
    dirs_after = {
        os.path.basename(os.path.dirname(f)) for f in _parquet_files(out)
    }
    assert dirs_before == dirs_after, (dirs_before, dirs_after)
    got = spark.read.parquet(out)
    assert got.count() == 4
    assert sorted(r.id for r in got.collect()) == [1, 2, 3, 4]


def test_idempotent_append_replay_is_noop(spark, facts, tmp_path):
    out = str(tmp_path / "t4")
    batch = facts.filter(F.col("id") < 100)
    assert idempotent_append(batch, out, ["id"]) == 100
    # replay (at-least-once redelivery): nothing appended
    assert idempotent_append(batch, out, ["id"]) == 0
    # overlapping later batch: only the new keys land
    batch2 = facts.filter((F.col("id") >= 50) & (F.col("id") < 150))
    assert idempotent_append(batch2, out, ["id"]) == 50
    assert spark.read.parquet(out).count() == 150


def test_idempotent_append_partitioned_replay_is_noop(spark, facts, tmp_path):
    out = str(tmp_path / "t5")
    batch = facts.filter(F.col("id") < 700)  # all 7 day values
    assert idempotent_append(batch, out, ["id"], partition_col="day") == 700
    assert idempotent_append(batch, out, ["id"], partition_col="day") == 0
    # a batch touching only day 0 and 1, half replayed
    batch2 = facts.filter(
        (F.col("id") >= 630) & (F.col("id") < 770) & (F.col("day") < 2)
    )
    n2 = batch2.count()
    dup2 = batch2.filter(F.col("id") < 700).count()
    assert idempotent_append(batch2, out, ["id"], partition_col="day") == n2 - dup2
    got = spark.read.parquet(out)
    assert got.count() == 700 + n2 - dup2
    # the layout really is Hive-partitioned by day
    assert any("day=0" in f for f in _parquet_files(out))


def test_idempotent_probe_scans_only_batch_partitions(spark, facts, tmp_path):
    """The 100 TB contract: the sink-existence probe must read ONLY the
    partition directories present in the micro-batch (replay horizon),
    not the whole sink history."""
    from pulsar_sync_java_spark.sinks.writers import _existing_keys

    out = str(tmp_path / "t6")
    idempotent_append(facts, out, ["id"], partition_col="day")  # 7 partitions
    probe = _existing_keys(spark, out, ["id"], "day", [2, 5])
    # execute the probe's own plan (collect, not count: count derives a
    # new plan whose metrics would not populate this one's scan)
    rows = probe.collect()
    assert len(rows) == facts.filter(F.col("day").isin(2, 5)).count()
    # the physical plan prunes partitions at the scan (PartitionFilters,
    # not a post-scan Filter) ...
    plan = probe._jdf.queryExecution().executedPlan().toString()
    pf = plan.split("PartitionFilters: [", 1)
    assert len(pf) == 2, plan
    assert "day" in pf[1].split("]", 1)[0], plan
    # ... and the executed scan actually read only the 2 matching
    # partition directories' files (numFiles metric), not all 7
    total_files = len(_parquet_files(out))
    matching_files = len(
        [f for f in _parquet_files(out) if "day=2" in f or "day=5" in f]
    )
    leaves = probe._jdf.queryExecution().executedPlan().collectLeaves()
    scan = leaves.apply(0)
    num_files = int(scan.metrics().apply("numFiles").value())
    assert num_files == matching_files < total_files, (
        num_files,
        matching_files,
        total_files,
    )


def test_idempotent_append_partitioned_null_partition_value(spark, tmp_path):
    out = str(tmp_path / "t7")
    df = spark.createDataFrame(
        [(1, "a"), (2, None), (3, "b")], "id long, day string"
    )
    assert idempotent_append(df, out, ["id"], partition_col="day") == 3
    # replayed rows — including the null-partition one — are no-ops
    assert idempotent_append(df, out, ["id"], partition_col="day") == 0
    assert spark.read.parquet(out).count() == 3


def test_compact_keeps_extensionless_data_files(spark, facts, tmp_path):
    """A partition value whose data file has no .parquet suffix (Hive/
    Impala writer style) must keep every row through compact: the
    sizing map counts all non-hidden files, and the salted-routing join
    is a LEFT join defaulting to one file — an inner join against a
    .parquet-only listing silently DELETED such values (review find)."""
    out = str(tmp_path / "text")
    facts.withColumn("day", (F.col("id") % 3).cast("int")).write.partitionBy(
        "day"
    ).parquet(out)
    # rewrite day=1's file extension-less, as a non-Spark writer would
    part = os.path.join(out, "day=1")
    files = [f for f in os.listdir(part) if f.endswith(".parquet")]
    assert files
    for i, f in enumerate(files):
        os.rename(os.path.join(part, f), os.path.join(part, f"000{i:03d}_0"))
    before = sorted(r.id for r in spark.read.parquet(out).collect())

    compact(spark, out, target_file_bytes=64 * 1024)  # force salting path
    after = sorted(r.id for r in spark.read.parquet(out).collect())
    assert before == after


def _file_stats(path, col):
    """(min, max) of `col` per parquet data file, from footer metadata."""
    import pyarrow.parquet as pq

    out = []
    for f in sorted(glob.glob(os.path.join(path, "part-*.parquet"))):
        md = pq.ParquetFile(f).metadata
        idx = md.schema.names.index(col)
        mn = min(md.row_group(g).column(idx).statistics.min for g in range(md.num_row_groups))
        mx = max(md.row_group(g).column(idx).statistics.max for g in range(md.num_row_groups))
        out.append((mn, mx))
    return out


def _overlapping(stats, lo, hi):
    return sum(1 for mn, mx in stats if mx >= lo and mn <= hi)


def test_zorder_prunes_on_every_dimension(spark, tmp_path):
    """Z-order vs linear sort on a 64x64 grid: the linear layout prunes
    only its leading column (every file spans the full y range), the
    z-ordered layout bounds BOTH columns per file so a point-range
    predicate on either dimension skips most files via footer stats."""
    from pulsar_sync_java_spark.sinks.writers import write_zordered

    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    zdir, ldir = str(tmp_path / "z"), str(tmp_path / "lin")
    write_zordered(grid, zdir, ["x", "y"], num_files=16)
    grid.repartitionByRange(16, "x").sortWithinPartitions("x").write.parquet(ldir)

    assert spark.read.parquet(zdir).count() == 64 * 64  # rows preserved
    n_z = len(_file_stats(zdir, "x"))
    n_l = len(_file_stats(ldir, "x"))
    # linear: x prunes, y does not (every file covers all of y)
    assert _overlapping(_file_stats(ldir, "x"), 10, 12) <= n_l // 2
    assert _overlapping(_file_stats(ldir, "y"), 10, 12) == n_l
    # z-order: BOTH dimensions prune
    assert _overlapping(_file_stats(zdir, "x"), 10, 12) <= n_z // 2, _file_stats(zdir, "x")
    assert _overlapping(_file_stats(zdir, "y"), 10, 12) <= n_z // 2, _file_stats(zdir, "y")


def test_zorder_key_validates_width(spark):
    from pulsar_sync_java_spark.sinks.writers import zorder_key

    df = spark.range(4).selectExpr("id a", "id b", "id c", "id d")
    with pytest.raises(ValueError):
        zorder_key(df, ["a", "b", "c", "d"], bits=16)  # 64 bits > long


def test_zorder_key_matches_python_morton_reference(spark):
    """The Spark expression must compute exactly the reference Morton
    key: min-max scale each column to `bits` bits (same IEEE double
    steps), then interleave bit planes column-major."""
    from pulsar_sync_java_spark.sinks.writers import zorder_key

    rows = [(x * 37 % 101, (x * 61 + 13) % 257) for x in range(500)]
    df = spark.createDataFrame(rows, "x long, y long")
    bits = 8
    got = [
        r["z"]
        for r in df.select(zorder_key(df, ["x", "y"], bits=bits).alias("z"))
        .orderBy("x", "y")
        .collect()
    ]

    xs, ys = [r[0] for r in rows], [r[1] for r in rows]
    def scale(v, mn, mx):
        span = (mx - mn) if mx > mn else 1.0
        return int((float(v) - mn) / span * ((1 << bits) - 1))
    def morton(sx, sy):
        z = 0
        for b in range(bits):
            z |= ((sx >> b) & 1) << (2 * b)
            z |= ((sy >> b) & 1) << (2 * b + 1)
        return z
    want = [
        morton(scale(x, min(xs), max(xs)), scale(y, min(ys), max(ys)))
        for x, y in sorted(rows)
    ]
    assert got == want


def test_compact_zorder_clusters_both_dimensions(spark, tmp_path):
    """OPTIMIZE ZORDER: compacting with zorder_cols must keep every row
    AND produce files whose footer stats prune on both listed columns
    (unpartitioned path: global range clustering across files)."""
    from pulsar_sync_java_spark.sinks.writers import compact

    out = str(tmp_path / "t")
    grid = spark.range(64 * 64).select(
        (F.col("id") % 64).alias("x"), (F.col("id") / 64).cast("long").alias("y")
    )
    # litter: many small files in random-ish order
    grid.orderBy(F.xxhash64("x", "y")).repartition(24).write.parquet(out)
    n = compact(spark, out, target_file_bytes=2 * 1024, zorder_cols=["x", "y"])
    assert spark.read.parquet(out).count() == 64 * 64
    stats_x = _file_stats(out, "x")
    stats_y = _file_stats(out, "y")
    assert len(stats_x) == n and n >= 10
    assert _overlapping(stats_x, 10, 12) <= n // 2, stats_x
    assert _overlapping(stats_y, 10, 12) <= n // 2, stats_y


def test_compact_zorder_keeps_hive_layout(spark, tmp_path):
    """Partitioned path: zorder_cols must not disturb the partition
    directory chain or row count."""
    from pulsar_sync_java_spark.sinks.writers import compact

    out = str(tmp_path / "p")
    grid = spark.range(2048).select(
        (F.col("id") % 2).cast("int").alias("part"),
        (F.col("id") % 32).alias("x"),
        (F.col("id") / 32).cast("long").alias("y"),
    )
    grid.repartition(8).write.partitionBy("part").parquet(out)
    compact(spark, out, zorder_cols=["x", "y"])
    back = spark.read.parquet(out)
    assert back.count() == 2048
    assert set(back.columns) == {"part", "x", "y"}
    assert back.groupBy("part").count().count() == 2


def test_partitioned_layout_enables_dynamic_partition_pruning(
    spark, facts, tmp_path
):
    """The hive-partitioned layout write_partitioned produces must let
    Catalyst prune partitions at RUNTIME from a join's dim-side filter
    (dynamic partition pruning) — at 100 TB this is the difference
    between scanning one day and scanning the whole fact table when the
    date predicate only exists on the dimension."""
    import io
    from contextlib import redirect_stdout

    out = str(tmp_path / "tdpp")
    write_partitioned(facts, out, ["day"])
    fact = spark.read.parquet(out)
    dim = spark.createDataFrame(
        [(d, "keep" if d == 3 else "drop") for d in range(7)],
        "day_key long, tag string",
    )
    joined = fact.join(dim.filter(F.col("tag") == "keep"),
                       fact.day == F.col("day_key"))
    buf = io.StringIO()
    with redirect_stdout(buf):
        joined.explain("formatted")
    plan = buf.getvalue()
    assert "dynamicpruning" in plan.lower(), plan
    # and the pruning is real: only day=3 rows are read/returned
    assert joined.count() == facts.filter(F.col("day") == 3).count()


def test_apply_compaction_plan_matches_plan_and_is_idempotent(
    spark, tmp_path
):
    """The execution half of q_compaction_plan (r9 verdict #5): landed
    files must equal the plan — one key-sorted file per group with
    exactly the planned row count and merged key range — rows of
    right-sized files must stay out of the rewrite even when their key
    range sits INSIDE a group's merged span, and re-running must land
    the identical layout."""
    from pulsar_sync_java_spark.sinks.writers import (
        apply_compaction_plan,
        compaction_groups,
        plan_compaction,
    )

    # keys 0..959 in 8-key files; file 5 (keys 40..47) is made
    # right-sized by repetition, so its range sits between undersized
    # files 4 and 6 that a group will merge across.
    base = spark.range(0, 960).select(F.col("id").alias("k"))
    fat = spark.range(0, 960).select(
        (F.lit(40) + F.pmod(F.col("id"), F.lit(8))).alias("k")
    )
    rows = base.unionByName(fat)
    file_id = F.expr("k div 8")
    files = rows.groupBy(file_id.alias("file_id")).agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.min("k").alias("min_key"),
        F.max("k").alias("max_key"),
    )
    assign = plan_compaction(files, target_rows=64, under_rows=32)
    groups = {
        r.group_id: r
        for r in compaction_groups(assign, 64).collect()
    }
    assert len(groups) > 1
    # the right-sized file is not planned...
    assert 5 not in {r.file_id for r in assign.collect()}
    # ...but some group's merged range spans its keys
    assert any(g.min_key < 40 and g.max_key > 47 for g in groups.values())

    path = str(tmp_path / "compacted")
    out = apply_compaction_plan(rows, assign, path, file_id, "k")
    assert out["groups"] == len(groups) == out["files"]

    landed = _parquet_files(path)
    assert len(landed) == len(groups)  # one file per group
    back = spark.read.parquet(path)
    # the fat file's rows never entered the rewrite
    assert back.filter((F.col("k") >= 40) & (F.col("k") <= 47)).count() == 0
    got = {
        r.group_id: r
        for r in back.groupBy("group_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("k").alias("lo"),
            F.max("k").alias("hi"),
        )
        .collect()
    }
    assert set(got) == set(groups)
    for gid, g in groups.items():
        assert (got[gid].n, got[gid].lo, got[gid].hi) == (
            g.total_rows,
            g.min_key,
            g.max_key,
        )

    # idempotent: the rewrite is deterministic, replay lands the same
    before = sorted(
        (os.path.relpath(f, path), os.path.getsize(f)) for f in landed
    )
    out2 = apply_compaction_plan(rows, assign, path, file_id, "k")
    after = sorted(
        (os.path.relpath(f, path), os.path.getsize(f))
        for f in _parquet_files(path)
    )
    assert out2 == out and [s for _, s in before] == [s for _, s in after]

    # divergence detection fires: rows missing vs the plan's stats must
    # raise, not silently land a plan-violating layout (and the
    # null-safe compare catches a planned group that never lands at all
    # — drop every row of the last group's key range)
    last = max(groups.values(), key=lambda g: g.group_id)
    short = rows.filter(
        (F.col("k") % 11 != 0) & ~F.col("k").between(last.min_key, last.max_key)
    )
    with pytest.raises(ValueError, match="diverge"):
        apply_compaction_plan(
            short, assign, str(tmp_path / "diverged"), file_id, "k"
        )

    # an EMPTY plan (every file right-sized) is a healthy no-op tick,
    # not a crash: zeros returned, nothing written
    healthy = plan_compaction(files, target_rows=64, under_rows=1)
    assert healthy.count() == 0
    out0 = apply_compaction_plan(
        rows, healthy, str(tmp_path / "noop"), file_id, "k"
    )
    assert out0 == {"groups": 0, "rows": 0, "files": 0}
    assert not os.path.exists(str(tmp_path / "noop"))


def test_compacting_stream_file_count_converges_across_restart(
    spark, tmp_path
):
    """r10 verdict #5: the compaction lifecycle runs IN-STREAM — a
    checkpointed ingestion stream appends small files and a periodic
    foreachBatch maintenance tick folds them into ~target-row compacted
    files.  Across a stop/restart AND a checkpoint wipe the row set
    stays exact and the file count converges instead of growing with
    batch count."""
    from pulsar_sync_java_spark.sinks.writers import (
        compacting_append_stream,
    )

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    ckpt = str(tmp_path / "ckpt")

    def batch(lo, hi):
        return spark.range(lo, hi).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        )

    def run():
        q = (
            compacting_append_stream(
                # one source file per micro-batch, so the sink actually
                # accretes trigger-sized small files for the ticks to fold
                spark.readStream.schema("k long, v long")
                .option("maxFilesPerTrigger", 1)
                .parquet(src),
                sink,
                ckpt,
                keys=["k"],
                key_col="k",
                target_rows=100,
                under_rows=100,
                compact_every=1,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    # phase 1: four 25-row files land one micro-batch each; the ticks
    # fold them up to the 100-row target
    for i in range(4):
        batch(i * 25, (i + 1) * 25).repartition(1).write.mode(
            "append"
        ).parquet(src)
    run()
    files1 = _parquet_files(sink)
    back = spark.read.parquet(sink)
    assert sorted(r["k"] for r in back.collect()) == list(range(100))
    # 100 rows at target 100 -> converged to ONE right-sized compacted
    # file (the undersized tail keeps absorbing arrivals)
    assert len(files1) == 1 and "compacted-" in files1[0], files1

    # phase 2: restart from checkpoint with four more small batches
    for i in range(4, 8):
        batch(i * 25, (i + 1) * 25).repartition(1).write.mode(
            "append"
        ).parquet(src)
    run()
    files2 = _parquet_files(sink)
    assert sorted(
        r["k"] for r in spark.read.parquet(sink).collect()
    ) == list(range(200))
    # two right-sized compacted files, NOT 8 trigger-sized ones
    assert len(files2) == 2 and all("compacted-" in f for f in files2), files2

    # phase 3: checkpoint WIPE — the whole source replays; appends are
    # key-deduped no-ops and the maintenance tick plans nothing
    import shutil

    shutil.rmtree(ckpt)
    run()
    assert sorted(
        r["k"] for r in spark.read.parquet(sink).collect()
    ) == list(range(200))
    assert sorted(_parquet_files(sink)) == sorted(files2)


def test_compaction_manifest_recovery_completes_interrupted_commit(
    spark, tmp_path
):
    """The crash window between publish (rename) and retire (source
    deletes): a manifest whose destination EXISTS must finish the
    commit — retire the sources so their rows are not duplicated —
    and a manifest whose destination does NOT exist must be discarded,
    leaving the sources authoritative for the next plan."""
    import json
    import shutil

    from pulsar_sync_java_spark.sinks.writers import (
        _recover_compaction_commits,
        compact_table_files,
    )

    sink = str(tmp_path / "t")
    for i in range(4):
        spark.range(i * 25, (i + 1) * 25).select(
            F.col("id").alias("k")
        ).repartition(1).write.mode("append").parquet(sink)
    pre = {
        os.path.basename(f): f
        for f in _parquet_files(sink)
        if "compacted-" not in f
    }
    keep = sorted(pre)[0]
    saved = str(tmp_path / "saved.parquet")
    shutil.copyfile(pre[keep], saved)

    out = compact_table_files(spark, sink, "k", 100, 50)
    assert out["groups"] == 1 and out["consumed_files"] == 4
    dest = [
        os.path.basename(f)
        for f in _parquet_files(sink)
        if "compacted-" in f
    ]
    assert len(dest) == 1
    assert spark.read.parquet(sink).count() == 100

    # simulate the crash: one source resurrected (its delete "never
    # happened") with the manifest still on disk
    shutil.copyfile(saved, os.path.join(sink, keep))
    with open(
        os.path.join(sink, "_compact_manifest_0.json"), "w"
    ) as fh:
        json.dump({"dest": dest[0], "sources": [keep]}, fh)
    assert spark.read.parquet(sink).count() == 125  # duplicates visible

    # the next tick's recovery completes the commit before planning
    assert _recover_compaction_commits(spark, sink) == 1
    assert spark.read.parquet(sink).count() == 100
    assert not glob.glob(os.path.join(sink, "_compact_manifest_*"))

    # the rollback side, on an honestly-constructed pre-publish crash
    # state (fresh table, manifest written, rename never happened):
    # recovery must keep the sources — they are the only copy — and
    # drop the manifest so the next tick re-plans the group
    sink2 = str(tmp_path / "t2")
    for i in range(2):
        spark.range(i * 25, (i + 1) * 25).select(
            F.col("id").alias("k")
        ).repartition(1).write.mode("append").parquet(sink2)
    srcs2 = sorted(
        os.path.basename(f) for f in _parquet_files(sink2)
    )
    with open(
        os.path.join(sink2, "_compact_manifest_0.json"), "w"
    ) as fh:
        json.dump({"dest": "compacted-never-published.parquet",
                   "sources": srcs2}, fh)
    assert _recover_compaction_commits(spark, sink2) == 0
    assert sorted(
        os.path.basename(f) for f in _parquet_files(sink2)
    ) == srcs2
    assert not glob.glob(os.path.join(sink2, "_compact_manifest_*"))
    out2 = compact_table_files(spark, sink2, "k", 100, 100)
    assert out2["consumed_files"] == 2
    assert spark.read.parquet(sink2).count() == 50


def test_compact_table_files_tolerates_all_null_key_file(spark, tmp_path):
    """idempotent_append explicitly supports NULL key values, so a
    landed file whose every row has a null key gives min_key/max_key
    NULL in the maintenance tick's stats — the planner sort and the
    group range reduction must not TypeError on it (a crash here
    wedges the ingest loop: the file persists, every restart re-ticks
    into the same comparison), and the null-key rows must survive the
    rewrite."""
    from pulsar_sync_java_spark.sinks.writers import compact_table_files

    sink = str(tmp_path / "t")
    for i in range(3):
        spark.range(i * 25, (i + 1) * 25).select(
            F.col("id").alias("k")
        ).repartition(1).write.mode("append").parquet(sink)
    spark.createDataFrame(
        [(None,)] * 10, "k bigint"
    ).repartition(1).write.mode("append").parquet(sink)

    out = compact_table_files(spark, sink, "k", 200, 100)
    assert out["groups"] >= 1 and out["consumed_files"] >= 2
    got = spark.read.parquet(sink)
    assert got.count() == 85
    assert got.filter(F.col("k").isNull()).count() == 10
    # a second tick on the converged layout plans nothing and the
    # null rows are still there
    out2 = compact_table_files(spark, sink, "k", 200, 100)
    assert out2["groups"] == 0
    assert spark.read.parquet(sink).filter(F.col("k").isNull()).count() == 10


def test_compact_table_files_all_null_key_only_sink(spark, tmp_path):
    """The extreme of the null-key case (r11 advice): a young sink fed
    ONLY null-key rows has no non-null min/max anywhere, so schema
    inference on the stats frame has nothing to infer from — the
    explicit key-typed schema keeps the tick planning (and folding)
    instead of crash-looping on createDataFrame."""
    from pulsar_sync_java_spark.sinks.writers import compact_table_files

    sink = str(tmp_path / "t")
    for _ in range(3):
        spark.createDataFrame(
            [(None,)] * 10, "k bigint"
        ).repartition(1).write.mode("append").parquet(sink)

    out = compact_table_files(spark, sink, "k", 200, 100)
    assert out["groups"] == 1 and out["consumed_files"] == 3
    got = spark.read.parquet(sink)
    assert got.count() == 30
    assert got.filter(F.col("k").isNull()).count() == 30
    # converged: a second tick plans nothing
    assert compact_table_files(spark, sink, "k", 200, 100)["groups"] == 0


def test_compact_table_files_max_files_chunks_backlog(spark, tmp_path):
    """The driver-metadata bound (r11 verdict #4): a tick stats and
    plans at most `max_files` files, reports the deferred remainder
    loudly, and successive chunked ticks converge to the same
    fixpoint a single unbounded tick reaches — a 10^6-file backlog
    becomes bounded ticks, never one 10^6-row driver collect."""
    import glob as _glob

    import pytest

    from pulsar_sync_java_spark.sinks.writers import compact_table_files

    sink = str(tmp_path / "t")
    for i in range(6):
        spark.range(i * 10, (i + 1) * 10).select(
            F.col("id").alias("k")
        ).repartition(1).write.mode("append").parquet(sink)

    out = compact_table_files(spark, sink, "k", 1000, 500, max_files=3)
    assert out["deferred_files"] >= 3  # _SUCCESS is not plannable
    assert out["groups"] == 1 and out["consumed_files"] == 3

    # keep ticking with the same bound until converged
    for _ in range(4):
        out = compact_table_files(spark, sink, "k", 1000, 500, max_files=3)
        if out["groups"] == 0 and out["deferred_files"] == 0:
            break
    # all 60 rows survive, layout folded well below the input count
    got = spark.read.parquet(sink)
    assert sorted(r["k"] for r in got.collect()) == list(range(60))
    data_files = [
        f
        for f in _glob.glob(f"{sink}/*.parquet")
        if "_SUCCESS" not in f
    ]
    assert len(data_files) <= 3

    # a bound that cannot form a pair is a misconfiguration, loudly
    with pytest.raises(ValueError, match="max_files"):
        compact_table_files(spark, sink, "k", 1000, 500, max_files=1)


def test_compacting_stream_maintenance_monitor_rows(spark, tmp_path):
    """Maintenance observability (the r11 #4 bound made actionable):
    with `maintenance_dir` set, every compaction tick appends ONE
    keyed health row — and a bounded tick chunking through a backlog
    reports `deferred_files > 0` loudly instead of silently planning
    a subset.  Keyed first-write-wins: a checkpoint-wipe replay's
    re-run ticks (which see the converged layout and plan nothing)
    must not overwrite the first processing's numbers."""
    import shutil

    from pulsar_sync_java_spark.sinks.writers import (
        compacting_append_stream,
    )

    src = str(tmp_path / "src")
    sink = str(tmp_path / "sink")
    monitor = str(tmp_path / "maint")

    # pre-seed the sink with a 6-file backlog so the FIRST tick's
    # max_files=3 bound must defer files
    for i in range(6):
        spark.range(1000 + i * 10, 1000 + (i + 1) * 10).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        ).repartition(1).write.mode("append").parquet(sink)

    def run(ck):
        q = (
            compacting_append_stream(
                spark.readStream.schema("k long, v long")
                .option("maxFilesPerTrigger", 1)
                .parquet(src),
                sink,
                ck,
                keys=["k"],
                key_col="k",
                target_rows=1000,
                under_rows=500,
                compact_every=1,
                max_files=3,
                maintenance_dir=monitor,
            )
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(120)

    for i in range(3):
        spark.range(i * 25, (i + 1) * 25).select(
            F.col("id").alias("k"), (F.col("id") * 10).alias("v")
        ).repartition(1).write.mode("append").parquet(src)
    run(str(tmp_path / "ckpt"))

    rows = {
        r["batch_id"]: r for r in spark.read.parquet(monitor).collect()
    }
    # compact_every=1 -> one health row per micro-batch
    assert sorted(rows) == [0, 1, 2]
    # the backlog tick deferred loudly under the max_files bound
    assert rows[0]["deferred_files"] > 0, rows[0]
    # ticks folded files: some tick consumed sources
    assert any(r["consumed_files"] > 0 for r in rows.values())
    # every ingested row survives maintenance
    got = sorted(r["k"] for r in spark.read.parquet(sink).collect())
    assert got == list(range(75)) + list(range(1000, 1060))

    # checkpoint-wipe replay: re-run ticks see a (more) converged
    # layout — the keyed monitor rows keep the FIRST numbers
    before = {b: tuple(r) for b, r in rows.items()}
    run(str(tmp_path / "ckpt2"))
    after = {
        r["batch_id"]: tuple(r)
        for r in spark.read.parquet(monitor).collect()
    }
    assert after == before
