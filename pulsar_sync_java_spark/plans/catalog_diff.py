"""Catalog diff — the reference's entire control plane as one batch plan.

The reference walks tenant -> namespace -> topic hierarchies with async
managers, creating on dst whatever src has and dst lacks, tolerating
AlreadyExists conflicts, never deleting
(`PulsarTenantSyncManager.java:64-88`, `PulsarNamespaceSyncManager.java:67-94`,
`PulsarTopicSyncManager.java:67-94`, `PulsarPartitionTopicSyncManager.java:93-111`).

Re-expressed relationally, every level is the same operator:

    to_create = src LEFT ANTI JOIN dst ON key

- **Additive-only convergence**: the diff emits only inserts — no
  delete call exists anywhere in the reference (SURVEY.md §2 fine
  print), so `apply_diff` unions and never subtracts.
- **Idempotency == conflict-tolerance**: applying a diff twice is a
  no-op because the second anti-join is empty — the relational
  equivalent of treating ConflictException as success
  (`PulsarTenantSyncManager.java:79`).
- **Partition expansion** (R12): a partitioned topic with N partitions
  materializes physical names `topic + '-partition-' + i`
  (`PulsarPartitionedTopicSyncWorker.java:68-78`, suffix `Const.java:24`)
  via explode(sequence()) — a generator, not a driver-side loop.

Scale: catalogs are small relative to data (millions of topics at
most), but the same anti-join plan holds at any size — Spark picks
broadcast-anti when dst keys fit, shuffled-hash otherwise; nothing here
collects to the driver.
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

# `Const.java:24` — the reserved suffix separating logical partitioned
# topics from their physical per-partition topics.
PARTITION_SUFFIX = "-partition-"

TENANT_KEY = ["tenant"]
NAMESPACE_KEY = ["tenant", "namespace"]
TOPIC_KEY = ["tenant", "namespace", "topic"]


@dataclass(frozen=True)
class CatalogDiff:
    """Insert-only diff between a source and destination catalog."""

    tenants: DataFrame
    namespaces: DataFrame
    topics: DataFrame
    partitions: DataFrame  # physical per-partition topic names


def missing(src: DataFrame, dst: DataFrame, key: list[str]) -> DataFrame:
    """Rows of src whose key is absent from dst (the upsert planner's
    insert set).  Payload columns (policies, properties, partitions)
    ride along from src, mirroring create-with-payload (R6/R9)."""
    return src.join(dst.select(*key), on=key, how="left_anti")


def expand_partitions(topics: DataFrame) -> DataFrame:
    """R12: one row per physical partition of each partitioned topic.

    `partitions <= 0` or null means non-partitioned -> no physical
    expansion (the reference spawns a direct worker instead,
    `PulsarTopicSyncManager.java:96-101`).
    """
    n = F.col("partitions")
    return (
        topics.filter(n.isNotNull() & (n > 0))
        .select(
            "tenant",
            "namespace",
            "topic",
            F.explode(F.sequence(F.lit(0), n - 1)).alias("partition_idx"),
        )
        .select(
            "tenant",
            "namespace",
            F.concat(
                F.col("topic"), F.lit(PARTITION_SUFFIX), F.col("partition_idx")
            ).alias("partition_topic"),
            "partition_idx",
        )
    )


def non_partitioned(topics: DataFrame) -> DataFrame:
    """R10: the reference lists plain topics and *filters out* names
    containing '-partition' so physical partitions of partitioned
    topics are not re-created as plain topics
    (`PulsarTopicSyncManager.java:67-74`)."""
    return topics.filter(~F.col("topic").contains(PARTITION_SUFFIX.rstrip("-")))


def diff_catalogs(
    src_tenants: DataFrame,
    src_namespaces: DataFrame,
    src_topics: DataFrame,
    dst_tenants: DataFrame,
    dst_namespaces: DataFrame,
    dst_topics: DataFrame,
) -> CatalogDiff:
    """The full control-plane tick: three leveled anti-joins plus
    partition expansion — what the reference does with four manager
    classes and a 10-thread pool, as one declarative plan."""
    new_tenants = missing(src_tenants, dst_tenants, TENANT_KEY)
    new_namespaces = missing(src_namespaces, dst_namespaces, NAMESPACE_KEY)
    new_topics = missing(src_topics, dst_topics, TOPIC_KEY)
    return CatalogDiff(
        tenants=new_tenants,
        namespaces=new_namespaces,
        topics=new_topics,
        partitions=expand_partitions(new_topics),
    )


def apply_diff(dst: DataFrame, inserts: DataFrame, key: list[str]) -> DataFrame:
    """Idempotent, additive-only apply: union the inserts whose key is
    still absent (conflict-tolerance — a concurrent create wins and is
    treated as success, `PulsarTenantSyncManager.java:79`)."""
    safe = inserts.join(dst.select(*key), on=key, how="left_anti")
    return dst.unionByName(safe.select(*dst.columns))
