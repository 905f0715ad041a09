"""Convergence tests for the catalog-diff plane — the reference's test
strategy (arrange on src -> run -> assert dst converges; SURVEY.md §5)
in batch form, plus the invariants its E2E tests leave untested:
idempotency, additive-only, partition expansion fidelity.
"""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from pulsar_sync_java_spark.plans.catalog_diff import (
    NAMESPACE_KEY,
    TENANT_KEY,
    TOPIC_KEY,
    apply_diff,
    diff_catalogs,
    expand_partitions,
    non_partitioned,
)


@pytest.fixture()
def catalogs(spark):
    src_tenants = spark.createDataFrame(
        [("public",), ("test-tenant",), ("acme",)], ["tenant"]
    )
    dst_tenants = spark.createDataFrame([("public",)], ["tenant"])
    src_ns = spark.createDataFrame(
        [
            ("public", "default", '{"retention": 7}'),
            ("public", "test-ns", "{}"),
            ("acme", "prod", '{"retention": 30}'),
        ],
        ["tenant", "namespace", "policies"],
    )
    dst_ns = spark.createDataFrame(
        [("public", "default", '{"retention": 7}')],
        ["tenant", "namespace", "policies"],
    )
    src_topics = spark.createDataFrame(
        [
            ("public", "default", "orders", 2, True),
            ("public", "default", "audit", None, False),
            ("acme", "prod", "clicks", 3, True),
        ],
        "tenant string, namespace string, topic string, partitions int, partitioned boolean",
    )
    dst_topics = spark.createDataFrame(
        [("public", "default", "orders", 2, True)],
        "tenant string, namespace string, topic string, partitions int, partitioned boolean",
    )
    return src_tenants, src_ns, src_topics, dst_tenants, dst_ns, dst_topics


def test_diff_inserts_only_what_is_missing(spark, catalogs):
    """Mirror of PulsarTenantSyncTest/PulsarNamespaceSyncTest: after one
    sync tick, dst contains what src has."""
    d = diff_catalogs(*catalogs)
    assert {r.tenant for r in d.tenants.collect()} == {"test-tenant", "acme"}
    assert {(r.tenant, r.namespace) for r in d.namespaces.collect()} == {
        ("public", "test-ns"),
        ("acme", "prod"),
    }
    assert {r.topic for r in d.topics.collect()} == {"audit", "clicks"}


def test_partition_expansion_matches_reference_naming(spark, catalogs):
    """PulsarTopicSyncTest asserts physical partitions topic-partition-0/1
    exist on dst (PulsarTopicSyncTest.java:52-59); same contract here."""
    d = diff_catalogs(*catalogs)
    parts = {(r.partition_topic, r.partition_idx) for r in d.partitions.collect()}
    assert parts == {
        ("clicks-partition-0", 0),
        ("clicks-partition-1", 1),
        ("clicks-partition-2", 2),
    }
    # non-partitioned topics expand to nothing
    assert expand_partitions(
        d.topics.filter(~F.col("partitioned"))
    ).count() == 0


def test_partition_name_filter(spark):
    """R10: physical partition names never re-enter the plain-topic
    plane (PulsarTopicSyncManager.java:72-74)."""
    topics = spark.createDataFrame(
        [
            ("t", "ns", "plain", None, False),
            ("t", "ns", "orders-partition-0", None, False),
        ],
        "tenant string, namespace string, topic string, partitions int, partitioned boolean",
    )
    kept = [r.topic for r in non_partitioned(topics).collect()]
    assert kept == ["plain"]


def test_apply_is_idempotent_and_additive(spark, catalogs):
    """Conflict-tolerance analogue: applying the same diff twice is a
    no-op; entities present only on dst are never removed."""
    src_tenants, src_ns, src_topics, dst_tenants, dst_ns, dst_topics = catalogs
    dst_extra = dst_tenants.union(spark.createDataFrame([("dst-only",)], ["tenant"]))
    d = diff_catalogs(src_tenants, src_ns, src_topics, dst_extra, dst_ns, dst_topics)

    once = apply_diff(dst_extra, d.tenants, TENANT_KEY)
    twice = apply_diff(once, d.tenants, TENANT_KEY)
    names_once = sorted(r.tenant for r in once.collect())
    names_twice = sorted(r.tenant for r in twice.collect())
    assert names_once == names_twice == ["acme", "dst-only", "public", "test-tenant"]

    ns_once = apply_diff(dst_ns, d.namespaces, NAMESPACE_KEY)
    ns_twice = apply_diff(ns_once, d.namespaces, NAMESPACE_KEY)
    assert ns_once.count() == ns_twice.count() == 3

    t_once = apply_diff(dst_topics, d.topics.select(*dst_topics.columns), TOPIC_KEY)
    assert apply_diff(t_once, d.topics.select(*dst_topics.columns), TOPIC_KEY).count() == t_once.count() == 3


def test_policies_payload_rides_along(spark, catalogs):
    """The gap the reference's tests leave open (SURVEY.md §5): created
    namespaces carry their policies payload (R6 create-with-policies,
    PulsarNamespaceSyncManager.java:78-79)."""
    d = diff_catalogs(*catalogs)
    rows = {(r.tenant, r.namespace): r.policies for r in d.namespaces.collect()}
    assert rows[("acme", "prod")] == '{"retention": 30}'
