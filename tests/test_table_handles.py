"""The load_table handle memo (r14): repeated loads of the same table
return the SAME lazy DataFrame handle (plan-construction cost paid
once per session), while the memo never caches DATA — the handle is a
plain unmaterialized plan whose every action re-scans the parquet
files — and never leaks across sessions or directories."""

from __future__ import annotations

from pulsar_sync_java_spark.sources.tables import _TABLE_HANDLES, load_table
from tests.conftest import SF_DIR


def test_same_session_same_dir_returns_one_handle(spark):
    a = load_table(spark, SF_DIR, "orders")
    b = load_table(spark, SF_DIR, "orders")
    assert a is b
    # a different table is a different handle
    c = load_table(spark, SF_DIR, "lineitem")
    assert c is not a


def test_handles_are_plain_lazy_plans_not_cached_data(spark):
    df = load_table(spark, SF_DIR, "orders")
    # not persisted: no storage level beyond NONE, nothing in the
    # cache manager — the memo must never become a persist in disguise
    assert df.storageLevel.useMemory is False
    assert df.storageLevel.useDisk is False
    # and actions still work (scan the files) after repeated fetches
    assert load_table(spark, SF_DIR, "orders").count() == df.count()


def test_handle_keyed_by_application_and_dir(spark):
    load_table(spark, SF_DIR, "orders")
    app = spark.sparkContext.applicationId
    keys = [k for k in _TABLE_HANDLES if k[0] == app]
    assert all(len(k) == 3 for k in keys)
    # a different sf_dir misses the memo (distinct key), so immutable
    # per-directory file listings can never cross-contaminate
    import os

    assert (
        app,
        os.path.realpath(SF_DIR),
        "orders",
    ) in _TABLE_HANDLES
