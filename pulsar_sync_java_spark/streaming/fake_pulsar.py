"""A minimal Spark 4 Python DataSource registered as ``pulsar`` — the
test/dev substrate that lets the REAL ``format("pulsar")`` binding
execute end-to-end without a broker (r6 verdict #1).

Why this exists: the engine's deploy adapter
(`streaming/pulsar_connector.py`) builds the exact option dicts the
public Pulsar Spark connector consumes, but until round 7 those dicts
were only ever exercised AS DICTS — the one failure mode a real user
hits on day one (an option-name typo, a malformed service URL, a
missing required option) was untested because `format("pulsar")` had
never run.  The reference's entire test strategy is dual-broker
convergence (`pulsar-sync-tests/PulsarMessageSyncTest.java:38-64`:
produce to src, sync, await dst convergence); this module is the
broker stand-in that lets tests/test_streaming.py replay that exact
scenario through `read_pulsar_stream -> message_projection ->
write_pulsar_stream`.

Fidelity contract (what makes the fake a meaningful gate):

- It registers under the REAL short name ``pulsar``, so
  `spark.readStream.format("pulsar")` resolves to it with zero changes
  to the connector module.
- Its reader/writer VALIDATE the option names and shapes the public
  connector requires (`service.url` must be a pulsar:// URL,
  `admin.url` http(s)://, `predefinedSubscription` non-empty, exactly
  one of `topics`/`topicsPattern`, `startingOffsets` in
  earliest/latest, producer `topic` required) and raise on drift — if
  `consumer_options` ever renames a key, the binding test fails here
  instead of on a production cluster.
- A "broker" is a directory (`fake.storage.root` option — the one
  fake-only option, passed through the connector module's
  `extra_options` escape hatch, where a real deployment would put auth
  settings): ``<root>/topics/<quoted-topic>/*.parquet`` holds messages
  in MESSAGE_SCHEMA, ``<root>/subscriptions/<name>.json`` holds the
  committed cursor (written by the reader's `commit`, the ack half of
  produce-then-ack).
- Offsets are sets of consumed file names per topic (JSON dicts with
  sorted lists) — append-robust (a file whose name sorts before
  already-consumed ones is still new) and exactly replayable
  (`readBetweenOffsets` re-serves a checkpointed range
  deterministically, Spark's recovery contract).
- The writer stages each task's rows as a parquet file under
  ``<root>/.staging/`` and only MOVES them into the topic directory at
  epoch `commit` — the produce-then-ack ordering of
  `PulsarPartitionSyncWorker.java:231-244` (a crash before commit
  leaves staging garbage, never a half-visible batch).

Scale note: this is a TEST substrate — the reader is a
SimpleDataSourceStreamReader (driver-side reads, one implicit
partition), which is exactly wrong at production scale and exactly
right for validating option plumbing and replay semantics.  The
production path remains the JVM connector jar; see
`pulsar_connector.py`'s CONNECTOR_PACKAGE.
"""

from __future__ import annotations

import json
import os
import shutil
import uuid
from dataclasses import dataclass
from urllib.parse import quote

from pyspark.sql.datasource import (
    DataSource,
    DataSourceStreamWriter,
    SimpleDataSourceStreamReader,
    WriterCommitMessage,
)

from pulsar_sync_java_spark.streaming.replicate import MESSAGE_SCHEMA

#: The one fake-only option: the directory standing in for a broker.
#: Real deployments put connector-specific extras (auth, TLS) in the
#: same `extra_options` slot of read_pulsar_stream/write_pulsar_stream.
STORAGE_ROOT_OPTION = "fake.storage.root"

_MESSAGE_COLUMNS = [
    "tenant",
    "namespace",
    "topic",
    "partition",
    "ledger_id",
    "entry_id",
    "batch_idx",
    "key",
    "value",
    "event_time",
    "publish_time",
    "properties",
]


def topic_dir(root: str, topic: str) -> str:
    """Directory holding a topic's messages.  URL-quoting keeps full
    Pulsar topic names (`persistent://tenant/ns/topic`) filesystem-safe
    while staying deterministic and reversible."""
    return os.path.join(root, "topics", quote(topic, safe=""))


def subscription_path(root: str, subscription: str) -> str:
    return os.path.join(root, "subscriptions", quote(subscription, safe="") + ".json")


def _require(options, key: str) -> str:
    val = options.get(key)
    if val is None or str(val) == "":
        raise ValueError(
            f"fake pulsar: required option {key!r} is missing — the real "
            "connector would reject this load the same way (option-name "
            "drift between pulsar_connector.py and the connector contract)"
        )
    return str(val)


def _validate_urls(options) -> None:
    service = _require(options, "service.url")
    if not service.startswith("pulsar://"):
        raise ValueError(
            f"fake pulsar: service.url must be a pulsar:// URL, got {service!r}"
        )
    admin = _require(options, "admin.url")
    if not (admin.startswith("http://") or admin.startswith("https://")):
        raise ValueError(
            f"fake pulsar: admin.url must be an http(s) URL, got {admin!r}"
        )


def _storage_root(options) -> str:
    root = _require(options, STORAGE_ROOT_OPTION)
    if not os.path.isdir(root):
        raise ValueError(f"fake pulsar: storage root {root!r} is not a directory")
    return root


class _FakePulsarStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        _validate_urls(options)
        self._root = _storage_root(options)
        self._subscription = _require(options, "predefinedSubscription")
        starting = str(options.get("startingOffsets", "earliest"))
        if starting not in ("earliest", "latest"):
            raise ValueError(
                "fake pulsar: startingOffsets must be earliest|latest, "
                f"got {starting!r}"
            )
        self._starting = starting
        topics = options.get("topics")
        pattern = options.get("topicsPattern")
        if (topics is None) == (pattern is None):
            raise ValueError(
                "fake pulsar: exactly one of topics / topicsPattern required"
            )
        for k in (
            "pulsar.reader.autoUpdatePartitions",
            "pulsar.consumer.autoUpdatePartitions",
        ):
            v = options.get(k)
            if v is not None and str(v) not in ("true", "false"):
                raise ValueError(f"fake pulsar: {k} must be true|false, got {v!r}")
        if topics is not None:
            self._topics = [t for t in str(topics).split(",") if t]
        else:
            import re

            rx = re.compile(str(pattern))
            tdir = os.path.join(self._root, "topics")
            names = sorted(os.listdir(tdir)) if os.path.isdir(tdir) else []
            from urllib.parse import unquote

            self._topics = [t for t in map(unquote, names) if rx.fullmatch(t)]

    # -- offset bookkeeping: {topic: sorted list of consumed files} --

    def _files(self, topic: str) -> list[str]:
        d = topic_dir(self._root, topic)
        if not os.path.isdir(d):
            return []
        return sorted(
            f
            for f in os.listdir(d)
            if f.endswith(".parquet") and not f.startswith((".", "_"))
        )

    def initialOffset(self) -> dict:
        if self._starting == "latest":
            return {t: self._files(t) for t in self._topics}
        return {t: [] for t in self._topics}

    def _rows_of(self, topic: str, files: list[str]):
        import pyarrow as pa
        import pyarrow.parquet as pq

        d = topic_dir(self._root, topic)
        for f in files:
            table = pq.read_table(os.path.join(d, f))
            # normalize timestamps to tz-aware microseconds: Spark's
            # default INT96 output reads back as tz-NAIVE nanosecond
            # values (pandas Timestamps after to_pylist), which the
            # ingestion converter rejects; arrow's naive->UTC cast is
            # shift-free, matching INT96's UTC-adjusted convention
            for c in ("event_time", "publish_time"):
                i = table.schema.get_field_index(c)
                if i >= 0:
                    table = table.set_column(
                        i,
                        c,
                        table.column(i).cast(pa.timestamp("us", tz="UTC")),
                    )
            for rec in table.to_pylist():
                props = rec.get("properties")
                if props is not None and not isinstance(props, dict):
                    props = dict(props)  # pyarrow map -> list of pairs
                yield tuple(
                    props if c == "properties" else rec.get(c)
                    for c in _MESSAGE_COLUMNS
                )

    def read(self, start: dict):
        end: dict = {}
        rows: list[tuple] = []
        for t in self._topics:
            seen = set(start.get(t, []))
            fresh = [f for f in self._files(t) if f not in seen]
            end[t] = sorted(seen | set(fresh))
            # materialized, not a generator: Spark's SimpleStreamReader
            # prefetch cache copy.copy()s the returned iterator, which a
            # generator cannot survive (driver-side and test-scale by
            # design — see module docstring)
            rows.extend(self._rows_of(t, fresh))
        return iter(rows), end

    def readBetweenOffsets(self, start: dict, end: dict):
        for t in self._topics:
            fresh = [
                f for f in end.get(t, []) if f not in set(start.get(t, []))
            ]
            yield from self._rows_of(t, sorted(fresh))

    def commit(self, end: dict) -> None:
        # the ack half of produce-then-ack: the durable subscription
        # cursor, advanced only after Spark has committed the epoch
        path = subscription_path(self._root, self._subscription)
        os.makedirs(os.path.dirname(path), exist_ok=True)
        tmp = path + ".tmp"
        with open(tmp, "w") as fh:
            json.dump(end, fh, sort_keys=True)
        os.replace(tmp, path)


@dataclass
class _StagedFile(WriterCommitMessage):
    staged: str
    rows: int


class _FakePulsarStreamWriter(DataSourceStreamWriter):
    def __init__(self, options, schema_names: list[str]):
        _validate_urls(options)
        self._root = _storage_root(options)
        self._topic = _require(options, "topic")
        missing = [c for c in _MESSAGE_COLUMNS if c not in schema_names]
        if missing:
            raise ValueError(
                f"fake pulsar: producer input lacks message columns {missing} "
                "(write message_projection output, SURVEY.md §1.2)"
            )

    def write(self, iterator) -> _StagedFile:
        import pyarrow as pa
        import pyarrow.parquet as pq

        schema = pa.schema(
            [
                ("tenant", pa.string()),
                ("namespace", pa.string()),
                ("topic", pa.string()),
                ("partition", pa.int32()),
                ("ledger_id", pa.int64()),
                ("entry_id", pa.int64()),
                ("batch_idx", pa.int32()),
                ("key", pa.string()),
                ("value", pa.binary()),
                ("event_time", pa.timestamp("us", tz="UTC")),
                ("publish_time", pa.timestamp("us", tz="UTC")),
                ("properties", pa.map_(pa.string(), pa.string())),
            ]
        )

        def ts(dt):
            if dt is None:
                return None
            # PySpark hands workers tz-naive datetimes in the process
            # local zone; astimezone() pins the instant before pyarrow
            # stores UTC-adjusted micros (exactness asserted by the
            # round-trip test)
            return dt.astimezone() if dt.tzinfo is None else dt

        cols: dict[str, list] = {c: [] for c in _MESSAGE_COLUMNS}
        n = 0
        for row in iterator:
            n += 1
            for c in _MESSAGE_COLUMNS:
                v = row[c]
                if c in ("event_time", "publish_time"):
                    v = ts(v)
                elif c == "properties" and v is not None:
                    v = list(v.items())
                elif c == "value" and v is not None:
                    v = bytes(v)
                cols[c].append(v)
        staging = os.path.join(self._root, ".staging")
        os.makedirs(staging, exist_ok=True)
        staged = os.path.join(staging, f"{uuid.uuid4().hex}.parquet")
        table = pa.Table.from_pydict(
            {c: pa.array(cols[c], type=schema.field(c).type) for c in _MESSAGE_COLUMNS},
            schema=schema,
        )
        pq.write_table(table, staged)
        return _StagedFile(staged=staged, rows=n)

    def commit(self, messages, batchId: int) -> None:
        # produce-then-ack: files become visible in the topic only
        # here, after every task of the epoch succeeded
        dest = topic_dir(self._root, self._topic)
        os.makedirs(dest, exist_ok=True)
        for m in messages:
            if m is None:
                continue
            shutil.move(
                m.staged, os.path.join(dest, f"batch-{batchId}-" + os.path.basename(m.staged))
            )

    def abort(self, messages, batchId: int) -> None:
        for m in messages:
            if m is not None and os.path.exists(m.staged):
                os.remove(m.staged)


class FakePulsarDataSource(DataSource):
    """Registered under the REAL connector name so the deploy adapter's
    `format("pulsar")` call resolves to it unchanged."""

    @classmethod
    def name(cls) -> str:
        return "pulsar"

    def schema(self) -> str:
        return MESSAGE_SCHEMA

    def simpleStreamReader(self, schema):
        return _FakePulsarStreamReader(self.options)

    def streamWriter(self, schema, overwrite: bool):
        return _FakePulsarStreamWriter(self.options, [f.name for f in schema.fields])


def register_fake_pulsar(spark) -> None:
    """Idempotently register the fake under the ``pulsar`` name on this
    session — after this, `read_pulsar_stream` / `write_pulsar_stream`
    run against directory-backed brokers with zero code changes."""
    spark.dataSource.register(FakePulsarDataSource)
