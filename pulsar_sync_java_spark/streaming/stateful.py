"""Custom stateful streaming operator: the reference's per-partition
sampled MessageId map as TRUE keyed state (`applyInPandasWithState`).

The windowed-aggregate formulation (streaming/replicate.py:
sparse_mapping_stream) covers the common case; this operator reproduces
the reference's *exact* imperative semantics, which a windowed agg
cannot:

- greedy rate-limit sampling: accept a sample iff >= `interval` elapsed
  since the LAST ACCEPTED sample (`PulsarPartitionSyncWorker.java:
  236-239` gates on `System.nanoTime() - lastRecordTime`), not one
  sample per aligned wall-clock bucket;
- put-time head eviction: on every accepted sample, drop live samples
  older than `ttl` before the newest timestamp seen
  (`SparseMap.java:36-53` evicts expired head entries inside put);
- the live-map size is observable per emission (`n_live`) — bounded by
  ttl/interval, the reference's <= 60 entries/partition envelope
  (BASELINE.md).

State per (topic, partition) key is a single struct
(last_sample_ts, live sample array) — bounded, Arrow-serialized once
per micro-batch per key.  At 100 TB scale the state size is
O(keys x ttl/interval), independent of message volume, exactly like the
reference's maps; the empty-map NPE bugs documented in SURVEY.md §2
fine print are structurally impossible (plain Python list handling).
"""

from __future__ import annotations

from collections.abc import Iterable, Iterator

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.state import GroupState, GroupStateTimeout
from pyspark.sql.types import (
    ArrayType,
    IntegerType,
    LongType,
    StringType,
    StructField,
    StructType,
)

OUTPUT_SCHEMA = StructType(
    [
        StructField("topic", StringType()),
        StructField("partition", IntegerType()),
        StructField("sample_ts", LongType()),  # epoch micros
        StructField("ledger_id", LongType()),
        StructField("entry_id", LongType()),
        StructField("n_live", IntegerType()),
    ]
)

_SAMPLE = StructType(
    [
        StructField("ts", LongType()),
        StructField("ledger_id", LongType()),
        StructField("entry_id", LongType()),
    ]
)

STATE_SCHEMA = StructType(
    [
        StructField("last_sample_ts", LongType()),
        StructField("live", ArrayType(_SAMPLE)),
    ]
)

_US = 1_000_000


def _sampler(interval_s: int, ttl_s: int):
    interval_us, ttl_us = interval_s * _US, ttl_s * _US

    def fn(
        key: tuple, pdfs: Iterable[pd.DataFrame], state: GroupState
    ) -> Iterator[pd.DataFrame]:
        topic, partition = key
        if state.exists:
            last_ts, live = state.get
            live = [tuple(s) for s in live]
        else:
            last_ts, live = None, []
        out: list[tuple] = []
        for pdf in pdfs:
            pdf = pdf.sort_values(["event_time", "ledger_id", "entry_id"])
            ts_us = pdf["event_time"].astype("int64") // 1000  # ns -> us
            for ts, ledger, entry in zip(
                ts_us, pdf["ledger_id"], pdf["entry_id"]
            ):
                ts, ledger, entry = int(ts), int(ledger), int(entry)
                if last_ts is not None and ts - last_ts < interval_us:
                    continue  # rate gate: < interval since last ACCEPTED
                last_ts = ts
                # put-time head eviction (oldest-first, like SparseMap)
                live = [s for s in live if ts - s[0] <= ttl_us]
                live.append((ts, ledger, entry))
                out.append((topic, partition, ts, ledger, entry, len(live)))
        state.update((last_ts, live))
        if out:
            yield pd.DataFrame(
                out,
                columns=[
                    "topic",
                    "partition",
                    "sample_ts",
                    "ledger_id",
                    "entry_id",
                    "n_live",
                ],
            )

    return fn


def stateful_sparse_sampler(
    stream: DataFrame,
    interval_s: int = 60,
    ttl_s: int = 3600,
) -> DataFrame:
    """Keyed stateful sampler over the canonical message stream: emits
    the accepted (topic, partition, sample_ts, ledger, entry) samples
    plus the live-map size after each accept.  `sample_ts` is epoch
    micros (a plain long keeps the Arrow state round-trip exact)."""
    return stream.groupBy("topic", "partition").applyInPandasWithState(
        _sampler(interval_s, ttl_s),
        outputStructType=OUTPUT_SCHEMA,
        stateStructType=STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )


def stateful_sparse_sampler_tws(
    stream: DataFrame,
    interval_s: int = 60,
    ttl_s: int = 3600,
) -> DataFrame:
    """The SAME sampler on Spark 4's `transformWithStateInPandas`
    (StatefulProcessor + typed ValueState) — the successor API to
    applyInPandasWithState, with explicit state variables and
    lifecycle hooks.  Semantics are identical by construction (one
    shared inner accept/evict loop would hide the API differences this
    module exists to demonstrate, so the loop is repeated verbatim);
    tests/test_streaming.py asserts both implementations emit exactly
    the same rows against the greedy oracle — skipped where
    google.protobuf (TWS's Python state-server protocol) is not
    installed, as in this container."""
    from pyspark.sql.streaming.stateful_processor import (
        StatefulProcessor,
        StatefulProcessorHandle,
    )

    interval_us, ttl_us = interval_s * _US, ttl_s * _US

    class Sampler(StatefulProcessor):
        def init(self, handle: StatefulProcessorHandle) -> None:
            # last accepted ts; live samples as parallel arrays (typed
            # ValueState structs hold the whole map in ONE value, like
            # the GroupState tuple)
            self._state = handle.getValueState("sampler", STATE_SCHEMA)

        def handleInputRows(
            self, key: tuple, rows: Iterator[pd.DataFrame], timerValues
        ) -> Iterator[pd.DataFrame]:
            topic, partition = key
            if self._state.exists():
                last_ts, live = self._state.get()
                live = [tuple(s) for s in live]
            else:
                last_ts, live = None, []
            out: list[tuple] = []
            for pdf in rows:
                pdf = pdf.sort_values(["event_time", "ledger_id", "entry_id"])
                ts_us = pdf["event_time"].astype("int64") // 1000
                for ts, ledger, entry in zip(
                    ts_us, pdf["ledger_id"], pdf["entry_id"]
                ):
                    ts, ledger, entry = int(ts), int(ledger), int(entry)
                    if last_ts is not None and ts - last_ts < interval_us:
                        continue
                    last_ts = ts
                    live = [s for s in live if ts - s[0] <= ttl_us]
                    live.append((ts, ledger, entry))
                    out.append(
                        (topic, partition, ts, ledger, entry, len(live))
                    )
            self._state.update((last_ts, live))
            if out:
                yield pd.DataFrame(out, columns=[f.name for f in OUTPUT_SCHEMA])

        def close(self) -> None:
            pass

    return stream.groupBy("topic", "partition").transformWithStateInPandas(
        Sampler(),
        outputStructType=OUTPUT_SCHEMA,
        outputMode="append",
        timeMode="none",
    )
