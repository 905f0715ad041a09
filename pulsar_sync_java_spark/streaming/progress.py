"""Streaming query progress readout — the engine-side half of the
observability story.

`streaming/stateful.py`'s metric rows cover what CUSTOM kernels hold
(round-8 state snapshots); this module reads what SPARK ITSELF tracks
per micro-batch — watermark position, state-store row counts and
memory, input rates, and the `numRowsDroppedByWatermark` counter
(SPARK-24634).  Late-data loss is the silent failure mode of every
watermarked operator: the batch result is simply missing rows, nothing
raises.  At 100 TB the difference between "the feed is clean" and
"0.3% of events fall behind the watermark every hour" lives on this
page — the reference has no analogue because it never reorders
(per-partition push listener), but any Spark deployment of the engine
needs it on a dashboard.

Source of truth: `StreamingQuery.lastProgress` / `recentProgress`
(public PySpark API) — dicts mirroring `StreamingQueryProgress`.
Caveat (measured on this Spark build, pinned in the tests): which
late rows increment `numRowsDroppedByWatermark` is OPERATOR-dependent
— windowed aggregates filter sub-watermark input in a plain pre-
aggregate Filter (invisible to the counter), and the dedupe / join
state stores may admit-then-evict within the batch — so a ZERO counter
does NOT certify a loss-free feed.  The loss-certifying check is
end-to-end row accounting: `num_input_rows` summed across batches vs
rows actually emitted/affected downstream, which this summary also
carries.  The counter, where an operator populates it, remains the
cheapest first alarm.
"""

from __future__ import annotations

from typing import Any


def progress_summary(progress: dict | None) -> dict[str, Any]:
    """Distill one progress dict (``query.lastProgress``) into the flat
    record an ops table stores per micro-batch: batch id, input/process
    rates, event-time watermark, and per-stateful-operator totals —
    state rows, state memory, and rows dropped by the watermark.

    Returns an empty-ish record (batch_id = None) when the query has
    not completed a batch yet (`lastProgress` is None) so callers can
    log unconditionally.
    """
    if progress is None:
        return {
            "batch_id": None,
            "num_input_rows": 0,
            "state_rows_total": 0,
            "state_memory_bytes": 0,
            "dropped_by_watermark": 0,
            "watermark": None,
            "operators": [],
        }
    ops = []
    for so in progress.get("stateOperators") or []:
        ops.append(
            {
                "operator": so.get("operatorName"),
                "state_rows": int(so.get("numRowsTotal") or 0),
                "updated_rows": int(so.get("numRowsUpdated") or 0),
                "memory_bytes": int(so.get("memoryUsedBytes") or 0),
                "dropped_by_watermark": int(
                    so.get("numRowsDroppedByWatermark") or 0
                ),
            }
        )
    return {
        "batch_id": progress.get("batchId"),
        "num_input_rows": int(progress.get("numInputRows") or 0),
        "state_rows_total": sum(o["state_rows"] for o in ops),
        "state_memory_bytes": sum(o["memory_bytes"] for o in ops),
        "dropped_by_watermark": sum(o["dropped_by_watermark"] for o in ops),
        "watermark": (progress.get("eventTime") or {}).get("watermark"),
        "operators": ops,
    }


def drops_by_watermark(query) -> int:
    """Late rows DROPPED across the RETAINED progress window of a
    (possibly finished) streaming query — sums `recentProgress`, so it
    works after ``availableNow`` termination too.  A non-zero return on
    a feed believed ordered is the investigate-now signal: some
    upstream partition is delivering behind the watermark horizon and
    its rows are silently missing from every windowed result.

    BOUNDED WINDOW, by Spark design: `recentProgress` retains only the
    last `spark.sql.streaming.numRecentProgressUpdates` batches
    (default 100), so on a long-running query this is the drop count
    of the recent window, NOT a lifetime total — fine for the alarm
    (any non-zero window is actionable), wrong for accounting.  For a
    lifetime total, accumulate per batch as batches complete:
    `CumulativeDropCounter` below, or persist `progress_summary` rows
    (each carries its batch_id) and sum the deduplicated log."""
    return sum(
        progress_summary(p)["dropped_by_watermark"]
        for p in (query.recentProgress or [])
    )


class CumulativeDropCounter:
    """Lifetime watermark-drop accounting that survives the
    `recentProgress` retention cap: feed it every progress dict as (or
    after) batches complete — re-feeding an already-counted batch is a
    no-op (batch_id keyed), so polling `recentProgress` periodically
    and bulk-feeding it is safe even when polls overlap."""

    def __init__(self) -> None:
        self._seen: set[int] = set()
        self.total = 0

    def feed(self, progress: dict | None) -> int:
        s = progress_summary(progress)
        bid = s["batch_id"]
        if bid is not None and bid not in self._seen:
            self._seen.add(bid)
            self.total += s["dropped_by_watermark"]
        return self.total

    def feed_recent(self, query) -> int:
        for p in query.recentProgress or []:
            self.feed(p)
        return self.total
