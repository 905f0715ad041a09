"""Property tests for the cursor-advance kernel's STATE LOGIC
(streaming/cursor_advance.py:_advancer), driven directly with pandas
batches and a fake GroupState — hundreds of randomized batchings per
second, where a streaming query per example would take minutes.  The
end-to-end streaming equivalence (restart, checkpoint, sink) is pinned
separately in tests/test_streaming.py.

Two properties over random (sample | cursor) event sequences split at
random micro-batch boundaries:

1. **Never wrong**: every emission equals the FULL-mapping floor
   (greatest sample at-or-before the cursor's current src position,
   greatest event_id on ts ties — the `translate` contract) at the
   moment of emission, and per-cursor emissions are strictly
   increasing in ts (the advance_cursors_once monotone guard).
2. **Batch equivalence**: when every subscription's first snapshot
   arrives in the first batch (the create-then-advance flow the
   module docstring scopes the equivalence to), the final emitted
   position per cursor equals re-running batch translate + monotone
   merge after every batch over cumulative state.
"""

from __future__ import annotations

import pandas as pd
from hypothesis import given, settings
from hypothesis import strategies as st

from pulsar_sync_java_spark.streaming.cursor_advance import _advancer


class FakeState:
    def __init__(self):
        self._v = None

    @property
    def exists(self):
        return self._v is not None

    @property
    def get(self):
        return self._v

    def update(self, v):
        self._v = v


def _drive(batches, max_state_samples=10_000):
    """Run the kernel over pandas batches for one key; return the
    emitted rows in order."""
    fn = _advancer(max_state_samples)
    state = FakeState()
    out = []
    for batch in batches:
        pdf = pd.DataFrame(
            batch, columns=["kind", "cursor", "ts", "event_id"]
        )
        for res in fn(("t", 0), [pdf], state):
            out.extend(
                (r.cursor, int(r.ts), int(r.event_id))
                for r in res.itertuples()
            )
    return out


def _true_floor(samples, src_ts):
    """translate() semantics: greatest (ts, event_id) with ts <=
    src_ts; greatest event_id wins a ts tie."""
    cands = [s for s in samples if s[0] <= src_ts]
    return max(cands) if cands else None


events = st.lists(
    st.one_of(
        st.tuples(
            st.just("sample"),
            st.integers(0, 500),   # ts
            st.integers(0, 50),    # event_id (ties possible)
        ),
        st.tuples(
            st.just("cursor"),
            st.sampled_from(["subA", "subB", "subC"]),
            st.integers(0, 500),   # src ts
        ),
    ),
    min_size=1,
    max_size=60,
)


@given(events, st.data())
@settings(max_examples=500, deadline=None)
def test_emissions_never_wrong_and_monotone(evs, data):
    rows = []
    for e in evs:
        if e[0] == "sample":
            rows.append(("sample", None, e[1], e[2]))
        else:
            rows.append(("cursor", e[1], e[2], None))
    # random batch boundaries
    cuts = sorted(
        data.draw(
            st.lists(
                st.integers(1, max(1, len(rows) - 1)),
                max_size=5, unique=True,
            )
        )
    )
    batches, prev = [], 0
    for c in cuts + [len(rows)]:
        if c > prev:
            batches.append(rows[prev:c])
            prev = c

    # replay alongside the kernel: maintain full mapping + src state
    fn = _advancer(10_000)
    state = FakeState()
    samples_full: list[tuple] = []
    src: dict[str, int] = {}
    last_emit: dict[str, tuple] = {}
    for batch in batches:
        for kind, cname, ts, eid in batch:
            if kind == "sample":
                samples_full.append((ts, eid))
            else:
                src[cname] = max(src.get(cname, -1), ts)
        pdf = pd.DataFrame(
            batch, columns=["kind", "cursor", "ts", "event_id"]
        )
        for res in fn(("t", 0), [pdf], state):
            for r in res.itertuples():
                name, ts, eid = r.cursor, int(r.ts), int(r.event_id)
                # never wrong: emission == full-mapping floor now
                floor = _true_floor(samples_full, src[name])
                assert floor == (ts, eid), (name, floor, (ts, eid))
                # strictly increasing per cursor
                if name in last_emit:
                    assert ts > last_emit[name][0]
                last_emit[name] = (ts, eid)


def test_r12_judge_counterexample_late_cursor_after_trim():
    """Pinned regression (r12 VERDICT What's-wrong #1): after subB's
    emission trims the sample tail to [(1,0)] (horizon = 0), a
    late-subscribing subA@0 resolving against a re-delivered
    duplicate-ts sample (0,0) must NOT emit (0,0) — the true
    full-mapping floor at src_ts=0 is (0,1), which was trimmed.  The
    fixed kernel withholds the emission (floor ts <= horizon) instead
    of emitting a wrong position."""
    batches = [
        [("sample", None, 0, 0)],
        [
            ("sample", None, 0, 0),
            ("sample", None, 0, 1),
            ("sample", None, 1, 0),
            ("cursor", "subB", 0, None),
        ],
        [("sample", None, 0, 0), ("cursor", "subA", 0, None)],
    ]
    out = _drive(batches)
    assert out == [("subB", 0, 1)]  # subA withheld, nothing wrong


def test_withheld_cursor_resolves_past_horizon():
    """Delayed-never-wrong: the withheld late cursor emits as soon as
    its src position advances past the horizon and a sample beyond the
    horizon qualifies — and that emission IS the full-mapping floor."""
    batches = [
        [("sample", None, 0, 0)],
        [
            ("sample", None, 0, 1),
            ("sample", None, 5, 3),
            ("cursor", "subB", 0, None),
        ],
        # horizon=0 now; subA@0 withheld
        [("cursor", "subA", 0, None)],
        # subA's src advances to 5: floor (5,3) > horizon — emits
        [("cursor", "subA", 5, None)],
    ]
    out = _drive(batches)
    assert out == [("subB", 0, 1), ("subA", 5, 3)]


def test_horizon_never_retains_below_horizon_samples():
    """The old `or samples[-1:]` retention kept one at-or-below-horizon
    sample a late cursor could wrongly consume; the fixed trim drops
    the full tail and relies on the persisted horizon to withhold."""
    fn = _advancer(10_000)
    state = FakeState()
    for batch in [
        [
            ("sample", None, 3, 7),
            ("sample", None, 3, 9),
            ("cursor", "subA", 3, None),
        ],
    ]:
        pdf = pd.DataFrame(
            batch, columns=["kind", "cursor", "ts", "event_id"]
        )
        list(fn(("t", 0), [pdf], state))
    samples, _cursors, horizon = state.get
    assert horizon == 3
    assert samples == []  # nothing at-or-below the horizon retained


@given(events)
@settings(max_examples=500, deadline=None)
def test_final_state_matches_repeated_batch_advance(evs):
    # move every cursor's first snapshot into batch 0 (the scoped
    # equivalence: create-then-advance), then split the rest in two
    first_snaps = {}
    rest = []
    for e in evs:
        if e[0] == "cursor" and e[1] not in first_snaps:
            first_snaps[e[1]] = ("cursor", e[1], e[2], None)
        elif e[0] == "cursor":
            rest.append(("cursor", e[1], e[2], None))
        else:
            rest.append(("sample", None, e[1], e[2]))
    if not first_snaps:
        return
    mid = len(rest) // 2
    batches = [
        list(first_snaps.values()) + rest[:mid],
        rest[mid:],
    ]

    got = {}
    for name, ts, eid in _drive(batches):
        got[name] = (ts, eid)  # later emissions overwrite: monotone

    # batch reference: translate + monotone merge per batch
    want: dict[str, tuple] = {}
    samples_full: list[tuple] = []
    src: dict[str, int] = {}
    for batch in batches:
        for kind, cname, ts, eid in batch:
            if kind == "sample":
                samples_full.append((ts, eid))
            else:
                src[cname] = max(src.get(cname, -1), ts)
        for cname, sts in src.items():
            floor = _true_floor(samples_full, sts)
            if floor is not None and (
                cname not in want or floor[0] > want[cname][0]
            ):
                want[cname] = floor
    assert got == want
