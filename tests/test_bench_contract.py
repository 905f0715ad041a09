"""The round driver tail-captures the last 2000 chars of bench.py's
stdout and json-parses the final line; round 4's line outgrew the
window and the bench gate silently skipped.  Pin the contract: the
compact line stays under the window and stays parseable at any
plausible suite size."""

from __future__ import annotations

import json

import bench


def _fake_timings(n: int) -> dict[str, float]:
    return {f"q_operator_family_name_{i:03d}": 0.1 + (i % 40) / 7.0 for i in range(n)}


def test_compact_line_fits_tail_window_at_every_scale():
    for n in (10, 93, 120, 200, 400):
        line = bench._compact_line(123.4567, _fake_timings(n), 0.1)
        assert len(line) <= 1980, (n, len(line))
        p = json.loads(line)
        assert {"metric", "value", "unit", "queries", "sf"} <= set(p)
        # truncation, if any, is DECLARED — never silent
        if len(p["queries"]) < n:
            assert p["queries_truncated"] == n - len(p["queries"])
            assert p["detail"] == "BENCH_DETAIL.json"
            # slowest queries survive truncation (the regression signal)
            kept = set(p["queries"])
            t = _fake_timings(n)
            key = {k[2:] if k.startswith("q_") else k: v for k, v in t.items()}
            dropped_max = max(v for k, v in key.items() if k not in kept)
            kept_min = min(v for k, v in key.items() if k in kept)
            assert dropped_max <= kept_min + 1e-9


def test_compact_line_mixed_prefix_fleet_never_collides():
    """If ever a metric name lacks the q_ prefix, stripping would merge
    'q_foo' and 'foo' and silently drop a measurement — the ladder must
    skip the strip rung entirely for a mixed fleet."""
    t = _fake_timings(200)  # big enough to overflow the full-name rung
    t["no_prefix_metric"] = 9.9
    t["q_no_prefix_metric"] = 1.1  # the collision partner
    p = json.loads(bench._compact_line(50.0, t, 0.1))
    assert "key_prefix" not in p
    kept = p["queries"]
    # both collision partners are distinguishable (the slow one, at
    # least, must survive truncation; the fast one may be truncated but
    # never silently MERGED)
    assert kept.get("no_prefix_metric") == 9.9
    total_accounted = len(kept) + p.get("queries_truncated", 0)
    assert total_accounted == len(t)


def test_compact_line_current_suite_fits_and_accounts():
    """At today's declared-query count the line must fit the driver's
    ~2000-char tail window and account for every query: kept + declared
    truncation == suite size, and any truncation carries the loud
    sidecar pointer.  (Up to 98 queries the 1dp rung held everything;
    the suite has since outgrown the window, so the slowest-subset rung
    is the designed behavior, not a defect.)"""
    from pulsar_sync_java_spark.queries import all_queries

    t = {n: 1.2345 for n in all_queries()}
    line = bench._compact_line(99.9, t, 0.1)
    assert len(line) <= 1980
    p = json.loads(line)
    assert len(p["queries"]) + p.get("queries_truncated", 0) == len(t)
    if "queries_truncated" in p:
        assert p["detail"] == "BENCH_DETAIL.json"


def test_compact_line_pathological_key_still_fits():
    """ADVICE r5: one absurdly long query name must not break the
    guaranteed-fit contract — the last resort is queries={} with the
    truncation declared."""
    t = {"q_" + "x" * 5000: 1.2345, "q_ok": 0.5}
    line = bench._compact_line(9.9, t, 0.1)
    assert len(line) <= 1980
    p = json.loads(line)
    assert p["queries"] == {}
    assert p["queries_truncated"] == 2
    assert p["detail"] == "BENCH_DETAIL.json"
