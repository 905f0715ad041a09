"""A/B bench probe: time a named subset of declared queries best-of-N
in ONE fresh Spark session and print one JSON line.

Usage:
    PYTHONPATH=<tree> python tools/bench_subset.py q_pagerank q_tfidf_topterms ...

Env:
    SPARK_GRAFT_SF_DIR    (default /root/testdata/sf0.1)
    SPARK_GRAFT_BENCH_RUNS (default 3)
    SPARK_GRAFT_BENCH_LABEL (tag echoed into the JSON line, e.g. "r6")

The engine tree is selected via PYTHONPATH so the same probe file can
bench two checkouts (a git worktree of an old round vs HEAD) under the
identical host conditions — the attribution protocol from BASELINE.md
§C: interleave A/B/A runs in one host session and compare best AND
median per side.
"""

from __future__ import annotations

import json
import os
import statistics
import sys
import time

# Runnable from any cwd — but ONLY as a fallback: the A/B attribution
# protocol (SCALE.md §10, BASELINE.md §C) selects the engine tree via
# PYTHONPATH to bench two checkouts against each other, and an
# unconditional sys.path.insert(0, <this file's repo>) would shadow
# that and silently bench HEAD on both sides.
try:
    import pulsar_sync_java_spark  # noqa: F401  (PYTHONPATH wins)
except ModuleNotFoundError:
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    )


def main() -> None:
    names = [a for a in sys.argv[1:] if not a.startswith("-")]
    if not names:
        print("usage: bench_subset.py <query> [query ...]", file=sys.stderr)
        sys.exit(2)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    runs = int(os.environ.get("SPARK_GRAFT_BENCH_RUNS", "3"))
    label = os.environ.get("SPARK_GRAFT_BENCH_LABEL", "")

    from pulsar_sync_java_spark.queries import all_queries
    from pulsar_sync_java_spark.session import get_spark
    from pulsar_sync_java_spark.sources.tables import TABLES, load_table

    spark = get_spark(app_name=f"bench-subset-{label or 'probe'}")
    qs = all_queries()
    missing = [n for n in names if n not in qs]
    if missing:
        print(f"unknown queries: {missing}", file=sys.stderr)
        sys.exit(2)

    # Same warmup discipline as bench.py: flagship query primes
    # JVM/codegen, one count per table primes parquet footers + page
    # cache, so run-1 isn't charged the cold-IO tax.
    qs["q_cursor_translate"](spark, sf_dir).count()
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    best: dict[str, float] = {}
    med: dict[str, float] = {}
    for name in names:
        times = []
        for _ in range(runs):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            times.append(time.perf_counter() - t0)
        best[name] = round(min(times), 4)
        med[name] = round(statistics.median(times), 4)
        print(f"# {name}: best={best[name]:.3f} median={med[name]:.3f}", file=sys.stderr)

    print(
        json.dumps(
            {"label": label, "best": best, "median": med, "runs": runs, "sf_dir": sf_dir},
            separators=(",", ":"),
        )
    )


if __name__ == "__main__":
    main()
