"""Per-query job/stage profiler (r13 optimization round).

For each named query (or --top N from BENCH_DETAIL.json): run it
twice (run 1 = codegen warm-up, run 2 = measured), and report wall
seconds plus how many Spark jobs / stages / tasks the measured run
submitted — the empirical denominator for "is this query overhead-
bound or work-bound" (guide §1).  Uses the same count() action as
bench.py so numbers line up with the committed sidecar.

Usage:
    python tools/profile_queries.py q_kmeans_assign q_ann_calibration
    python tools/profile_queries.py --top 25

Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1), SPARK_GRAFT_CPUS.
Output: one JSON line per query on stdout.
"""

from __future__ import annotations

import json
import os
import sys
import time

try:
    import pulsar_sync_java_spark  # noqa: F401  (PYTHONPATH wins)
except ModuleNotFoundError:
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    )


def main() -> None:
    args = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    from pulsar_sync_java_spark.queries import all_queries
    from pulsar_sync_java_spark.session import get_spark

    qs = all_queries()
    if args and args[0] == "--top":
        n = int(args[1])
        here = os.path.dirname(os.path.abspath(__file__))
        detail = json.load(open(os.path.join(here, "..", "BENCH_DETAIL.json")))
        names = [
            k
            for k, _ in sorted(
                detail["queries"].items(), key=lambda kv: -kv[1]
            )[:n]
        ]
    else:
        names = args
    unknown = [n for n in names if n not in qs]
    if unknown:
        print(f"unknown queries: {unknown}", file=sys.stderr)
        sys.exit(2)

    spark = get_spark(app_name="profile-queries")
    sc = spark.sparkContext
    from pulsar_sync_java_spark.sources.tables import TABLES, load_table

    qs["q_cursor_translate"](spark, sf_dir).count()
    for t in TABLES:
        load_table(spark, sf_dir, t).count()

    tracker = sc.statusTracker()

    def job_ids():
        return set(tracker.getJobIdsForGroup(None) or [])

    for name in names:
        # warm-up run (codegen compile, broadcast warm)
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        warm = time.perf_counter() - t0
        before = job_ids()
        t0 = time.perf_counter()
        qs[name](spark, sf_dir).count()
        wall = time.perf_counter() - t0
        after = job_ids()
        new_jobs = sorted(after - before)
        n_stages = 0
        n_tasks = 0
        for j in new_jobs:
            ji = tracker.getJobInfo(j)
            if ji is None:
                continue
            for st in ji.stageIds:
                si = tracker.getStageInfo(st)
                if si is not None:
                    n_stages += 1
                    n_tasks += si.numTasks
        print(
            json.dumps(
                {
                    "query": name,
                    "warm1": round(warm, 3),
                    "sec": round(wall, 3),
                    "jobs": len(new_jobs),
                    "stages": n_stages,
                    "tasks": n_tasks,
                }
            ),
            flush=True,
        )


if __name__ == "__main__":
    main()
