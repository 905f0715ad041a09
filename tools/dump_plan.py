"""Dump `.explain("formatted")` of named declared queries to files —
the r13 optimization round's plan-evidence artifact writer.

    PYTHONPATH=<tree> python tools/dump_plan.py <outdir> <suffix> q_a q_b ...

Writes <outdir>/<query>_<suffix>.txt for each query, using the engine
tree selected by PYTHONPATH (so `_before` plans can come from an old
worktree and `_after` plans from HEAD under identical data/session).
Env: SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1).
"""

from __future__ import annotations

import io
import os
import sys
from contextlib import redirect_stdout

try:
    import pulsar_sync_java_spark  # noqa: F401  (PYTHONPATH wins)
except ModuleNotFoundError:
    sys.path.insert(
        0, os.path.join(os.path.dirname(os.path.abspath(__file__)), "..")
    )


def main() -> None:
    outdir, suffix, *names = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    os.makedirs(outdir, exist_ok=True)

    from pulsar_sync_java_spark.queries import all_queries
    from pulsar_sync_java_spark.session import get_spark

    spark = get_spark(app_name="dump-plan")
    spark.sparkContext.setLogLevel("ERROR")
    qs = all_queries()
    for name in names:
        df = qs[name](spark, sf_dir)
        buf = io.StringIO()
        with redirect_stdout(buf):
            df.explain("formatted")
        path = os.path.join(outdir, f"{name}_{suffix}.txt")
        with open(path, "w") as f:
            f.write(f"# {name} @ {sf_dir} ({suffix})\n")
            f.write(buf.getvalue())
        print(f"wrote {path}", file=sys.stderr)


if __name__ == "__main__":
    main()
