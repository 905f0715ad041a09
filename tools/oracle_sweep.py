"""Driver-style correctness sweep: every declared query vs its DuckDB
oracle at an arbitrary SF (default the driver's sf0.01), reproducing
the driver's compare — sort columns by name, stringify values, sort
rows, hash — so a size-dependent divergence (AQE plan change, tie
ordering, float formatting) surfaces HERE before it costs a round.

    python tools/oracle_sweep.py [sf_dir]

Exit code 1 if any query mismatches.  The pytest suite runs the same
compare at sf0.001 per-query (tests/test_oracle.py); this tool is the
pre-round full-fleet replay at driver scale.
"""

from __future__ import annotations

import os
import sys

import duckdb

sys.path.insert(0, os.path.join(os.path.dirname(os.path.abspath(__file__)), ".."))

import __spark_entry__ as entry
from pulsar_sync_java_spark.session import get_spark
from pulsar_sync_java_spark.sources.tables import TABLES

# the one true local replica of the driver compare (pandas-style fetch
# on BOTH engines, name-sorted columns, sorted stringified rows) —
# shared with the pytest gate so the two replicas cannot disagree
from tests.conftest import compare_frames


def main() -> int:
    argv = sys.argv[1:]
    only: set[str] | None = None
    if "--only" in argv:
        i = argv.index("--only")
        only = set(argv[i + 1].split(","))
        argv = argv[:i] + argv[i + 2 :]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    spark = get_spark(app_name="oracle-sweep")
    con = duckdb.connect()
    for t in TABLES:
        # <table>.parquet may be a single file (driver layout) or a
        # directory of part files (gen_testdata multi-file layout at
        # sf >= 1) — DuckDB needs the glob for the directory form
        path = os.path.join(sf_dir, f"{t}.parquet")
        src = f"{path}/*.parquet" if os.path.isdir(path) else path
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{src}'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    if only is not None:
        unknown = only - set(qs)
        if unknown:
            print(f"unknown queries in --only: {sorted(unknown)}")
            return 1
        qs = {k: v for k, v in qs.items() if k in only}
    bad = []
    for name in sorted(qs):
        try:
            sdf = qs[name](spark, sf_dir)
            s_pdf = sdf.toPandas()
            if name not in oracles:
                print(f"  {name}: rows-only ({len(s_pdf)} rows)", flush=True)
                continue
            rel = con.sql(oracles[name])
            ok, detail = compare_frames(sdf.columns, s_pdf, rel.columns, rel.df())
            print(f"  {name}: {'ok' if ok else 'MISMATCH'} ({detail})", flush=True)
            if not ok:
                bad.append(name)
        except Exception as exc:  # keep sweeping; report at the end
            bad.append(name)
            print(f"  {name}: ERROR {exc}", flush=True)
    print(f"swept {len(qs)} queries at {sf_dir}: {len(bad)} problem(s) {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
