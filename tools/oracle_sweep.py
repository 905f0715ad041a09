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


def norm(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(str(r[i]) for i in order) for r in rows]
    return sorted(out)


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    spark = get_spark(app_name="oracle-sweep")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")

    qs, oracles = entry.queries(), entry.oracle_sql()
    bad = []
    for name in sorted(qs):
        try:
            sdf = qs[name](spark, sf_dir)
            s_cols = sdf.columns
            s_rows = [tuple(r) for r in sdf.collect()]
            if name not in oracles:
                print(f"  {name}: rows-only ({len(s_rows)} rows)", flush=True)
                continue
            rel = con.sql(oracles[name])
            d_cols, d_rows = rel.columns, rel.fetchall()
            ok_schema = sorted(s_cols) == sorted(d_cols)
            sn, dn = norm(s_cols, s_rows), norm(d_cols, d_rows)
            ok = ok_schema and sn == dn
            status = "ok" if ok else "MISMATCH"
            print(f"  {name}: {status} ({len(sn)} vs {len(dn)} rows)", flush=True)
            if not ok:
                bad.append(name)
                if not ok_schema:
                    print(f"    cols: spark={sorted(s_cols)} duck={sorted(d_cols)}")
                else:
                    diffs = [(a, b) for a, b in zip(sn, dn) if a != b][:3]
                    print(f"    first diffs: {diffs}")
        except Exception as exc:  # keep sweeping; report at the end
            bad.append(name)
            print(f"  {name}: ERROR {exc}", flush=True)
    print(f"swept {len(qs)} queries at {sf_dir}: {len(bad)} problem(s) {bad}")
    return 1 if bad else 0


if __name__ == "__main__":
    raise SystemExit(main())
