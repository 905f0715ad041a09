"""CLI entry point: ``python -m pulsar_sync_java_spark SRC DST [...]``.

The reference ships ``bin/pulsar-sync`` whose ``main()`` only installs
an uncaught-exception handler and never constructs ``PulsarSync``
(`PulsarSyncStarter.java:26-33`; jcommander is a declared dependency
with no parsing anywhere — SURVEY.md §2 dead surface), so there is no
reference CLI behavior to match.  This module provides the WORKING
equivalent over the engine's directory-backed clusters: each flag maps
onto a `SyncEngineConfig` field (`SyncConfig.java:29-41`), one
``--tick`` is one `run_once()` convergence pass (catalog + replication
+ cursors), and ``--ticks N --interval S`` emulates the reference's
scheduled rescans (`PulsarTenantSyncManager.java:57-58` et al.) for
deployments without an external scheduler.

Output: one JSON line per tick with the per-plane apply counts —
all-zero means converged (idempotent pass), the same signal the tests
assert.  Exit code 0 on completion; failures raise (the moral
equivalent of the reference's uncaught-exception handler: loud, not
swallowed).

``python -m pulsar_sync_java_spark calibrate SF_DIR`` runs the
unified sketch-model health page instead (see `_main_calibrate`);
``python -m pulsar_sync_java_spark semdedup SF_DIR OUT_DIR`` runs the
production auto-K SemDeDup pass (see `_main_semdedup`).
"""

from __future__ import annotations

import argparse
import json
import sys
import time


def _parser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(
        prog="python -m pulsar_sync_java_spark",
        description="Converge a destination cluster directory onto a source "
        "(catalogs, messages, cursors) — the reference's PulsarSync.start() "
        "as an explicit tick loop.",
    )
    p.add_argument("src", help="source cluster directory")
    p.add_argument("dst", help="destination cluster directory")
    p.add_argument(
        "--subscription-name", default="pulsar-sync", help="replication subscription"
    )
    p.add_argument(
        "--no-tenant", dest="tenant", action="store_false",
        help="disable tenant auto-update (SyncConfig.autoUpdateTenant)",
    )
    p.add_argument(
        "--no-namespace", dest="namespace", action="store_false",
        help="disable namespace auto-update",
    )
    p.add_argument(
        "--no-topic", dest="topic", action="store_false",
        help="disable topic auto-update",
    )
    p.add_argument(
        "--advance-cursors", action="store_true",
        help="opt-in improvement: advance existing dst cursors forward "
        "(the reference freezes cursors after creation)",
    )
    p.add_argument(
        "--sample-interval", default="60 seconds",
        help="sparse-mapping sample interval (R17)",
    )
    p.add_argument("--ticks", type=int, default=1, help="convergence passes to run")
    p.add_argument(
        "--interval", type=float, default=0.0,
        help="seconds to sleep between ticks (reference cadence: 180/60/10)",
    )
    return p


def _main_calibrate(argv: list[str]) -> int:
    """``python -m pulsar_sync_java_spark calibrate SF_DIR`` — run the
    unified model-health page (`operators/calibration.py:
    calibration_report`) over a table directory and print one JSON
    line per (family, metric) row plus a final summary line with the
    page verdict.  Exit 0 if every gate is ok, 1 otherwise — the shape
    a scheduler alerts on (the operator-facing consumer the r11
    verdict #6 asked the three calibration twins to compose into)."""
    p = argparse.ArgumentParser(
        prog="python -m pulsar_sync_java_spark calibrate",
        description="Unified sketch-model health page: MinHash banding, "
        "SimHash, PQ-coded ANN — one (family, metric, value, ok) row "
        "per gate.",
    )
    p.add_argument("sf_dir", help="table directory (documents/embeddings)")
    p.add_argument(
        "--max-docs", type=int, default=1000,
        help="deterministic document-sample bound for the pair audits",
    )
    args = p.parse_args(argv)
    from pulsar_sync_java_spark.operators.calibration import (
        calibration_report,
    )
    from pulsar_sync_java_spark.session import get_spark

    spark = get_spark(app_name="pulsar-sync-calibrate")
    rows = calibration_report(
        spark, args.sf_dir, max_docs=args.max_docs
    ).collect()
    ok = True
    for r in rows:
        ok = ok and bool(r["ok"])
        print(json.dumps(r.asDict(), separators=(",", ":")))
        sys.stdout.flush()
    print(json.dumps({"healthy": ok, "n_gates": len(rows)},
                     separators=(",", ":")))
    return 0 if ok else 1


def _main_semdedup(argv: list[str]) -> int:
    """``python -m pulsar_sync_java_spark semdedup SF_DIR OUT_DIR`` —
    run the production SemDeDup pass (`queries/clustering.py:
    semantic_dedup`) with its corpus-derived dials (K = max(8,
    ceil(√N)) clusters, block count from the 512-reduce-group target
    — r12 verdict #2) and write the (vec_id, cluster, sem_group,
    is_dup) labels as parquet.  Prints one JSON summary line with the
    derived dials and the dup count, so a pipeline can log what the
    dial derivation actually chose."""
    p = argparse.ArgumentParser(
        prog="python -m pulsar_sync_java_spark semdedup",
        description="Production SemDeDup: corpus-derived K and block "
        "count, PQ-prefiltered in-cell pairs, exact verify, "
        "connected-component groups.",
    )
    p.add_argument("sf_dir", help="table directory (embeddings)")
    p.add_argument("out_dir", help="output parquet directory for labels")
    p.add_argument(
        "--k", type=int, default=None,
        help="override the derived cluster count (default: ceil(sqrt(N)))",
    )
    p.add_argument(
        "--threshold", type=float, default=0.35,
        help="cosine threshold for a semantic-dup pair",
    )
    args = p.parse_args(argv)
    from pulsar_sync_java_spark.queries.clustering import (
        derive_semdedup_dials,
        semantic_dedup,
    )
    from pulsar_sync_java_spark.session import get_spark
    from pulsar_sync_java_spark.sources.tables import load_table

    spark = get_spark(app_name="pulsar-sync-semdedup")
    e = load_table(spark, args.sf_dir, "embeddings").select(
        "vec_id", "embedding"
    )
    n = e.count()
    # ONE derivation (queries/clustering.py) serves the helper and
    # this CLI, and the summary line carries BOTH derived dials so a
    # pipeline log can reproduce the run exactly
    k, s = derive_semdedup_dials(n, k=args.k)
    out = semantic_dedup(
        e, args.sf_dir, k=k, blocks=s, threshold=args.threshold
    )
    out.write.mode("overwrite").parquet(args.out_dir)
    labeled = spark.read.parquet(args.out_dir)
    n_dups = labeled.filter("is_dup").count()
    print(json.dumps(
        {"n": n, "k": k, "blocks": s, "threshold": args.threshold,
         "n_dups": n_dups, "out": args.out_dir},
        separators=(",", ":"),
    ))
    return 0


def main(argv: list[str] | None = None) -> int:
    argv = list(sys.argv[1:] if argv is None else argv)
    if argv and argv[0] == "calibrate":
        return _main_calibrate(argv[1:])
    if argv and argv[0] == "semdedup":
        return _main_semdedup(argv[1:])
    args = _parser().parse_args(argv)
    from pulsar_sync_java_spark.engine import SyncEngine, SyncEngineConfig
    from pulsar_sync_java_spark.session import get_spark

    # session sizing comes from the shared env knobs (SPARK_GRAFT_CPUS)
    # so the CLI matches bench.py / the driver contract
    spark = get_spark(app_name="pulsar-sync")
    engine = SyncEngine(
        spark,
        args.src,
        args.dst,
        SyncEngineConfig(
            subscription_name=args.subscription_name,
            auto_update_tenant=args.tenant,
            auto_update_namespace=args.namespace,
            auto_update_topic=args.topic,
            advance_cursors=args.advance_cursors,
            sample_interval=args.sample_interval,
        ),
    )
    for tick in range(args.ticks):
        counts = engine.run_once()
        print(json.dumps({"tick": tick, **counts}, separators=(",", ":")))
        sys.stdout.flush()
        if args.interval and tick + 1 < args.ticks:
            time.sleep(args.interval)
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
