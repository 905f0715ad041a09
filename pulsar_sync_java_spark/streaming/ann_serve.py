"""Streaming ANN serving over a persisted IVF index (r8 verdict #7) —
closes the index LIFECYCLE loop: `ivf_index_write` builds the layout,
`ivf_index_refresh` maintains it, and this module SERVES a continuous
stream of query vectors against whichever index version is active,
with the staleness contract deciding refresh IN-STREAM.

Shape per micro-batch (`foreachBatch`, the enrich.py discipline):

1. **Ingest gate** — if a delta landed in the staging directory, run
   `ivf_index_refresh` on it: the contract (size staleness + cell
   drift TV) decides append-vs-rebuild, and on rebuild the active
   pointer swaps to the NEW directory (versioned-dir convention —
   never overwrite the directory being probed; enrich.py's atomicity
   note).  The same batch's queries then probe the fresh index.
2. **Probe** — the batch's queries are routed in ONE Spark job
   regardless of query count: per-query probe cells are ranked
   driver-side against the (tiny, effectively broadcast) centroid
   table, the index is scanned ONCE with `ivf_cell IN (union of
   cells)` (partition pruning — nprobe/n_centroids of the corpus per
   query, amortized across the batch), the query rows broadcast-join
   onto the pruned candidates, and a per-query window takes exact
   cosine top-k.  No per-query index scan, no driver-side ranking.
3. **Sink** — results append through the keyed idempotent sink
   ((query_id, rank) identity), so checkpoint replays stay
   exactly-once even when a replayed batch probes a newer index
   version than the original attempt (the first write wins).

Scale posture: the index scan is partition-pruned parquet; the only
per-batch driver work is O(batch_queries x n_centroids) float math
and the staging-directory listing.  Queries ride with their vector
(array<double>), so the stream side never joins anything un-pruned.
Equivalence + refresh-boundary + restart tests: tests/test_ann_serve.py.
"""

from __future__ import annotations

import os
import threading
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter

from pulsar_sync_java_spark.operators.similarity import cosine, ivf_index_refresh


class IvfServer:
    """Mutable active-index pointer (path + centroids) shared between
    the serving loop and whoever applies refreshes.  A single object
    per serving query; the lock only guards the tiny pointer swap —
    all heavy work happens outside it.

    The pointer is process-local state by default; `state_path` makes
    it DURABLE: every applied refresh atomically rewrites a JSON state
    file (write temp + os.replace — the staging-consume discipline),
    and `IvfServer.load` / `IvfPqServer.load` reconstruct the server
    from it after a driver restart.  Crash ordering is safe at every
    point: the state file is written BEFORE the refresh's staging
    delta is consumed, so a crash between swap and consume replays
    the refresh against the already-current pointer (appends are
    keyed no-ops, a rebuild regenerates the same directory), and a
    crash before the write replays it against the old pointer —
    either way the loaded server and the sink converge to the same
    answers, which is what the restart tests pin."""

    _KIND = "ivf"

    def __init__(
        self,
        path: str,
        centroids: Sequence[Sequence[float]],
        state_path: str | None = None,
    ):
        self._lock = threading.Lock()
        self._save_lock = threading.Lock()
        self._path = path
        self._centroids = [list(map(float, c)) for c in centroids]
        self._state_path = state_path
        # Pointer-change ordinal, bumped under self._lock whenever the
        # pointer changes; _persisted_version (guarded by _save_lock)
        # records the newest ordinal already on disk so a stale
        # snapshot written late can never regress the durable file
        # (two appliers racing through apply_refresh used to be
        # ordered only by _save_lock acquisition, not by snapshot
        # recency).
        self._version = 0
        self._persisted_version = -1
        if state_path is not None:
            self._write_state(self._state(), 0)

    def snapshot(self) -> tuple[str, list[list[float]]]:
        with self._lock:
            return self._path, self._centroids

    def _state(self) -> dict:
        return {
            "kind": self._KIND,
            "path": self._path,
            "centroids": self._centroids,
        }

    def _write_state(self, st: dict, version: int) -> None:
        """Atomic, crash-durable pointer persistence: temp file +
        fsync + os.replace (+ directory fsync), so neither a reader
        nor a power loss ever sees a torn or empty state file.  Runs
        OUTSIDE the pointer lock — serialization and disk I/O must
        not stall concurrent snapshot() callers — with its own save
        lock serializing concurrent writers.  `version` is the
        pointer-change ordinal taken under self._lock alongside the
        snapshot: if a newer version has already been persisted the
        write is skipped, so two appliers racing can never leave the
        durable file holding the superseded pointer (the regression a
        restart would then load and serve)."""
        import json

        with self._save_lock:
            if version <= self._persisted_version:
                return
            tmp = f"{self._state_path}.tmp"
            with open(tmp, "w") as fh:
                json.dump(st, fh)
                fh.flush()
                os.fsync(fh.fileno())
            os.replace(tmp, self._state_path)
            # recorded only AFTER the replace lands (review catch): a
            # write that fails mid-I/O must leave the version
            # unclaimed, so a replayed refresh — or the next changed
            # pointer — still persists instead of being skipped while
            # the durable file holds the superseded pointer
            self._persisted_version = version
            dfd = os.open(
                os.path.dirname(os.path.abspath(self._state_path)),
                os.O_RDONLY,
            )
            try:
                os.fsync(dfd)
            finally:
                os.close(dfd)

    @classmethod
    def load(cls, state_path: str) -> "IvfServer":
        """Reconstruct the durable server from its state file (and
        keep it durable at the same path).  Deliberately does NOT
        rewrite the file it just read: a forensics/monitoring loader
        running beside a live serving driver must never race the
        driver's own saves and regress the pointer."""
        import json

        with open(state_path) as fh:
            st = json.load(fh)
        kind = st.get("kind")
        if kind != cls._KIND:
            raise ValueError(
                f"{cls.__name__}.load: state file at {state_path} holds "
                f"a {kind!r} pointer — load it with the matching "
                "server class"
            )
        srv = cls._from_state(st)
        srv._state_path = state_path
        return srv

    @classmethod
    def _from_state(cls, st: dict) -> "IvfServer":
        return cls(st["path"], st["centroids"])

    def apply_refresh(self, record: dict) -> None:
        """Adopt a decision record from `ivf_index_refresh` (append
        records keep the path; rebuild records carry the new one).
        A durable server persists a CHANGED pointer before returning;
        append records leave the model untouched by contract, so they
        skip the rewrite (no per-micro-batch model-sized JSON I/O)."""
        new_path = record["path"]
        new_cents = [list(map(float, c)) for c in record["centroids"]]
        with self._lock:
            changed = new_path != self._path or new_cents != self._centroids
            self._path = new_path
            self._centroids = new_cents
            if changed:
                self._version += 1
            ver = self._version
            st = (
                self._state()
                if changed and self._state_path is not None
                else None
            )
        if st is not None:
            self._write_state(st, ver)


def probe_queries(
    spark: SparkSession,
    path: str,
    centroids: Sequence[Sequence[float]],
    queries: Sequence[tuple[int, Sequence[float]]],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch-route `queries` = [(query_id, vector), ...] against the
    materialized IVF index in ONE job: union-of-cells pruned scan,
    broadcast query join, per-query exact cosine top-k.  Matches
    `ivf_topk_indexed` per query bit-for-bit (same probe ranking, same
    cosine expression, same (score DESC, id) tie-break) — the
    equivalence the serving tests pin."""
    rows = []
    for qid, vec in queries:
        order = sorted(
            range(len(centroids)),
            key=lambda i: sum((a - b) ** 2 for a, b in zip(vec, centroids[i])),
        )
        rows.append(
            (int(qid), [float(v) for v in vec], [int(c) for c in order[:nprobe]])
        )
    qdf = spark.createDataFrame(
        rows, "query_id long, qvec array<double>, cells array<int>",
        verifySchema=False,  # rows built above as exact int/list types
    )
    cells_union = sorted({c for _, _, cs in rows for c in cs})
    cand = (
        spark.read.parquet(path)
        .where(F.col("ivf_cell").isin(cells_union))
        .select(id_col, vec_col, "ivf_cell")
    )
    probes = qdf.select("query_id", "qvec", F.explode("cells").alias("ivf_cell"))
    scored = cand.join(F.broadcast(probes), "ivf_cell").select(
        "query_id",
        F.col(id_col),
        cosine(F.col(vec_col), F.col("qvec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return scored.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


def _consume_staging(
    spark: SparkSession, staging: str
) -> tuple[DataFrame | None, list[str]]:
    """Claim the staged delta for this batch, exactly once: snapshot
    the file listing, read EXACTLY those files, and return them so the
    caller can move only what was read after the refresh succeeds.
    Files that land in `staging` after the snapshot stay in place for
    the next batch — moving the whole directory instead would sweep
    them into the consumed marker without ever ingesting them (silent
    vector loss under a concurrent producer).  Replay safety does not
    depend on the move — a crash between refresh and move replays the
    delta into the keyed `ivf_index_append` (a no-op) or into a
    deterministic rebuild of the same versioned target."""
    try:
        entries = sorted(os.listdir(staging))
    except FileNotFoundError:
        return None, []
    files = [
        os.path.join(staging, e)
        for e in entries
        if (e.endswith(".parquet") or not e.startswith(("_", ".")))
        and os.path.isfile(os.path.join(staging, e))
    ]
    if not files:
        return None, []
    return spark.read.parquet(*files), files


def serve_ann_stream(
    query_stream: DataFrame,
    server: IvfServer,
    sink_dir: str,
    checkpoint_dir: str,
    k: int = 10,
    nprobe: int = 4,
    delta_staging: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refresh_kwargs: dict | None = None,
    calibrate_rebuilds: bool = False,
) -> DataStreamWriter:
    """Serve a stream of (query_id, qvec) rows against the active IVF
    index.  When `delta_staging` is set, each micro-batch first checks
    it for newly landed vectors and runs one `ivf_index_refresh`
    maintenance step on them — the staleness contract (growth, cell
    share, assignment-drift TV) decides append-vs-rebuild in-stream,
    and a rebuild atomically swaps the server's active pointer before
    this batch's queries are probed.

    `calibrate_rebuilds` arms the swap gate (`calibrated_swap`): a
    rebuilt layout must pass the balance audit (a collapsed coarse
    quantizer routes everything into one cell — perfect recall, zero
    pruning) before the pointer moves; a failing audit RAISES before
    the staging delta is consumed, so the stream stops on the old
    index and a restart retries."""
    from pulsar_sync_java_spark.sinks.writers import idempotent_append

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if delta_staging is not None:
            delta, delta_files = _consume_staging(spark, delta_staging)
            if delta is not None:
                path, cents = server.snapshot()
                record = ivf_index_refresh(
                    spark,
                    path,
                    delta,
                    cents,
                    id_col=id_col,
                    vec_col=vec_col,
                    # deterministic per-batch target: a replayed rebuild
                    # regenerates the same directory content
                    rebuild_path=f"{path}_r{batch_id}",
                    **(refresh_kwargs or {}),
                )
                if calibrate_rebuilds:
                    record = calibrated_swap(
                        spark, server, record,
                        id_col=id_col, vec_col=vec_col,
                    )
                    if not record["swapped"]:
                        # raise BEFORE consuming the staging delta —
                        # the stream stops on the OLD index, nothing
                        # is acked, a restart retries the refresh
                        raise RuntimeError(
                            "serve_ann_stream: rebuilt index at "
                            f"{record['path']} failed the balance "
                            f"audit (max_cell_share="
                            f"{record['balance_share']:.3f})"
                        )
                else:
                    server.apply_refresh(record)
                # Move ONLY the files this batch actually read; later
                # arrivals stay staged for the next batch.  os.replace
                # tolerates a pre-existing target (a checkpoint wipe
                # restarts batch ids at 0, so b0 names can recur — the
                # replayed file content is identical by construction).
                consumed = f"{delta_staging}_consumed"
                os.makedirs(consumed, exist_ok=True)
                for fp in delta_files:
                    os.replace(
                        fp,
                        os.path.join(
                            consumed, f"b{batch_id}_{os.path.basename(fp)}"
                        ),
                    )
        queries = [
            (r["query_id"], list(r["qvec"]))
            for r in batch_df.select("query_id", "qvec").collect()
        ]
        if not queries:
            return
        path, cents = server.snapshot()
        topk = probe_queries(
            spark, path, cents, queries, k, nprobe, id_col, vec_col
        )
        idempotent_append(topk, sink_dir, keys=["query_id", "rank"])

    return (
        query_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )


def probe_queries_pq(
    spark: SparkSession,
    path: str,
    centroids: Sequence[Sequence[float]],
    codebooks,
    queries: Sequence[tuple[int, Sequence[float]]],
    k: int = 10,
    nprobe: int = 4,
    rerank: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Batch-route queries against a materialized IVF-PQ index
    (`ivf_pq_index_write`) in ONE lazy plan: the codes column is
    scanned once with the union-of-cells partition filter (column
    pruning keeps the embedding bytes out of this scan), per-(query,
    cell) ADC lookup tables — computed driver-side, nprobe x M x
    k_sub doubles per query — broadcast onto it, a per-query window
    cuts the `rerank` best by ADC, and only those (query, candidate)
    pairs fetch full vectors for the exact cosine top-k.

    Matches `ivf_pq_topk_indexed` per query bit-for-bit: same
    normalized probe ranking, same LUT math, same (ADC ASC, id ASC)
    candidate cut and (cosine DESC, id ASC) final tie-breaks — the
    equivalence the serving tests pin.

    Payload discipline (r10 advice): the broadcast LUT frame carries
    ONLY (query_id, cell, lut) — nprobe x M x k_sub doubles per query,
    never the query vector — and the candidate-scan shuffle into the
    per-query window cut carries ONLY (query_id, id, adc), so the
    scored rows stay M-byte-code-sized as the docstring's payload
    story requires.  The d-double query vectors live in a separate
    len(queries)-row frame that is broadcast-joined once onto the
    `rerank` SURVIVORS at the exact re-rank — k-row scale, not
    candidate scale."""
    from pulsar_sync_java_spark.operators.similarity import (
        _pq_lut_rows,
        _pq_probe_order,
        adc_lut_fold,
    )

    lut_rows = []
    qvec_rows = []
    for qid, vec in queries:
        order, q_norm = _pq_probe_order([float(v) for v in vec], centroids)
        probe = order[:nprobe]
        qvec_rows.append((int(qid), [float(v) for v in vec]))
        for cell, lut in _pq_lut_rows(q_norm, centroids, codebooks, probe):
            lut_rows.append((int(qid), cell, lut))
    # verifySchema=False: rows built above as exact int/list[float];
    # the per-element verifier walks nprobe*m*k_sub LUT doubles per
    # query on the driver (see similarity.py r14 note)
    ludf = spark.createDataFrame(
        lut_rows,
        "query_id long, ivf_cell int, __lut array<array<double>>",
        verifySchema=False,
    )
    qv = spark.createDataFrame(
        qvec_rows, "query_id long, qvec array<double>", verifySchema=False
    )
    cells_union = sorted({r[1] for r in lut_rows})
    codes = (
        spark.read.parquet(path)
        .where(F.col("ivf_cell").isin(cells_union))
        .select(id_col, F.col("ivf_cell").cast("int").alias("ivf_cell"), "pq_codes")
    )
    adc = adc_lut_fold("__lut", "pq_codes")
    scored = codes.join(F.broadcast(ludf), "ivf_cell").select(
        "query_id", F.col(id_col), adc.alias("__adc")
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("__adc").asc(), F.col(id_col).asc()
    )
    cand = (
        scored.withColumn("__r", F.row_number().over(wc))
        .filter(F.col("__r") <= rerank)
        .select("query_id", id_col)
        .join(F.broadcast(qv), "query_id")
    )
    vecs = (
        spark.read.parquet(path)
        .where(F.col("ivf_cell").isin(cells_union))
        .select(id_col, vec_col)
    )
    exact = vecs.join(F.broadcast(cand), id_col).select(
        "query_id",
        F.col(id_col),
        cosine(F.col(vec_col), F.col("qvec")).alias("cos_sim"),
    )
    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return exact.withColumn("rank", F.row_number().over(w)).filter(
        F.col("rank") <= k
    )


class IvfPqServer(IvfServer):
    """Active-pointer for a PQ-coded index: (path, centroids,
    codebooks).  Same swap and durability discipline as IvfServer;
    refresh records from `ivf_pq_index_refresh` carry the
    codebooks."""

    _KIND = "ivf_pq"

    def __init__(self, path, centroids, codebooks, state_path=None):
        self._codebooks = [
            [[float(v) for v in row] for row in book] for book in codebooks
        ]
        # after _codebooks: the base __init__ may persist the full state
        super().__init__(path, centroids, state_path=state_path)

    def snapshot(self):
        with self._lock:
            return self._path, self._centroids, self._codebooks

    def _state(self) -> dict:
        return {**super()._state(), "codebooks": self._codebooks}

    @classmethod
    def _from_state(cls, st: dict) -> "IvfPqServer":
        return cls(st["path"], st["centroids"], st["codebooks"])

    def apply_refresh(self, record: dict) -> None:
        new_path = record["path"]
        new_cents = [list(map(float, c)) for c in record["centroids"]]
        new_books = [
            [[float(v) for v in row] for row in book]
            for book in record["codebooks"]
        ]
        with self._lock:
            changed = (
                new_path != self._path
                or new_cents != self._centroids
                or new_books != self._codebooks
            )
            self._path = new_path
            self._centroids = new_cents
            self._codebooks = new_books
            if changed:
                self._version += 1
            ver = self._version
            st = (
                self._state()
                if changed and self._state_path is not None
                else None
            )
        if st is not None:
            self._write_state(st, ver)


def calibrated_swap(
    spark,
    server: "IvfServer",
    record: dict,
    probe_ids: list[int] | None = None,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    recall_min: int = 8,
    rank_corr_min: float = 0.50,
    adc_err_max: float = 0.60,
    balance_max: float = 0.8,
) -> dict:
    """Apply an index-refresh decision record to the active server
    ONLY if the model it carries passes the calibration gate — the
    r10 degenerate-family lesson applied to the serving lifecycle: a
    rebuild retrains the quantizer(s), and a silently-bad retrain
    (collapsed sample, wrong metric space, truncated codebook) would
    otherwise swap straight into the serving pointer with every
    downstream answer still *plausible*.

    - ``action == "append"``: the stored model is unchanged (appends
      encode against it by contract), so there is nothing new to
      audit — apply immediately, ``calibration: None``.
    - ``action == "rebuild"``: three audits of the REBUILT artifact.

      0. **Row count** (both index kinds): the rebuilt layout's
         ``current_rows`` must equal the record's ``expected_rows``
         (counted from the rebuild's input BEFORE the write).  Every
         other audit — balance, recall, rank-corr, ADC — is computed
         over the rows that survived the write, so only this check can
         see a write that silently LOST vectors.
      1. **Layout balance** (both index kinds): re-read the rebuilt
         layout's cell histogram (`ivf_index_staleness` — one
         partition-column aggregate, no vector bytes) and refuse if
         ``max_cell_share > balance_max`` or the index is empty.
         This is the signal that catches a COLLAPSED coarse
         quantizer, which recall cannot: a degenerate model that
         routes everything into one cell still has perfect recall —
         it just stopped pruning, turning every 100 TB probe into a
         full scan.
      2. **Coded-metric flags** (PQ records — detected by a
         ``codebooks`` key): `ann_calibration` with paths=("pq",)
         over `probe_ids` (one encode pass + the exact anchor,
         serving-sized) — every probe must pass recall@k,
         rank-correlation and ADC-error bounds.

      Any failure leaves the server on the OLD index (the rebuilt
      directory stays on disk for forensics) and returns
      ``swapped: False`` — the caller decides whether that raises
      (the in-stream gates do, loudly) or pages.

    Returns the record extended with ``swapped``, ``balance_share``
    and ``calibration`` (the per-probe flag rows for observability).
    At 100 TB the audit corpus is the probed index itself —
    partition-pruned like any serve — with `probe_ids` drawn from a
    pinned monitoring set."""
    from pulsar_sync_java_spark.operators.similarity import (
        ann_calibration,
        ivf_index_staleness,
    )

    if record.get("action") != "rebuild":
        server.apply_refresh(record)
        return {**record, "swapped": True, "calibration": None}
    report = ivf_index_staleness(spark, record["path"])
    share = report.max_cell_share  # 0.0 on empty; the emptiness
    # refusal is the separate current_rows check below
    ok = report.current_rows > 0 and share <= balance_max
    # Row-count audit (r11 advice, medium): balance + PQ flags are all
    # computed over the rows that SURVIVED the rebuild write, so a
    # write that silently dropped vectors could pass every other gate.
    # The refresh record carries `expected_rows` counted from the
    # rebuild's input BEFORE the write — an independent expectation
    # the rebuilt layout must match exactly.
    expected = record.get("expected_rows")
    rows_ok = expected is None or report.current_rows == int(expected)
    ok = ok and rows_ok
    flags = None
    if ok and "codebooks" in record:
        if probe_ids is None:
            raise ValueError(
                "calibrated_swap: a PQ rebuild audit needs probe_ids "
                "— gating a coded model on layout balance alone would "
                "pass a garbage codebook (balanced cells, broken "
                "metric)"
            )
        corpus = spark.read.parquet(record["path"]).select(id_col, vec_col)
        # coded_path: the PQ arm probes and ADC-audits the STORED
        # (ivf_cell, pq_codes) columns the rebuild just materialized —
        # no second full-corpus encode, and a write-path divergence
        # between the record's model and the bytes on disk fails the
        # gate instead of passing unseen
        flags = ann_calibration(
            corpus,
            [int(q) for q in probe_ids],
            k=k,
            id_col=id_col,
            vec_col=vec_col,
            recall_min=recall_min,
            rank_corr_min=rank_corr_min,
            adc_err_max=adc_err_max,
            centroids=record["centroids"],
            codebooks=record["codebooks"],
            paths=("pq",),
            coded_path=record["path"],
        ).collect()
        ok = len(flags) == len(probe_ids) and all(
            r["recall_pq_ok"] and r["rank_corr_ok"] and r["adc_err_ok"]
            for r in flags
        )
    if ok:
        server.apply_refresh(record)
    return {
        **record,
        "swapped": ok,
        "balance_share": share,
        "rows_ok": rows_ok,
        "current_rows": report.current_rows,
        "calibration": None if flags is None else [r.asDict() for r in flags],
    }


def serve_ann_stream_pq(
    query_stream: DataFrame,
    server: IvfPqServer,
    sink_dir: str,
    checkpoint_dir: str,
    k: int = 10,
    nprobe: int = 4,
    rerank: int = 64,
    delta_staging: str | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    refresh_kwargs: dict | None = None,
    calibration_probe_ids: list[int] | None = None,
) -> DataStreamWriter:
    """The PQ twin of `serve_ann_stream`: same foreachBatch shape
    (staged-delta refresh gate -> one-plan batch probe -> keyed
    idempotent sink), with `ivf_pq_index_refresh` as the in-stream
    maintenance step (append encodes the delta against the STORED
    quantizers; rebuild retrains both levels and swaps the pointer —
    codebooks travel in the decision record) and `probe_queries_pq`
    as the serving kernel, so each batch's candidate scan reads
    M bytes/vector instead of full embeddings.

    `calibration_probe_ids` arms the swap gate (`calibrated_swap`):
    every REBUILT model is audited over those probes before the
    pointer moves, and a failing audit RAISES — deliberately loud,
    before the staging delta is consumed, so the stream stops on the
    old index with the delta still staged and a restart retries
    (exactly-once discipline: nothing was acked).  None keeps the
    ungated r10 behavior."""
    from pulsar_sync_java_spark.operators.similarity import (
        ivf_pq_index_refresh,
    )
    from pulsar_sync_java_spark.sinks.writers import idempotent_append

    def apply_batch(batch_df: DataFrame, batch_id: int) -> None:
        spark = batch_df.sparkSession
        if delta_staging is not None:
            delta, delta_files = _consume_staging(spark, delta_staging)
            if delta is not None:
                path, cents, books = server.snapshot()
                record = ivf_pq_index_refresh(
                    spark,
                    path,
                    delta,
                    cents,
                    books,
                    id_col=id_col,
                    vec_col=vec_col,
                    rebuild_path=f"{path}_r{batch_id}",
                    **(refresh_kwargs or {}),
                )
                if calibration_probe_ids is not None:
                    record = calibrated_swap(
                        spark, server, record, calibration_probe_ids,
                        id_col=id_col, vec_col=vec_col,
                    )
                    if not record["swapped"]:
                        # raise BEFORE consuming the staging delta:
                        # the stream stops on the OLD index, nothing
                        # is acked, a restart retries the refresh —
                        # a silently-bad retrain must never serve.
                        # A balance refusal short-circuits the flag
                        # audit (calibration None), so print the
                        # share that explains it either way
                        raise RuntimeError(
                            "serve_ann_stream_pq: rebuilt index at "
                            f"{record['path']} failed the calibration "
                            "gate (max_cell_share="
                            f"{record['balance_share']:.3f}): "
                            f"{record['calibration']}"
                        )
                else:
                    server.apply_refresh(record)
                consumed = f"{delta_staging}_consumed"
                os.makedirs(consumed, exist_ok=True)
                for fp in delta_files:
                    os.replace(
                        fp,
                        os.path.join(
                            consumed, f"b{batch_id}_{os.path.basename(fp)}"
                        ),
                    )
        queries = [
            (r["query_id"], list(r["qvec"]))
            for r in batch_df.select("query_id", "qvec").collect()
        ]
        if not queries:
            return
        path, cents, books = server.snapshot()
        topk = probe_queries_pq(
            spark, path, cents, books, queries, k, nprobe, rerank,
            id_col, vec_col,
        )
        idempotent_append(topk, sink_dir, keys=["query_id", "rank"])

    return (
        query_stream.writeStream.foreachBatch(apply_batch)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
