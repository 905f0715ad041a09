"""Similarity search over embedding columns (array<float>).

Two paths (BASELINE.json north star):
- `cosine_topk` — brute-force exact: one pass over all vectors, per-row
  dot/norm in JVM higher-order functions, TakeOrderedAndProject top-k.
  O(n·d), embarrassingly parallel, no shuffle — correct at any scale
  where a full scan is affordable (and the oracle-checked baseline).
- `lsh_topk` — random-hyperplane LSH: H fixed pseudo-random planes give
  every vector an H-bit signature; candidates = vectors whose signature
  is within `max_hamming` of the query's; exact cosine re-rank on the
  candidates only.  Plan shape: signature is a literal-vector dot
  product in codegen (planes are deterministic from a seed, shipped as
  literals, NOT data) -> cheap bitmask filter -> exact re-rank on a tiny
  fraction.  At 100 TB the signature column is precomputed once and the
  filter prunes partitions by signature prefix.
"""

from __future__ import annotations

import random

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pulsar_sync_java_spark.operators.util import pair_structs, spread, spread_by


def _dot(a: Column, b: Column) -> Column:
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return _dot(a, b) / (_norm(a) * _norm(b))


def cosine_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """Exact cosine top-k against a literal query vector.

    Deliberately NOT spread (r13, measured): one dot+norm fold per
    row costs ~60 ms serial on the whole bench corpus, less than the
    exchange + extra AQE stages a spread adds — q_ann_pq_topk
    regressed ~1.5 s with a spread here (its candidate inputs are
    already spread upstream, so the gate made it a no-op exactly
    where it would have been free).  Multi-fold exact scans that DO
    benefit carry their own spread (q_sim_topk, ann_calibration's
    anchor)."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = df.select(
        F.col(id_col), cosine(F.col(vec_col), q).alias("cos_sim")
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def _planes(dim: int, num_planes: int, seed: int) -> list[list[float]]:
    """Deterministic Gaussian hyperplanes (the standard Charikar
    construction), seeded via Python's Mersenne-Twister `random.Random`
    — stable across runs, machines and CPython versions.

    (An earlier ±1 variant drew signs from an LCG's lowest bit, which
    for a power-of-two modulus alternates with period 2 — every plane
    degenerated to the SAME alternating pattern, i.e. one effective
    hyperplane, and LSH bucketing collapsed to a 2-bucket split.)
    """
    rng = random.Random(seed)
    return [
        [rng.gauss(0.0, 1.0) for _ in range(dim)] for _ in range(num_planes)
    ]


def lsh_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 16,
    max_hamming: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Approximate cosine top-k: signature filter, then exact re-rank.

    Recall/speed dial: expected candidate fraction is
    P[hamming(sig_a, sig_q) <= r] which for random vectors concentrates
    near sum_{i<=r} C(H,i)/2^H; raising max_hamming trades scan
    fraction for recall.  The query's own bucket is always probed, so
    an exact-duplicate vector is always found: the query signature is
    computed by the SAME numpy kernel as the corpus signatures
    (hyperplane_sign_bits), so identical vectors cannot sign-flip
    apart on a near-zero dot product.
    """
    import numpy as np

    from pulsar_sync_java_spark.operators.vectorized import (
        hyperplane_sign_bits,
        hyperplane_signature_udf,
    )

    planes = _planes(len(query_vec), num_planes, seed)
    q_sig = int(
        hyperplane_sign_bits(
            np.asarray([query_vec], dtype=np.float64), np.asarray(planes)
        )[0]
    )
    sig = hyperplane_signature_udf(planes)(F.col(vec_col))
    candidates = spread(df).withColumn("__sig", sig).filter(
        F.bit_count(F.col("__sig").bitwiseXOR(F.lit(q_sig))) <= max_hamming
    )
    return cosine_topk(candidates, query_vec, k, id_col, vec_col)


def _multi_cosine_topk(
    scored: DataFrame, k: int, id_col: str
) -> DataFrame:
    """Per-query exact top-k over (query_id, id, cos_sim) candidate
    rows: the batch twin of `cosine_topk`'s (cos DESC, id ASC) cut —
    row_number over a query-partitioned window selects the identical
    per-query set the single-query TakeOrdered does."""
    from pyspark.sql.window import Window

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .drop("rank")
    )


def lsh_topk_multi(
    df: DataFrame,
    queries: list[tuple[int, list[float]]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 16,
    max_hamming: int = 4,
    seed: int = 42,
) -> DataFrame:
    """Batch `lsh_topk`: answer EVERY (query_id, vector) probe from ONE
    corpus signature pass.  Per-query results match `lsh_topk`
    exactly (same planes, same numpy query-signature kernel, same
    hamming filter, same decimal tie-breaks) — the equivalence the
    calibration harness and tests pin.

    Plan: one signature projection over the corpus (the per-call cost
    `lsh_topk` pays |Q| times), a |Q|-row broadcast of (query_id,
    signature, vector) nested-loop-joined on the bit_count hamming
    predicate, exact cosine on the survivors, per-query window top-k.
    The query vector rides the candidate rows because exact cosine on
    every candidate IS the LSH re-rank — unlike the PQ path there is
    no code-sized intermediate to preserve."""
    import numpy as np

    from pulsar_sync_java_spark.operators.vectorized import (
        hyperplane_sign_bits,
        hyperplane_signature_udf,
    )

    if not queries:
        raise ValueError("lsh_topk_multi: empty probe batch")
    dim = len(queries[0][1])
    planes = _planes(dim, num_planes, seed)
    qsigs = hyperplane_sign_bits(
        np.asarray([[float(v) for v in qv] for _, qv in queries],
                   dtype=np.float64),
        np.asarray(planes),
    )
    qdf = df.sparkSession.createDataFrame(
        [
            (int(qid), int(sig), [float(v) for v in qv])
            for (qid, qv), sig in zip(queries, qsigs)
        ],
        "query_id long, __qsig long, __qv array<double>",
        verifySchema=False,  # rows built here as exact int/list[float]
    )
    sig = hyperplane_signature_udf(planes)(F.col(vec_col))
    corpus = spread(df).select(id_col, vec_col).withColumn("__sig", sig)
    pairs = corpus.join(
        F.broadcast(qdf),
        F.bit_count(F.col("__sig").bitwiseXOR(F.col("__qsig")))
        <= max_hamming,
    )
    scored = pairs.select(
        "query_id",
        F.col(id_col),
        cosine(F.col(vec_col), F.col("__qv")).alias("cos_sim"),
    )
    return _multi_cosine_topk(scored, k, id_col)


def _lsh_signed(
    df: DataFrame,
    dim: int,
    vec_col: str,
    num_planes: int,
    prefix_bits: int,
    seed: int,
) -> DataFrame:
    """Signature + partition-prefix projection shared by
    `lsh_index_write` and `lsh_index_append` — ONE definition of the
    Hive partition value, because the idempotent append's pruned
    existence probe is only exact if a vector always lands in the same
    prefix the write path produced ("pruned absence == global
    absence")."""
    from pulsar_sync_java_spark.operators.vectorized import (
        hyperplane_signature_udf,
    )

    planes = _planes(dim, num_planes, seed)
    sig = hyperplane_signature_udf(planes)(F.col(vec_col))
    return spread(df).withColumn("__sig", sig).withColumn(
        "sig_prefix",
        F.shiftrightunsigned(F.col("__sig"), num_planes - prefix_bits)
        .bitwiseAND(F.lit((1 << prefix_bits) - 1)),
    )


def lsh_index_write(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 16,
    prefix_bits: int = 4,
    seed: int = 42,
) -> None:
    """Materialize the layout `lsh_topk`'s docstring promises at scale:
    precompute the H-bit hyperplane signature once and write the corpus
    Hive-partitioned by its top `prefix_bits` bits (2^prefix_bits
    directories).  A Hamming-ball probe then PRUNES partitions: a
    prefix whose distance to the query's prefix already exceeds the
    ball radius cannot contain candidates, so those directories are
    never read (`lsh_topk_indexed`)."""
    row = df.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None:
        raise ValueError(
            f"lsh_index_write: input has no rows — nothing to index "
            f"(vec_col={vec_col!r})"
        )
    signed = _lsh_signed(
        df, int(row["d"]), vec_col, num_planes, prefix_bits, seed
    )
    signed.repartition("sig_prefix").write.mode("overwrite").partitionBy(
        "sig_prefix"
    ).parquet(path)


def lsh_index_append(
    df_new: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 16,
    prefix_bits: int = 4,
    seed: int = 42,
) -> int:
    """Incrementally grow a materialized LSH index (`lsh_index_write`)
    — signatures are a pure function of (planes, seed), so new vectors
    hash into the same prefix partitions forever; no rebuild is ever
    REQUIRED (unlike IVF, whose centroids can drift).  Keyed idempotent
    append, partition-pruned by prefix: replays add nothing, each batch
    probes only the prefixes it lands in.  Params must match the
    original build (same planes ⇒ same layout).  Returns rows appended.
    """
    from pulsar_sync_java_spark.sinks.writers import idempotent_append

    row = df_new.select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None:
        return 0
    signed = _lsh_signed(
        df_new, int(row["d"]), vec_col, num_planes, prefix_bits, seed
    )
    return idempotent_append(
        signed, path, keys=[id_col], partition_col="sig_prefix"
    )


def lsh_topk_indexed(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 16,
    prefix_bits: int = 4,
    max_hamming: int = 3,
    seed: int = 42,
) -> DataFrame:
    """ANN top-k over a materialized LSH index (`lsh_index_write`):
    compute the query signature driver-side, keep only the prefixes
    whose Hamming distance to the query's prefix is <= max_hamming
    (bits that already disagree in the prefix count against the whole-
    signature budget), scan just those partition directories, apply the
    exact bit_count filter on the stored signature, and re-rank.  The
    pruned fraction concentrates near
    sum_{i<=r} C(prefix_bits,i)/2^prefix_bits of the corpus.

    Partition pruning only exists while max_hamming < prefix_bits: a
    radius >= prefix_bits admits every prefix and the probe degrades to
    a full scan + filter (a warning is emitted).  max_hamming is the
    recall/cost dial — raise it (accepting weaker pruning) when the
    corpus is isotropic and neighbors sit at low cosine; on clustered
    real-world embeddings small radii keep recall high AND prune."""
    import numpy as np

    from pulsar_sync_java_spark.operators.vectorized import hyperplane_sign_bits

    row = spark.read.parquet(path).select(F.size(F.col(vec_col)).alias("d")).first()
    if row is None:
        raise ValueError(
            f"lsh_topk_indexed: index at {path!r} is empty — "
            "was lsh_index_write run on a non-empty corpus?"
        )
    planes = _planes(int(row["d"]), num_planes, seed)
    q_sig = int(
        hyperplane_sign_bits(
            np.asarray([query_vec], dtype=np.float64), np.asarray(planes)
        )[0]
    )
    q_prefix = (q_sig >> (num_planes - prefix_bits)) & ((1 << prefix_bits) - 1)
    probe = [
        p
        for p in range(1 << prefix_bits)
        if bin(p ^ q_prefix).count("1") <= max_hamming
    ]
    if len(probe) == (1 << prefix_bits):
        import warnings

        warnings.warn(
            f"lsh_topk_indexed: max_hamming={max_hamming} >= "
            f"prefix_bits={prefix_bits} admits every prefix — the probe "
            "scans the whole index (no partition pruning). Lower "
            "max_hamming or index with more prefix_bits.",
            stacklevel=2,
        )
    cand = (
        spark.read.parquet(path)
        .where(F.col("sig_prefix").isin(probe))
        .filter(F.bit_count(F.col("__sig").bitwiseXOR(F.lit(q_sig))) <= max_hamming)
    )
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def assign_clusters(
    df: DataFrame, vec_col: str, centroids: list[list[float]]
) -> DataFrame:
    """Add a `__cluster` column: index of the nearest centroid (squared
    L2; ties -> lowest index).  Centroids close over an Arrow-
    vectorized numpy kernel (operators/vectorized.py) — the k x d
    distance loop per row is exactly the interpreted-HOF hot spot that
    module exists for.  At 100 TB this projection is the one
    precomputed into a partition column (see ivf_topk)."""
    from pulsar_sync_java_spark.operators.vectorized import nearest_centroid_udf

    return df.withColumn("__cluster", nearest_centroid_udf(centroids)(F.col(vec_col)))


def _seeded_sample(
    df: DataFrame,
    id_col: str,
    vec_col: str,
    n: int,
    seed: int,
    caller: str = "kmeans_centroids",
):
    """The quantizer training sample: the `n` vectors with the smallest
    seeded xxhash64 of their id — reproducible, no data-order
    dependence, ONE Spark job.  Shared by the coarse quantizer
    (kmeans_centroids) and the PQ codebooks (pq_train) so IVF-PQ
    training costs a single collect.  Returns a float64 numpy matrix."""
    import numpy as np

    rows = (
        spread(df)
        .select(id_col, vec_col)
        .orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)), F.col(id_col))
        .limit(n)
        .collect()
    )
    if not rows:
        raise ValueError(
            f"{caller}: input has no rows — cannot train a quantizer "
            f"(vec_col={vec_col!r})"
        )
    return np.asarray([[float(x) for x in r[1]] for r in rows], dtype=np.float64)


def kmeans_centroids(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    k: int = 16,
    iters: int = 2,
    seed: int = 42,
    sample=None,
) -> list[list[float]]:
    """Deterministic k-means for the IVF coarse quantizer, trained on a
    bounded sample.

    A coarse quantizer does not need full-corpus Lloyd passes — its
    residual errors are corrected by the exact re-rank inside the
    probed lists — so training runs driver-side in numpy over a
    deterministic pseudo-random sample (the `sample_per_centroid * k`
    vectors with the smallest seeded hash of their id: reproducible,
    no data-order dependence, ONE Spark job).  The previous
    formulation ran one distributed assign + per-dimension mean
    aggregation per Lloyd iteration — 2 driver round-trip jobs each —
    which at 100 TB is exactly the anti-pattern (iterating the full
    corpus to fit 16 cluster centers).  Empty clusters keep their
    previous centroid.

    `sample` lets a caller that already collected the seeded sample
    (the IVF-PQ trainer, which fits coarse + subspace codebooks from
    the SAME rows) pass it in, skipping the collect.  METRIC-SPACE
    CONTRACT (r10 advice): pass the sample in the SAME space the
    index assigns cells in — the IVF-PQ path trains on L2-NORMALIZED
    rows (its cells are assigned on normalized vectors), the plain-IVF
    path on RAW rows; a caller mixing the two gets a quantizer in the
    wrong metric space.  The guard below only catches emptiness — the
    normalization choice is the caller's, stated here so both callers
    (`ivf_pq_index_write`: normalized; `ivf_index_write`/`ivf_topk`:
    raw) are auditable against it."""
    if sample is not None and len(sample) == 0:
        raise ValueError(
            "kmeans_centroids: empty `sample` — cannot train a "
            f"quantizer (vec_col={vec_col!r})"
        )
    X = sample if sample is not None else _seeded_sample(
        df, id_col, vec_col, 256 * k, seed
    )
    C = X[:k].copy()  # hash order == seeded random -> first k are the seeds
    for _ in range(iters):
        d2 = ((X[:, None, :] - C[None, :, :]) ** 2).sum(axis=2)
        assign = d2.argmin(axis=1)
        for ci in range(k):
            members = X[assign == ci]
            if len(members):
                C[ci] = members.mean(axis=0)
    return [[float(v) for v in c] for c in C]


def ivf_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    iters: int = 2,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
) -> DataFrame:
    """IVF approximate top-k: coarse-quantize the corpus into
    `n_centroids` inverted lists, probe the `nprobe` lists nearest the
    query, exact cosine re-rank inside them only.

    The scale path vs hyperplane LSH (`lsh_topk`): at 100 TB the
    cluster assignment is a precomputed partition column — probing
    nprobe/n_centroids of the corpus becomes partition PRUNING at the
    parquet scan, not a filter; recall is tuned by nprobe with cost
    linear in the probed fraction.

    `centroids` supplies an external coarse model (RAW-space — this
    path, unlike IVF-PQ, quantizes unnormalized vectors); multi-query
    callers (ann_calibration) train once and pass it per probe instead
    of paying a sample collect + driver Lloyd per call."""
    cents = (
        centroids
        if centroids is not None
        else kmeans_centroids(df, id_col, vec_col, n_centroids, iters, seed)
    )
    order = sorted(
        range(len(cents)),
        key=lambda i: sum((a - b) ** 2 for a, b in zip(query_vec, cents[i])),
    )
    probe = order[:nprobe]
    assigned = assign_clusters(spread(df), vec_col, cents)
    cand = assigned.filter(F.col("__cluster").isin(*probe)).drop("__cluster")
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def ivf_topk_multi(
    df: DataFrame,
    queries: list[tuple[int, list[float]]],
    centroids: list[list[float]],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 4,
) -> DataFrame:
    """Batch `ivf_topk` against a supplied coarse model: ONE cluster
    assignment pass over the corpus answers every probe (the per-call
    Arrow argmin projection is what `ivf_topk` re-pays per query).
    Per-query results match `ivf_topk(..., centroids=centroids)`
    exactly: same RAW-space probe order (driver-side squared-L2 over
    the same centroid list), same in-cell exact cosine, same
    tie-breaks.

    Plan: assign once -> equi-join the |Q| x nprobe broadcast
    (query_id, cell) probe table on the cell id -> broadcast the
    |Q|-row query-vector frame onto the candidates -> exact cosine ->
    per-query window top-k.  The probe table and the vector frame stay
    separate so the cell join carries no d-double payload (the r10
    probe_queries_pq payload discipline); the candidate rows must
    carry the query vector regardless — exact cosine per candidate IS
    the in-cell re-rank."""
    if not queries:
        raise ValueError("ivf_topk_multi: empty probe batch")
    probe_rows = []
    for qid, qv in queries:
        order = sorted(
            range(len(centroids)),
            key=lambda i: sum(
                (a - b) ** 2 for a, b in zip(qv, centroids[i])
            ),
        )
        for cell in order[:nprobe]:
            probe_rows.append((int(qid), int(cell)))
    spark = df.sparkSession
    pdf = spark.createDataFrame(
        probe_rows, "query_id long, __cluster int", verifySchema=False
    )  # rows built above as exact ints
    qdf = spark.createDataFrame(
        [(int(qid), [float(v) for v in qv]) for qid, qv in queries],
        "query_id long, __qv array<double>",
        verifySchema=False,  # exact int/list[float]
    )
    from pulsar_sync_java_spark.operators.vectorized import (
        nearest_centroid_udf,
    )

    # asNondeterministic is the ivf_pq_topk pushdown barrier, not a
    # semantics claim: the equi-join's implied isnotnull(__cluster)
    # otherwise pushes below this projection and ExtractPythonUDFs
    # plans the k x d argmin kernel TWICE over the corpus (verified by
    # plan inspection — 2 ArrowEvalPython stages without the barrier).
    assigned = spread(df).withColumn(
        "__cluster",
        nearest_centroid_udf(centroids)
        .asNondeterministic()(F.col(vec_col)),
    )
    scored = (
        assigned.join(F.broadcast(pdf), "__cluster")
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            F.col(id_col),
            cosine(F.col(vec_col), F.col("__qv")).alias("cos_sim"),
        )
    )
    return _multi_cosine_topk(scored, k, id_col)


def ivf_index_write(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    iters: int = 2,
    seed: int = 42,
) -> list[list[float]]:
    """Materialize the IVF layout `ivf_topk`'s docstring promises at
    100 TB: assign every vector to its coarse cell and write the corpus
    Hive-partitioned BY CELL, so a probe becomes partition PRUNING at
    the parquet scan — the nprobe/n_centroids cost model enforced by
    the storage layout instead of a runtime filter.  Returns the
    centroids (the tiny model artifact a deployment stores next to the
    index; re-derivable deterministically from the data + seed).

    Routed through one repartition on the cell id before the write
    (write_partitioned's file-count discipline: files per cell ~= 1,
    not tasks x cells)."""
    cents = kmeans_centroids(df, id_col, vec_col, n_centroids, iters, seed)
    assigned = assign_clusters(spread(df), vec_col, cents).withColumnRenamed(
        "__cluster", "ivf_cell"
    )
    assigned.repartition("ivf_cell").write.mode("overwrite").partitionBy(
        "ivf_cell"
    ).parquet(path)
    # sidecar metadata for the staleness contract (ivf_index_staleness):
    # underscore-prefixed, so every parquet scan of `path` ignores it
    # (Hadoop hidden-file convention) — works on object stores too
    spark = df.sparkSession
    trained = int(spark.read.parquet(path).count())  # footer-count only
    spark.createDataFrame(
        [(trained, int(n_centroids), int(iters), int(seed))],
        "trained_rows long, n_centroids int, iters int, seed int",
    ).write.mode("overwrite").parquet(f"{path}/_ivf_meta")
    return cents


def ivf_index_append(
    df_new: DataFrame,
    path: str,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    assigned: DataFrame | None = None,
) -> int:
    """Incrementally grow a materialized IVF index (`ivf_index_write`)
    with new vectors — the index LIFECYCLE step a streaming corpus
    needs: assign against the STORED centroids (a coarse quantizer is
    deliberately never retrained per batch; its residual error is
    corrected by the exact re-rank inside every probe) and append via
    the keyed idempotent sink, partition-pruned by cell.

    Replay-safe: re-delivering a batch appends nothing (vec_id keyed,
    and a vector always lands in the same cell under fixed centroids,
    so the pruned existence probe is exact).  Each batch's probe scans
    only the cells present in the batch, not the index history.
    Returns rows appended.  Retrain/rebalance (centroid drift after
    the corpus grows far past the training sample) is a full
    `ivf_index_write` rebuild — the standard IVF maintenance model.

    `assigned` lets a caller that already ran `assign_clusters` over
    this exact batch (the refresh pipeline's drift check) hand the
    (rows + __cluster) frame in, skipping the second assignment pass
    — the per-row k x d distance kernel is the expensive half of an
    append.
    """
    from pulsar_sync_java_spark.sinks.writers import idempotent_append

    if assigned is None:
        assigned = assign_clusters(spread(df_new), vec_col, centroids)
    assigned = assigned.withColumnRenamed("__cluster", "ivf_cell")
    return idempotent_append(
        assigned, path, keys=[id_col], partition_col="ivf_cell"
    )


def ivf_topk_indexed(
    spark,
    path: str,
    centroids: list[list[float]],
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 4,
) -> DataFrame:
    """ANN top-k over a materialized IVF index (`ivf_index_write`):
    rank the stored centroids against the query driver-side (k x d
    floats — no Spark job), then scan ONLY the nprobe matching
    partition directories (`ivf_cell IN (...)` becomes
    PartitionFilters; plan-asserted in tests) and exact-re-rank inside
    them.  This is the scale path where `ivf_topk`'s per-query
    assignment projection is replaced by the layout: probing 4 of 1024
    cells reads ~0.4% of a 100 TB corpus."""
    order = sorted(
        range(len(centroids)),
        key=lambda i: sum((a - b) ** 2 for a, b in zip(query_vec, centroids[i])),
    )
    probe = [int(i) for i in order[:nprobe]]
    cand = spark.read.parquet(path).where(F.col("ivf_cell").isin(probe))
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


class IvfStaleness:
    """Health report for a materialized IVF index (SCALE.md §5b
    staleness contract; r6 verdict #6).  The coarse quantizer is
    trained ONCE at `ivf_index_write` time; appends never retrain it
    (residual error is absorbed by each probe's exact re-rank), so two
    things decay as the corpus grows past the training snapshot:
    probe COST (cells fill up — every probe scans more rows) and, if
    the data distribution drifted, probe RECALL (new vectors crowd
    into cells the query ranking then under-probes).  Both show up in
    the two numbers here: total growth and worst-cell share."""

    def __init__(
        self,
        trained_rows: int,
        current_rows: int,
        n_centroids: int,
        occupied_cells: int,
        max_cell_rows: int,
    ):
        self.trained_rows = trained_rows
        self.current_rows = current_rows
        self.n_centroids = n_centroids
        self.occupied_cells = occupied_cells
        self.max_cell_rows = max_cell_rows

    @property
    def growth(self) -> float:
        return (
            self.current_rows / self.trained_rows if self.trained_rows else 0.0
        )

    @property
    def max_cell_share(self) -> float:
        return (
            self.max_cell_rows / self.current_rows if self.current_rows else 0.0
        )

    def should_rebuild(
        self, growth_factor: float = 2.0, cell_share_factor: float = 4.0
    ) -> bool:
        """Rebuild (full `ivf_index_write` retrain) when the corpus
        has grown past `growth_factor` x the training snapshot, or any
        single cell holds more than `cell_share_factor` x the uniform
        share (1/n_centroids) — the quantizer-misfit signal that makes
        fixed-nprobe probes both slow (that cell dominates scan cost)
        and recall-lossy (its residual radius outgrew the re-rank's
        candidate budget).  Same decide-from-a-bounded-report pattern
        as operators/skew.py:maybe_salt."""
        return (
            self.growth >= growth_factor
            or self.max_cell_share >= cell_share_factor / self.n_centroids
        )

    def __repr__(self) -> str:  # pragma: no cover - debugging aid
        return (
            f"IvfStaleness(trained={self.trained_rows}, "
            f"current={self.current_rows}, growth={self.growth:.2f}, "
            f"max_cell_share={self.max_cell_share:.3f})"
        )


def ivf_index_staleness(spark, path: str) -> IvfStaleness:
    """Probe a materialized IVF index's staleness: reads the sidecar
    `_ivf_meta` written at build time plus ONE footer-level aggregate
    over the index (per-cell row counts — partition-column groupBy,
    no vector bytes deserialized).  The maintenance loop a standing
    100 TB ANN index runs between batches:

        report = ivf_index_staleness(spark, path)
        if report.should_rebuild():
            cents = ivf_index_write(full_corpus, path, ...)   # retrain
        else:
            ivf_index_append(new_batch, path, cents)          # grow
    """
    meta = spark.read.parquet(f"{path}/_ivf_meta").collect()[0]
    cells = (
        spark.read.parquet(path)
        .groupBy("ivf_cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .agg(
            F.count(F.lit(1)).alias("occupied"),
            F.sum("n").alias("total"),
            F.max("n").alias("max_n"),
        )
        .collect()[0]
    )
    return IvfStaleness(
        trained_rows=int(meta["trained_rows"]),
        current_rows=int(cells["total"] or 0),
        n_centroids=int(meta["n_centroids"]),
        occupied_cells=int(cells["occupied"]),
        max_cell_rows=int(cells["max_n"] or 0),
    )


def embedding_near_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 48,
    bands: int = 6,
    max_bucket: int = 2000,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs via banded hyperplane LSH.

    Three scale-critical choices (vs the naive full-signature bucket):
    - **Center the corpus first.** Real embedding corpora live in a
      narrow cone (all-pairs cosine ~0.7+), so hyperplanes through the
      origin barely separate them — measured: 12 uncentered planes left
      50% of ALL pairs in shared buckets (n²/2 candidates).  Subtracting
      the mean vector (one tiny agg, shipped back as a literal) makes
      background pairs ~orthogonal, so each plane splits ~50/50 and
      buckets shrink geometrically.
    - **Band the bits** (bands x rows_per_band = num_planes), minhash-
      LSH style: a near-dup pair only needs ONE fully-agreeing band, so
      recall stays high (miss prob (1-p^r)^b) while each band's buckets
      stay small.
    - **Precompute norms** before the pair join — norms are per-vector
      (n·d work), not per-pair (pairs·d); only the dot product is
      per-pair.  Measured 3x on the pair stage.

    Exact cosine (on the ORIGINAL vectors) verifies every candidate, so
    false positives are impossible; recall is the only approximation.
    """
    # The centering mean does NOT need to be exact — it only has to put
    # the corpus cone near the origin so hyperplanes split ~50/50 (the
    # exact-cosine verify step is what guarantees precision; banding
    # guarantees recall for >=threshold pairs, whose signatures agree on
    # ~every plane regardless of a slightly-shifted mean).  So it comes
    # from a bounded deterministic sample (same seeded-hash TakeOrdered
    # discipline as kmeans_centroids): ONE narrow bounded job, instead
    # of the previous full-corpus posexplode + per-dimension aggregate —
    # at 100 TB that aggregate was a whole extra corpus scan with d-fold
    # row amplification, paid per invocation.
    sample_rows = (
        spread(df)
        .select(id_col, vec_col)
        .where(F.col(vec_col).isNotNull() & (F.size(vec_col) > 0))
        .orderBy(F.xxhash64(F.col(id_col).cast("string"), F.lit(seed)), F.col(id_col))
        .limit(4096)
        .select(vec_col)
        .collect()
    )
    if not sample_rows:
        return df.select(
            F.col(id_col).alias("id_a"), F.col(id_col).alias("id_b"),
            F.lit(0.0).alias("cos_sim"),
        ).limit(0)
    import numpy as np

    vecs = [r[0] for r in sample_rows]
    lens = {len(v) for v in vecs}
    if len(lens) > 1:
        # fail HERE with the real story: a ragged corpus would otherwise
        # die later inside the signature kernel with an opaque numpy
        # shape error (the LSH planes are a fixed d x k matrix)
        raise ValueError(
            "embedding_near_pairs requires a fixed embedding dimension; "
            f"sample contains lengths {sorted(lens)[:5]}"
        )
    sample = np.asarray(vecs, dtype=np.float64)
    dim = sample.shape[1]
    from pulsar_sync_java_spark.operators.vectorized import (
        hyperplane_signature_udf,
    )

    mean = [float(x) for x in sample.mean(axis=0)]

    planes = _planes(dim, num_planes, seed)
    rows_per_band = max(num_planes // bands, 1)
    # Signature = one Arrow-vectorized kernel (centering + planes x dim
    # dot products fused in numpy; see operators/vectorized.py).  The
    # repartition barrier keeps it parallel and un-inlined; the banded
    # subtree and the two vector/norm lookups are three consumers AQE
    # does not share, so persist the projection (n rows x (d+2) cols —
    # the norms, interpreted HOF folds, then compute once instead of
    # three times; measured 1.77s -> 1.21s cold at sf0.1, deduplicated
    # across invocations by the plan-matched cache).
    sig = spread_by(
        spread(df).select(
            F.col(id_col),
            F.col(vec_col),
            _norm(F.col(vec_col)).alias("nrm"),
            hyperplane_signature_udf(planes, mean)(F.col(vec_col)).alias("sig"),
        ),
        id_col,
    ).persist()
    band_mask = (1 << rows_per_band) - 1
    # Banded rows carry ONLY (band, bucket, id): the vectors are the
    # wide payload (d doubles/row) and must not be amplified bands-fold
    # through the shuffle.  Candidates come from one groupBy per bucket
    # (util.pair_structs; oversized buckets dropped whole), then the
    # vectors+norms join back on the deduplicated pair set only — tiny,
    # so AQE broadcasts it against the vector branches.
    banded = sig.select(
        id_col,
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(b).alias("band"),
                        F.shiftright(F.col("sig"), b * rows_per_band)
                        .bitwiseAND(F.lit(band_mask))
                        .alias("bucket"),
                    )
                    for b in range(bands)
                ]
            )
        ).alias("bb"),
    ).select(id_col, "bb.band", "bb.bucket")

    buckets = (
        banded.groupBy("band", "bucket")
        .agg(F.sort_array(F.collect_list(id_col)).alias("__ids"))
        .filter((F.size("__ids") >= 2) & (F.size("__ids") <= max_bucket))
    )
    cand = (
        buckets.select(F.explode(pair_structs(F.col("__ids"))).alias("p"))
        .select(F.col("p.a").alias("id_a"), F.col("p.b").alias("id_b"))
        .dropDuplicates(["id_a", "id_b"])
    )
    va = sig.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"),
        F.col("nrm").alias("norm_a"),
    )
    vb = sig.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"),
        F.col("nrm").alias("norm_b"),
    )
    return (
        cand.join(va, "id_a")
        .join(vb, "id_b")
        .select(
            "id_a",
            "id_b",
            (_dot(F.col("vec_a"), F.col("vec_b")) / (F.col("norm_a") * F.col("norm_b"))).alias(
                "cos_sim"
            ),
        )
        .filter(F.col("cos_sim") >= threshold)
    )


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    exclude_self: bool = False,
    prereduce: bool = True,
) -> DataFrame:
    """Exact k-NN JOIN: for every row of `queries`, the k most cosine-
    similar rows of `corpus` — the batch generalization of cosine_topk
    (one query) that a training pipeline runs to attach retrieval
    neighbors to every example.

    Output: (query_id, neighbor_id, cos_sim, rank), rank 1..k per query
    in (cos_sim desc, neighbor_id asc) total order.

    Plan shape, built for |corpus| >> |queries|:
    - `queries` is broadcast (with per-query norms precomputed), so
      scoring is one shuffle-free pass over the corpus: each corpus row
      computes its own norm ONCE and a decimal-exact dot product per
      query (functions/numeric.py:dec_arr_sum — the q_sim_topk
      formulation, bit-identical to the DuckDB oracle);
    - `prereduce` inserts a partition-local top-k (mapInPandas: one
      running pandas top-k per batch iterator) BEFORE the ranking
      shuffle, so the window stage receives at most
      partitions * |queries| * k rows instead of |corpus| * |queries|
      — the two-phase top-k that keeps the final shuffle O(P·Q·k) at
      any corpus size.  Scores pass through Arrow untouched (float64
      round-trip is bit-exact), so the reduction cannot change the
      result (property-tested);
    - the final window ranks the survivors per query.
    """
    from pulsar_sync_java_spark.functions.numeric import dec_arr_sum
    from pyspark.sql import Window

    sq = lambda c: F.transform(c, lambda x: x.cast("double") * x.cast("double"))  # noqa: E731
    q = queries.select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        dec_arr_sum(sq(F.col(vec_col))).alias("__ny"),
    )
    c = spread(corpus).select(
        F.col(id_col).alias("neighbor_id"),
        F.col(vec_col).alias("__cv"),
        dec_arr_sum(sq(F.col(vec_col))).alias("__nx"),
    )
    prod = F.zip_with(
        "__cv", "__qv", lambda x, y: x.cast("double") * y.cast("double")
    )
    scored = (
        c.crossJoin(F.broadcast(q))
        .select(
            "query_id",
            "neighbor_id",
            (
                dec_arr_sum(prod) / (F.sqrt("__nx") * F.sqrt("__ny"))
            ).alias("cos_sim"),
        )
    )
    if exclude_self:
        scored = scored.filter(F.col("neighbor_id") != F.col("query_id"))

    if prereduce:
        schema = scored.schema

        def local_topk(batches):
            import pandas as pd

            best: pd.DataFrame | None = None
            for pdf in batches:
                cur = pd.concat([best, pdf]) if best is not None else pdf
                cur = cur.sort_values(
                    ["query_id", "cos_sim", "neighbor_id"],
                    ascending=[True, False, True],
                )
                best = cur.groupby("query_id", sort=False).head(k)
            if best is not None:
                yield best

        scored = scored.mapInPandas(local_topk, schema)

    w = Window.partitionBy("query_id").orderBy(
        F.col("cos_sim").desc(), F.col("neighbor_id").asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("query_id", "neighbor_id", "cos_sim", "rank")
    )


def ivf_delta_drift(
    spark,
    path: str,
    delta_assigned: DataFrame,
) -> float:
    """Total-variation distance between the standing index's
    cell-occupancy distribution and an incoming delta's assignment
    distribution UNDER THE SAME stored centroids — the q_drift_tv
    machinery (queries/stats.py) pointed at the quantizer: cells are
    the buckets, the index vs the delta are the two slices.

    This is the RECALL-side staleness signal `IvfStaleness`'s two size
    ratios cannot see: a small delta (growth barely moves) whose
    vectors crowd into cells the training snapshot left sparse means
    the data distribution moved — fixed-nprobe probes will under-probe
    exactly the cells that now matter.  TV = 0.5 * Σ|p_cell - q_cell|
    over the union of cells, computed from exact integer counts
    (Fraction arithmetic; one partition-column aggregate per side, no
    vector bytes deserialized) — deterministic, like every drift
    number in the engine.
    """
    from fractions import Fraction

    idx = {
        int(r["ivf_cell"]): int(r["n"])
        for r in spark.read.parquet(path)
        .groupBy("ivf_cell")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    new = {
        int(r["__cluster"]): int(r["n"])
        for r in delta_assigned.groupBy("__cluster")
        .agg(F.count(F.lit(1)).alias("n"))
        .collect()
    }
    ti, tn = sum(idx.values()), sum(new.values())
    if not ti or not tn:
        return 0.0
    tv = Fraction(0)
    for cell in set(idx) | set(new):
        tv += abs(
            Fraction(idx.get(cell, 0), ti) - Fraction(new.get(cell, 0), tn)
        )
    return float(tv / 2)


def ivf_index_refresh(
    spark,
    path: str,
    df_new: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rebuild_path: str | None = None,
    growth_factor: float = 2.0,
    cell_share_factor: float = 4.0,
    drift_tv_threshold: float = 0.25,
    n_centroids: int | None = None,
    iters: int = 2,
    seed: int = 42,
) -> dict:
    """One maintenance step of a standing IVF index (r7 verdict #5 —
    the refresh pipeline composed from the lifecycle parts): decide
    append-vs-rebuild from the staleness report AND the delta's cell
    drift, then do it.

    - **append** (the cheap steady-state path): the delta is assigned
      against the STORED centroids and idempotently appended,
      partition-pruned by cell (`ivf_index_append`) — delta-sized
      cost, the index history never rewrites.
    - **rebuild** (the periodic re-quantize): triggered when the size
      ratios trip (`IvfStaleness.should_rebuild`: growth past
      `growth_factor`, or a cell past `cell_share_factor`/n of the
      corpus) OR the delta's assignment distribution sits TV >=
      `drift_tv_threshold` away from the index's (`ivf_delta_drift`)
      — the distribution-moved signal that degrades recall before it
      degrades size.  The quantizer retrains over index ∪ delta into
      `rebuild_path` (a NEW directory — never overwrite the directory
      being read; the caller swaps the active pointer, the standard
      versioned-index deployment), and the decision record carries the
      fresh centroids.

    Returns a decision record dict: action ('append'|'rebuild'),
    the trigger flags, the measured numbers (growth, max_cell_share,
    drift_tv), rows appended (append path), and active path +
    centroids.  Deterministic end to end: deterministic quantizer
    (seeded init), exact-integer TV, idempotent append.
    """
    delta_assigned = assign_clusters(spread(df_new), vec_col, centroids)
    drift_tv = ivf_delta_drift(spark, path, delta_assigned)
    report = ivf_index_staleness(spark, path)
    size_stale = report.should_rebuild(growth_factor, cell_share_factor)
    drifted = drift_tv >= drift_tv_threshold
    record = {
        "growth": report.growth,
        "max_cell_share": report.max_cell_share,
        "drift_tv": drift_tv,
        "size_stale": size_stale,
        "drifted": drifted,
    }
    if not (size_stale or drifted):
        # the drift check already paid the delta's assignment pass —
        # hand it to the append rather than re-running the k x d kernel
        appended = ivf_index_append(
            df_new, path, centroids, id_col, vec_col, assigned=delta_assigned
        )
        return {
            **record,
            "action": "append",
            "appended": appended,
            "path": path,
            "centroids": centroids,
        }
    target = rebuild_path or f"{path}_rebuilt"
    # DELTA WINS, deterministically: a delta row updating an existing
    # id replaces the stored row (anti-join drops the stored copy), and
    # ids duplicated INSIDE the delta collapse to their array-minimum
    # embedding (arrays are orderable) — dropDuplicates([id]) here
    # would keep an arbitrary copy and break the documented
    # deterministic-rebuild contract.
    delta_u = (
        df_new.select(id_col, vec_col)
        .groupBy(id_col)
        .agg(F.min(vec_col).alias(vec_col))
    )
    full = (
        spark.read.parquet(path)
        .select(id_col, vec_col)
        .join(delta_u.select(id_col), id_col, "left_anti")
        .unionByName(delta_u)
    )
    # Counted BEFORE the write, independently of it: the sidecar
    # trained_rows is counted from the WRITTEN files, so a write that
    # dropped rows would report a self-consistent (wrong) number —
    # this pre-write expectation is what the swap gate
    # (`calibrated_swap`) checks the rebuilt layout against (r11
    # advice: a botched write passed balance + all PQ flags).
    # |full| = stored + genuinely-new delta ids, computed as an
    # id-column-pruned anti-join count instead of full.count() — the
    # latter re-scans every vector byte a second time per rebuild
    # (review catch); the staleness report already holds stored rows.
    new_ids = int(
        delta_u.select(id_col)
        .join(spark.read.parquet(path).select(id_col), id_col, "left_anti")
        .count()
    )
    expected = report.current_rows + new_ids
    k = n_centroids if n_centroids is not None else report.n_centroids
    cents = ivf_index_write(full, target, id_col, vec_col, k, iters, seed)
    return {
        **record,
        "action": "rebuild",
        "appended": 0,
        "path": target,
        "centroids": cents,
        "expected_rows": expected,
    }


# ---------------------------------------------------------------------------
# IVF-PQ: product-quantization ADC scan + exact re-rank inside probed cells
# (Jegou, Douze, Schmid — "Product Quantization for Nearest Neighbor
# Search", TPAMI 2011).  IVF prunes cells; PQ cuts the in-cell scan
# payload from d*4 bytes/vector to M bytes/vector (~32x at d=64, M=8),
# so the candidate scan reads ONLY the tiny codes column — the full
# vector is fetched for just the `rerank` survivors.
#
# All PQ paths operate on L2-NORMALIZED vectors: on the unit sphere
# squared L2 is 2 - 2*cos, monotone in cosine, so the ADC (asymmetric
# distance computation) ranking agrees with the exact cosine re-rank
# that follows — without normalization an L2-trained codebook would
# rank by a metric the re-rank does not use.
# ---------------------------------------------------------------------------


def _l2_normalize(X):
    """Row-normalize a numpy matrix; zero rows pass through unscaled."""
    import numpy as np

    n = np.sqrt((X * X).sum(axis=1, keepdims=True))
    n[n == 0.0] = 1.0
    return X / n


def pq_train(
    df: DataFrame,
    centroids: list[list[float]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    m: int = 8,
    k_sub: int = 256,
    iters: int = 3,
    seed: int = 42,
    sample=None,
) -> list[list[list[float]]]:
    """Train the M x k_sub product-quantization codebooks over COARSE
    RESIDUALS (normalized vector minus its nearest coarse centroid),
    driver-side in numpy on the same bounded seeded sample the coarse
    quantizer used (`_seeded_sample` — pass `sample` to share the one
    collect).  Returns codebooks shaped (m, k_sub, d_sub) as plain
    lists (the tiny model artifact stored next to the index, like the
    centroids).

    Per subspace: seeds are the first k_sub sample residuals (hash
    order == seeded random; tiled if the sample is smaller), then
    `iters` Lloyd steps; empty codewords keep their previous value —
    the kmeans_centroids determinism contract, per subspace."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    k, d = C.shape
    if d % m != 0:
        raise ValueError(
            f"pq_train: dim {d} not divisible by m={m} subspaces — "
            "pick m | d (PQ splits the vector into equal subvectors)"
        )
    d_sub = d // m
    if sample is not None and len(sample) == 0:
        raise ValueError(
            "pq_train: empty `sample` — cannot train codebooks "
            f"(vec_col={vec_col!r})"
        )
    # `sample` contract: rows must already be L2-NORMALIZED (the
    # kmeans_centroids sample-sharing contract — see its docstring)
    X = sample if sample is not None else _l2_normalize(
        _seeded_sample(df, id_col, vec_col, 256 * k, seed, caller="pq_train")
    )
    cells = ((C * C).sum(axis=1)[None, :] - 2.0 * (X @ C.T)).argmin(axis=1)
    R = (X - C[cells]).reshape(len(X), m, d_sub)
    books = np.empty((m, k_sub, d_sub), dtype=np.float64)
    for j in range(m):
        Xj = R[:, j, :]
        if len(Xj) >= k_sub:
            Bj = Xj[:k_sub].copy()
        else:
            Bj = Xj[np.arange(k_sub) % len(Xj)].copy()
        cells_idx = np.arange(k_sub)
        for _ in range(iters):
            a = ((Bj * Bj).sum(axis=1)[None, :] - 2.0 * (Xj @ Bj.T)).argmin(
                axis=1
            )
            # group-by-cell via stable sort + slices: O(n log n) rather
            # than k_sub full-array masks (measured ~0.9 s/train at the
            # bench dials, m=16 x k_sub=256 x 3 iters).  The stable
            # sort keeps members in ascending row order — the same
            # rows, in the same order, as the Xj[a == ci] mask.  Each
            # slice mean runs as np.add.reduce / n, which IS ndarray
            # .mean()'s exact computation (umr_sum then true_divide by
            # the count — bit-identical), minus the _methods._mean
            # wrapper that cost ~35 us x m*iters*k_sub calls (r14
            # cProfile: 12,320 mean calls, 0.47 s).
            order = np.argsort(a, kind="stable")
            sa = a[order]
            Xs = Xj[order]
            starts = np.searchsorted(sa, cells_idx, side="left")
            ends = np.searchsorted(sa, cells_idx, side="right")
            for ci in range(k_sub):
                s0, e0 = starts[ci], ends[ci]
                if e0 > s0:
                    Bj[ci] = np.add.reduce(Xs[s0:e0], axis=0) / (e0 - s0)
        books[j] = Bj
    return [[[float(v) for v in row] for row in book] for book in books]


def _pq_probe_order(query_vec: list[float], centroids: list[list[float]]):
    """Cells ranked by squared L2 of the NORMALIZED query to each coarse
    centroid — driver-side, k x d floats, no Spark job."""
    import numpy as np

    q = _l2_normalize(np.asarray([query_vec], dtype=np.float64))[0]
    C = np.asarray(centroids, dtype=np.float64)
    d2 = ((C - q[None, :]) ** 2).sum(axis=1)
    return [int(i) for i in np.argsort(d2, kind="stable")], q


def _pq_lut_rows(q_norm, centroids, codebooks, probe):
    """Per-probed-cell ADC lookup tables: LUT[m][c] = ||r_m - b_mc||^2
    where r = q_norm - centroid[cell].  One (cell, lut) row per probed
    cell — nprobe x m x k_sub doubles, broadcast to the scan."""
    import numpy as np

    C = np.asarray(centroids, dtype=np.float64)
    B = np.asarray(codebooks, dtype=np.float64)  # (m, k_sub, d_sub)
    m, _, d_sub = B.shape
    rows = []
    for cell in probe:
        r = (q_norm - C[cell]).reshape(m, d_sub)
        lut = ((B - r[:, None, :]) ** 2).sum(axis=2)  # (m, k_sub)
        rows.append(
            (int(cell), [[float(x) for x in sub] for sub in lut])
        )
    return rows


def adc_lut_fold(
    lut_col: Column | str = "__lut", codes_col: Column | str = "__codes"
) -> Column:
    """THE ADC lookup-table fold — sum of per-subspace LUT entries
    selected by the 0-based codes (element_at is 1-based, hence the
    +1).  One definition for every consumer (_pq_adc_topc, the serving
    probe in streaming/ann_serve.py, ann_calibration's audit): a fix
    to the fold — indexing, or a codegen workaround — lands once.
    Bounded use only: LUT folds run on candidate/audit frames of m
    lookups per row; a corpus-scale pair fold belongs in the Arrow
    kernel (vectorized.py:pq_gram_dot_udf — HOFs are CodegenFallback,
    measured 19x slower per pair at sf0.1)."""
    return F.aggregate(
        F.zip_with(
            F.col(lut_col) if isinstance(lut_col, str) else lut_col,
            F.col(codes_col) if isinstance(codes_col, str) else codes_col,
            lambda sub, c: F.element_at(sub, c + F.lit(1)),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def _pq_adc_topc(
    coded: DataFrame,
    lut_rows,
    rerank: int,
    id_col: str,
    cell_col: str = "__cell",
    codes_col: str = "__codes",
) -> DataFrame:
    """ADC scan: broadcast-join the per-cell LUTs onto the codes frame
    (already cell-filtered), sum the per-subspace table lookups in JVM
    higher-order functions (zip_with + aggregate — m element_at's per
    row, no Python), and TakeOrderedAndProject the `rerank` best.
    Ties break on id for determinism."""
    spark = coded.sparkSession
    lutdf = spark.createDataFrame(
        lut_rows, f"{cell_col} int, __lut array<array<double>>",
        verifySchema=False,  # rows built here as exact int/list[float]
    )
    adc = adc_lut_fold("__lut", codes_col)
    return (
        coded.join(F.broadcast(lutdf), cell_col)
        .select(F.col(id_col), adc.alias("__adc"))
        .orderBy(F.col("__adc").asc(), F.col(id_col).asc())
        .limit(rerank)
    )


def ivf_pq_topk(
    df: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    nprobe: int = 4,
    m: int = 8,
    k_sub: int = 256,
    rerank: int = 64,
    iters: int = 1,
    pq_iters: int = 3,
    seed: int = 42,
    centroids: list[list[float]] | None = None,
    codebooks=None,
) -> DataFrame:
    """IVF-PQ approximate top-k: coarse-quantize (normalized) vectors
    into `n_centroids` cells, product-quantize the residuals to M
    byte-codes, ADC-scan the codes inside the `nprobe` probed cells,
    exact-cosine re-rank only the `rerank` ADC survivors.

    vs `ivf_topk`: the probed-cell scan ranks M-byte codes via
    broadcast lookup tables instead of computing exact cosine on full
    d-float vectors — at 100 TB the in-cell candidate scan reads ~3%
    of the bytes, and the exact metric touches only `rerank` rows.
    Training (coarse + codebooks) shares ONE bounded driver-side
    sample; everything distributed is one Arrow encode projection, a
    broadcast LUT join, and a top-C.

    Pass `centroids` + `codebooks` (together) to probe with an
    EXTERNAL model — the calibration harness (`ann_calibration`) uses
    this to audit a given model rather than retrain; production callers
    leave them None and get the deterministic seeded training."""
    if (centroids is None) != (codebooks is None):
        raise ValueError(
            "ivf_pq_topk: pass centroids and codebooks together — a "
            "coarse model and codebooks from different trainings rank "
            "in inconsistent metric spaces"
        )
    if centroids is not None:
        cents, books = centroids, codebooks
    else:
        X = _l2_normalize(
            _seeded_sample(df, id_col, vec_col, 256 * n_centroids, seed,
                           caller="ivf_pq_topk")
        )
        cents = kmeans_centroids(
            df, id_col, vec_col, n_centroids, iters, seed, sample=X
        )
        books = pq_train(
            df, cents, id_col, vec_col, m, k_sub, pq_iters, seed, sample=X
        )
    order, q_norm = _pq_probe_order(query_vec, cents)
    probe = order[:nprobe]

    from pulsar_sync_java_spark.operators.vectorized import pq_encode_udf

    # asNondeterministic is a PUSHDOWN BARRIER, not a semantics claim:
    # the kernel is pure, but letting Catalyst push the cell filter
    # below the projection substitutes element_at(encode(v),1) into
    # the predicate and ExtractPythonUDFs then plans TWO
    # ArrowEvalPython stages — the full k x d + M-subspace encode ran
    # twice over the corpus (caught by plan inspection; the contract
    # is ONE encode pass per row).  The filter stays above the single
    # encode stage.
    enc = pq_encode_udf(cents, books).asNondeterministic()(F.col(vec_col))
    coded = (
        spread(df)
        .select(F.col(id_col), enc.alias("__enc"))
        .select(
            id_col,
            F.element_at("__enc", 1).alias("__cell"),
            F.slice("__enc", 2, len(books)).alias("__codes"),
        )
        .filter(F.col("__cell").isin(*probe))
    )
    topc = _pq_adc_topc(
        coded, _pq_lut_rows(q_norm, cents, books, probe), rerank, id_col
    )
    cand = df.join(F.broadcast(topc.select(id_col)), id_col)
    return cosine_topk(cand, query_vec, k, id_col, vec_col)


def ivf_pq_topk_multi(
    df: DataFrame,
    queries: list[tuple[int, list[float]]],
    centroids: list[list[float]],
    codebooks,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 4,
    rerank: int = 64,
) -> DataFrame:
    """Batch `ivf_pq_topk` against a supplied model: ONE Arrow encode
    pass over the corpus serves every probe — the in-query twin of
    `streaming/ann_serve.py:probe_queries_pq` (which routes batches
    against a MATERIALIZED codes parquet; this routes them against a
    DataFrame that must be coded in-plan).  Per-query results match
    `ivf_pq_topk(..., centroids=..., codebooks=...)` exactly: same
    normalized probe order, same LUT math (`_pq_lut_rows` +
    `adc_lut_fold`), same (ADC ASC, id ASC) rerank cut and
    (cosine DESC, id ASC) final tie-breaks.

    Payload discipline (the r10 probe_queries_pq contract): the
    broadcast LUT frame carries ONLY (query_id, cell, lut); the ADC
    candidate rows carry ONLY (query_id, id, adc); the d-double query
    vectors live in a separate |Q|-row frame broadcast onto the
    `rerank` SURVIVORS at the exact re-rank.  The encode projection
    keeps the single-query path's pushdown barrier (one
    ArrowEvalPython stage — plan-asserted by the equivalence tests'
    plan check)."""
    from pyspark.sql.window import Window

    from pulsar_sync_java_spark.operators.vectorized import pq_encode_udf

    if not queries:
        raise ValueError("ivf_pq_topk_multi: empty probe batch")
    lut_rows = []
    qvec_rows = []
    for qid, qv in queries:
        order, q_norm = _pq_probe_order([float(v) for v in qv], centroids)
        qvec_rows.append((int(qid), [float(v) for v in qv]))
        for cell, lut in _pq_lut_rows(
            q_norm, centroids, codebooks, order[:nprobe]
        ):
            lut_rows.append((int(qid), int(cell), lut))
    spark = df.sparkSession
    # verifySchema=False: rows are built above with explicit int()/
    # float() conversions; the default per-element verifier walks the
    # ~nprobe*m*k_sub LUT doubles on the driver (~0.3s per
    # construction, measured via cProfile r14)
    ludf = spark.createDataFrame(
        lut_rows, "query_id long, __cell int, __lut array<array<double>>",
        verifySchema=False,
    )
    qdf = spark.createDataFrame(
        qvec_rows, "query_id long, __qv array<double>",
        verifySchema=False,
    )
    cells_union = sorted({r[1] for r in lut_rows})
    enc = pq_encode_udf(centroids, codebooks).asNondeterministic()(
        F.col(vec_col)
    )
    coded = (
        spread(df)
        .select(F.col(id_col), enc.alias("__enc"))
        .select(
            id_col,
            F.element_at("__enc", 1).alias("__cell"),
            F.slice("__enc", 2, len(codebooks)).alias("__codes"),
        )
        .filter(F.col("__cell").isin(*cells_union))
    )
    adc = adc_lut_fold("__lut", "__codes")
    scored = coded.join(F.broadcast(ludf), "__cell").select(
        "query_id", F.col(id_col), adc.alias("__adc")
    )
    wc = Window.partitionBy("query_id").orderBy(
        F.col("__adc").asc(), F.col(id_col).asc()
    )
    cand = (
        scored.withColumn("__r", F.row_number().over(wc))
        .filter(F.col("__r") <= rerank)
        .select("query_id", id_col)
    )
    scored_exact = (
        df.select(id_col, vec_col)
        .join(F.broadcast(cand), id_col)
        .join(F.broadcast(qdf), "query_id")
        .select(
            "query_id",
            F.col(id_col),
            cosine(F.col(vec_col), F.col("__qv")).alias("cos_sim"),
        )
    )
    return _multi_cosine_topk(scored_exact, k, id_col)


def ivf_pq_index_write(
    df: DataFrame,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    n_centroids: int = 16,
    m: int = 8,
    k_sub: int = 256,
    iters: int = 2,
    pq_iters: int = 3,
    seed: int = 42,
):
    """Materialize an IVF-PQ index: the `ivf_index_write` layout
    (Hive-partitioned by coarse cell -> probes are partition PRUNING)
    plus a `pq_codes array<int>` column, so the ADC candidate scan
    reads only (id, codes) via parquet column pruning — the full
    embedding column is touched only by the re-rank fetch.  Returns
    (centroids, codebooks): the tiny model artifact stored beside the
    index, re-derivable deterministically from data + seed.

    Cells are assigned on NORMALIZED vectors (the PQ metric contract
    above), so this is a self-contained layout, not a column bolted
    onto an `ivf_index_write` directory."""
    from pulsar_sync_java_spark.operators.vectorized import pq_encode_udf

    X = _l2_normalize(
        _seeded_sample(df, id_col, vec_col, 256 * n_centroids, seed,
                       caller="ivf_pq_index_write")
    )
    cents = kmeans_centroids(
        df, id_col, vec_col, n_centroids, iters, seed, sample=X
    )
    books = pq_train(
        df, cents, id_col, vec_col, m, k_sub, pq_iters, seed, sample=X
    )
    enc = pq_encode_udf(cents, books)(F.col(vec_col))
    assigned = (
        spread(df)
        .withColumn("__enc", enc)
        .withColumn("ivf_cell", F.element_at("__enc", 1))
        .withColumn("pq_codes", F.slice("__enc", 2, m))
        .drop("__enc")
    )
    assigned.repartition("ivf_cell").write.mode("overwrite").partitionBy(
        "ivf_cell"
    ).parquet(path)
    spark = df.sparkSession
    trained = int(spark.read.parquet(path).count())  # footer-count only
    spark.createDataFrame(
        [(trained, int(n_centroids), int(iters), int(seed), int(m), int(k_sub))],
        "trained_rows long, n_centroids int, iters int, seed int, "
        "pq_m int, pq_k_sub int",
    ).write.mode("overwrite").parquet(f"{path}/_ivf_meta")
    return cents, books


def ivf_pq_topk_indexed(
    spark,
    path: str,
    centroids: list[list[float]],
    codebooks,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    nprobe: int = 4,
    rerank: int = 64,
) -> DataFrame:
    """ANN top-k over a materialized IVF-PQ index
    (`ivf_pq_index_write`): rank cells driver-side, scan ONLY the
    nprobe matching partition directories AND only the (id, codes)
    columns (partition pruning x column pruning — the two axes that
    make the candidate scan ~0.1% of a 100 TB corpus), ADC-rank via
    broadcast LUTs, then fetch the full vectors for just the `rerank`
    survivors (broadcast semi-join, still partition-pruned) for the
    exact cosine re-rank."""
    order, q_norm = _pq_probe_order(query_vec, centroids)
    probe = order[:nprobe]
    codes_scan = (
        spark.read.parquet(path)
        .where(F.col("ivf_cell").isin(probe))
        .select(
            F.col(id_col),
            F.col("ivf_cell").cast("int").alias("__cell"),
            F.col("pq_codes").alias("__codes"),
        )
    )
    topc = _pq_adc_topc(
        codes_scan,
        _pq_lut_rows(q_norm, centroids, codebooks, probe),
        rerank,
        id_col,
    )
    fetch = (
        spark.read.parquet(path)
        .where(F.col("ivf_cell").isin(probe))
        .select(id_col, vec_col)
        .join(F.broadcast(topc.select(id_col)), id_col)
    )
    return cosine_topk(fetch, query_vec, k, id_col, vec_col)


def ivf_pq_index_refresh(
    spark,
    path: str,
    df_new: DataFrame,
    centroids: list[list[float]],
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    rebuild_path: str | None = None,
    growth_factor: float = 2.0,
    cell_share_factor: float = 4.0,
    drift_tv_threshold: float = 0.25,
    n_centroids: int | None = None,
    m: int | None = None,
    k_sub: int | None = None,
    iters: int = 2,
    pq_iters: int = 3,
    seed: int = 42,
) -> dict:
    """One maintenance step of a standing IVF-PQ index — the
    `ivf_index_refresh` decision model (size staleness OR delta cell
    drift => rebuild; else append) carried over to the coded layout:

    - **append**: the delta is encoded against the STORED quantizers
      (one Arrow kernel pass computes cell + codes; a coarse/PQ model
      is deliberately never retrained per batch — ADC error is
      corrected by the exact re-rank) and idempotently appended,
      partition-pruned by cell.
    - **rebuild**: retrains BOTH quantizer levels (coarse centroids
      and the residual codebooks — residuals move when centroids
      move, so the codebooks can never be kept across a coarse
      retrain) over index ∪ delta into a NEW directory via
      `ivf_pq_index_write`; the caller swaps the active pointer.

    The drift signal reuses `ivf_delta_drift` over the coded
    assignment (cell occupancy is layout-level — identical machinery
    whether cells carry raw vectors or codes).  Returns the
    `ivf_index_refresh`-shaped decision record plus `codebooks`.
    """
    from pulsar_sync_java_spark.operators.vectorized import pq_encode_udf

    mm = len(codebooks)
    enc = pq_encode_udf(centroids, codebooks)(F.col(vec_col))
    # persist: the drift check (groupBy collect) and the append's
    # existence probe + write are separate ACTIONS — passing the
    # DataFrame shares only the lineage, so without a cache the
    # encode kernel (the expensive half of an append) would run twice
    delta_coded = (
        spread(df_new)
        .withColumn("__enc", enc)
        .withColumn("__cluster", F.element_at("__enc", 1))
        .withColumn("pq_codes", F.slice("__enc", 2, mm))
        .drop("__enc")
    ).persist()
    try:
        drift_tv = ivf_delta_drift(spark, path, delta_coded)
        report = ivf_index_staleness(spark, path)
        size_stale = report.should_rebuild(growth_factor, cell_share_factor)
        drifted = drift_tv >= drift_tv_threshold
        record = {
            "growth": report.growth,
            "max_cell_share": report.max_cell_share,
            "drift_tv": drift_tv,
            "size_stale": size_stale,
            "drifted": drifted,
            # observability (r10 advice): the meta the decision was
            # judged against plus the coded dials actually in force,
            # so an operator auditing refresh decisions sees the full
            # picture — on append these are the STORED model's (the
            # meta is deliberately not rewritten by appends: staleness
            # measures growth since the last TRAIN)
            "trained_rows": report.trained_rows,
            "n_centroids": report.n_centroids,
        }
        if not (size_stale or drifted):
            appended = ivf_index_append(
                df_new, path, centroids, id_col, vec_col,
                assigned=delta_coded,
            )
            return {
                **record,
                "action": "append",
                "appended": appended,
                "path": path,
                "centroids": centroids,
                "codebooks": codebooks,
                "pq_m": mm,
                "pq_k_sub": len(codebooks[0]),
            }
    finally:
        delta_coded.unpersist()
    target = rebuild_path or f"{path}_rebuilt"
    # delta wins deterministically — the ivf_index_refresh contract
    delta_u = (
        df_new.select(id_col, vec_col)
        .groupBy(id_col)
        .agg(F.min(vec_col).alias(vec_col))
    )
    full = (
        spark.read.parquet(path)
        .select(id_col, vec_col)
        .join(delta_u.select(id_col), id_col, "left_anti")
        .unionByName(delta_u)
    )
    # the staleness report already collected _ivf_meta — no second read
    k = n_centroids if n_centroids is not None else report.n_centroids
    new_m = m if m is not None else mm
    new_ks = k_sub if k_sub is not None else len(codebooks[0])
    # independent pre-write expectation for the swap gate's row-count
    # check — id-pruned anti-join count, see ivf_index_refresh's
    # rebuild branch for the rationale
    new_ids = int(
        delta_u.select(id_col)
        .join(spark.read.parquet(path).select(id_col), id_col, "left_anti")
        .count()
    )
    expected = report.current_rows + new_ids
    cents, books = ivf_pq_index_write(
        full, target, id_col, vec_col, k, new_m, new_ks, iters, pq_iters, seed
    )
    return {
        **record,
        "action": "rebuild",
        "appended": 0,
        "path": target,
        "expected_rows": expected,
        "centroids": cents,
        "codebooks": books,
        # the rebuild's n_centroids supersedes the stored meta's
        "n_centroids": k,
        "pq_m": new_m,
        "pq_k_sub": new_ks,
    }


# ---------------------------------------------------------------------------
# ANN calibration harness (r10 verdict #3): the ANN twin of
# q_sketch_calibration.  The r10 lesson — partial oracles (in-plan
# recall flags) can go stale silently if the thing they measure
# degrades together with the flag's inputs — generalizes to the ANN
# family: a broken quantizer changes BOTH the approx result and any
# flag computed from it, so the monitor must anchor on the EXACT side
# (hash-gateable) and express approx health as bounded flags against
# that anchor.
# ---------------------------------------------------------------------------


def ann_calibration(
    df: DataFrame,
    query_ids: list[int],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    num_planes: int = 16,
    max_hamming: int = 9,
    n_centroids: int = 16,
    nprobe: int = 14,
    iters: int = 1,
    m: int = 16,
    k_sub: int = 256,
    rerank: int = 64,
    pq_iters: int = 3,
    seed: int = 42,
    recall_min: int = 8,
    rank_corr_min: float = 0.50,
    adc_err_max: float = 0.60,
    centroids: list[list[float]] | None = None,
    codebooks=None,
    paths: tuple = ("lsh", "ivf", "pq"),
    coded_path: str | None = None,
) -> DataFrame:
    """Per-query ANN quality monitoring over a batch of probe vectors:
    one row per query with the EXACT top-k anchor (top-1 id + id sum —
    SQL-replayable, hash-gateable) beside bounded health flags for
    every approximate path the engine ships:

    - ``recall_{lsh,ivf,pq}_ok``: recall@k >= recall_min/k vs the
      exact top-k, each method run with its production dials;
    - ``rank_corr_ok``: Spearman rank correlation between the ADC
      (PQ lookup-table) ranking and the exact cosine ranking over the
      AUDIT SET = exact top-k ∪ a deterministic k-row background
      sample (ids ≡ 7 mod 41).  Two deliberate choices: the reranked
      OUTPUT order would correlate trivially (it IS exact order), so
      the monitor ranks by raw ADC; and the top-k alone are near-ties
      on an isotropic corpus (measured ρ as low as 0.16 on a HEALTHY
      model at sf0.001 — ordering noise, not model damage), so the
      audit set spans the full distance range, where a healthy coded
      metric separates neighbors from background (measured ρ ≥ 0.87
      across sf0.001/0.01/0.1 x 3 probes) and a corrupted one cannot;
    - ``adc_err_ok``: max |(2 - 2 cos_exact) - adc| over the audit
      set — the coded metric's absolute distance error (both sides
      are squared L2 on the unit sphere; measured ≤ 0.41 healthy
      across all sf x probe combinations, ~2x the bound under a
      zeroed codebook whose reconstruction collapses to the cell
      centroid).

    A garbage codebook leaves recall/rank-corr near chance and blows
    the ADC error by an order of magnitude (pinned by the mis-trained
    codebook test), while a healthy retrain keeps every flag TRUE with
    wide margin — so the flags detect model corruption, not noise.

    Exact side: the q_sim_topk decimal-exact cosine discipline
    (zip_with products folded through DECIMAL(38,12)), multi-query via
    a broadcast of the len(query_ids)-row query frame — one corpus
    scan for ALL probes, window top-k per query.  Pass `centroids` +
    `codebooks` to audit an EXTERNAL model (the mis-training test
    hook); default trains the same deterministic seeded model
    `ivf_pq_topk` ships.

    Scale: the probe batch is serving-sized (|Q| rows broadcast); the
    corpus pays one scan for the exact anchor (the calibration cost —
    run it on a sampled slice at 100 TB) plus the three production
    probe paths; every per-query frame is k rows.

    `paths` selects which approximate arms to audit (subset of
    ("lsh", "ivf", "pq")); omitted arms skip their corpus pass AND
    their flag columns.  The refresh gate
    (`streaming/ann_serve.py:calibrated_swap`) audits a candidate
    model with paths=("pq",) — the LSH arm is model-independent and
    the IVF arm trains its own raw-space quantizer, so neither judges
    the model under test.  The rank/ADC audit requires "pq".

    `coded_path` points the PQ arm at a MATERIALIZED codes layout
    (`ivf_pq_index_write`): the recall probe routes through
    `probe_queries_pq` and the rank/ADC audit reads the STORED
    (ivf_cell, pq_codes) columns instead of re-encoding in-plan — so
    the audit judges exactly the bytes production serves (a write-path
    divergence between the supplied model and the codes on disk FAILS
    the gate rather than passing unseen) and a gated rebuild pays
    partition-pruned code scans, not a second full-corpus encode.
    Requires centroids+codebooks (the stored model)."""
    from pyspark.sql.window import Window

    from pulsar_sync_java_spark.functions.numeric import dec_arr_sum
    from pulsar_sync_java_spark.operators.vectorized import pq_encode_udf

    if coded_path is not None and centroids is None:
        raise ValueError(
            "ann_calibration: coded_path requires centroids+codebooks "
            "— the stored layout can only be audited against the model "
            "that claims to have written it"
        )
    if not query_ids:
        # catch the misconfigured monitor at the harness boundary —
        # an empty pinned-probe set would otherwise surface as a bare
        # IndexError deep inside the first batch arm
        raise ValueError("ann_calibration: empty query_ids probe set")
    if (centroids is None) != (codebooks is None):
        # the ivf_pq_topk pairing contract, doubly important here: a
        # codebooks-only call would silently retrain a HEALTHY model
        # and audit that instead of the suspect one — every flag green
        # for a corrupted model, the exact silent-green failure this
        # harness exists to prevent
        raise ValueError(
            "ann_calibration: pass centroids and codebooks together — "
            "auditing a mixed or partially-defaulted model would judge "
            "a different quantizer than the one supplied"
        )

    sq = lambda c: F.transform(  # noqa: E731
        c, lambda x: x.cast("double") * x.cast("double")
    )
    # per-query norms fold ONCE into the |Q|-row broadcast frame
    # (bit-identical to folding per joined row — the decimal sum is a
    # pure function of the query vector)
    qdf = df.filter(F.col(id_col).isin([int(q) for q in query_ids])).select(
        F.col(id_col).alias("query_id"),
        F.col(vec_col).alias("__qv"),
        dec_arr_sum(sq(F.col(vec_col))).alias("__ny"),
    )
    qvecs = {
        int(r["query_id"]): [float(x) for x in r["__qv"]]
        for r in qdf.select("query_id", "__qv").collect()  # probe batch
    }
    missing = set(int(q) for q in query_ids) - set(qvecs)
    if missing:
        raise ValueError(f"ann_calibration: probe ids absent: {sorted(missing)}")

    prod = F.zip_with(
        vec_col, "__qv", lambda x, y: x.cast("double") * y.cast("double")
    )
    # corpus-row norms fold once per row BEFORE the query cross join
    # (not |Q| times after it) — same values, 1/|Q| the fold work on
    # the anchor scan.  spread(): the anchor scan's |Q|+1 decimal
    # folds per corpus row are the exact arm's cost; a single-split
    # scan would run them on one task (r13 profile; gated away on
    # many-split scans)
    corpus = spread(df).select(
        id_col, vec_col, dec_arr_sum(sq(F.col(vec_col))).alias("__nx")
    )
    scored = (
        corpus.crossJoin(F.broadcast(qdf))
        .select(
            "query_id",
            id_col,
            dec_arr_sum(prod).alias("__dot"),
            "__nx",
            "__ny",
        )
    )
    cos = F.col("__dot") / (F.sqrt("__nx") * F.sqrt("__ny"))
    we = Window.partitionBy("query_id").orderBy(
        cos.desc(), F.col(id_col).asc()
    )
    # exact anchor feeds the per-query aggregate, three recall joins
    # and the ADC audit — 6 consumers over |Q| x k rows
    exact = (
        scored.withColumn("__rk", F.row_number().over(we))
        .filter(F.col("__rk") <= k)
        .select("query_id", id_col, cos.alias("__cos"), "__rk")
        .persist()
    )

    # Each recall arm is the BATCH variant of its production path —
    # one corpus pass (signature scan / cluster assignment / Arrow
    # encode) answers all |Q| probes, where the per-query functions
    # would re-pay that pass per probe.  The batch variants are
    # pinned per-query bit-identical to the single-query paths by
    # tests/test_dedup_ops.py, so the flags still judge the
    # production plans.
    probes = sorted(qvecs.items())

    def recall_flag(approx: DataFrame, name: str) -> DataFrame:
        # broadcast the |Q| x k exact anchor: the batch arms' window
        # output has no row-count statistics, so Spark would otherwise
        # sort-merge two k-row frames
        hits = (
            approx.select("query_id", id_col)
            .join(F.broadcast(exact.select("query_id", id_col)),
                  ["query_id", id_col])
            .groupBy("query_id")
            .agg(F.count(F.lit(1)).alias("__hits"))
        )
        return hits.select(
            "query_id", (F.col("__hits") >= recall_min).alias(name)
        )

    r_lsh = (
        recall_flag(
            lsh_topk_multi(
                df, probes, k, id_col, vec_col, num_planes, max_hamming,
                seed,
            ),
            "recall_lsh_ok",
        )
        if "lsh" in paths
        else None
    )
    # ONE seeded-sample collect serves BOTH trainers (r14): the IVF
    # arm's raw-space quantizer and the PQ model's normalized sample
    # draw the same n=256*k smallest-hash rows with the same seed, so
    # collecting twice was a redundant corpus scan + driver transfer
    # (~0.35s measured).  Raw rows here; each consumer applies its own
    # metric-space transform (IVF trains raw, PQ normalizes) —
    # bit-identical to the private collects it replaces.
    raw_sample = (
        _seeded_sample(
            df, id_col, vec_col, 256 * n_centroids, seed,
            caller="ann_calibration",
        )
        if ("ivf" in paths) or ("pq" in paths and centroids is None)
        else None
    )
    r_ivf = None
    if "ivf" in paths:
        # one RAW-space sample + Lloyd for all IVF probes (ivf_topk's
        # own metric space — distinct from the PQ model's normalized
        # sample)
        cents_ivf = kmeans_centroids(
            df, id_col, vec_col, n_centroids, iters, seed,
            sample=raw_sample,
        )
        r_ivf = recall_flag(
            ivf_topk_multi(
                df, probes, cents_ivf, k, id_col, vec_col, nprobe
            ),
            "recall_ivf_ok",
        )
    if "pq" not in paths:
        base = exact.groupBy("query_id").agg(
            F.max(F.when(F.col("__rk") == 1, F.col(id_col)))
            .cast("long")
            .alias("exact_top1"),
            F.sum(id_col).cast("long").alias("exact_id_sum"),
        )
        out = base
        for arm, name in ((r_lsh, "recall_lsh_ok"), (r_ivf, "recall_ivf_ok")):
            if arm is not None:
                out = out.join(
                    F.broadcast(arm), "query_id", "left"
                ).withColumn(
                    name, F.coalesce(name, F.lit(False))
                )
        return out
    if centroids is None:
        X = _l2_normalize(raw_sample)
        cents = kmeans_centroids(
            df, id_col, vec_col, n_centroids, iters, seed, sample=X
        )
        books = pq_train(
            df, cents, id_col, vec_col, m, k_sub, pq_iters, seed, sample=X
        )
    else:
        cents, books = centroids, codebooks
    if coded_path is not None:
        from pulsar_sync_java_spark.streaming.ann_serve import (
            probe_queries_pq,
        )

        pq_probe = probe_queries_pq(
            df.sparkSession, coded_path, cents, books, probes, k,
            nprobe, rerank, id_col, vec_col,
        )
    else:
        pq_probe = ivf_pq_topk_multi(
            df, probes, cents, books, k, id_col, vec_col, nprobe, rerank
        )
    r_pq = recall_flag(pq_probe, "recall_pq_ok")

    # ADC audit set: exact top-k ∪ deterministic background rows (ids
    # ≡ 7 mod 41, smallest k — fetched by a pushed-down id filter, one
    # cheap scan), so the rank audit spans the full distance range.
    bg_ids = [
        int(r[0])
        for r in df.select(id_col)
        .filter((F.col(id_col) % 41) == 7)
        .orderBy(id_col)
        .limit(k)
        .collect()
    ]
    bg = (
        corpus.filter(F.col(id_col).isin(bg_ids))
        .crossJoin(F.broadcast(qdf))
        .select(
            "query_id",
            id_col,
            (
                dec_arr_sum(prod) / (F.sqrt("__nx") * F.sqrt("__ny"))
            ).alias("__cos"),
        )
    )
    audit = (
        exact.select("query_id", id_col, "__cos")
        .unionByName(bg)
        # a background id can also be an exact neighbor: both arms
        # compute the identical decimal-exact __cos, so the dedup is
        # value-safe
        .dropDuplicates(["query_id", id_col])
    )
    # broadcast per-(query, cell) LUTs for ALL cells (|Q| x
    # n_centroids rows — the audit must cover whatever cell an audit
    # row landed in)
    lut_rows = []
    for qid, qv in sorted(qvecs.items()):
        _, q_norm = _pq_probe_order(qv, cents)
        for cell, lut in _pq_lut_rows(
            q_norm, cents, books, list(range(len(cents)))
        ):
            lut_rows.append((qid, cell, lut))
    # verifySchema=False: lut_rows built above as exact int/list[float];
    # the verifier walked |Q| x n_centroids x m x k_sub doubles (~0.4s
    # of driver time per construction, measured via cProfile r14)
    ludf = df.sparkSession.createDataFrame(
        lut_rows, "query_id long, __cell int, __lut array<array<double>>",
        verifySchema=False,
    )
    if coded_path is not None:
        # judge the STORED codes — the bytes production probes read.
        # The audit join is INNER on id, so a stored layout MISSING
        # audit rows (a rebuild that silently lost vectors) would
        # otherwise drop them from the rank/ADC audit and pass unseen
        # (r11 advice, medium) — count both sides (|Q| x ~2k rows,
        # audit derives from the persisted exact anchor) and raise on
        # any mismatch; a duplicate-id layout inflates the join and
        # fails the same check.  Deliberately NOT persisted: the
        # final lazy plan re-derives the join once more, but a
        # per-rebuild gate that cached these frames would accumulate
        # storage memory for the application lifetime with no release
        # point (the returned frame outlives this function).
        coded = (
            df.sparkSession.read.parquet(coded_path)
            .select(
                id_col,
                F.col("ivf_cell").cast("int").alias("__cell"),
                F.col("pq_codes").alias("__codes"),
            )
            .join(F.broadcast(audit), id_col)
            .select("query_id", id_col, "__cos", "__cell", "__codes")
        )
        n_audit, n_coded = audit.count(), coded.count()
        if n_coded != n_audit:
            raise ValueError(
                "ann_calibration: stored layout at "
                f"{coded_path} joined {n_coded} of {n_audit} audit "
                "rows — the index is missing (or duplicating) vectors "
                "the audit set expects; refusing to certify a lossy "
                "write"
            )
    else:
        enc = pq_encode_udf(cents, books).asNondeterministic()(
            F.col(vec_col)
        )
        coded = (
            df.select(id_col, vec_col)
            .join(F.broadcast(audit), id_col)
            .select("query_id", id_col, "__cos", enc.alias("__enc"))
            .select(
                "query_id",
                id_col,
                "__cos",
                F.element_at("__enc", 1).alias("__cell"),
                F.slice("__enc", 2, len(books)).alias("__codes"),
            )
        )
    adc = adc_lut_fold("__lut", "__codes")
    we2 = Window.partitionBy("query_id").orderBy(
        F.col("__cos").desc(), F.col(id_col).asc()
    )
    wa = Window.partitionBy("query_id").orderBy(
        F.col("__adc").asc(), F.col(id_col).asc()
    )
    ranked = (
        coded.join(F.broadcast(ludf), ["query_id", "__cell"])
        .select("query_id", id_col, "__cos", adc.alias("__adc"))
        .withColumn("__erk", F.row_number().over(we2))
        .withColumn("__adc_rk", F.row_number().over(wa))
    )
    n = F.count(F.lit(1)).cast("double")
    metrics = ranked.groupBy("query_id").agg(
        (
            F.lit(1.0)
            - F.lit(6.0)
            * F.sum(
                (F.col("__erk") - F.col("__adc_rk"))
                * (F.col("__erk") - F.col("__adc_rk"))
            ).cast("double")
            / (n * (n * n - F.lit(1.0)))
        ).alias("__rank_corr"),
        F.max(
            F.abs(F.lit(2.0) - F.lit(2.0) * F.col("__cos") - F.col("__adc"))
        ).alias("__adc_err"),
    )

    base = exact.groupBy("query_id").agg(
        F.max(F.when(F.col("__rk") == 1, F.col(id_col)))
        .cast("long")
        .alias("exact_top1"),
        F.sum(id_col).cast("long").alias("exact_id_sum"),
    )
    out = base
    cols = ["query_id", "exact_top1", "exact_id_sum"]
    for arm, name in ((r_lsh, "recall_lsh_ok"), (r_ivf, "recall_ivf_ok")):
        if arm is not None:
            out = out.join(F.broadcast(arm), "query_id", "left")
            cols.append(name)
    return (
        out.join(F.broadcast(r_pq), "query_id", "left")
        .join(F.broadcast(metrics), "query_id", "left")
        .select(
            *cols[:3],
            *[
                F.coalesce(c, F.lit(False)).alias(c)
                for c in cols[3:]
            ],
            F.coalesce("recall_pq_ok", F.lit(False)).alias("recall_pq_ok"),
            (F.coalesce("__rank_corr", F.lit(-1.0)) >= rank_corr_min).alias(
                "rank_corr_ok"
            ),
            (F.coalesce("__adc_err", F.lit(1e18)) <= adc_err_max).alias(
                "adc_err_ok"
            ),
        )
    )
