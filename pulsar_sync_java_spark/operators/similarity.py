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

import math

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


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
    """Exact cosine top-k against a literal query vector."""
    q = F.array(*[F.lit(float(v)) for v in query_vec])
    scored = df.select(
        F.col(id_col), cosine(F.col(vec_col), q).alias("cos_sim")
    )
    return scored.orderBy(F.col("cos_sim").desc(), F.col(id_col).asc()).limit(k)


def _planes(dim: int, num_planes: int, seed: int) -> list[list[float]]:
    """Deterministic pseudo-random ±1 hyperplanes from a seeded LCG —
    no numpy dependency, reproducible across runs and machines."""
    state = seed & 0x7FFFFFFF or 1
    out: list[list[float]] = []
    for _ in range(num_planes):
        row = []
        for _ in range(dim):
            state = (1103515245 * state + 12345) & 0x7FFFFFFF
            row.append(1.0 if state & 1 else -1.0)
        out.append(row)
    return out


def signature_bits(
    vec_col: Column, planes: list[list[float]]
) -> Column:
    """H-bit LSH signature as a long: bit i = sign(vec · plane_i)."""
    bits = F.lit(0).cast("long")
    for i, p in enumerate(planes):
        plane = F.array(*[F.lit(v) for v in p])
        bit = F.when(_dot(vec_col, plane) >= 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
            F.lit(0).cast("long")
        )
        bits = bits.bitwiseOR(bit)
    return bits


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
    an exact-duplicate vector is always found.
    """
    planes = _planes(len(query_vec), num_planes, seed)
    # query signature computed in plain python (same arithmetic)
    q_sig = 0
    for i, p in enumerate(planes):
        dot = sum(float(a) * b for a, b in zip(query_vec, p))
        if dot >= 0:
            q_sig |= 1 << i
    sig = signature_bits(F.col(vec_col), planes)
    candidates = df.withColumn("__sig", sig).filter(
        F.bit_count(F.col("__sig").bitwiseXOR(F.lit(q_sig))) <= max_hamming
    )
    return cosine_topk(candidates, query_vec, k, id_col, vec_col)


def embedding_near_pairs(
    df: DataFrame,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    threshold: float = 0.95,
    num_planes: int = 16,
    max_bucket: int = 2000,
    seed: int = 42,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: bucket by full LSH
    signature, exact cosine within buckets only (plus the hot-bucket
    guard).  Misses pairs whose signatures differ — the standard
    recall/cost trade; tighten by lowering num_planes or unioning
    rotated-seed passes."""
    dim_row = df.select(F.size(vec_col).alias("d")).first()
    if dim_row is None:
        return df.select(
            F.col(id_col).alias("id_a"), F.col(id_col).alias("id_b"),
            F.lit(0.0).alias("cos_sim"),
        ).limit(0)
    planes = _planes(dim_row.d, num_planes, seed)
    sig = df.select(
        F.col(id_col), F.col(vec_col), signature_bits(F.col(vec_col), planes).alias("sig")
    )
    ok = (
        sig.groupBy("sig").agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") <= max_bucket)
        .select("sig")
    )
    pruned = sig.join(ok, "sig")
    a = pruned.select("sig", F.col(id_col).alias("id_a"), F.col(vec_col).alias("vec_a"))
    b = pruned.select("sig", F.col(id_col).alias("id_b"), F.col(vec_col).alias("vec_b"))
    return (
        a.join(b, "sig")
        .filter(F.col("id_a") < F.col("id_b"))
        .select(
            "id_a",
            "id_b",
            cosine(F.col("vec_a"), F.col("vec_b")).alias("cos_sim"),
        )
        .filter(F.col("cos_sim") >= threshold)
    )
