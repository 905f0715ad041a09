"""Near-duplicate detection operators for 100 TB corpora.

Four families, cheapest-first — the standard training-data pipeline
stack (each is a `queries()` entry; see queries/pipeline.py and
queries/dedup_scale.py):

1. exact        — hash-groupBy on content digest (q_dedup_exact);
2. n-gram Jaccard — exact set overlap via a shingle inverted index
                    (no n² pair enumeration; hot shingles capped);
3. MinHash + LSH — signature sketch + banded bucketing: candidate pairs
                    are generated only within buckets, estimated
                    similarity from signature agreement;
4. SimHash      — 64-bit weighted-majority fingerprint; near-dups are
                    small Hamming distances, bucketed by 16-bit chunks
                    (pigeonhole: distance <=3 -> one of 4 chunks equal).

Scale discipline shared by all: candidate generation is inverted-index
shaped (explode -> shuffle by token/band/chunk -> within-bucket join),
never a cross join; buckets above `max_bucket` are dropped exactly like
stop-shingles in web dedup (a bucket with b docs adds b² pairs; a stop
token's bucket adds nothing but noise).
"""

from __future__ import annotations

from functools import reduce

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from pulsar_sync_java_spark.functions.text import hash64, shingles, tokens


def shingle_rows(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Exploded distinct (id, shingle) rows — the inverted-index input."""
    return df.select(
        F.col(id_col), F.explode(shingles(text_col, n)).alias("shingle")
    )


def jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_bucket: int = 1000,
) -> DataFrame:
    """Exact n-gram Jaccard similarity for all pairs sharing >=1 shingle.

    Inverted index join: explode shingles -> drop shingles shared by
    more than `max_bucket` docs (stop-shingles: quadratic cost, no
    discriminative value) -> self-join per shingle -> per-pair
    intersection counts -> Jaccard = inter / (|A| + |B| - inter).

    Cost is sum over shingles of bucket², bounded by max_bucket — never
    n² over documents.
    """
    sh = shingle_rows(df, id_col, text_col, n)
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("set_size"))
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df_count"))
        .filter(F.col("df_count") <= max_bucket)
        .select("shingle")
    )
    pruned = sh.join(hot, "shingle")
    a = pruned.select(F.col(id_col).alias("doc_a"), "shingle")
    b = pruned.select(F.col(id_col).alias("doc_b"), "shingle")
    inter = (
        a.join(b, "shingle")
        .filter(F.col("doc_a") < F.col("doc_b"))
        .groupBy("doc_a", "doc_b")
        .agg(F.count(F.lit(1)).alias("inter"))
    )
    sa = sizes.select(F.col(id_col).alias("doc_a"), F.col("set_size").alias("size_a"))
    sb = sizes.select(F.col(id_col).alias("doc_b"), F.col("set_size").alias("size_b"))
    return (
        inter.join(sa, "doc_a")
        .join(sb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            (
                F.col("inter").cast("double")
                / (F.col("size_a") + F.col("size_b") - F.col("inter"))
            ).alias("jaccard"),
        )
        .filter(F.col("jaccard") >= threshold)
    )


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    num_hashes: int = 64,
    n: int = 3,
) -> DataFrame:
    """MinHash sketch: signature[i] = min over shingles of hash_i(shingle).

    Computed as `num_hashes` partial-min aggregates over the exploded
    shingle rows — a single shuffle on doc id, map-side combined, no
    UDF.  E[signature agreement] = Jaccard similarity (Broder).
    Empty-shingle docs get a null signature (left join back).
    """
    sh = shingle_rows(df, id_col, text_col, n)
    mins = sh.groupBy(id_col).agg(
        F.array(
            *[F.min(hash64(F.col("shingle"), i)) for i in range(num_hashes)]
        ).alias("signature")
    )
    return df.select(id_col).join(mins, id_col, "left")


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    max_bucket: int = 1000,
) -> DataFrame:
    """Banded LSH over MinHash signatures: split each signature into
    `bands` slices, bucket by (band index, slice hash), emit pairs
    sharing a bucket, with estimated Jaccard = fraction of agreeing
    signature positions.

    Two docs with Jaccard s collide in >=1 band with probability
    1-(1-s^r)^b (r = rows/band) — the classic S-curve; band count tunes
    the threshold.  Buckets above max_bucket are dropped (skew guard).
    """
    sig = signatures.filter(F.col("signature").isNotNull())
    n_hashes_row = sig.select(F.size("signature").alias("n")).first()
    if n_hashes_row is None:
        return (
            sig.select(
                F.col(id_col).alias("doc_a"),
                F.col(id_col).alias("doc_b"),
                F.lit(0.0).alias("est_jaccard"),
            ).limit(0)
        )
    rows_per_band = max(n_hashes_row.n // bands, 1)
    banded = sig.select(
        id_col,
        "signature",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), F.lit(bands - 1)),
                lambda b: F.struct(
                    b.alias("band"),
                    F.xxhash64(
                        F.slice(
                            F.col("signature"), b * rows_per_band + 1, rows_per_band
                        )
                    ).alias("bucket"),
                ),
            )
        ).alias("bb"),
    ).select(id_col, "signature", "bb.band", "bb.bucket")

    ok = (
        banded.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") <= max_bucket)
        .select("band", "bucket")
    )
    pruned = banded.join(ok, ["band", "bucket"])
    a = pruned.select(
        "band", "bucket", F.col(id_col).alias("doc_a"), F.col("signature").alias("sig_a")
    )
    b = pruned.select(
        "band", "bucket", F.col(id_col).alias("doc_b"), F.col("signature").alias("sig_b")
    )
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq
        )
    )
    return (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b", "sig_a", "sig_b")
        .dropDuplicates(["doc_a", "doc_b"])
        .select(
            "doc_a",
            "doc_b",
            (agree.cast("double") / F.size("sig_a")).alias("est_jaccard"),
        )
    )


def simhash64(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text"
) -> DataFrame:
    """64-bit SimHash: per token hash, each bit votes +1/-1; the
    fingerprint takes the majority sign per bit.  Near-duplicates have
    small Hamming distance (Charikar).

    Vectorized formulation: explode tokens -> for each bit, sum votes
    (64 partial aggregates, one shuffle) -> assemble bits with
    shiftleft/bitwise-or.  Empty docs -> fingerprint 0.
    """
    tok = df.select(F.col(id_col), F.explode(tokens(text_col)).alias("tok"))
    h = F.xxhash64("tok")
    votes = tok.groupBy(id_col).agg(
        *[
            F.sum(
                F.when(F.shiftright(h, i).bitwiseAND(F.lit(1)) == 1, 1).otherwise(-1)
            ).alias(f"v{i}")
            for i in range(64)
        ]
    )
    fingerprint: Column = reduce(
        lambda acc, i: acc.bitwiseOR(
            F.when(F.col(f"v{i}") > 0, F.shiftleft(F.lit(1).cast("long"), i)).otherwise(
                F.lit(0).cast("long")
            )
        ),
        range(64),
        F.lit(0).cast("long"),
    )
    sig = votes.select(F.col(id_col), fingerprint.alias("simhash"))
    return df.select(id_col).join(sig, id_col, "left").fillna({"simhash": 0})


def simhash_near_pairs(
    sims: DataFrame, id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Hamming-ball pairing via the pigeonhole chunk trick: split the
    64-bit fingerprint into 4 x 16-bit chunks; any pair within Hamming
    distance 3 agrees on at least one chunk, so bucketing by
    (chunk index, chunk value) finds all such pairs with an
    inverted-index join, then the exact bit_count(xor) filter verifies.
    """
    chunk = lambda i: F.shiftright(F.col("simhash"), i * 16).bitwiseAND(  # noqa: E731
        F.lit(0xFFFF)
    )
    chunked = sims.select(
        F.col(id_col),
        "simhash",
        F.explode(
            F.array(*[F.struct(F.lit(i).alias("ci"), chunk(i).alias("cv")) for i in range(4)])
        ).alias("c"),
    ).select(id_col, "simhash", "c.ci", "c.cv")
    a = chunked.select("ci", "cv", F.col(id_col).alias("doc_a"), F.col("simhash").alias("sim_a"))
    b = chunked.select("ci", "cv", F.col(id_col).alias("doc_b"), F.col("simhash").alias("sim_b"))
    return (
        a.join(b, ["ci", "cv"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .dropDuplicates(["doc_a", "doc_b"])
        .select(
            "doc_a",
            "doc_b",
            F.bit_count(F.col("sim_a").bitwiseXOR(F.col("sim_b"))).alias("hamming"),
        )
        .filter(F.col("hamming") <= max_hamming)
    )
