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

from pulsar_sync_java_spark.functions.text import shingles_from_tokens, tokens
from pulsar_sync_java_spark.operators.util import spread, spread_by


def shingle_rows(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3
) -> DataFrame:
    """Exploded distinct (id, shingle) rows — the inverted-index input.

    Tokens are materialized in their own projection before the n-gram
    transform touches them (see shingles_from_tokens: lambdas get no
    subexpression sharing, so inlining the split is 20x slower)."""
    toks = df.select(F.col(id_col), tokens(text_col).alias("__toks"))
    return toks.select(
        F.col(id_col),
        F.explode(shingles_from_tokens(F.col("__toks"), n)).alias("shingle"),
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

    Plan-shape rules this encodes (measured, see operators/util.spread):
    - the shingle arrays are computed in ONE parallel projection and
      materialized through an exchange before anything consumes them:
      explode(<computed array>) and size(<computed array>) both make
      the optimizer inline the array expression into their operator and
      re-evaluate it (for explode, once per OUTPUT row — ~10x); after
      the exchange both consumers read a plain column, and ReuseExchange
      gives the sizes branch and the explode branch the same
      materialization for free;
    - set sizes join onto the (small, pruned) pair set at the end, not
      onto the exploded rows;
    - the exploded rows are repartitioned by shingle — the partitioning
      the census groupBy and the self-join need anyway — so that
      exchange is free and shared across all three consumers.
    """
    ds = spread(df)
    toks = ds.select(F.col(id_col), tokens(text_col).alias("__toks"))
    arr = toks.select(
        F.col(id_col), shingles_from_tokens(F.col("__toks"), n).alias("__sh")
    ).repartition(ds.sparkSession.sparkContext.defaultParallelism)
    sizes = arr.select(F.col(id_col), F.size("__sh").alias("set_size"))
    sh = arr.select(
        F.col(id_col), F.explode("__sh").alias("shingle")
    )
    sh = spread_by(sh, "shingle")
    hot = (
        sh.groupBy("shingle")
        .agg(F.count(F.lit(1)).alias("df_count"))
        .filter(F.col("df_count") <= max_bucket)
        .select("shingle")
    )
    pruned = sh.join(hot, "shingle")
    a = pruned.select("shingle", F.col(id_col).alias("doc_a"))
    b = pruned.select("shingle", F.col(id_col).alias("doc_b"))
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

    Entirely per-row, ZERO shuffle: each document hashes its shingle
    array once (xxhash64), then derives the `num_hashes` hash family by
    re-hashing the 64-bit value with the seed (`xxhash64(seed, h)`), and
    takes array_min per seed — all inside one whole-stage-codegen
    projection.  The explode + num_hashes-column groupBy formulation
    this replaces shuffled every shingle row and ran ~9x slower.
    E[signature agreement] = Jaccard similarity (Broder).

    Documents with fewer than n tokens (no shingles) are dropped HERE,
    by a cheap pushdown-friendly predicate — emitting nullable
    signatures instead would force every downstream isNotNull filter to
    re-evaluate this whole expression below the projection (measured
    60x: the duplicated expression also kicks the stage out of
    whole-stage codegen).
    """
    base = spread(df.filter(F.size(tokens(text_col)) >= n))
    toks = base.select(F.col(id_col), tokens(text_col).alias("__toks"))
    hs = toks.select(
        F.col(id_col),
        F.transform(
            shingles_from_tokens(F.col("__toks"), n), lambda s: F.xxhash64(s)
        ).alias("__hs"),
    )
    sig = F.transform(
        F.sequence(F.lit(0), F.lit(num_hashes - 1)),
        lambda i: F.array_min(F.transform(F.col("__hs"), lambda h: F.xxhash64(i, h))),
    )
    return hs.select(F.col(id_col), sig.alias("signature"))


def lsh_candidate_pairs(
    signatures: DataFrame,
    id_col: str = "doc_id",
    bands: int = 16,
    num_hashes: int = 64,
    max_bucket: int = 1000,
) -> DataFrame:
    """Banded LSH over MinHash signatures: split each signature into
    `bands` slices, bucket by (band index, slice hash), emit pairs
    sharing a bucket, with estimated Jaccard = fraction of agreeing
    signature positions.

    Two docs with Jaccard s collide in >=1 band with probability
    1-(1-s^r)^b (r = rows/band) — the classic S-curve; band count tunes
    the threshold.  Buckets above max_bucket are dropped (skew guard).
    `num_hashes` must match the signature width (a parameter, not a
    data probe: sniffing it with .first() would cost an extra job).

    Signatures must be non-null (minhash_signatures guarantees this by
    dropping shingle-less docs).  The signature projection feeds four
    subtree copies of the self-join DAG (bucket census + both join
    sides), so it is re-materialized through a cheap repartition
    exchange — Spark's ReuseExchange then computes it once instead of
    four times.

    Shuffle discipline: the banded table carries ONLY (band, bucket,
    id) — exploding the full `num_hashes`-wide signature `bands` times
    would amplify the shuffle payload ~bands·num_hashes-fold.
    Signatures are joined back by id on the deduplicated candidate
    pairs only (both lookups reuse the same signature exchange).
    """
    sig = spread_by(signatures, id_col)
    rows_per_band = max(num_hashes // bands, 1)
    # Generator first, hash after: explode the band indexes, then slice-
    # hash in a separate projection within the same stage.  (Building
    # struct(band, hash(slice)) inside a `transform` lambda and exploding
    # that hit an interpreted-evaluation path ~50x slower; the explode
    # output never crosses a shuffle with the signature attached, so
    # there is no payload amplification either way.)
    banded = sig.select(
        id_col, "signature", F.explode(F.sequence(F.lit(0), F.lit(bands - 1))).alias("band")
    ).select(
        id_col,
        "band",
        F.xxhash64(
            F.slice(F.col("signature"), F.col("band") * rows_per_band + 1, rows_per_band)
        ).alias("bucket"),
    )

    ok = (
        banded.groupBy("band", "bucket")
        .agg(F.count(F.lit(1)).alias("c"))
        .filter(F.col("c") <= max_bucket)
        .select("band", "bucket")
    )
    pruned = banded.join(ok, ["band", "bucket"])
    a = pruned.select("band", "bucket", F.col(id_col).alias("doc_a"))
    b = pruned.select("band", "bucket", F.col(id_col).alias("doc_b"))
    cand = (
        a.join(b, ["band", "bucket"])
        .filter(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .dropDuplicates(["doc_a", "doc_b"])
    )
    sa = sig.select(F.col(id_col).alias("doc_a"), F.col("signature").alias("sig_a"))
    sb = sig.select(F.col(id_col).alias("doc_b"), F.col("signature").alias("sig_b"))
    agree = F.size(
        F.filter(
            F.zip_with("sig_a", "sig_b", lambda x, y: x == y), lambda eq: eq
        )
    )
    return (
        cand.join(sa, "doc_a")
        .join(sb, "doc_b")
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

    Entirely per-row, ZERO shuffle: hash the token array once, then for
    each bit count set-bit occurrences with a higher-order filter —
    bit i of the fingerprint is set iff ones > zeros (2*ones > n),
    identical to the +1/-1 vote sum being positive.  Replaces the
    explode + 64-column groupBy formulation (one full shuffle of every
    token row).  Empty docs -> fingerprint 0.
    """
    hs_df = spread(df).select(
        F.col(id_col),
        F.transform(tokens(text_col), lambda t: F.xxhash64(t)).alias("__hs"),
    )
    n = F.size("__hs")

    def bit(i: int) -> Column:
        ones = F.size(
            F.filter(
                F.col("__hs"),
                lambda h: F.shiftright(h, i).bitwiseAND(F.lit(1)) == F.lit(1),
            )
        )
        return F.when(
            ones * 2 > n, F.shiftleft(F.lit(1).cast("long"), i)
        ).otherwise(F.lit(0).cast("long"))

    fingerprint: Column = reduce(
        lambda acc, i: acc.bitwiseOR(bit(i)), range(64), F.lit(0).cast("long")
    )
    return hs_df.select(F.col(id_col), fingerprint.alias("simhash"))


def simhash_near_pairs(
    sims: DataFrame, id_col: str = "doc_id", max_hamming: int = 3
) -> DataFrame:
    """Hamming-ball pairing via the pigeonhole chunk trick: split the
    64-bit fingerprint into 4 x 16-bit chunks; any pair within Hamming
    distance 3 agrees on at least one chunk, so bucketing by
    (chunk index, chunk value) finds all such pairs with an
    inverted-index join, then the exact bit_count(xor) filter verifies.

    The fingerprint projection feeds both join sides plus the bucket
    census; the repartition barrier makes ReuseExchange compute it once.
    """
    sims = spread_by(sims, id_col)
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
