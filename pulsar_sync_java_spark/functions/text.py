"""Shared text primitives: tokenization, shingling, deterministic
hashing.  All JVM-side column expressions — no Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def tokens(text_col: Column | str) -> Column:
    """Non-empty whitespace-delimited tokens (the corpus-wide token
    definition; the DuckDB twin is list_filter(string_split_regex(...)))."""
    c = F.col(text_col) if isinstance(text_col, str) else text_col
    return F.filter(F.split(c, r"\s+"), lambda x: x != "")


def shingles(text_col: Column | str, n: int = 3) -> Column:
    """Distinct word n-gram shingles as an array<string>.

    Built with transform over an index sequence — stays in codegen,
    no explode needed until the caller wants rows.  Documents shorter
    than n tokens produce an empty array (not null).
    """
    toks = tokens(text_col)
    count = F.greatest(F.size(toks) - (n - 1), F.lit(0))
    idx = F.sequence(F.lit(0), count - 1)
    gram = lambda i: F.concat_ws(  # noqa: E731
        " ", *[F.get(toks, i + j) for j in range(n)]
    )
    return F.when(count > 0, F.array_distinct(F.transform(idx, gram))).otherwise(
        F.array().cast("array<string>")
    )


def hash64(col: Column, seed: int) -> Column:
    """Deterministic 64-bit hash of a string column under a seed —
    xxhash64 with the seed mixed into the input (xxhash64's own seed
    argument is not exposed column-wise)."""
    return F.xxhash64(F.concat(F.lit(f"{seed}|"), col))
