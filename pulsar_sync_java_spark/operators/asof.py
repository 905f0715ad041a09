"""As-of (floor) join — the reference's `SparseMap.get` semantics.

Reference behavior: cursor translation resolves a source MessageId to the
greatest sampled mapping key <= the probe (`SparseMap.java:55-62`,
`floorKey` at :57; used from `PulsarPartitionSyncWorker.java:211-218`).
That is exactly a backward as-of join keyed by partition.

Spark has no native ASOF JOIN, and the naive formulation
(range join `r.ts <= l.ts` + row_number) explodes quadratically per key —
fine at sf0.01, fatal at 100 TB.  The scale-correct formulation used here
is the **union-window** (merge) form:

    union(right tagged 0, left tagged 1)
      -> single shuffle on the `by` key
      -> sort within partition by (ts, tag)
      -> last(right cols, ignorenulls) over rows unbounded-preceding
      -> keep left rows

One shuffle, no row explosion, whole-stage codegen throughout; skewed
keys are handled by AQE.  This is the same trick Flink/Kafka-Streams use
for temporal joins expressed relationally.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

_TAG = "__asof_side"


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    by: list[str] | str | None = None,
    right_tiebreak: list[str] | None = None,
    suffix: str = "_right",
    strict: bool = False,
) -> DataFrame:
    """Backward as-of join: for each left row, attach the right row with
    the greatest ``on`` value <= (< if ``strict``) the left's ``on``,
    within the same ``by`` group.

    Left rows with no floor match are kept with nulls (left-outer
    semantics), matching `SparseMap.get` returning "not found" when the
    probe precedes every sampled key (`SparseMap.java:55-62` minus its
    null-floorKey NPE bug, which we deliberately do not reproduce —
    SURVEY.md §2 fine print).

    ``right_tiebreak``: right columns ordering equal-``on`` right rows;
    the last one wins (greatest tiebreak), keeping results deterministic.
    """
    by = [by] if isinstance(by, str) else list(by or [])
    right_tiebreak = list(right_tiebreak or [])

    right_vals = [c for c in right.columns if c not in by and c != on]
    # Right rows: tag 0 so they sort before left rows at equal `on`
    # (inclusive floor); tag 2 under strict mode so they sort after.
    r = right.select(
        *[F.col(c) for c in by],
        F.col(on).alias(on),
        F.lit(2 if strict else 0).alias(_TAG),
        *[F.col(c).alias(f"{c}{suffix}") for c in right_vals],
    )
    l = left.select(
        *[F.col(c) for c in left.columns],
        F.lit(1).alias(_TAG),
        *[F.lit(None).cast(r.schema[f"{c}{suffix}"].dataType).alias(f"{c}{suffix}") for c in right_vals],
    )
    left_only = [c for c in left.columns if c not in by and c != on]
    r_full = r.select(
        *[F.lit(None).cast(left.schema[c].dataType).alias(c) for c in left_only],
        *by,
        on,
        _TAG,
        *[f"{c}{suffix}" for c in right_vals],
    )
    combined = l.select(r_full.columns).unionByName(r_full)

    order: list[Column] = [F.col(on).asc_nulls_first(), F.col(_TAG).asc()]
    order += [F.col(f"{c}{suffix}").asc_nulls_first() for c in right_tiebreak]
    w = (
        Window.partitionBy(*[F.col(c) for c in by])
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    filled = combined.select(
        *left_only,
        *by,
        on,
        _TAG,
        *[F.last(F.col(f"{c}{suffix}"), ignorenulls=True).over(w).alias(f"{c}{suffix}") for c in right_vals],
    )
    return filled.filter(F.col(_TAG) == 1).drop(_TAG)
