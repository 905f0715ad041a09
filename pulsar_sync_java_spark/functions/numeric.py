"""Deterministic numeric aggregation helpers.

Problem: `SUM(double)` is order-dependent; Spark's partial aggregation
order differs from DuckDB's, so the last ulps of a 60k-row double sum
diverge and an exact value-hash comparison fails.

Fix: accumulate exactly.  The double *inputs* are identical bit-for-bit
in both engines (same parquet), and double arithmetic on identical
operands is IEEE-deterministic, so we compute row-level expressions in
double, cast each row's value to a DECIMAL (exact, associative), sum
exactly, and cast the final decimal back to double.  Both engines then
produce the identical double.

Averages follow as exact-sum / count in double (single IEEE division —
deterministic).  These helpers are the engine's standard for any
money/metric aggregate that feeds the oracle gate; at scale the decimal
sum is still a single partial+final hash aggregate (no perf cliff —
Spark sums decimals in unscaled longs when precision allows).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 38 total digits, 6 fractional: plenty for 100 TB of ~1e4-scale prices
# (31 integral digits) while keeping Spark's sum in the fast path.
DEC = "decimal(38,6)"


def dsum(col: Column | str) -> Column:
    """Exact, order-independent sum of a double expression -> double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: Column | str) -> Column:
    """Deterministic average: exact sum divided by count, in double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double") / F.count(c)


_DEC12 = "decimal(30,12)"


def dec_arr_sum(arr_col: Column) -> Column:
    """Exact fold-sum of a double array into decimal -> double.

    The merge re-casts to the accumulator type: Spark widens
    (30,12)+(30,12) to (31,12) and requires the lambda to return the
    accumulator type; the cast back preserves scale (no rounding), so
    the fold stays exact and bit-identical to DuckDB's DECIMAL sum.
    Used by every dot-product/norm that feeds the oracle gate
    (q_sim_topk, q_knn_join, q_array_funcs)."""
    return F.aggregate(
        arr_col,
        F.lit(0).cast(_DEC12),
        lambda acc, x: (acc + x.cast(_DEC12)).cast(_DEC12),
    ).cast("double")


def sql_dsum(expr: str) -> str:
    """DuckDB oracle twin of `dsum`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE)"


def sql_davg(expr: str) -> str:
    """DuckDB oracle twin of `davg`."""
    return f"CAST(SUM(CAST(({expr}) AS DECIMAL(38,6))) AS DOUBLE) / COUNT({expr})"
