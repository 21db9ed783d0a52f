"""Exact-arithmetic helpers for oracle-comparable aggregates.

Money/quantity columns in the test corpus are exact 2-decimal values
stored as DOUBLE. Summing doubles is order-dependent (Spark's partial
aggregation vs DuckDB's single-threaded sum differ in the low bits), so
any float-hash comparison would be flaky. Instead: cast to DECIMAL
first (exact, since the data has <=2 decimals), aggregate in decimal
(exact integer arithmetic), and cast the final scalar back to DOUBLE
(deterministic round-to-nearest of the same decimal on both engines).

This mirrors what the reference does with typed accumulators
(common/functions/src/aggregates/aggregate_sum.rs:19-146 widens the sum
state type to avoid overflow) — we widen to decimal for exactness.

At scale this costs a constant factor on the agg but keeps results
reproducible across cluster sizes and partition counts — a property a
100 TB pipeline wants anyway (rerun == same bytes).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(col: str | Column, precision: int = 12, scale: int = 2) -> Column:
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal({precision},{scale})")


def dsum(col: str | Column, precision: int = 12, scale: int = 2) -> Column:
    """Exact decimal sum, returned as DOUBLE."""
    return F.sum(dec(col, precision, scale)).cast("double")


def davg(col: str | Column, precision: int = 12, scale: int = 2) -> Column:
    """avg = double(exact_sum) / count — identical float ops on both
    engines, so bit-stable (unlike F.avg over doubles)."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(dec(c, precision, scale)).cast("double") / F.count(c)


def one_minus(col: str | Column) -> Column:
    """(1 - x) in exact decimal, for discount-style expressions."""
    return F.lit(1).cast("decimal(3,2)") - dec(col)


def one_plus(col: str | Column) -> Column:
    return F.lit(1).cast("decimal(3,2)") + dec(col)
