"""Exact-arithmetic helpers for oracle-deterministic aggregation.

Floating-point sums are order-dependent; Spark's shuffle order differs run
to run and from DuckDB's scan order, so ``SUM(double)`` can differ in the
low bits — enough to break a value-hash comparison. The fix used across
this engine: accumulate in exact types (decimal / bigint), then apply at
most a fixed sequence of scalar FP ops at the very end (a single
decimal→double cast, or one division). Those final ops are IEEE-754
deterministic, so Spark and DuckDB produce bit-identical doubles.

The driver data stores money as 2-decimal doubles (verified: max deviation
from 2-decimal grid < 1e-8), so a decimal(18,2) cast recovers the exact
intended value on both engines.

CAST-PARITY BOUNDARY (measured): the final decimal→double cast agrees
across engines only while the decimal's SCALED integer stays below 2^53.
DuckDB converts int128→double first and divides by 10^scale after — two
roundings — while Spark's BigDecimal cast rounds once; both reduce to the
single correctly-rounded quotient only when the int128→double step is
exact. At scale 2 that bounds values to ~9e13 (three orders of magnitude
above the sf0.1 sums). For larger magnitudes (e.g. sums of SQUARED
prices) keep moments in integer/bigint domains instead — see
queries.relational._agg_battery2 for the pattern and the failure case.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F


def dec(c: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Cast a column to an exact decimal for order-independent accumulation."""
    col = F.col(c) if isinstance(c, str) else c
    return col.cast(f"decimal({precision},{scale})")


def money(c: Column | str) -> Column:
    """A 2-decimal monetary column as exact decimal(18,2)."""
    return dec(c, 18, 2)


def dsum(c: Column | str, precision: int = 18, scale: int = 2) -> Column:
    """Exact decimal SUM, surfaced as double (single deterministic cast)."""
    return F.sum(dec(c, precision, scale)).cast("double")
