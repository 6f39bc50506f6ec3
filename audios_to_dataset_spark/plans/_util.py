"""Shared helpers for oracle-parity plans.

Floating-point SUMs are order-dependent, and Spark's shuffle order differs
from DuckDB's scan order. Every aggregated double therefore goes through a
fixed-point decimal sum (exact, order-independent) and is cast back to
double at the end — both engines produce the bit-identical double. See
``dsum``/``davg`` here and ``CAST(SUM(CAST(x AS DECIMAL(...))) AS DOUBLE)``
in the oracle SQL strings.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# 18 digits / 6 decimals comfortably covers the testdata value ranges
# (prices < 1e6, quantities < 100) with headroom at sf0.1.
DEC = "decimal(28,6)"
DEC_SQL = "DECIMAL(28,6)"


def dsum(col: str | Column) -> Column:
    """Order-independent sum of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return F.sum(c.cast(DEC)).cast("double")


def davg(col: str | Column) -> Column:
    """Order-independent average of a double column, returned as double."""
    c = F.col(col) if isinstance(col, str) else col
    return (F.sum(c.cast(DEC)).cast("double") / F.count(c)).cast("double")


def sround(col: Column, k: int) -> Column:
    """Cross-engine-stable rounding to k decimals.

    ``round(x, k)`` disagrees between engines at half boundaries: Spark
    rounds the exact binary value via BigDecimal, DuckDB multiplies by
    10^k in floating point first (observed: 0.0032135 → 0.003213 vs
    0.003214 at sf0.1). Doing the multiply explicitly on BOTH sides makes
    the boundary value identical, and integer rounding of the same double
    agrees everywhere; ``+ 0.0`` collapses IEEE −0.0.
    """
    scale = float(10**k)
    return (F.round(col * scale) / scale) + 0.0


def sround_sql(expr: str, k: int) -> str:
    scale = float(10**k)
    return f"(round(({expr}) * {scale}) / {scale}) + 0.0"


def dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {DEC_SQL})) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS {DEC_SQL})) AS DOUBLE)"
        f" / COUNT({expr}) AS DOUBLE)"
    )
