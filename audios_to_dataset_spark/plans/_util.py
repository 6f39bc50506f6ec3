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


def dsum_sql(expr: str) -> str:
    return f"CAST(SUM(CAST({expr} AS {DEC_SQL})) AS DOUBLE)"


def davg_sql(expr: str) -> str:
    return (
        f"CAST(CAST(SUM(CAST({expr} AS {DEC_SQL})) AS DOUBLE)"
        f" / COUNT({expr}) AS DOUBLE)"
    )
