"""Z-order (Morton) interleaving for multi-dimensional data layout.

Sorting a 100 TB table by one key makes scans on that key cheap and on
every other key useless. Interleaving the bits of two keys gives a
single sort order whose contiguous ranges are small rectangles in
(x, y) space — min/max parquet row-group stats then prune scans on
EITHER dimension. This is the layout trick behind Delta/Iceberg
Z-ordering, implemented here as a pure column expression (the classic
bit-spreading construction, public domain), so ``df.repartitionByRange/
orderBy(morton)`` + the native sharded sink produce the clustered
files.

Spreading magic (16 bits → even bit positions of 32):
``x = (x | x<<8) & 0x00FF00FF; (x | x<<4) & 0x0F0F0F0F;
(x | x<<2) & 0x33333333; (x | x<<1) & 0x55555555`` — every step is a
shift/mask Spark and DuckDB evaluate identically on BIGINT.

No analog in the reference (its only layout choice is scan-order shard
slicing, /root/reference/src/main.rs:714-718).
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

_SPREAD_MASKS = (
    (8, 0x00FF00FF),
    (4, 0x0F0F0F0F),
    (2, 0x33333333),
    (1, 0x55555555),
)


def _spread16(col: Column) -> Column:
    """Spread the low 16 bits of ``col`` into the even bit positions."""
    x = col.bitwiseAND(F.lit(0xFFFF))
    for s, mask in _SPREAD_MASKS:
        x = (x.bitwiseOR(F.shiftleft(x, s))).bitwiseAND(F.lit(mask))
    return x


def morton2(x: Column, y: Column) -> Column:
    """32-bit Morton code: x in even bits, y in odd bits (low 16 each)."""
    return _spread16(x).bitwiseOR(F.shiftleft(_spread16(y), 1)).cast("long")


def _spread16_sql(expr: str) -> str:
    x = f"(({expr}) & 65535)"
    for s, mask in _SPREAD_MASKS:
        x = f"(({x} | ({x} << {s})) & {mask})"
    return x


def morton2_sql(x_sql: str, y_sql: str) -> str:
    """DuckDB twin of morton2."""
    return (
        f"CAST(({_spread16_sql(x_sql)}"
        f" | ({_spread16_sql(y_sql)} << 1)) AS BIGINT)"
    )
