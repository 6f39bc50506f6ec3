"""Bloom-filter semi-join pruning.

At 100 TB the expensive pattern is "shuffle a huge probe table to join a
selective build side". Spark's AQE can inject a runtime bloom filter
(``spark.sql.optimizer.runtime.bloomFilter.enabled``), but its hash is
engine-internal and the decision is cost-based; this operator is the
explicit, deterministic version: build a bit-set of k md5-derived
positions from the build side's keys, broadcast it, and pre-filter the
probe side before any shuffle. False positives are possible (that is the
point — the filter is tiny), false negatives are not.

The bit-set is represented as a DataFrame of distinct set positions
(at most ``m_bits`` rows, e.g. 65536 — always broadcastable) and the
membership test is k broadcast LEFT SEMI joins, which keeps every step
JVM-side and lets the DuckDB oracle replay membership exactly with k
EXISTS subqueries (plans/sketches.py). A production variant would pack
the positions into a bitmap and test with a scalar expression; the
candidate-set semantics — what the oracle pins — are identical.

No analog in the reference (its lookup join broadcasts the whole
metadata table, /root/reference/src/main.rs:622-633); engine-capability
extension.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _position(col, seed: int, m_bits: int):
    """k-th bloom position: 60-bit md5 prefix of 'seed:value' mod m_bits
    (m_bits a power of two → mask, integer-exact)."""
    h = F.conv(
        F.substring(
            F.md5(F.concat(F.lit(f"{seed}:"), col.cast("string"))), 1, 15
        ),
        16,
        10,
    ).cast("bigint")
    return h.bitwiseAND(F.lit(m_bits - 1)).cast("long")


def bloom_positions_sql(value_sql: str, seed: int, m_bits: int) -> str:
    """DuckDB twin of _position."""
    h = (
        f"(('0x' || substr(md5('{seed}:' || CAST({value_sql} AS VARCHAR)),"
        f" 1, 15))::BIGINT)"
    )
    return f"({h} & {m_bits - 1})"


def bloom_semi_join(
    probe: DataFrame,
    build: DataFrame,
    probe_key: str,
    build_key: str,
    m_bits: int = 1 << 16,
    k: int = 3,
) -> DataFrame:
    """Rows of ``probe`` whose key *may* appear in ``build[build_key]``.

    Guaranteed superset of the exact left-semi join; deterministic
    false-positive set given (m_bits, k). One distinct-positions
    aggregation on the build side, then k broadcast semi-joins on the
    probe — no shuffle of the probe table.
    """
    if m_bits & (m_bits - 1):
        raise ValueError("m_bits must be a power of two")
    bits = None
    for i in range(k):
        p = build.select(
            _position(F.col(build_key), i, m_bits).alias("pos")
        )
        bits = p if bits is None else bits.unionByName(p)
    bits = bits.distinct()
    out = probe
    for i in range(k):
        out = out.join(
            F.broadcast(bits),
            _position(F.col(probe_key), i, m_bits) == F.col("pos"),
            "left_semi",
        )
    return out
