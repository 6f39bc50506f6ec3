"""Cross-engine Unicode string-semantics registry.

The oracle discipline relies on Spark (JVM/ICU-style full case mapping)
and DuckDB (utf8proc simple mapping) agreeing on the string functions
the queries use. This test pins WHERE they agree (length, substr,
split — codepoint semantics on both) and registers the two REAL
divergences a Unicode-injection sweep found, so an engine upgrade that
changes either side fails loudly instead of silently corrupting an
oracle:

- ``lower('İ')`` (U+0130, Turkish dotted capital I): Spark produces
  ``i`` + U+0307 combining dot (the full Unicode mapping); DuckDB
  produces plain ``i``.
- Final sigma: Spark lowercases a word-final ``Σ`` to the contextual
  ``ς``; DuckDB always produces ``σ``.

Consequence, documented here as the repo contract: oracle-checked
queries may apply ``lower()`` to the ASCII-plus-Latin-1 testdata
freely, but any future fixture that injects Unicode text must either
avoid case mapping or normalize (NFKC + casefold) in a UDF on BOTH
sides. The production answer for a real multilingual corpus is a
normalization pass before the engine, not per-query locale handling.
"""

from __future__ import annotations

import duckdb
from pyspark.sql import functions as F

SAMPLES = [
    "straße GROSS",
    "Łódź ŁÓDŹ",
    "МОСКВА москва",
    "日本語 テスト",
    "emoji \U0001F600\U0001F389",
    "café CAFÉ",
    "ĲSSELMEER ĳsselmeer",
]


def test_unicode_agreement_and_divergence_registry(spark):
    df = spark.createDataFrame([(s,) for s in SAMPLES], "s string")
    rows = df.select(
        "s",
        F.lower("s").alias("l"),
        F.length("s").alias("n"),
        F.substring("s", 2, 5).alias("sub"),
    ).collect()
    for r in rows:
        dl, dn, dsub = duckdb.sql(
            "SELECT lower(?), length(?), substr(?, 2, 5)",
            params=[r.s, r.s, r.s],
        ).fetchone()
        # codepoint length and substr agree everywhere, lower() agrees
        # on every script in SAMPLES (incl. sharp-s, ligatures, emoji)
        assert r.n == dn, r.s
        assert r.sub == dsub, r.s
        assert r.l == dl, r.s

    # --- the registered divergences (pin BOTH sides exactly) ---
    sp = {
        r.s: r.l
        for r in spark.createDataFrame(
            [("İ",), ("ΦΟΣ",)], "s string"
        ).select("s", F.lower("s").alias("l")).collect()
    }
    assert sp["İ"] == "i̇"  # Spark: full mapping adds U+0307
    assert duckdb.sql("SELECT lower('İ')").fetchone()[0] == "i"
    assert sp["ΦΟΣ"] == "φος"  # Spark: contextual final sigma
    assert duckdb.sql("SELECT lower('ΦΟΣ')").fetchone()[0] == "φοσ"
