"""Corpus readability and vocabulary-growth metrics (round 9
extension) — document-quality surface beyond plans/textops'
stats/lang-id/repetition: Flesch-style readability per source and a
Heaps'-law vocabulary-growth table.

No reference analog (the reference never reads text content,
``src/main.rs:97-110`` is an audio MIME list); engine-capability
surface like plans/textops2. Everything is JVM-side HOFs — regexp
run-counting via length differences (which cancel any cross-engine
character-length disagreement on astral-plane characters: both
variants of a string count its unchanged remainder identically), and
the only window in the Heaps query runs over a ≤21-row
power-of-two spine.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ._util import sround, sround_sql

# Heaps'-law thresholds: first-N-docs prefixes at N = 2^4 .. 2^24.
# A fixed spine (21 rows) regardless of corpus size; docs beyond 2^24
# fall outside the largest prefix and are correctly excluded.
HEAPS_LO = 4
HEAPS_HI = 24


def _doc_words(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, words[], n_sent_runs) with NULL keys dropped on
    both engines. Words are lowercase ASCII-letter runs — the same
    token rule in both regex engines; sentence runs count [.!?]+
    groups by the replace-and-diff trick."""
    d = load(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
        & F.col("text").isNotNull()
        & F.col("source").isNotNull()
    )
    words = F.filter(
        F.split(F.lower(F.col("text")), "[^a-z]+"), lambda x: x != ""
    )
    runs = F.length(
        F.regexp_replace(F.col("text"), "[.!?]+", "\u0001")
    ) - F.length(F.regexp_replace(F.col("text"), "[.!?]+", ""))
    return d.select(
        "doc_id",
        "source",
        words.alias("words"),
        runs.cast("bigint").alias("n_sent_runs"),
    )


_DOC_WORDS_SQL = """
  SELECT doc_id, source,
         list_filter(regexp_split_to_array(lower(text), '[^a-z]+'),
                     x -> x <> '') AS words,
         CAST(length(regexp_replace(text, '[.!?]+', chr(1), 'g'))
              - length(regexp_replace(text, '[.!?]+', '', 'g'))
              AS BIGINT) AS n_sent_runs
  FROM documents
  WHERE doc_id IS NOT NULL AND text IS NOT NULL AND source IS NOT NULL
"""


def q_readability(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flesch reading-ease per source: 206.835 − 1.015·(words/sentences)
    − 84.6·(syllables/words), with a deterministic vowel-run syllable
    counter (runs of [aeiouy], min 1 per word) — the standard
    dictionary-free approximation. All counts are exact integers
    summed per source (one map-side-combinable groupBy over a
    wordcount-shaped plan); the formula is three correctly-rounded
    double ops on identical inputs, then sround. Sources with zero
    words keep NULL flesch via the explicit guard."""
    w = _doc_words(spark, sf_dir)
    syl = F.aggregate(
        F.col("words"),
        F.lit(0).cast("bigint"),
        lambda a, x: a
        + F.greatest(
            F.lit(1).cast("bigint"),
            (
                F.length(F.regexp_replace(x, "[aeiouy]+", "#"))
                - F.length(F.regexp_replace(x, "[aeiouy]+", ""))
            ).cast("bigint"),
        ),
    )
    per_doc = w.select(
        "source",
        F.size("words").cast("bigint").alias("nw"),
        F.greatest(F.lit(1).cast("bigint"), F.col("n_sent_runs")).alias(
            "ns"
        ),
        syl.alias("nsyl"),
    )
    agg = per_doc.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum("nw").cast("bigint").alias("n_words"),
        F.sum("ns").cast("bigint").alias("n_sentences"),
        F.sum("nsyl").cast("bigint").alias("n_syllables"),
    )
    wd = F.col("n_words").cast("double")
    flesch = (
        F.lit(206.835)
        - F.lit(1.015) * (wd / F.col("n_sentences").cast("double"))
        - F.lit(84.6) * (F.col("n_syllables").cast("double") / wd)
    )
    return agg.select(
        "source",
        "n_docs",
        "n_words",
        "n_sentences",
        "n_syllables",
        F.when(F.col("n_words") > 0, sround(flesch, 6)).alias("flesch"),
    ).orderBy("source")


ORACLE_READABILITY = f"""
WITH w AS ({_DOC_WORDS_SQL}),
per_doc AS (
  SELECT source,
         CAST(len(words) AS BIGINT) AS nw,
         GREATEST(CAST(1 AS BIGINT), n_sent_runs) AS ns,
         CAST(COALESCE(list_sum(list_transform(words, x ->
             GREATEST(1, length(regexp_replace(x, '[aeiouy]+', '#', 'g'))
                  - length(regexp_replace(x, '[aeiouy]+', '', 'g'))))), 0)
              AS BIGINT) AS nsyl
  FROM w
), agg AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         CAST(SUM(nw) AS BIGINT) AS n_words,
         CAST(SUM(ns) AS BIGINT) AS n_sentences,
         CAST(SUM(nsyl) AS BIGINT) AS n_syllables
  FROM per_doc GROUP BY source
)
SELECT source, n_docs, n_words, n_sentences, n_syllables,
       CASE WHEN n_words > 0 THEN
         {sround_sql(
             "206.835"
             " - 1.015 * (CAST(n_words AS DOUBLE)"
             " / CAST(n_sentences AS DOUBLE))"
             " - 84.6 * (CAST(n_syllables AS DOUBLE)"
             " / CAST(n_words AS DOUBLE))", 6)}
       END AS flesch
FROM agg ORDER BY source
"""


def q_heaps_law(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Heaps'-law vocabulary growth: distinct vocabulary and total
    token count over the first-N-docs prefix for N = 2^4..2^24. The
    scale-safe shape: each token reduces to its MINIMUM doc_id (one
    wordcount groupBy), each doc to its token count, and both bucket
    by bit-length(= smallest covering power of two) into ≤21 cells;
    the cumulative sum then runs over the fixed 21-row spine, never
    over tokens. Prefix membership is doc_id < 2^j."""
    w = _doc_words(spark, sf_dir)
    toks = w.select(
        "doc_id", F.explode("words").alias("tok")
    )
    # smallest j with x < 2^j is length(bin(x)), floored at HEAPS_LO
    def bucket(c):  # noqa: ANN001 — Column-in/Column-out helper
        return F.greatest(
            F.lit(HEAPS_LO), F.length(F.conv(c, 10, 2))
        ).cast("bigint")

    tok_b = (
        toks.groupBy("tok")
        .agg(F.min("doc_id").alias("min_doc"))
        .groupBy(bucket(F.col("min_doc")).alias("b"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("new_vocab"))
    )
    doc_b = w.groupBy(bucket(F.col("doc_id")).alias("b")).agg(
        F.count(F.lit(1)).cast("bigint").alias("new_docs"),
        F.sum(F.size("words")).cast("bigint").alias("new_tokens"),
    )
    spine = spark.range(HEAPS_LO, HEAPS_HI + 1).select(
        F.col("id").alias("j"),
        F.expr("shiftleft(CAST(1 AS BIGINT), CAST(id AS INT))").alias(
            "threshold"
        ),
    )
    joined = (
        spine.join(F.broadcast(tok_b), spine.j == tok_b.b, "left")
        .drop("b")
        .join(F.broadcast(doc_b), spine.j == doc_b.b, "left")
        .drop("b")
    )
    cum = Window.orderBy("j").rowsBetween(
        Window.unboundedPreceding, Window.currentRow
    )
    return joined.select(
        "threshold",
        F.sum(F.coalesce("new_docs", F.lit(0)))
        .over(cum)
        .cast("bigint")
        .alias("n_docs"),
        F.sum(F.coalesce("new_tokens", F.lit(0)))
        .over(cum)
        .cast("bigint")
        .alias("total_tokens"),
        F.sum(F.coalesce("new_vocab", F.lit(0)))
        .over(cum)
        .cast("bigint")
        .alias("vocab"),
    ).orderBy("threshold")


ORACLE_HEAPS_LAW = f"""
WITH w AS ({_DOC_WORDS_SQL}),
toks AS (
  SELECT doc_id, unnest(words) AS tok FROM w
), tok_b AS (
  SELECT GREATEST({HEAPS_LO}, length(bin(min_doc))) AS b,
         CAST(COUNT(*) AS BIGINT) AS new_vocab
  FROM (SELECT tok, MIN(doc_id) AS min_doc FROM toks GROUP BY tok)
  GROUP BY 1
), doc_b AS (
  SELECT GREATEST({HEAPS_LO}, length(bin(doc_id))) AS b,
         CAST(COUNT(*) AS BIGINT) AS new_docs,
         CAST(SUM(len(words)) AS BIGINT) AS new_tokens
  FROM w GROUP BY 1
), spine AS (
  SELECT j, CAST(1 AS BIGINT) << j AS threshold
  FROM generate_series({HEAPS_LO}, {HEAPS_HI}) t(j)
)
SELECT threshold,
       CAST(SUM(COALESCE(new_docs, 0)) OVER cum AS BIGINT) AS n_docs,
       CAST(SUM(COALESCE(new_tokens, 0)) OVER cum AS BIGINT)
         AS total_tokens,
       CAST(SUM(COALESCE(new_vocab, 0)) OVER cum AS BIGINT) AS vocab
FROM spine
LEFT JOIN tok_b ON tok_b.b = spine.j
LEFT JOIN doc_b ON doc_b.b = spine.j
WINDOW cum AS (ORDER BY j ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
ORDER BY threshold
"""


QUERIES = {
    "q_readability": q_readability,
    "q_heaps_law": q_heaps_law,
}

ORACLES = {
    "q_readability": ORACLE_READABILITY,
    "q_heaps_law": ORACLE_HEAPS_LAW,
}


def q_gini_length(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of document length per source — the
    concentration audit for corpus balance (a source where 1% of docs
    carry 90% of the characters skews any per-doc sampling). Exact
    Lorenz form G = (2·Σ i·x_(i) − (n+1)·Σx) / (n·Σx) with i the
    1-based rank under the TOTAL order (n_chars, doc_id): every sum is
    integer in the decimal domain, ranks come from a PER-SOURCE window
    (parallel across sources, never a global sort), and the single
    division is quantized by sround."""
    d = load(spark, sf_dir, "documents").filter(
        F.col("doc_id").isNotNull()
        & F.col("source").isNotNull()
        & F.col("n_chars").isNotNull()
    )
    w = Window.partitionBy("source").orderBy("n_chars", "doc_id")
    r = d.select(
        "source",
        F.col("n_chars").cast("bigint").alias("x"),
        F.row_number().over(w).cast("bigint").alias("i"),
    )
    agg = r.groupBy("source").agg(
        F.count(F.lit(1)).cast("bigint").alias("n_docs"),
        F.sum(F.col("x").cast("decimal(38,0)")).alias("sx"),
        F.sum((F.col("i") * F.col("x")).cast("decimal(38,0)")).alias(
            "six"
        ),
    )
    num = (
        F.lit(2).cast("decimal(38,0)") * F.col("six")
        - (F.col("n_docs") + 1).cast("decimal(38,0)") * F.col("sx")
    )
    den = F.col("n_docs").cast("decimal(38,0)") * F.col("sx")
    return agg.select(
        "source",
        "n_docs",
        F.col("sx").cast("bigint").alias("total_chars"),
        F.when(
            F.col("sx") > 0,
            sround(num.cast("double") / den.cast("double"), 12),
        ).alias("gini"),
    ).orderBy("source")


ORACLE_GINI_LENGTH = f"""
WITH d AS (
  SELECT source, CAST(n_chars AS BIGINT) AS x,
         CAST(row_number() OVER (PARTITION BY source
                ORDER BY n_chars, doc_id) AS BIGINT) AS i
  FROM documents
  WHERE doc_id IS NOT NULL AND source IS NOT NULL
    AND n_chars IS NOT NULL
), agg AS (
  SELECT source, CAST(COUNT(*) AS BIGINT) AS n_docs,
         SUM(CAST(x AS DECIMAL(38,0))) AS sx,
         SUM(CAST(i * x AS DECIMAL(38,0))) AS six
  FROM d GROUP BY source
)
SELECT source, n_docs, CAST(sx AS BIGINT) AS total_chars,
       CASE WHEN sx > 0 THEN
         {sround_sql(
             "CAST(CAST(2 AS DECIMAL(38,0)) * six"
             " - CAST(n_docs + 1 AS DECIMAL(38,0)) * sx AS DOUBLE)"
             " / CAST(CAST(n_docs AS DECIMAL(38,0)) * sx AS DOUBLE)",
             12)}
       END AS gini
FROM agg ORDER BY source
"""


QUERIES["q_gini_length"] = q_gini_length
ORACLES["q_gini_length"] = ORACLE_GINI_LENGTH
