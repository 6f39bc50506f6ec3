"""Round-11 statistics wave: Kendall tau-b, Kruskal-Wallis H, one-way
ANOVA F, Cohen's d / Hedges' g, Jensen-Shannon source drift,
permutation entropy, Brier decomposition, macro/micro F1, rank-biased
overlap, Bollinger bands, per-user drawdown, and the binned
Lorenz/Gini concentration curve.

No reference analog (the reference is batch audio-file ingest,
``/root/reference/src/main.rs:118-140``; it computes no statistics
beyond WAV header fields) — engine-capability surface for the
curation/eval/experimentation layer next to ``plans/infostats``,
``plans/expstats``, ``plans/nonparam``, and ``plans/evalmetrics``.

Exactness discipline (CLAUDE.md): counts exact integers; every double
aggregate is a DECIMAL sum of per-row terms (quantized with sround
where the term is not already decimal-exact); ln/sqrt/pow run on
bit-identical inputs; divisions guarded with lazy CASE branches.

Scale notes (100 TB design point):
- Kendall tau-b reduces the corpus to the (l_quantity × l_discount)
  contingency grid (~50×11 cells — value-range-bounded) with ONE
  map-side-combinable groupBy; concordant/discordant pair counts come
  from two cascaded PARTITIONED windows over the densified grid
  (partition by one axis, order by the other), never a pairwise join.
- Kruskal-Wallis uses HISTOGRAM ranks over the distinct-value spine
  (events.value lives on a 0.01 grid — the q_mann_whitney argument);
  raw rows feed one combinable groupBy.
- ANOVA / Cohen's d reduce to per-group moment sums (one combinable
  groupBy, ≤ a handful of groups).
- Jensen-Shannon runs on the (source × lang) contingency table with
  broadcast margins (the q_chi2_independence shape).
- Permutation entropy is two lag windows per user timeline (the
  q_transitions contract) + one combinable groupBy over ≤ 27 ordinal
  patterns.
- Brier / macro-F1 aggregate the CAL_BINS histogram / class² confusion
  cells (the q_ece / q_confusion_matrix shapes).
- Rank overlap ranks only the top-RBO_K rows produced by a distributed
  TakeOrdered (the q_zipf_slope argument); the depth spine is a
  literal 1..K sequence.
- Bollinger / drawdown are per-user ROWS-frame windows over the event
  timeline (partitioned by user — no global sort).
- Lorenz/Gini reduces customers to a FIXED 100-bin spend histogram;
  the cumulative window runs over that spine only (the q_wasserstein
  argument).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ._util import sround, sround_sql

TOTAL = "~~total~~"  # total-row label; sorts after all data values
D38 = "decimal(38,6)"
D38_SQL = "DECIMAL(38,6)"
D28_9 = "decimal(28,9)"
D28_9_SQL = "DECIMAL(28,9)"

QUERIES: dict = {}
ORACLES: dict = {}


# --------------------------------------------------------------------------
# one-way ANOVA F (orders.o_totalprice across o_orderpriority groups)

def q_anova_f(spark: SparkSession, sf_dir: str) -> DataFrame:
    """One-way ANOVA F-test of order value across the five
    o_orderpriority groups — the k-group extension of q_welch_t's
    two-cohort comparison (equal-variance model), with eta² effect
    size on the total row.

    Per-group moment sums (n, Σx, Σx²) are DECIMAL-exact (o_totalprice
    has 2 dp; the q_welch_t convention); SSB/SSW come from quantized
    per-group terms re-summed in the decimal domain, so the F statistic
    is an identical IEEE tree on both engines.
    """
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority").isNotNull()
        & F.col("o_totalprice").isNotNull()
    ).select(
        F.col("o_orderpriority").alias("grp"),
        F.col("o_totalprice").alias("x"),
    )
    g = o.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast(D38)).cast("double").alias("s"),
        F.sum((F.col("x") * F.col("x")).cast(D38)).cast("double")
        .alias("ss"),
    )
    nd = F.col("n").cast("double")
    m = F.col("s") / nd
    per = g.select(
        "grp", "n", "s", m.alias("mean"),
        sround(nd * m * m, 6).alias("t_b"),          # n_g·m_g²
        sround(F.col("ss") - nd * m * m, 6).alias("t_w"),  # within-SS
    )
    tot = per.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_tot"),
        F.sum(F.col("s").cast(D38)).cast("double").alias("s_tot"),
        F.sum(F.col("t_b").cast(D38)).cast("double").alias("sum_nm2"),
        F.sum(F.col("t_w").cast(D38)).cast("double").alias("ssw"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    ntd = F.col("n_tot").cast("double")
    gm = F.col("s_tot") / ntd
    ssb = F.col("sum_nm2") - sround(ntd * gm * gm, 6)
    kd = F.col("k").cast("double")
    fstat = (ssb / (kd - 1.0)) / (F.col("ssw") / (ntd - kd))
    ok = (
        (F.col("k") > 1) & (F.col("n_tot") > F.col("k"))
        & (F.col("ssw") > 0.0)
    )
    total = tot.select(
        F.lit(TOTAL).alias("grp"),
        F.col("n_tot").alias("n"),
        F.when(F.col("n_tot") > 0, sround(gm, 9)).alias("mean"),
        F.when(ok, sround(fstat, 9)).alias("f_stat"),
        F.when(F.col("k") > 1, F.col("k") - 1).cast("bigint").alias("df1"),
        F.when(F.col("n_tot") > F.col("k"), F.col("n_tot") - F.col("k"))
        .cast("bigint").alias("df2"),
        F.when(ok & (ssb + F.col("ssw") > 0.0),
               sround(ssb / (ssb + F.col("ssw")), 9)).alias("eta_sq"),
    )
    per_out = per.select(
        "grp", "n", sround(F.col("mean"), 9).alias("mean"),
        F.lit(None).cast("double").alias("f_stat"),
        F.lit(None).cast("bigint").alias("df1"),
        F.lit(None).cast("bigint").alias("df2"),
        F.lit(None).cast("double").alias("eta_sq"),
    )
    return per_out.unionByName(total).orderBy("grp")


ORACLE_ANOVA_F = f"""
WITH o AS (
  SELECT o_orderpriority AS grp, o_totalprice AS x
  FROM orders
  WHERE o_orderpriority IS NOT NULL AND o_totalprice IS NOT NULL
), g AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS {D38_SQL})) AS DOUBLE) AS s,
         CAST(SUM(CAST(x * x AS {D38_SQL})) AS DOUBLE) AS ss
  FROM o GROUP BY 1
), per AS (
  SELECT grp, n, s, s / CAST(n AS DOUBLE) AS mean,
    {sround_sql(
        "CAST(n AS DOUBLE) * (s / CAST(n AS DOUBLE))"
        " * (s / CAST(n AS DOUBLE))", 6)} AS t_b,
    {sround_sql(
        "ss - CAST(n AS DOUBLE) * (s / CAST(n AS DOUBLE))"
        " * (s / CAST(n AS DOUBLE))", 6)} AS t_w
  FROM g
), tot AS (
  SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_tot,
         CAST(SUM(CAST(s AS {D38_SQL})) AS DOUBLE) AS s_tot,
         CAST(SUM(CAST(t_b AS {D38_SQL})) AS DOUBLE) AS sum_nm2,
         CAST(SUM(CAST(t_w AS {D38_SQL})) AS DOUBLE) AS ssw,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM per
), mid AS (
  SELECT n_tot, s_tot, ssw, k,
         s_tot / CAST(n_tot AS DOUBLE) AS gm,
         sum_nm2 - {sround_sql(
             "CAST(n_tot AS DOUBLE)"
             " * (s_tot / CAST(n_tot AS DOUBLE))"
             " * (s_tot / CAST(n_tot AS DOUBLE))", 6)} AS ssb
  FROM tot
)
SELECT grp, n, {sround_sql("mean", 9)} AS mean,
       CAST(NULL AS DOUBLE) AS f_stat, CAST(NULL AS BIGINT) AS df1,
       CAST(NULL AS BIGINT) AS df2, CAST(NULL AS DOUBLE) AS eta_sq
FROM per
UNION ALL
SELECT '{TOTAL}', n_tot,
       CASE WHEN n_tot > 0 THEN {sround_sql("gm", 9)} END,
       CASE WHEN k > 1 AND n_tot > k AND ssw > 0.0
       THEN {sround_sql(
           "(ssb / (CAST(k AS DOUBLE) - 1.0))"
           " / (ssw / (CAST(n_tot AS DOUBLE) - CAST(k AS DOUBLE)))", 9)}
       END,
       CASE WHEN k > 1 THEN CAST(k - 1 AS BIGINT) END,
       CASE WHEN n_tot > k THEN CAST(n_tot - k AS BIGINT) END,
       CASE WHEN k > 1 AND n_tot > k AND ssw > 0.0
                 AND ssb + ssw > 0.0
       THEN {sround_sql("ssb / (ssb + ssw)", 9)} END
FROM mid
ORDER BY grp
"""

QUERIES["q_anova_f"] = q_anova_f
ORACLES["q_anova_f"] = ORACLE_ANOVA_F


# --------------------------------------------------------------------------
# Cohen's d / Hedges' g (the q_welch_t cohorts, pooled-variance model)

def q_cohens_d(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohen's d and Hedges' g effect sizes between the c_custkey-parity
    order-value cohorts — the magnitude readout that complements
    q_welch_t's significance test (same cohorts, pooled-variance
    model). Moment sums are DECIMAL-exact (the q_welch_t convention);
    d = (m1−m0)/s_p with s_p² the pooled sample variance, and
    g = d·(1 − 3/(4N−9)) (small-sample bias correction). One row out.
    """
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_custkey").isNotNull() & F.col("o_totalprice").isNotNull()
    ).select(
        (F.col("o_custkey") % 2).cast("int").alias("grp"),
        F.col("o_totalprice").alias("x"),
    )
    stats = o.groupBy("grp").agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.col("x").cast(D38)).cast("double").alias("s"),
        F.sum((F.col("x") * F.col("x")).cast(D38)).cast("double")
        .alias("ss"),
    )
    piv = stats.agg(
        F.max(F.when(F.col("grp") == 0, F.col("n"))).alias("n0"),
        F.max(F.when(F.col("grp") == 0, F.col("s"))).alias("s0"),
        F.max(F.when(F.col("grp") == 0, F.col("ss"))).alias("ss0"),
        F.max(F.when(F.col("grp") == 1, F.col("n"))).alias("n1"),
        F.max(F.when(F.col("grp") == 1, F.col("s"))).alias("s1"),
        F.max(F.when(F.col("grp") == 1, F.col("ss"))).alias("ss1"),
    )
    n0d, n1d = F.col("n0").cast("double"), F.col("n1").cast("double")
    m0, m1 = F.col("s0") / n0d, F.col("s1") / n1d
    v0 = (F.col("ss0") - (F.col("s0") * F.col("s0")) / n0d) / (n0d - 1.0)
    v1 = (F.col("ss1") - (F.col("s1") * F.col("s1")) / n1d) / (n1d - 1.0)
    mid = piv.select(
        "n0", "n1", m0.alias("m0"), m1.alias("m1"),
        F.when(F.col("n0") > 1, v0).alias("v0"),
        F.when(F.col("n1") > 1, v1).alias("v1"),
    )
    n0d2 = F.col("n0").cast("double")
    n1d2 = F.col("n1").cast("double")
    sp2 = (
        (n0d2 - 1.0) * F.col("v0") + (n1d2 - 1.0) * F.col("v1")
    ) / (n0d2 + n1d2 - 2.0)
    nn = F.col("n0") + F.col("n1")
    d = (F.col("m1") - F.col("m0")) / F.sqrt(sp2)
    corr = 1.0 - 3.0 / (4.0 * nn.cast("double") - 9.0)
    ok = (
        F.col("v0").isNotNull() & F.col("v1").isNotNull()
        & (nn > 2)
    )
    return mid.select(
        F.col("n0").alias("n_ctrl"), F.col("n1").alias("n_treat"),
        sround(F.col("m1") - F.col("m0"), 9).alias("mean_diff"),
        F.when(ok & (sp2 > 0.0), sround(F.sqrt(sp2), 9))
        .alias("pooled_sd"),
        F.when(ok & (sp2 > 0.0), sround(d, 9)).alias("cohens_d"),
        F.when(ok & (sp2 > 0.0) & (nn > 2), sround(d * corr, 9))
        .alias("hedges_g"),
    )


_SP2_SQL = (
    "(((CAST(n0 AS DOUBLE) - 1.0) * v0"
    " + (CAST(n1 AS DOUBLE) - 1.0) * v1)"
    " / (CAST(n0 AS DOUBLE) + CAST(n1 AS DOUBLE) - 2.0))"
)
_D_SQL = f"((m1 - m0) / sqrt{_SP2_SQL})"

ORACLE_COHENS_D = f"""
WITH o AS (
  SELECT CAST(o_custkey % 2 AS INTEGER) AS grp, o_totalprice AS x
  FROM orders
  WHERE o_custkey IS NOT NULL AND o_totalprice IS NOT NULL
), stats AS (
  SELECT grp, CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CAST(x AS {D38_SQL})) AS DOUBLE) AS s,
         CAST(SUM(CAST(x * x AS {D38_SQL})) AS DOUBLE) AS ss
  FROM o GROUP BY 1
), piv AS (
  SELECT MAX(CASE WHEN grp = 0 THEN n END) AS n0,
         MAX(CASE WHEN grp = 0 THEN s END) AS s0,
         MAX(CASE WHEN grp = 0 THEN ss END) AS ss0,
         MAX(CASE WHEN grp = 1 THEN n END) AS n1,
         MAX(CASE WHEN grp = 1 THEN s END) AS s1,
         MAX(CASE WHEN grp = 1 THEN ss END) AS ss1
  FROM stats
), mid AS (
  SELECT n0, n1,
    s0 / CAST(n0 AS DOUBLE) AS m0, s1 / CAST(n1 AS DOUBLE) AS m1,
    CASE WHEN n0 > 1 THEN (ss0 - (s0 * s0) / CAST(n0 AS DOUBLE))
                          / (CAST(n0 AS DOUBLE) - 1.0) END AS v0,
    CASE WHEN n1 > 1 THEN (ss1 - (s1 * s1) / CAST(n1 AS DOUBLE))
                          / (CAST(n1 AS DOUBLE) - 1.0) END AS v1
  FROM piv
)
SELECT n0 AS n_ctrl, n1 AS n_treat,
  {sround_sql("m1 - m0", 9)} AS mean_diff,
  CASE WHEN v0 IS NOT NULL AND v1 IS NOT NULL AND n0 + n1 > 2
            AND {_SP2_SQL} > 0.0
  THEN {sround_sql("sqrt" + _SP2_SQL, 9)} END AS pooled_sd,
  CASE WHEN v0 IS NOT NULL AND v1 IS NOT NULL AND n0 + n1 > 2
            AND {_SP2_SQL} > 0.0
  THEN {sround_sql(_D_SQL, 9)} END AS cohens_d,
  CASE WHEN v0 IS NOT NULL AND v1 IS NOT NULL AND n0 + n1 > 2
            AND {_SP2_SQL} > 0.0
  THEN {sround_sql(
      _D_SQL + " * (1.0 - 3.0 / (4.0"
      " * CAST(n0 + n1 AS DOUBLE) - 9.0))", 9)} END AS hedges_g
FROM mid
"""

QUERIES["q_cohens_d"] = q_cohens_d
ORACLES["q_cohens_d"] = ORACLE_COHENS_D

# --------------------------------------------------------------------------
# Kendall tau-b (l_quantity vs l_discount over the contingency grid)

def q_kendall_tau(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kendall tau-b rank correlation between l_quantity and
    l_discount — the concordance-based alternative to q_spearman
    (same column pair), exact under heavy ties.

    The corpus reduces to the (quantity × discount) contingency grid
    (~50×11 cells, value-range-bounded) with ONE map-side-combinable
    groupBy. Concordant/discordant pair counts come from 2-D prefix
    sums over the DENSIFIED grid: a within-row cumulative (partition
    by q, order by d) cascaded into an across-row cumulative
    (partition by d, order by q) — two PARTITIONED windows over ≤550
    rows, never a pairwise join. All pair counts are exact BIGINTs;
    the only float ops are the final sqrt/divide on identical inputs.
    """
    li = load(spark, sf_dir, "lineitem").filter(
        F.col("l_quantity").isNotNull() & F.col("l_discount").isNotNull()
    )
    cells = li.groupBy(
        F.col("l_quantity").alias("q"), F.col("l_discount").alias("d")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("n"))
    qs = cells.select("q").distinct()
    ds = cells.select("d").distinct()
    grid = (
        qs.crossJoin(F.broadcast(ds))
        .join(cells, ["q", "d"], "left")
        .select("q", "d",
                F.coalesce("n", F.lit(0)).cast("bigint").alias("n"))
    )
    w_lt = (Window.partitionBy("q").orderBy("d")
            .rowsBetween(Window.unboundedPreceding, -1))
    w_gt = (Window.partitionBy("q").orderBy(F.col("d").desc())
            .rowsBetween(Window.unboundedPreceding, -1))
    p = grid.select(
        "q", "d", "n",
        F.coalesce(F.sum("n").over(w_lt), F.lit(0)).cast("bigint")
        .alias("p_lt"),
        F.coalesce(F.sum("n").over(w_gt), F.lit(0)).cast("bigint")
        .alias("p_gt"),
    )
    w_q = (Window.partitionBy("d").orderBy("q")
           .rowsBetween(Window.unboundedPreceding, -1))
    s = p.select(
        "q", "d", "n",
        F.coalesce(F.sum("p_lt").over(w_q), F.lit(0)).cast("bigint")
        .alias("s_con"),
        F.coalesce(F.sum("p_gt").over(w_q), F.lit(0)).cast("bigint")
        .alias("s_dis"),
    )
    pair = s.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_rows"),
        F.coalesce(F.sum(F.col("n") * F.col("s_con")), F.lit(0))
        .cast("bigint").alias("concordant"),
        F.coalesce(F.sum(F.col("n") * F.col("s_dis")), F.lit(0))
        .cast("bigint").alias("discordant"),
    )
    tq = (
        cells.groupBy("q")
        .agg(F.sum("n").cast("bigint").alias("c"))
        .agg(F.coalesce(
            F.sum(F.col("c") * (F.col("c") - 1) / 2), F.lit(0)
        ).cast("bigint").alias("t_x"))
    )
    td = (
        cells.groupBy("d")
        .agg(F.sum("n").cast("bigint").alias("c"))
        .agg(F.coalesce(
            F.sum(F.col("c") * (F.col("c") - 1) / 2), F.lit(0)
        ).cast("bigint").alias("t_y"))
    )
    j = pair.crossJoin(F.broadcast(tq)).crossJoin(F.broadcast(td))
    n0 = (F.col("n_rows") * (F.col("n_rows") - 1) / 2).cast("bigint")
    den = (
        (n0 - F.col("t_x")).cast("double")
        * (n0 - F.col("t_y")).cast("double")
    )
    return j.select(
        "n_rows", "concordant", "discordant", "t_x", "t_y",
        F.when(
            den > 0.0,
            sround(
                (F.col("concordant") - F.col("discordant")).cast("double")
                / F.sqrt(den), 9),
        ).alias("tau_b"),
    )


ORACLE_KENDALL_TAU = f"""
WITH li AS (
  SELECT l_quantity AS q, l_discount AS d FROM lineitem
  WHERE l_quantity IS NOT NULL AND l_discount IS NOT NULL
), cells AS (
  SELECT q, d, CAST(COUNT(*) AS BIGINT) AS n FROM li GROUP BY 1, 2
), grid AS (
  SELECT qs.q, ds.d, CAST(COALESCE(cells.n, 0) AS BIGINT) AS n
  FROM (SELECT DISTINCT q FROM cells) qs
  CROSS JOIN (SELECT DISTINCT d FROM cells) ds
  LEFT JOIN cells ON cells.q = qs.q AND cells.d = ds.d
), p AS (
  SELECT q, d, n,
    CAST(COALESCE(SUM(n) OVER (PARTITION BY q ORDER BY d
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS p_lt,
    CAST(COALESCE(SUM(n) OVER (PARTITION BY q ORDER BY d DESC
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS p_gt
  FROM grid
), s AS (
  SELECT q, d, n,
    CAST(COALESCE(SUM(p_lt) OVER (PARTITION BY d ORDER BY q
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS s_con,
    CAST(COALESCE(SUM(p_gt) OVER (PARTITION BY d ORDER BY q
      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
      AS BIGINT) AS s_dis
  FROM p
), pair AS (
  SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_rows,
         CAST(COALESCE(SUM(n * s_con), 0) AS BIGINT) AS concordant,
         CAST(COALESCE(SUM(n * s_dis), 0) AS BIGINT) AS discordant
  FROM s
), tq AS (
  SELECT CAST(COALESCE(SUM(c * (c - 1) / 2), 0) AS BIGINT) AS t_x
  FROM (SELECT CAST(SUM(n) AS BIGINT) AS c FROM cells GROUP BY q)
), td AS (
  SELECT CAST(COALESCE(SUM(c * (c - 1) / 2), 0) AS BIGINT) AS t_y
  FROM (SELECT CAST(SUM(n) AS BIGINT) AS c FROM cells GROUP BY d)
)
SELECT n_rows, concordant, discordant, t_x, t_y,
  CASE WHEN CAST(n_rows * (n_rows - 1) / 2 - t_x AS DOUBLE)
            * CAST(n_rows * (n_rows - 1) / 2 - t_y AS DOUBLE) > 0.0
  THEN {sround_sql(
      "CAST(concordant - discordant AS DOUBLE)"
      " / sqrt(CAST(n_rows * (n_rows - 1) / 2 - t_x AS DOUBLE)"
      " * CAST(n_rows * (n_rows - 1) / 2 - t_y AS DOUBLE))", 9)}
  END AS tau_b
FROM pair CROSS JOIN tq CROSS JOIN td
"""

QUERIES["q_kendall_tau"] = q_kendall_tau
ORACLES["q_kendall_tau"] = ORACLE_KENDALL_TAU

# --------------------------------------------------------------------------
# Jensen-Shannon source drift (per-source lang mix vs the corpus mix)

_LN2 = 0.6931471805599453  # shared literal; never engine-computed


def q_jensen_shannon(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Jensen-Shannon divergence between each source's language
    distribution and the corpus-wide language distribution — the
    bounded, symmetric "which source skews the language mix" drift
    score next to q_psi (bin drift) and q_chi2_independence
    (independence test). Reported in nats and normalized to [0,1]
    bits (÷ ln 2, a shared literal).

    Same contingency-table shape as q_chi2_independence: one
    map-side-combinable groupBy to (source × lang) cells, broadcast
    margins, and the DENSIFIED source×lang grid so q-side terms exist
    where a source never saw a language (p=0 → the q·ln(q/m) = q·ln 2
    term still contributes). Each ln term is quantized (sround 9 —
    the q_psi/q_mutual_information precedent) and DECIMAL-summed per
    source.
    """
    d = load(spark, sf_dir, "documents").filter(
        F.col("lang").isNotNull() & F.col("source").isNotNull()
    )
    cells = d.groupBy("source", "lang").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    src_t = cells.groupBy("source").agg(
        F.sum("n").cast("bigint").alias("n_src")
    )
    lang_t = cells.groupBy("lang").agg(
        F.sum("n").cast("bigint").alias("n_lang")
    )
    tot = cells.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_tot")
    )
    grid = (
        src_t.crossJoin(F.broadcast(lang_t))
        .join(cells, ["source", "lang"], "left")
        .crossJoin(F.broadcast(tot))
        .select(
            "source", "n_src",
            F.coalesce("n", F.lit(0)).cast("bigint").alias("n"),
            "n_lang", "n_tot",
        )
    )
    p = F.col("n").cast("double") / F.col("n_src").cast("double")
    qq = F.col("n_lang").cast("double") / F.col("n_tot").cast("double")
    m = (p + qq) / 2.0
    t1 = F.when(F.col("n") > 0, sround(p * F.log(p / m), 9)).otherwise(
        F.lit(0.0)
    )
    t2 = sround(qq * F.log(qq / m), 9)  # q > 0 on the grid by build
    per_src = grid.select(
        "source", "n_src",
        t1.cast(D28_9).alias("t1"),
        t2.cast(D28_9).alias("t2"),
    ).groupBy("source").agg(
        F.max("n_src").alias("n_docs"),
        F.sum("t1").cast("double").alias("kl_p"),
        F.sum("t2").cast("double").alias("kl_q"),
    )
    jsd = (F.col("kl_p") + F.col("kl_q")) / 2.0
    return per_src.select(
        "source", "n_docs",
        sround(jsd, 9).alias("jsd_nats"),
        sround(jsd / _LN2, 9).alias("jsd_bits"),
    ).orderBy("source")


_P_SQL = "(CAST(n AS DOUBLE) / CAST(n_src AS DOUBLE))"
_Q_SQL = "(CAST(n_lang AS DOUBLE) / CAST(n_tot AS DOUBLE))"
_M_SQL = f"(({_P_SQL} + {_Q_SQL}) / 2.0)"

ORACLE_JENSEN_SHANNON = f"""
WITH d AS (
  SELECT source, lang FROM documents
  WHERE lang IS NOT NULL AND source IS NOT NULL
), cells AS (
  SELECT source, lang, CAST(COUNT(*) AS BIGINT) AS n
  FROM d GROUP BY 1, 2
), src_t AS (
  SELECT source, CAST(SUM(n) AS BIGINT) AS n_src FROM cells GROUP BY 1
), lang_t AS (
  SELECT lang, CAST(SUM(n) AS BIGINT) AS n_lang FROM cells GROUP BY 1
), tot AS (
  SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_tot FROM cells
), grid AS (
  SELECT src_t.source, n_src,
         CAST(COALESCE(cells.n, 0) AS BIGINT) AS n, n_lang, n_tot
  FROM src_t CROSS JOIN lang_t
  LEFT JOIN cells
    ON cells.source = src_t.source AND cells.lang = lang_t.lang
  CROSS JOIN tot
), per_src AS (
  SELECT source, MAX(n_src) AS n_docs,
    CAST(SUM(CAST(CASE WHEN n > 0 THEN {sround_sql(
        _P_SQL + " * ln(" + _P_SQL + " / " + _M_SQL + ")", 9)}
      ELSE 0.0 END AS {D28_9_SQL})) AS DOUBLE) AS kl_p,
    CAST(SUM(CAST({sround_sql(
        _Q_SQL + " * ln(" + _Q_SQL + " / " + _M_SQL + ")", 9)}
      AS {D28_9_SQL})) AS DOUBLE) AS kl_q
  FROM grid GROUP BY 1
)
SELECT source, n_docs,
       {sround_sql("(kl_p + kl_q) / 2.0", 9)} AS jsd_nats,
       {sround_sql("((kl_p + kl_q) / 2.0) / " + repr(_LN2), 9)}
         AS jsd_bits
FROM per_src
ORDER BY source
"""

QUERIES["q_jensen_shannon"] = q_jensen_shannon
ORACLES["q_jensen_shannon"] = ORACLE_JENSEN_SHANNON

# --------------------------------------------------------------------------
# Kruskal-Wallis H (events.value across ALL event types, histogram ranks)

def q_kruskal_wallis(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Kruskal-Wallis H test of events.value across ALL event types —
    the k-group extension of q_mann_whitney's two-cohort rank-sum
    (and the nonparametric twin of q_anova_f), with the standard tie
    correction.

    Ranks are HISTOGRAM ranks over the distinct-value spine
    (events.value lives on a 0.01 grid, so the spine is bounded by the
    value range, not row count — the q_mann_whitney argument): the
    average tie rank is before + (t+1)/2 from the cumulative spine
    window; per-group rank sums run in DECIMAL(38,6) (exact — .5-step
    ranks × integer counts); the tie term Σ(t³−t) is quantized per
    value and DECIMAL-summed. Per-group rows carry (n, mean_rank);
    the ``~~total~~`` row carries H, the tie-corrected H, and df.
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull() & F.col("event_type").isNotNull()
    )
    per_vt = e.groupBy(
        F.col("value").alias("v"), F.col("event_type").alias("grp")
    ).agg(F.count(F.lit(1)).cast("bigint").alias("c"))
    per_v = per_vt.groupBy("v").agg(
        F.sum("c").cast("bigint").alias("t")
    )
    wv = Window.orderBy("v").rowsBetween(Window.unboundedPreceding, -1)
    spine = per_v.select(
        "v", "t",
        F.coalesce(F.sum("t").over(wv), F.lit(0).cast("bigint"))
        .alias("before"),
    )
    avgrank = (F.col("before").cast("double")
               + (F.col("t").cast("double") + 1.0) / 2.0)
    ranked = per_vt.join(spine, "v").select(
        "grp", "c",
        (F.col("c").cast("double") * avgrank).cast(D38).alias("r_t"),
    )
    groups = ranked.groupBy("grp").agg(
        F.sum("c").cast("bigint").alias("n"),
        F.sum("r_t").cast("double").alias("r"),
    )
    td = F.col("t").cast("double")
    ties = spine.agg(
        F.coalesce(
            F.sum(sround(td * td * td - td, 6).cast(D38)),
            F.lit(0).cast(D38),
        ).cast("double").alias("tie")
    )
    per_g = groups.select(
        "grp", "n", "r",
        sround(
            (F.col("r") * F.col("r")) / F.col("n").cast("double"), 6
        ).cast(D38).alias("rr_t"),
    )
    tot = per_g.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_tot"),
        F.sum("rr_t").cast("double").alias("s_rr"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    ).crossJoin(F.broadcast(ties))
    nd = F.col("n_tot").cast("double")
    h = 12.0 / (nd * (nd + 1.0)) * F.col("s_rr") - 3.0 * (nd + 1.0)
    c_tie = 1.0 - F.col("tie") / (nd * nd * nd - nd)
    ok = (F.col("k") > 1) & (F.col("n_tot") > F.col("k"))
    total = tot.select(
        F.lit(TOTAL).alias("event_type"),
        F.col("n_tot").alias("n"),
        F.lit(None).cast("double").alias("mean_rank"),
        F.when(ok, sround(h, 9)).alias("h_stat"),
        F.when(ok & (c_tie > 0.0), sround(h / c_tie, 9)).alias("h_adj"),
        F.when(F.col("k") > 1, F.col("k") - 1).cast("bigint").alias("df"),
    )
    per_out = per_g.select(
        F.col("grp").alias("event_type"), "n",
        sround(F.col("r") / F.col("n").cast("double"), 9)
        .alias("mean_rank"),
        F.lit(None).cast("double").alias("h_stat"),
        F.lit(None).cast("double").alias("h_adj"),
        F.lit(None).cast("bigint").alias("df"),
    )
    return per_out.unionByName(total).orderBy("event_type")


_KW_H_SQL = (
    "(12.0 / (CAST(n_tot AS DOUBLE) * (CAST(n_tot AS DOUBLE) + 1.0))"
    " * s_rr - 3.0 * (CAST(n_tot AS DOUBLE) + 1.0))"
)
_KW_CTIE_SQL = (
    "(1.0 - tie / (CAST(n_tot AS DOUBLE) * CAST(n_tot AS DOUBLE)"
    " * CAST(n_tot AS DOUBLE) - CAST(n_tot AS DOUBLE)))"
)

ORACLE_KRUSKAL_WALLIS = f"""
WITH e AS (
  SELECT value AS v, event_type AS grp FROM events
  WHERE value IS NOT NULL AND event_type IS NOT NULL
), per_vt AS (
  SELECT v, grp, CAST(COUNT(*) AS BIGINT) AS c FROM e GROUP BY 1, 2
), per_v AS (
  SELECT v, CAST(SUM(c) AS BIGINT) AS t FROM per_vt GROUP BY 1
), spine AS (
  SELECT v, t,
         CAST(COALESCE(SUM(t) OVER (ORDER BY v
           ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
           AS BIGINT) AS before
  FROM per_v
), ranked AS (
  SELECT grp, c,
    CAST(CAST(c AS DOUBLE) * (CAST(before AS DOUBLE)
         + (CAST(t AS DOUBLE) + 1.0) / 2.0) AS {D38_SQL}) AS r_t
  FROM per_vt JOIN spine USING (v)
), groups AS (
  SELECT grp, CAST(SUM(c) AS BIGINT) AS n,
         CAST(SUM(r_t) AS DOUBLE) AS r
  FROM ranked GROUP BY 1
), ties AS (
  SELECT CAST(COALESCE(SUM(CAST({sround_sql(
      "CAST(t AS DOUBLE) * CAST(t AS DOUBLE) * CAST(t AS DOUBLE)"
      " - CAST(t AS DOUBLE)", 6)} AS {D38_SQL})), 0) AS DOUBLE) AS tie
  FROM spine
), per_g AS (
  SELECT grp, n, r,
    CAST({sround_sql("(r * r) / CAST(n AS DOUBLE)", 6)}
         AS {D38_SQL}) AS rr_t
  FROM groups
), tot AS (
  SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_tot,
         CAST(SUM(rr_t) AS DOUBLE) AS s_rr,
         CAST(COUNT(*) AS BIGINT) AS k, MAX(tie) AS tie
  FROM per_g CROSS JOIN ties
)
SELECT grp AS event_type, n,
       {sround_sql("r / CAST(n AS DOUBLE)", 9)} AS mean_rank,
       CAST(NULL AS DOUBLE) AS h_stat, CAST(NULL AS DOUBLE) AS h_adj,
       CAST(NULL AS BIGINT) AS df
FROM per_g
UNION ALL
SELECT '{TOTAL}', n_tot, CAST(NULL AS DOUBLE),
       CASE WHEN k > 1 AND n_tot > k
       THEN {sround_sql(_KW_H_SQL, 9)} END,
       CASE WHEN k > 1 AND n_tot > k AND {_KW_CTIE_SQL} > 0.0
       THEN {sround_sql(_KW_H_SQL + " / " + _KW_CTIE_SQL, 9)} END,
       CASE WHEN k > 1 THEN CAST(k - 1 AS BIGINT) END
FROM tot
ORDER BY event_type
"""

QUERIES["q_kruskal_wallis"] = q_kruskal_wallis
ORACLES["q_kruskal_wallis"] = ORACLE_KRUSKAL_WALLIS

# --------------------------------------------------------------------------
# permutation entropy (ordinal 3-patterns over each user's event values)

def q_permutation_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Permutation entropy of the event-value stream: each run of 3
    consecutive values on a user's timeline maps to its ordinal
    pattern (the trichotomy <,=,> of the three pairwise comparisons —
    27 codes, ties get their own patterns), and the entropy of the
    pattern distribution measures how "random" the series is — the
    complexity readout next to q_acf (linear memory) and
    q_entropy_rate (symbol streams).

    Two LEAD windows per user timeline ordered by the total
    (ts, event_id) key (the q_transitions contract — NULL ts/user/
    value rows are dropped first, so "consecutive" means consecutive
    non-NULL samples); pattern counting is one map-side-combinable
    groupBy over ≤27 cells. Entropy terms are quantized (sround 9)
    and DECIMAL-summed; the normalized entropy divides by ln(k
    observed patterns) — both engine-identical. Per-pattern rows
    carry counts/shares; the ``-1`` row carries the entropies.
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("ts").isNotNull() & F.col("user_id").isNotNull()
        & F.col("value").isNotNull()
    )
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    tri = e.select(
        F.col("value").alias("v1"),
        F.lead("value", 1).over(w).alias("v2"),
        F.lead("value", 2).over(w).alias("v3"),
    ).filter(F.col("v2").isNotNull() & F.col("v3").isNotNull())

    def _cmp3(a, b):
        return (
            F.when(F.col(a) < F.col(b), 0)
            .when(F.col(a) == F.col(b), 1)
            .otherwise(2)
        )

    pat = tri.select(
        (_cmp3("v1", "v2") * 9 + _cmp3("v1", "v3") * 3
         + _cmp3("v2", "v3")).cast("bigint").alias("pattern")
    )
    counts = pat.groupBy("pattern").agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    tot = counts.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("n_tot"),
        F.count(F.lit(1)).cast("bigint").alias("k"),
    )
    withp = counts.crossJoin(F.broadcast(tot)).select(
        "pattern", "n", "n_tot", "k",
        (F.col("n").cast("double") / F.col("n_tot").cast("double"))
        .alias("p"),
    )
    ent = withp.select(
        "n_tot", "k",
        sround(F.col("p") * F.log(F.col("p")), 9).cast(D28_9).alias("t"),
    ).groupBy("n_tot", "k").agg(
        (-F.sum("t").cast("double")).alias("h")
    )
    total = ent.select(
        F.lit(-1).cast("bigint").alias("pattern"),
        F.col("n_tot").alias("n"),
        F.lit(None).cast("double").alias("share"),
        sround(F.col("h") + 0.0, 9).alias("entropy"),
        F.when(
            F.col("k") > 1,
            sround(F.col("h") / F.log(F.col("k").cast("double")), 9),
        ).alias("norm_entropy"),
    )
    per = withp.select(
        "pattern", "n", sround(F.col("p"), 9).alias("share"),
        F.lit(None).cast("double").alias("entropy"),
        F.lit(None).cast("double").alias("norm_entropy"),
    )
    out = per.unionByName(total).orderBy("pattern")
    # empty input: counts is empty so no total row would survive the
    # groupBy — re-attach a degenerate total from the scalar aggregate
    empty_total = tot.filter(F.col("n_tot") == 0).select(
        F.lit(-1).cast("bigint").alias("pattern"),
        F.col("n_tot").alias("n"),
        F.lit(None).cast("double").alias("share"),
        F.lit(None).cast("double").alias("entropy"),
        F.lit(None).cast("double").alias("norm_entropy"),
    )
    return out.unionByName(empty_total).orderBy("pattern")


_PE_CMP = (
    "(CASE WHEN {a} < {b} THEN 0 WHEN {a} = {b} THEN 1 ELSE 2 END)"
)

ORACLE_PERMUTATION_ENTROPY = f"""
WITH e AS (
  SELECT user_id, ts, event_id, value FROM events
  WHERE ts IS NOT NULL AND user_id IS NOT NULL AND value IS NOT NULL
), tri AS (
  SELECT value AS v1,
         LEAD(value, 1) OVER w AS v2,
         LEAD(value, 2) OVER w AS v3
  FROM e WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), pat AS (
  SELECT CAST({_PE_CMP.format(a="v1", b="v2")} * 9
             + {_PE_CMP.format(a="v1", b="v3")} * 3
             + {_PE_CMP.format(a="v2", b="v3")} AS BIGINT) AS pattern
  FROM tri WHERE v2 IS NOT NULL AND v3 IS NOT NULL
), counts AS (
  SELECT pattern, CAST(COUNT(*) AS BIGINT) AS n FROM pat GROUP BY 1
), tot AS (
  SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS n_tot,
         CAST(COUNT(*) AS BIGINT) AS k
  FROM counts
), withp AS (
  SELECT pattern, n, n_tot, k,
         CAST(n AS DOUBLE) / CAST(n_tot AS DOUBLE) AS p
  FROM counts CROSS JOIN tot
), ent AS (
  SELECT n_tot, k,
    -CAST(SUM(CAST({sround_sql("p * ln(p)", 9)} AS {D28_9_SQL}))
          AS DOUBLE) AS h
  FROM withp GROUP BY 1, 2
)
SELECT pattern, n, {sround_sql("p", 9)} AS share,
       CAST(NULL AS DOUBLE) AS entropy,
       CAST(NULL AS DOUBLE) AS norm_entropy
FROM withp
UNION ALL
SELECT CAST(-1 AS BIGINT), n_tot, CAST(NULL AS DOUBLE),
       {sround_sql("h + 0.0", 9)},
       CASE WHEN k > 1
       THEN {sround_sql("h / ln(CAST(k AS DOUBLE))", 9)} END
FROM ent
UNION ALL
SELECT CAST(-1 AS BIGINT), n_tot, CAST(NULL AS DOUBLE),
       CAST(NULL AS DOUBLE), CAST(NULL AS DOUBLE)
FROM tot WHERE n_tot = 0
ORDER BY pattern
"""

QUERIES["q_permutation_entropy"] = q_permutation_entropy
ORACLES["q_permutation_entropy"] = ORACLE_PERMUTATION_ENTROPY

# --------------------------------------------------------------------------
# Brier score + Murphy decomposition (the q_ece score/outcome frame)

def q_brier_decomposition(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Brier score with the (binned) Murphy decomposition —
    reliability − resolution + uncertainty — over the q_ece
    score/outcome frame: the proper-scoring-rule companion to ECE
    (reliability ≈ calibration error², resolution ≈ discrimination).

    The raw Brier is the decimal mean of the 6-dp-quantized per-row
    (score − y)² (sround 12 terms); the decomposition aggregates the
    same CAL_BINS histogram as q_ece (one map-side-combinable groupBy)
    with per-bin terms quantized (sround 9) and DECIMAL-summed. The
    binned decomposition identity holds only up to within-bin variance,
    so both sides are reported, never reconciled.
    """
    from .evalmetrics import CAL_BINS, _scored

    s = _scored(spark, sf_dir)
    y = F.when(F.col("pos"), 1.0).otherwise(0.0)
    raw = s.select(
        sround((F.col("score") - y) * (F.col("score") - y), 12)
        .cast("decimal(30,12)").alias("sq")
    ).agg(
        F.count(F.lit(1)).cast("bigint").alias("n_total"),
        F.sum("sq").cast("double").alias("sq_sum"),
    )
    b = F.least(
        F.floor(F.col("score") * CAL_BINS), F.lit(CAL_BINS - 1)
    ).cast("bigint")
    bins = s.groupBy(b.alias("bin")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n"),
        F.sum(F.when(F.col("pos"), 1).otherwise(0)).cast("bigint")
        .alias("n_pos"),
        F.sum(F.col("score").cast("decimal(28,6)")).cast("double")
        .alias("sum_s"),
    )
    tot = bins.agg(
        F.coalesce(F.sum("n"), F.lit(0)).cast("bigint").alias("nn"),
        F.coalesce(F.sum("n_pos"), F.lit(0)).cast("bigint")
        .alias("nn_pos"),
    )
    nd = F.col("n").cast("double")
    obar_b = F.col("n_pos").cast("double") / nd
    sbar_b = F.col("sum_s") / nd
    obar = F.col("nn_pos").cast("double") / F.col("nn").cast("double")
    terms = bins.crossJoin(F.broadcast(tot)).select(
        sround(nd * (sbar_b - obar_b) * (sbar_b - obar_b), 9)
        .cast(D28_9).alias("rel_t"),
        sround(nd * (obar_b - obar) * (obar_b - obar), 9)
        .cast(D28_9).alias("res_t"),
    ).agg(
        F.sum("rel_t").cast("double").alias("rel_s"),
        F.sum("res_t").cast("double").alias("res_s"),
    )
    out = raw.crossJoin(F.broadcast(terms)).crossJoin(F.broadcast(tot))
    ntd = F.col("n_total").cast("double")
    ob = F.col("nn_pos").cast("double") / F.col("nn").cast("double")
    ok = F.col("n_total") > 0
    return out.select(
        "n_total",
        F.when(ok, sround(F.col("sq_sum") / ntd, 9)).alias("brier"),
        F.when(ok, sround(F.col("rel_s") / ntd, 9)).alias("reliability"),
        F.when(ok, sround(F.col("res_s") / ntd, 9)).alias("resolution"),
        F.when(ok, sround(ob * (1.0 - ob), 9)).alias("uncertainty"),
    )


def _oracle_brier() -> str:
    from .evalmetrics import _SCORED_SQL, CAL_BINS

    obar_b = "(CAST(n_pos AS DOUBLE) / CAST(n AS DOUBLE))"
    sbar_b = "(sum_s / CAST(n AS DOUBLE))"
    obar = "(CAST(nn_pos AS DOUBLE) / CAST(nn AS DOUBLE))"
    return f"""
WITH s AS ({_SCORED_SQL}),
raw AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_total,
         CAST(SUM(CAST({sround_sql(
             "(score - CASE WHEN pos THEN 1.0 ELSE 0.0 END)"
             " * (score - CASE WHEN pos THEN 1.0 ELSE 0.0 END)", 12)}
           AS DECIMAL(30,12))) AS DOUBLE) AS sq_sum
  FROM s
), bins AS (
  SELECT LEAST(CAST(floor(score * {CAL_BINS}) AS BIGINT),
               {CAL_BINS - 1}) AS bin,
         CAST(COUNT(*) AS BIGINT) AS n,
         CAST(SUM(CASE WHEN pos THEN 1 ELSE 0 END) AS BIGINT) AS n_pos,
         CAST(SUM(CAST(score AS DECIMAL(28,6))) AS DOUBLE) AS sum_s
  FROM s GROUP BY 1
), tot AS (
  SELECT CAST(COALESCE(SUM(n), 0) AS BIGINT) AS nn,
         CAST(COALESCE(SUM(n_pos), 0) AS BIGINT) AS nn_pos
  FROM bins
), terms AS (
  SELECT
    CAST(SUM(CAST({sround_sql(
        "CAST(n AS DOUBLE) * (" + sbar_b + " - " + obar_b + ")"
        " * (" + sbar_b + " - " + obar_b + ")", 9)}
      AS {D28_9_SQL})) AS DOUBLE) AS rel_s,
    CAST(SUM(CAST({sround_sql(
        "CAST(n AS DOUBLE) * (" + obar_b + " - " + obar + ")"
        " * (" + obar_b + " - " + obar + ")", 9)}
      AS {D28_9_SQL})) AS DOUBLE) AS res_s
  FROM bins CROSS JOIN tot
)
SELECT n_total,
  CASE WHEN n_total > 0 THEN {sround_sql(
      "sq_sum / CAST(n_total AS DOUBLE)", 9)} END AS brier,
  CASE WHEN n_total > 0 THEN {sround_sql(
      "rel_s / CAST(n_total AS DOUBLE)", 9)} END AS reliability,
  CASE WHEN n_total > 0 THEN {sround_sql(
      "res_s / CAST(n_total AS DOUBLE)", 9)} END AS resolution,
  CASE WHEN n_total > 0 THEN {sround_sql(
      obar + " * (1.0 - " + obar + ")", 9)} END AS uncertainty
FROM raw CROSS JOIN terms CROSS JOIN tot
"""


QUERIES["q_brier_decomposition"] = q_brier_decomposition
ORACLES["q_brier_decomposition"] = _oracle_brier()
