"""Round-12 statistics wave: Ljung-Box portmanteau, Wald-Wolfowitz
runs test, two-sample Cramér-von Mises, and Durbin-Watson residual
serial correlation.

No reference analog (the reference is batch audio-file ingest,
``/root/reference/src/main.rs:118-140``; it computes no statistics) —
engine-capability surface for the time-series / experimentation layer
next to ``plans/stats2``, ``plans/nonparam``, and ``plans/events``
(q_acf / q_changepoint / q_seasonality).

Exactness discipline (CLAUDE.md): counts and count-products are exact
integers (DECIMAL(38,0)/HUGEINT where squares can pass 2^63); every
double aggregate is a DECIMAL sum of per-row terms quantized with
sround; ln/sqrt run on bit-identical inputs; divisions sit behind lazy
CASE guards.

Scale notes (100 TB design point):
- All four reduce the corpus with ONE map-side-combinable groupBy to a
  BOUNDED spine (observed-day sequence or the 0.01 value grid) before
  any window: the lag/lead/cumulative windows sort thousands of spine
  rows, never raw events (the q_kaplan_meier / q_mann_whitney
  argument; plan-audit ALLOW entries document each).
- Ljung-Box needs the 5 leads + one moment aggregate over the day
  spine; the heavy input scan is a single count groupBy.
- The runs test is one lag window over the day spine; the mean comes
  from the order-level decimal total, never a double re-sum.
- CvM shares q_mann_whitney's histogram-CDF shape: per-distinct-value
  cohort counts, two cumulative sums, quantized per-value terms.
- Durbin-Watson regresses the DECIMAL daily-revenue spine on the
  integer day number (day x decimal products stay exact), so residuals
  are identical IEEE doubles on both engines before the one lag
  window.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ._util import sround, sround_sql

DAY_US = 86_400_000_000

QUERIES: dict = {}
ORACLES: dict = {}

LB_LAGS = 5  # Ljung-Box portmanteau depth
CVM_A, CVM_B = "click", "purchase"  # q_mann_whitney's cohorts


# --------------------------------------------------------------------------
# Ljung-Box portmanteau test (is daily traffic white noise?)

def q_ljung_box(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ljung-Box Q over ACF lags 1..5 of the daily TOTAL event count —
    the "is there any serial structure at all" portmanteau next to
    q_acf's per-type lag readout (same observed-day-sequence
    convention: calendar gap days are absent, not zero-filled).

    Sums are exact: daily counts are integers, so sx / sxx / the five
    lagged cross-products are DECIMAL(38,0) sums (counts can pass
    2^26.5 per day at 100 TB, where a double product would silently
    round — the q_kendall_tau lesson); the mean/variance/r_k doubles
    are identical IEEE trees on both engines; the five r_k²/(n−k)
    terms are quantized (sround 12) and DECIMAL-summed so the 5-term
    reduction is order-independent. One row out: n_days, r1..r5, the
    Q statistic, dof.
    """
    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    day = F.floor(F.unix_micros("ts") / F.lit(DAY_US)).cast("bigint")
    daily = e.groupBy(day.alias("day")).agg(
        F.count(F.lit(1)).cast("bigint").alias("n")
    )
    nd0 = F.col("n").cast("decimal(38,0)")
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(nd0).alias("sx"),
        F.sum(nd0 * F.col("n")).alias("sxx"),
    )
    w = Window.orderBy("day")
    led = daily.select(
        "n",
        *[F.lead("n", k).over(w).alias(f"y{k}")
          for k in range(1, LB_LAGS + 1)],
    )
    pair = led.select(
        F.explode(F.array(*[
            F.struct(F.lit(k).alias("lag_k"),
                     F.col("n").alias("x"),
                     F.col(f"y{k}").alias("y"))
            for k in range(1, LB_LAGS + 1)
        ])).alias("p")
    ).select("p.lag_k", "p.x", "p.y").filter(F.col("y").isNotNull())
    xd0 = F.col("x").cast("decimal(38,0)")
    per_k = pair.groupBy("lag_k").agg(
        F.count(F.lit(1)).cast("bigint").alias("cnt"),
        F.sum(xd0).alias("sxk"),
        F.sum(F.col("y").cast("decimal(38,0)")).alias("syk"),
        F.sum(xd0 * F.col("y")).alias("sxyk"),
    )
    j = per_k.crossJoin(F.broadcast(tot))
    nd = F.col("n_days").cast("double")
    m = F.col("sx").cast("double") / nd
    s0 = F.col("sxx").cast("double") - F.col("sx").cast("double") * m
    ck = (
        F.col("sxyk").cast("double")
        - m * F.col("sxk").cast("double")
        - m * F.col("syk").cast("double")
        + F.col("cnt").cast("double") * m * m
    )
    rk = F.when(s0 > 0.0, ck / s0)
    kd = F.col("lag_k").cast("double")
    terms = j.select(
        "lag_k", "n_days", "sx", "sxx",
        rk.alias("rk"),
        F.when(
            s0 > 0.0, sround(ck / s0 * (ck / s0) / (nd - kd), 12)
        ).cast("decimal(38,12)").alias("term"),
    )
    agg = terms.groupBy("n_days", "sx", "sxx").agg(
        *[F.max(F.when(F.col("lag_k") == k, sround(F.col("rk"), 9)))
          .alias(f"r{k}") for k in range(1, LB_LAGS + 1)],
        F.sum("term").alias("sterm"),
        F.count(F.lit(1)).cast("bigint").alias("n_lags"),
    )
    nd2 = F.col("n_days").cast("double")
    return agg.select(
        "n_days",
        *[f"r{k}" for k in range(1, LB_LAGS + 1)],
        F.when(
            (F.col("n_days") > LB_LAGS) & F.col("sterm").isNotNull(),
            sround(nd2 * (nd2 + 2.0)
                   * F.col("sterm").cast("double"), 9),
        ).alias("q_lb"),
        F.lit(LB_LAGS).cast("bigint").alias("dof"),
    )


_LB_LEADS = ",\n         ".join(
    f"lead(n, {k}) OVER w AS y{k}" for k in range(1, LB_LAGS + 1)
)
_LB_PAIRS = "\n  UNION ALL\n".join(
    f"  SELECT {k} AS lag_k, n AS x, y{k} AS y FROM led"
    f" WHERE y{k} IS NOT NULL"
    for k in range(1, LB_LAGS + 1)
)
_LB_RK = ("((CAST(sxyk AS DOUBLE) - m * CAST(sxk AS DOUBLE)"
          " - m * CAST(syk AS DOUBLE)"
          " + CAST(cnt AS DOUBLE) * m * m) / s0)")
_LB_R_COLS = ",\n       ".join(
    f"MAX(CASE WHEN lag_k = {k} THEN rk9 END) AS r{k}"
    for k in range(1, LB_LAGS + 1)
)

ORACLE_LJUNG_BOX = f"""
WITH daily AS (
  SELECT CAST(floor(epoch_us(ts) / {DAY_US}) AS BIGINT) AS day,
         CAST(COUNT(*) AS BIGINT) AS n
  FROM events WHERE ts IS NOT NULL GROUP BY 1
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         SUM(CAST(n AS HUGEINT)) AS sx,
         SUM(CAST(n AS HUGEINT) * n) AS sxx
  FROM daily
), led AS (
  SELECT n,
         {_LB_LEADS}
  FROM daily
  WINDOW w AS (ORDER BY day)
), pairs AS (
{_LB_PAIRS}
), per_k AS (
  SELECT lag_k, CAST(COUNT(*) AS BIGINT) AS cnt,
         SUM(CAST(x AS HUGEINT)) AS sxk,
         SUM(CAST(y AS HUGEINT)) AS syk,
         SUM(CAST(x AS HUGEINT) * y) AS sxyk
  FROM pairs GROUP BY 1
), j AS (
  SELECT per_k.*, tot.n_days, tot.sx, tot.sxx,
         CAST(tot.sx AS DOUBLE) / CAST(tot.n_days AS DOUBLE) AS m,
         CAST(tot.sxx AS DOUBLE)
           - CAST(tot.sx AS DOUBLE)
             * (CAST(tot.sx AS DOUBLE)
                / CAST(tot.n_days AS DOUBLE)) AS s0
  FROM per_k CROSS JOIN tot
), terms AS (
  SELECT lag_k, n_days, sx, sxx,
         CASE WHEN s0 > 0.0 THEN {sround_sql(_LB_RK, 9)} END AS rk9,
         CASE WHEN s0 > 0.0 THEN CAST({sround_sql(
             _LB_RK + " * " + _LB_RK
             + " / (CAST(n_days AS DOUBLE) - CAST(lag_k AS DOUBLE))",
             12)} AS DECIMAL(38,12)) END AS term
  FROM j
), agg AS (
  SELECT n_days,
       {_LB_R_COLS},
       SUM(term) AS sterm
  FROM terms GROUP BY n_days, sx, sxx
)
SELECT n_days,
       {", ".join(f"r{k}" for k in range(1, LB_LAGS + 1))},
       CASE WHEN n_days > {LB_LAGS} AND sterm IS NOT NULL
       THEN {sround_sql(
           "CAST(n_days AS DOUBLE) * (CAST(n_days AS DOUBLE) + 2.0)"
           " * CAST(sterm AS DOUBLE)", 9)} END AS q_lb,
       CAST({LB_LAGS} AS BIGINT) AS dof
FROM agg
"""

QUERIES["q_ljung_box"] = q_ljung_box
ORACLES["q_ljung_box"] = ORACLE_LJUNG_BOX


# --------------------------------------------------------------------------
# Wald-Wolfowitz runs test (daily revenue above/below its mean)

def q_runs_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runs test for randomness of daily order revenue around its mean:
    too FEW runs of above/below-mean days means trending/clustered
    revenue, too MANY means oscillation — the nonparametric "is the
    series memoryless" check next to q_acf (which measures the same
    thing parametrically at fixed lags).

    The mean is the order-level DECIMAL total over the day count —
    never a double re-sum of per-day doubles — so the above/below flag
    compares identical IEEE doubles on both engines. Above = rev > m;
    equal-to-mean days count as below (documented convention). Runs
    are counted with one lag window over the observed-day spine
    (bounded by the horizon); z uses the standard normal approximation
    mu = 2·n1·n2/N + 1, var = 2·n1·n2·(2·n1·n2 − N)/(N²·(N−1)),
    guarded var > 0.
    """
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull() & F.col("o_totalprice").isNotNull()
    )
    day = F.expr(f"unix_micros(o_orderdate) div {DAY_US}")
    daily = o.groupBy(day.alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("rev")
    )
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum("rev").alias("tot_rev"),
    )
    m = F.col("tot_rev").cast("double") / F.col("n_days").cast("double")
    signed = daily.crossJoin(F.broadcast(tot)).select(
        "day", "n_days",
        F.when(F.col("rev").cast("double") > m, F.lit(1))
        .otherwise(F.lit(0)).alias("s"),
    )
    w = Window.orderBy("day")
    runs = signed.select(
        "n_days", "s",
        F.when(
            F.lag("s").over(w).isNull()
            | (F.col("s") != F.lag("s").over(w)),
            F.lit(1),
        ).otherwise(F.lit(0)).alias("brk"),
    )
    agg = runs.groupBy("n_days").agg(
        F.sum("s").cast("bigint").alias("n_above"),
        F.sum("brk").cast("bigint").alias("n_runs"),
    )
    n1 = F.col("n_above").cast("double")
    n2 = (F.col("n_days") - F.col("n_above")).cast("double")
    nd = F.col("n_days").cast("double")
    mu = 2.0 * n1 * n2 / nd + 1.0
    var = (2.0 * n1 * n2 * (2.0 * n1 * n2 - nd)
           / (nd * nd * (nd - 1.0)))
    return agg.select(
        "n_days",
        "n_above",
        (F.col("n_days") - F.col("n_above")).cast("bigint")
        .alias("n_below"),
        "n_runs",
        F.when(
            (F.col("n_days") > 1) & (var > 0.0),
            sround((F.col("n_runs").cast("double") - mu)
                   / F.sqrt(var), 9),
        ).alias("z_runs"),
    )


_RT_MU = "(2.0 * n1 * n2 / nd + 1.0)"
_RT_VAR = ("(2.0 * n1 * n2 * (2.0 * n1 * n2 - nd)"
           " / (nd * nd * (nd - 1.0)))")

ORACLE_RUNS_TEST = f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // {DAY_US} AS day,
         SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev
  FROM orders
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
  GROUP BY 1
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days, SUM(rev) AS tot_rev
  FROM daily
), signed AS (
  SELECT day, n_days,
         CASE WHEN CAST(rev AS DOUBLE)
                   > CAST(tot_rev AS DOUBLE)
                     / CAST(n_days AS DOUBLE)
              THEN 1 ELSE 0 END AS s
  FROM daily CROSS JOIN tot
), runs AS (
  SELECT n_days, s,
         CASE WHEN lag(s) OVER w IS NULL OR s <> lag(s) OVER w
              THEN 1 ELSE 0 END AS brk
  FROM signed
  WINDOW w AS (ORDER BY day)
), agg AS (
  SELECT n_days, CAST(SUM(s) AS BIGINT) AS n_above,
         CAST(SUM(brk) AS BIGINT) AS n_runs
  FROM runs GROUP BY 1
), v AS (
  SELECT n_days, n_above, n_days - n_above AS n_below, n_runs,
         CAST(n_above AS DOUBLE) AS n1,
         CAST(n_days - n_above AS DOUBLE) AS n2,
         CAST(n_days AS DOUBLE) AS nd
  FROM agg
)
SELECT n_days, n_above, CAST(n_below AS BIGINT) AS n_below, n_runs,
       CASE WHEN n_days > 1 AND {_RT_VAR} > 0.0
       THEN {sround_sql(
           "(CAST(n_runs AS DOUBLE) - " + _RT_MU + ")"
           " / sqrt(" + _RT_VAR + ")", 9)} END AS z_runs
FROM v
"""

QUERIES["q_runs_test"] = q_runs_test
ORACLES["q_runs_test"] = ORACLE_RUNS_TEST


# --------------------------------------------------------------------------
# Two-sample Cramér-von Mises (click vs purchase value distributions)

def q_cvm_test(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Two-sample Cramér-von Mises T between the 'click' and 'purchase'
    event-value distributions — the whole-CDF distance next to
    q_mann_whitney (location shift) and q_ks_drift (max CDF gap):
    T = n·m/N² · Σ_pooled t_i·(F(v_i) − G(v_i))², summed over the
    pooled observations with tie weight t_i.

    Shares q_mann_whitney's histogram shape: events.value lives on a
    0.01 grid, so the spine is value-range-bounded; per-value cohort
    counts come from ONE map-side-combinable groupBy; F and G are
    cumulative-count windows over the spine divided by exact integer
    totals (identical IEEE divisions); each value's term is quantized
    (sround 12) and DECIMAL-summed so the spine reduction is
    order-independent.
    """
    e = load(spark, sf_dir, "events").filter(
        F.col("value").isNotNull()
        & F.col("event_type").isin(CVM_A, CVM_B)
    )
    per_v = e.groupBy(F.col("value").alias("v")).agg(
        F.sum(F.when(F.col("event_type") == CVM_A, 1).otherwise(0))
        .cast("bigint").alias("c1"),
        F.sum(F.when(F.col("event_type") == CVM_B, 1).otherwise(0))
        .cast("bigint").alias("c2"),
    )
    tot = per_v.agg(
        F.sum("c1").cast("bigint").alias("n1"),
        F.sum("c2").cast("bigint").alias("n2"),
    )
    wv = (Window.orderBy("v")
          .rowsBetween(Window.unboundedPreceding, Window.currentRow))
    spine = per_v.select(
        "v", "c1", "c2",
        F.sum("c1").over(wv).cast("bigint").alias("cum1"),
        F.sum("c2").over(wv).cast("bigint").alias("cum2"),
    )
    j = spine.crossJoin(F.broadcast(tot))
    d = (F.col("cum1").cast("double") / F.col("n1").cast("double")
         - F.col("cum2").cast("double") / F.col("n2").cast("double"))
    td = (F.col("c1") + F.col("c2")).cast("double")
    terms = j.select(
        "n1", "n2",
        sround(td * d * d, 12).cast("decimal(38,12)").alias("term"),
    )
    agg = terms.groupBy("n1", "n2").agg(F.sum("term").alias("u"))
    n1d = F.col("n1").cast("double")
    n2d = F.col("n2").cast("double")
    nd = (F.col("n1") + F.col("n2")).cast("double")
    return agg.select(
        F.col("n1").alias("n_x"),
        F.col("n2").alias("n_y"),
        F.when(
            (F.col("n1") > 0) & (F.col("n2") > 0),
            sround(F.col("u").cast("double") * n1d * n2d / (nd * nd),
                   9),
        ).alias("t_cvm"),
    )


ORACLE_CVM_TEST = f"""
WITH per_v AS (
  SELECT value AS v,
         CAST(SUM(CASE WHEN event_type = '{CVM_A}' THEN 1 ELSE 0 END)
              AS BIGINT) AS c1,
         CAST(SUM(CASE WHEN event_type = '{CVM_B}' THEN 1 ELSE 0 END)
              AS BIGINT) AS c2
  FROM events
  WHERE value IS NOT NULL AND event_type IN ('{CVM_A}', '{CVM_B}')
  GROUP BY 1
), tot AS (
  SELECT CAST(SUM(c1) AS BIGINT) AS n1, CAST(SUM(c2) AS BIGINT) AS n2
  FROM per_v
), spine AS (
  SELECT v, c1, c2,
         CAST(SUM(c1) OVER w AS BIGINT) AS cum1,
         CAST(SUM(c2) OVER w AS BIGINT) AS cum2
  FROM per_v
  WINDOW w AS (ORDER BY v ROWS BETWEEN UNBOUNDED PRECEDING
               AND CURRENT ROW)
), terms AS (
  SELECT n1, n2,
         CAST({sround_sql(
             "CAST(c1 + c2 AS DOUBLE)"
             " * (CAST(cum1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
             "    - CAST(cum2 AS DOUBLE) / CAST(n2 AS DOUBLE))"
             " * (CAST(cum1 AS DOUBLE) / CAST(n1 AS DOUBLE)"
             "    - CAST(cum2 AS DOUBLE) / CAST(n2 AS DOUBLE))",
             12)} AS DECIMAL(38,12)) AS term
  FROM spine CROSS JOIN tot
), agg AS (
  SELECT n1, n2, SUM(term) AS u FROM terms GROUP BY 1, 2
)
SELECT n1 AS n_x, n2 AS n_y,
       CASE WHEN n1 > 0 AND n2 > 0
       THEN {sround_sql(
           "CAST(u AS DOUBLE) * CAST(n1 AS DOUBLE)"
           " * CAST(n2 AS DOUBLE)"
           " / (CAST(n1 + n2 AS DOUBLE) * CAST(n1 + n2 AS DOUBLE))",
           9)} END AS t_cvm
FROM agg
"""

QUERIES["q_cvm_test"] = q_cvm_test
ORACLES["q_cvm_test"] = ORACLE_CVM_TEST


# --------------------------------------------------------------------------
# Durbin-Watson residual serial correlation (daily revenue ~ day)

def q_durbin_watson(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Durbin-Watson statistic of the OLS residuals from regressing
    daily order revenue on the day number — "after removing the linear
    trend, are the errors serially correlated?" (DW ≈ 2 means no;
    → 0 positive, → 4 negative autocorrelation). The residual-level
    companion to q_linreg (same closed-form fit) and q_acf.

    Exactness: the daily revenue spine stays DECIMAL; the regression
    moments are day×decimal products (exact — day is a small integer),
    so slope/intercept/residuals are identical IEEE trees on both
    engines. The (e_t − e_{t−1})² and e_t² terms are quantized
    (sround 6 — residuals are O(1e8), so 6 dp is far below double's
    granularity there and identical on both engines) and
    DECIMAL-summed; one lag window over the bounded day spine.
    """
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_orderdate").isNotNull() & F.col("o_totalprice").isNotNull()
    )
    day = F.expr(f"unix_micros(o_orderdate) div {DAY_US}")
    daily = o.groupBy(day.alias("day")).agg(
        F.sum(F.col("o_totalprice").cast("decimal(28,6)")).alias("rev")
    )
    dday = F.col("day").cast("decimal(18,0)")
    tot = daily.agg(
        F.count(F.lit(1)).cast("bigint").alias("n_days"),
        F.sum(dday).alias("sx"),
        F.sum(dday * dday).alias("sxx"),
        F.sum("rev").alias("sy"),
        F.sum(dday * F.col("rev")).alias("sxy"),
    )
    nd = F.col("n_days").cast("double")
    sx = F.col("sx").cast("double")
    sxx = F.col("sxx").cast("double")
    sy = F.col("sy").cast("double")
    sxy = F.col("sxy").cast("double")
    den = nd * sxx - sx * sx
    b = (nd * sxy - sx * sy) / den
    a = (sy - b * sx) / nd
    resid = daily.crossJoin(F.broadcast(tot)).select(
        "day", "n_days",
        sround(b, 9).alias("slope"),
        sround(a, 9).alias("intercept"),
        F.when(
            den > 0.0,
            F.col("rev").cast("double")
            - (a + b * F.col("day").cast("double")),
        ).alias("e"),
    )
    w = Window.orderBy("day")
    lagged = resid.select(
        "n_days", "slope", "intercept", "e",
        F.lag("e").over(w).alias("ep"),
    )
    terms = lagged.select(
        "n_days", "slope", "intercept",
        F.when(
            F.col("ep").isNotNull(),
            sround((F.col("e") - F.col("ep"))
                   * (F.col("e") - F.col("ep")), 6),
        ).cast("decimal(38,6)").alias("dnum"),
        sround(F.col("e") * F.col("e"), 6).cast("decimal(38,6)")
        .alias("dden"),
    )
    agg = terms.groupBy("n_days", "slope", "intercept").agg(
        F.sum("dnum").alias("num"),
        F.sum("dden").alias("den"),
    )
    return agg.select(
        "n_days", "slope", "intercept",
        F.when(
            F.col("den").isNotNull() & (F.col("den") > 0)
            & F.col("num").isNotNull(),
            sround(F.col("num").cast("double")
                   / F.col("den").cast("double"), 9),
        ).alias("dw"),
    )


_DW_B = "((nd * sxy - sx * sy) / (nd * sxx - sx * sx))"
_DW_A = f"((sy - {_DW_B} * sx) / nd)"

ORACLE_DURBIN_WATSON = f"""
WITH daily AS (
  SELECT epoch_us(o_orderdate) // {DAY_US} AS day,
         SUM(CAST(o_totalprice AS DECIMAL(28,6))) AS rev
  FROM orders
  WHERE o_orderdate IS NOT NULL AND o_totalprice IS NOT NULL
  GROUP BY 1
), tot AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS n_days,
         CAST(SUM(CAST(day AS DECIMAL(18,0))) AS DOUBLE) AS sx,
         CAST(SUM(CAST(day AS DECIMAL(18,0))
                  * CAST(day AS DECIMAL(18,0))) AS DOUBLE) AS sxx,
         CAST(SUM(rev) AS DOUBLE) AS sy,
         CAST(SUM(CAST(day AS DECIMAL(18,0)) * rev) AS DOUBLE) AS sxy,
         CAST(COUNT(*) AS DOUBLE) AS nd
  FROM daily
), resid AS (
  SELECT day, n_days,
         {sround_sql(_DW_B, 9)} AS slope,
         {sround_sql(_DW_A, 9)} AS intercept,
         CASE WHEN nd * sxx - sx * sx > 0.0
         THEN CAST(rev AS DOUBLE)
              - ({_DW_A} + {_DW_B} * CAST(day AS DOUBLE)) END AS e
  FROM daily CROSS JOIN tot
), lagged AS (
  SELECT n_days, slope, intercept, e, lag(e) OVER w AS ep
  FROM resid
  WINDOW w AS (ORDER BY day)
), terms AS (
  SELECT n_days, slope, intercept,
         CASE WHEN ep IS NOT NULL
         THEN CAST({sround_sql("(e - ep) * (e - ep)", 6)}
                   AS DECIMAL(38,6)) END AS dnum,
         CAST({sround_sql("e * e", 6)} AS DECIMAL(38,6)) AS dden
  FROM lagged
), agg AS (
  SELECT n_days, slope, intercept,
         SUM(dnum) AS num, SUM(dden) AS den
  FROM terms GROUP BY 1, 2, 3
)
SELECT n_days, slope, intercept,
       CASE WHEN den IS NOT NULL AND den > 0 AND num IS NOT NULL
       THEN {sround_sql(
           "CAST(num AS DOUBLE) / CAST(den AS DOUBLE)", 9)} END AS dw
FROM agg
"""

QUERIES["q_durbin_watson"] = q_durbin_watson
ORACLES["q_durbin_watson"] = ORACLE_DURBIN_WATSON
