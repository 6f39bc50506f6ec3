"""Second breadth batch: cube/grouping, subqueries, per-group top-k,
pivot, ntile, having, conditional agg, string agg, moment statistics.

All engine-capability surface (the reference has none of these); every
query is oracle-checked. Float determinism follows _util's decimal-sum
discipline; moments are derived from exact decimal sums in one final
double expression.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ._util import dsum, dsum_sql, sround, sround_sql


def q_cube(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE over (returnflag, linestatus). Same empty-input note as
    q_rollup: the oracle's HAVING COUNT(*) > 0 encodes Spark's
    no-rows-on-empty grouping-sets semantics (no-op at any scale)."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "n_rows",
        )
    )


ORACLE_CUBE = """
SELECT COALESCE(l_returnflag, 'ALL') AS rf,
       COALESCE(l_linestatus, 'ALL') AS ls, COUNT(*) AS n_rows
FROM lineitem GROUP BY CUBE(l_returnflag, l_linestatus)
HAVING COUNT(*) > 0
"""


def q_grouping_sets(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Explicit GROUPING SETS ((priority), (status)) via spark.sql."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("_orders_gs")
    return spark.sql(
        """
        SELECT COALESCE(o_orderpriority, 'ALL') AS pri,
               COALESCE(o_orderstatus, 'ALL') AS st,
               COUNT(*) AS n_orders
        FROM _orders_gs
        GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
        """
    )


ORACLE_GROUPING_SETS = """
SELECT COALESCE(o_orderpriority, 'ALL') AS pri,
       COALESCE(o_orderstatus, 'ALL') AS st,
       COUNT(*) AS n_orders
FROM orders
GROUP BY GROUPING SETS ((o_orderpriority), (o_orderstatus))
"""


def q_exists_subquery(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS: customers having an order above 400k (planned as
    a semi join by both engines)."""
    for t in ("customer", "orders"):
        load(spark, sf_dir, t).createOrReplaceTempView(f"_sq_{t}")
    return spark.sql(
        """
        SELECT c_custkey, c_name FROM _sq_customer c
        WHERE EXISTS (SELECT 1 FROM _sq_orders o
                      WHERE o.o_custkey = c.c_custkey
                        AND o.o_totalprice > 400000)
        """
    )


ORACLE_EXISTS_SUBQUERY = """
SELECT c_custkey, c_name FROM customer c
WHERE EXISTS (SELECT 1 FROM orders o
              WHERE o.o_custkey = c.c_custkey
                AND o.o_totalprice > 400000)
"""


def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 orders per customer by price (row_number ≤ 3, deterministic
    tie-break on orderkey)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return (
        o.withColumn("rk", F.row_number().over(w))
        .filter(F.col("rk") <= 3)
        .select("o_custkey", "o_orderkey", "o_totalprice", "rk")
    )


ORACLE_TOPK_PER_GROUP = """
SELECT o_custkey, o_orderkey, o_totalprice, rk FROM (
  SELECT *, row_number() OVER (PARTITION BY o_custkey
              ORDER BY o_totalprice DESC, o_orderkey) AS rk
  FROM orders) t
WHERE rk <= 3
"""


def q_window_ntile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(10) decile assignment over customer balances."""
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_acctbal")
    w = Window.orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey", F.ntile(10).over(w).alias("decile")
    )


# NULLS FIRST pins DuckDB to Spark's ascending default: decile
# assignment must cover balance-less customers, so the NULL position is
# pinned rather than the rows dropped (--nulls sweep)
ORACLE_WINDOW_NTILE = """
SELECT c_custkey,
       ntile(10) OVER (ORDER BY c_acctbal NULLS FIRST, c_custkey) AS decile
FROM customer
"""


def q_window_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """percent_rank + cume_dist over order totals within each order
    priority — the two relative-position window functions the surface
    didn't cover (q_window_ntile buckets, these give the continuous
    position). Both are tie-aware ((rank-1)/(N-1) and
    n_peers_at_or_below/N), so the result carries no within-tie order
    dependence; the dyadic divisions are exact IEEE doubles on both
    engines, rounded to 6 as belt-and-braces. Partitioned window —
    parallel across priorities, no single-partition flag."""
    o = load(spark, sf_dir, "orders").select(
        "o_orderkey", "o_orderpriority", "o_totalprice"
    )
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        (F.round(F.percent_rank().over(w), 6) + F.lit(0.0)).alias(
            "pct_rank"
        ),
        (F.round(F.cume_dist().over(w), 6) + F.lit(0.0)).alias(
            "cume"
        ),
    )


# NULLS FIRST pins DuckDB to Spark's ascending default (--nulls sweep:
# injected NULL o_totalprice rows tie at the front, and both functions
# are tie-aware so the hash is stable)
ORACLE_WINDOW_CUME = """
SELECT o_orderkey, o_orderpriority,
       round(percent_rank() OVER
         (PARTITION BY o_orderpriority
          ORDER BY o_totalprice NULLS FIRST), 6) + 0.0 AS pct_rank,
       round(cume_dist() OVER
         (PARTITION BY o_orderpriority
          ORDER BY o_totalprice NULLS FIRST), 6) + 0.0 AS cume
FROM orders
"""


def q_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Group filter: customers with ≥ 15 orders."""
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(F.count("*").alias("n_orders"))
        .filter(F.col("n_orders") >= 15)
    )


ORACLE_HAVING = """
SELECT o_custkey, COUNT(*) AS n_orders
FROM orders GROUP BY o_custkey HAVING COUNT(*) >= 15
"""


def q_case_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation: per-returnflag quantity split by status."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        dsum(
            F.when(F.col("l_linestatus") == "F", F.col("l_quantity"))
            .otherwise(F.lit(0.0))
        ).alias("qty_f"),
        dsum(
            F.when(F.col("l_linestatus") == "O", F.col("l_quantity"))
            .otherwise(F.lit(0.0))
        ).alias("qty_o"),
    )


ORACLE_CASE_AGG = f"""
SELECT l_returnflag,
       {dsum_sql("CASE WHEN l_linestatus = 'F' THEN l_quantity ELSE 0.0 END")}
         AS qty_f,
       {dsum_sql("CASE WHEN l_linestatus = 'O' THEN l_quantity ELSE 0.0 END")}
         AS qty_o
FROM lineitem GROUP BY l_returnflag
"""


def q_string_agg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered string aggregation: nation names per region."""
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    return (
        n.join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.array_join(
                F.array_sort(F.collect_list("n_name")), ","
            ).alias("nations")
        )
    )


ORACLE_STRING_AGG = """
SELECT r_name, string_agg(n_name, ',' ORDER BY n_name) AS nations
FROM nation JOIN region ON n_regionkey = r_regionkey
GROUP BY r_name
"""


def q_pivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot: per-user event counts by type (5 known types)."""
    e = load(spark, sf_dir, "events")
    types = ["click", "error", "purchase", "signup", "view"]
    return (
        e.groupBy("user_id")
        .pivot("event_type", types)
        .agg(F.count(F.lit(1)))
        .select(
            "user_id",
            *[F.coalesce(F.col(t), F.lit(0)).alias(f"n_{t}") for t in types],
        )
    )


ORACLE_PIVOT = """
SELECT user_id,
       COUNT(*) FILTER (event_type = 'click') AS n_click,
       COUNT(*) FILTER (event_type = 'error') AS n_error,
       COUNT(*) FILTER (event_type = 'purchase') AS n_purchase,
       COUNT(*) FILTER (event_type = 'signup') AS n_signup,
       COUNT(*) FILTER (event_type = 'view') AS n_view
FROM events GROUP BY user_id
"""


def q_moment_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Mean and population variance per group from exact decimal moments
    (sum, sum of squares) — order-independent, unlike native stddev."""
    li = load(spark, sf_dir, "lineitem")
    s1 = F.sum(F.col("l_quantity").cast("decimal(28,6)")).cast("double")
    s2 = F.sum(
        (F.col("l_quantity") * F.col("l_quantity")).cast("decimal(28,6)")
    ).cast("double")
    n = F.count("l_quantity")
    mean = s1 / n
    var = s2 / n - (s1 / n) * (s1 / n)
    return li.groupBy("l_returnflag").agg(
        sround(mean, 6).alias("mean_qty"),
        sround(var, 6).alias("var_qty"),
    )


ORACLE_MOMENT_STATS = """
SELECT l_returnflag,
       round((CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
              / COUNT(l_quantity)) * 1000000.0) / 1000000.0 + 0.0
         AS mean_qty,
       round((CAST(SUM(CAST(l_quantity * l_quantity AS DECIMAL(28,6)))
                   AS DOUBLE) / COUNT(l_quantity)
              - (CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
                 / COUNT(l_quantity))
                * (CAST(SUM(CAST(l_quantity AS DECIMAL(28,6))) AS DOUBLE)
                   / COUNT(l_quantity))) * 1000000.0) / 1000000.0 + 0.0
         AS var_qty
FROM lineitem GROUP BY l_returnflag
"""


def q_join_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q5-shaped 5-way join: revenue per region for 1996 orders.
    Dimension chain broadcasts; the fact-fact join shuffles on the key."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders").filter(
        (F.col("o_orderdate") >= "1996-01-01")
        & (F.col("o_orderdate") < "1997-01-01")
    )
    c = load(spark, sf_dir, "customer")
    n = load(spark, sf_dir, "nation")
    r = load(spark, sf_dir, "region")
    revenue = (F.col("l_extendedprice") * (1 - F.col("l_discount"))).cast(
        "decimal(28,6)"
    )
    return (
        li.join(o, li.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .groupBy("r_name")
        .agg(
            F.sum(revenue).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


ORACLE_JOIN_MULTI = """
SELECT r_name,
       CAST(SUM(CAST(l_extendedprice * (1 - l_discount) AS DECIMAL(28,6)))
            AS DOUBLE) AS revenue,
       COUNT(*) AS n_items
FROM lineitem
JOIN orders ON l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
JOIN region ON n_regionkey = r_regionkey
WHERE o_orderdate >= TIMESTAMP '1996-01-01'
  AND o_orderdate < TIMESTAMP '1997-01-01'
GROUP BY r_name
"""


def q_json_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """from_json with an explicit schema → typed struct → field access
    (the reference's serde_json object parse, src/main.rs:345, with a
    declared schema instead of inference)."""
    e = load(spark, sf_dir, "events")
    parsed = F.from_json("props", "k BIGINT")
    return e.select(
        "event_id",
        parsed.getField("k").alias("k_typed"),
        F.when(parsed.isNull(), F.lit("invalid"))
        .otherwise(F.lit("valid"))
        .alias("parse_status"),
    )


ORACLE_JSON_STRUCT = """
SELECT event_id,
       CAST(json_extract(props, '$.k') AS BIGINT) AS k_typed,
       CASE WHEN TRY_CAST(props AS JSON) IS NULL THEN 'invalid'
            ELSE 'valid' END AS parse_status
FROM events
"""


def q_explode_pos(spark: SparkSession, sf_dir: str) -> DataFrame:
    """posexplode (lateral unnest with ordinality): dimension-wise mean
    over all embedding vectors — the columnar flatten at scale shuffles
    on the position key, perfectly uniform."""
    em = load(spark, sf_dir, "embeddings")
    flat = em.select(
        F.posexplode(F.col("embedding")).alias("pos", "val")
    )
    return flat.groupBy("pos").agg(
        F.count("*").alias("n"),
        F.sum(F.col("val").cast("double").cast("decimal(28,6)"))
        .cast("double")
        .alias("dim_sum"),
    ).select(F.col("pos").cast("long").alias("pos"), "n", "dim_sum")


ORACLE_EXPLODE_POS = """
SELECT pos, COUNT(*) AS n,
       CAST(SUM(CAST(CAST(val AS DOUBLE) AS DECIMAL(28,6))) AS DOUBLE)
         AS dim_sum
FROM (
  SELECT generate_subscripts(embedding, 1) - 1 AS pos,
         unnest(embedding) AS val
  FROM embeddings) t
GROUP BY pos
"""


def q_limit_offset(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic pagination: rows 101-120 of the key-ordered orders."""
    o = load(spark, sf_dir, "orders").select("o_orderkey", "o_totalprice")
    return o.orderBy("o_orderkey").offset(100).limit(20)


ORACLE_LIMIT_OFFSET = """
SELECT o_orderkey, o_totalprice FROM orders
ORDER BY o_orderkey LIMIT 20 OFFSET 100
"""


def q_distinct_proj(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DISTINCT projection (dedup shuffle on the projected key pair)."""
    li = load(spark, sf_dir, "lineitem")
    return li.select("l_returnflag", "l_linestatus").distinct()


ORACLE_DISTINCT_PROJ = """
SELECT DISTINCT l_returnflag, l_linestatus FROM lineitem
"""


def q_cross_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cartesian product of the two smallest dims (5 × 25)."""
    r = load(spark, sf_dir, "region").select("r_name")
    n = load(spark, sf_dir, "nation").select("n_name")
    return r.crossJoin(n)


ORACLE_CROSS_JOIN = """
SELECT r_name, n_name FROM region CROSS JOIN nation
"""


def q_percentile(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (both engines use the
    same linear-interpolation definition — verified bit-equal)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.percentile("l_quantity", F.lit(0.5)).alias("q50"),
        F.percentile("l_quantity", F.lit(0.9)).alias("q90"),
        F.percentile("l_extendedprice", F.lit(0.25)).alias("price_q25"),
    )


ORACLE_PERCENTILE = """
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS q50,
       quantile_cont(l_quantity, 0.9) AS q90,
       quantile_cont(l_extendedprice, 0.25) AS price_q25
FROM lineitem GROUP BY l_returnflag
"""


def q_hash_split(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/val/test split by content-hash prefix — the
    reproducible-split primitive every training pipeline needs (stable
    under re-runs, engine-independent, no RNG). ~5% val, ~5% test via
    lexicographic md5-prefix ranges."""
    d = load(spark, sf_dir, "documents")
    h = F.substring(F.md5(F.col("text").cast("binary")), 1, 2)
    split = (
        F.when(h < "0d", "val")
        .when(h < "1a", "test")
        .otherwise("train")
    )
    return d.groupBy(split.alias("split")).agg(
        F.count("*").alias("n_docs"),
        F.min("doc_id").alias("min_id"),
    )


ORACLE_HASH_SPLIT = """
SELECT CASE WHEN substr(md5(text), 1, 2) < '0d' THEN 'val'
            WHEN substr(md5(text), 1, 2) < '1a' THEN 'test'
            ELSE 'train' END AS split,
       COUNT(*) AS n_docs, MIN(doc_id) AS min_id
FROM documents GROUP BY 1
"""


def q_regex_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Regex group extraction (the extension-match shape,
    src/main.rs:266-277): numeric id out of the source tag."""
    d = load(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        F.regexp_extract("source", "src([0-9]+)", 1)
        .cast("long")
        .alias("src_num"),
        F.regexp_extract("text", "^([a-z]+)", 1).alias("first_word"),
    )


ORACLE_REGEX_EXTRACT = """
SELECT doc_id,
       CAST(regexp_extract(source, 'src([0-9]+)', 1) AS BIGINT) AS src_num,
       regexp_extract(text, '^([a-z]+)', 1) AS first_word
FROM documents
"""


def q_union_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deduplicating UNION of two key sets (vs the UNION ALL in
    q_schema_union)."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("k")
    )
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("k")
    )
    return c.union(s).distinct()


ORACLE_UNION_DISTINCT = """
SELECT c_nationkey AS k FROM customer
UNION
SELECT s_nationkey AS k FROM supplier
"""


def q_first_last(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value over an unbounded frame with a
    deterministic (ts, event_id) order. Timeline op: unstamped events
    are dropped on both sides (--nulls sweep; NULL-ts ordering differs
    between engines)."""
    e = load(spark, sf_dir, "events").filter(F.col("ts").isNotNull())
    w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    )
    return e.select(
        "user_id",
        F.first_value("event_type").over(w).alias("first_type"),
        F.last_value("event_type").over(w).alias("last_type"),
    ).distinct()


ORACLE_FIRST_LAST = """
SELECT DISTINCT user_id,
       first_value(event_type) OVER w AS first_type,
       last_value(event_type) OVER w AS last_type
FROM events WHERE ts IS NOT NULL
WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
"""



def q_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape (large-volume orders): aggregate the fact table
    first (map-side partial sums shrink the shuffle), filter on the
    aggregate, then join the survivors back to orders/customer — the
    having-pushdown pattern that keeps the expensive join small."""
    li = load(spark, sf_dir, "lineitem")
    o = load(spark, sf_dir, "orders")
    c = load(spark, sf_dir, "customer")
    big = (
        li.groupBy("l_orderkey")
        .agg(dsum("l_quantity").alias("total_qty"))
        .filter(F.col("total_qty") > 300.0)
    )
    return (
        big.join(o, big.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .select(
            "c_name",
            F.col("c_custkey").cast("bigint").alias("c_custkey"),
            F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
            F.col("o_orderdate").cast("timestamp").alias("o_orderdate"),
            "o_totalprice",
            "total_qty",
        )
    )


ORACLE_LARGE_ORDERS = f"""
SELECT c_name, CAST(c_custkey AS BIGINT) AS c_custkey,
       CAST(o_orderkey AS BIGINT) AS o_orderkey,
       CAST(o_orderdate AS TIMESTAMP) AS o_orderdate,
       o_totalprice, total_qty
FROM (SELECT l_orderkey, {dsum_sql('l_quantity')} AS total_qty
      FROM lineitem GROUP BY l_orderkey
      HAVING total_qty > 300.0) big
JOIN orders ON big.l_orderkey = o_orderkey
JOIN customer ON o_custkey = c_custkey
"""


def q_window_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution window functions: percent_rank and cume_dist of each
    order's price within its priority class (tie-stable by definition),
    plus the class size.

    Scale note: rank semantics require each partition's rows on one
    task, so low-cardinality partition keys cap parallelism at the key
    count — inherent to the operator, not this plan. When only the
    quantile VALUES are needed, use the mergeable histogram sketch
    (``q_approx_percentile``) which has no such constraint."""
    # a NULL price has no place in a price distribution, and the two
    # engines order NULLs oppositely (Spark first ASC, DuckDB last),
    # which would shift every percent_rank — drop unpriced orders on
    # both sides (--nulls sweep)
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    w = Window.partitionBy("o_orderpriority").orderBy("o_totalprice")
    return o.select(
        F.col("o_orderkey").cast("bigint").alias("o_orderkey"),
        "o_orderpriority",
        F.percent_rank().over(w).alias("price_pct_rank"),
        F.cume_dist().over(w).alias("price_cume_dist"),
        F.count(F.lit(1))
        .over(Window.partitionBy("o_orderpriority"))
        .cast("bigint")
        .alias("class_size"),
    )


ORACLE_WINDOW_DIST = """
SELECT CAST(o_orderkey AS BIGINT) AS o_orderkey, o_orderpriority,
       percent_rank() OVER w AS price_pct_rank,
       cume_dist() OVER w AS price_cume_dist,
       CAST(COUNT(*) OVER (PARTITION BY o_orderpriority) AS BIGINT)
         AS class_size
FROM orders WHERE o_totalprice IS NOT NULL
WINDOW w AS (PARTITION BY o_orderpriority ORDER BY o_totalprice)
"""


def q_unpivot(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Unpivot/melt (§2.6 reshaping): part's numeric attributes to long
    (key, attr, val) form — the normalization step before generic
    per-attribute profiling. Zero shuffles: unpivot is a per-row
    projection (each input row emits one row per value column)."""
    p = load(spark, sf_dir, "part")
    return p.select(
        "p_partkey",
        F.col("p_size").cast("double").alias("p_size"),
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
    ).unpivot(
        ids=["p_partkey"],
        values=["p_size", "p_retailprice"],
        variableColumnName="attr",
        valueColumnName="val",
    )


ORACLE_UNPIVOT = """
SELECT p_partkey, attr, val
FROM (SELECT p_partkey, CAST(p_size AS DOUBLE) AS p_size,
             CAST(p_retailprice AS DOUBLE) AS p_retailprice
      FROM part)
UNPIVOT (val FOR attr IN (p_size, p_retailprice))
"""


def q_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """FULL OUTER join (§2.3 completeness): per-nation wealthy-customer
    counts vs wealthy-supplier counts, where each side's filter leaves
    nations unmatched on the other — both null-padded directions are
    genuinely exercised. The aggregates shrink each side to ≤25 rows
    BEFORE the join (agg-below-join), so the full-outer itself is a
    dimension-sized hash join, never a fact-table shuffle."""
    c = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9950)
        .groupBy(F.col("c_nationkey").alias("nk_c"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("rich_customers"))
    )
    s = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 9000)
        .groupBy(F.col("s_nationkey").alias("nk_s"))
        .agg(F.count(F.lit(1)).cast("bigint").alias("rich_suppliers"))
    )
    return (
        c.join(s, c.nk_c == s.nk_s, "full_outer")
        .select(
            F.coalesce("nk_c", "nk_s").cast("bigint").alias("nationkey"),
            F.coalesce("rich_customers", F.lit(0))
            .cast("bigint")
            .alias("rich_customers"),
            F.coalesce("rich_suppliers", F.lit(0))
            .cast("bigint")
            .alias("rich_suppliers"),
        )
        .orderBy("nationkey")
    )


ORACLE_FULL_OUTER = """
WITH c AS (
  SELECT c_nationkey AS nk_c, CAST(COUNT(*) AS BIGINT) AS rich_customers
  FROM customer WHERE c_acctbal > 9950 GROUP BY c_nationkey),
s AS (
  SELECT s_nationkey AS nk_s, CAST(COUNT(*) AS BIGINT) AS rich_suppliers
  FROM supplier WHERE s_acctbal > 9000 GROUP BY s_nationkey)
SELECT CAST(COALESCE(nk_c, nk_s) AS BIGINT) AS nationkey,
       CAST(COALESCE(rich_customers, 0) AS BIGINT) AS rich_customers,
       CAST(COALESCE(rich_suppliers, 0) AS BIGINT) AS rich_suppliers
FROM c FULL OUTER JOIN s ON nk_c = nk_s
ORDER BY nationkey
"""


def q_variant_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT surface (the open-ended semi-structured type that
    replaces schema-on-write JSON structs): parse each event's props
    into a variant, extract a typed path, aggregate. The parse and the
    typed get are both JVM expressions — this is the modern path for
    "the schema isn't known until read". Oracle: DuckDB's JSON extract
    of the same path, cast to the same type."""
    ev = load(spark, sf_dir, "events")
    k = F.variant_get(F.parse_json("props"), "$.k", "bigint")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count("k").cast("bigint").alias("n_with_k"),
            F.min("k").cast("bigint").alias("min_k"),
            F.max("k").cast("bigint").alias("max_k"),
            F.sum("k").cast("bigint").alias("sum_k"),
        )
        .orderBy("event_type")
    )


ORACLE_VARIANT_EXTRACT = """
SELECT event_type,
       CAST(COUNT(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS n_with_k,
       CAST(MIN(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS min_k,
       CAST(MAX(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS max_k,
       CAST(SUM(CAST(props->>'$.k' AS BIGINT)) AS BIGINT) AS sum_k
FROM events GROUP BY event_type ORDER BY event_type
"""


def q_dense_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """dense_rank (ties share a rank, no gaps — vs rank's gap
    semantics, q_window_rank): per-segment customer balance leaderboard
    keeping every customer in the densest three tiers. Completes the
    ranking-function surface (§2.5)."""
    c = load(spark, sf_dir, "customer")
    w = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), "c_custkey"
    )
    return (
        c.select(
            "c_mktsegment",
            "c_custkey",
            "c_acctbal",
            F.dense_rank().over(w).cast("bigint").alias("dr"),
        )
        .filter(F.col("dr") <= 3)
        .orderBy("c_mktsegment", "dr", "c_custkey")
    )


ORACLE_DENSE_RANK = """
SELECT c_mktsegment, c_custkey, c_acctbal, dr FROM (
  SELECT c_mktsegment, c_custkey, c_acctbal,
         CAST(dense_rank() OVER (PARTITION BY c_mktsegment
                ORDER BY c_acctbal DESC, c_custkey) AS BIGINT) AS dr
  FROM customer) x
WHERE dr <= 3 ORDER BY c_mktsegment, dr, c_custkey
"""


HIST_BUCKETS = 20


def q_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-width numeric histogram of o_totalprice — the profiling
    primitive behind every data-drop QA dashboard (q_profile gives
    min/max/distinct; this gives the SHAPE). Bounds come from one
    broadcast 1-row aggregate; bucket = floor((x-min)·B/(max-min))
    clamped at B-1 — every step is a correctly-rounded IEEE double op,
    so the bucket id is engine-exact. One scan + one 20-row groupBy:
    map-side combinable, shuffle width = B."""
    o = load(spark, sf_dir, "orders").filter(
        F.col("o_totalprice").isNotNull()
    )
    bounds = o.agg(
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )
    j = o.crossJoin(F.broadcast(bounds))
    # hi == lo (degenerate single-value column, the tiny-data regime)
    # must land everything in bucket 0, not divide 0/0 — Spark's floor
    # (NaN) is NULL while DuckDB's BIGINT cast of NaN raises
    b = F.when(F.col("hi") == F.col("lo"), F.lit(0)).otherwise(
        F.least(
            F.floor(
                (F.col("o_totalprice") - F.col("lo"))
                * F.lit(float(HIST_BUCKETS))
                / (F.col("hi") - F.col("lo"))
            ),
            F.lit(HIST_BUCKETS - 1),
        )
    ).cast("bigint")
    w = (F.col("hi") - F.col("lo")) / F.lit(float(HIST_BUCKETS))
    return (
        j.select(
            b.alias("bucket"),
            (F.col("lo") + b.cast("double") * w).alias("b_lo"),
            (F.col("lo") + (b + 1).cast("double") * w).alias("b_hi"),
        )
        .groupBy("bucket")
        .agg(
            sround(F.min("b_lo"), 4).alias("lo"),
            sround(F.min("b_hi"), 4).alias("hi"),
            F.count(F.lit(1)).cast("bigint").alias("n"),
        )
        .orderBy("bucket")
    )


ORACLE_HISTOGRAM = f"""
WITH bounds AS (
  SELECT MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
  FROM orders WHERE o_totalprice IS NOT NULL
), j AS (
  SELECT CASE WHEN hi = lo THEN 0
          ELSE LEAST(CAST(floor((o_totalprice - lo)
                           * {float(HIST_BUCKETS)}
                           / (hi - lo)) AS BIGINT),
                     {HIST_BUCKETS - 1}) END AS bucket,
         lo, hi
  FROM orders CROSS JOIN bounds WHERE o_totalprice IS NOT NULL
)
SELECT bucket,
       {sround_sql(
           "MIN(lo + CAST(bucket AS DOUBLE)"
           f" * ((hi - lo) / {float(HIST_BUCKETS)}))", 4)} AS lo,
       {sround_sql(
           "MIN(lo + CAST(bucket + 1 AS DOUBLE)"
           f" * ((hi - lo) / {float(HIST_BUCKETS)}))", 4)} AS hi,
       CAST(COUNT(*) AS BIGINT) AS n
FROM j GROUP BY bucket ORDER BY bucket
"""


GAP_BUCKET = 1024  # id-space bucket width for distributed gap detection


def q_id_gaps(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Missing-id-range detection over a key sequence (completed-order
    keys) — the ingest-completeness audit ('which shard/manifest ids
    never arrived?'). A naive LEAD over the global key order is one
    total sort; this decomposes exactly: within-bucket gaps via LEAD
    partitioned by bucket = key DIV 1024 (uniform shuffle), plus
    boundary gaps via LEAD over the 1024×-smaller per-bucket min/max
    summary. The summary pass repeats the same shape recursively at
    +scale (depth log_1024 N); one level suffices for any corpus whose
    key count / 1024 fits a single sort (10^11 keys → 10^8 summary
    rows; a second level → 10^5)."""
    k = (
        load(spark, sf_dir, "orders")
        .filter(
            F.col("o_orderstatus") == "F"
        )
        .select(F.col("o_orderkey").alias("k"))
        .filter(F.col("k").isNotNull())
    )
    b = (F.col("k") / GAP_BUCKET).cast("bigint")
    kb = k.select("k", b.alias("b"))
    w_in = Window.partitionBy("b").orderBy("k")
    within = (
        kb.select("k", F.lead("k").over(w_in).alias("nk"))
        .filter(F.col("nk") > F.col("k") + 1)
        .select(
            (F.col("k") + 1).alias("gap_start"),
            (F.col("nk") - 1).alias("gap_end"),
        )
    )
    summary = kb.groupBy("b").agg(
        F.min("k").alias("mn"), F.max("k").alias("mx")
    )
    w_b = Window.orderBy("b")
    boundary = (
        summary.select(
            "mx", F.lead("mn").over(w_b).alias("next_mn")
        )
        .filter(F.col("next_mn") > F.col("mx") + 1)
        .select(
            (F.col("mx") + 1).alias("gap_start"),
            (F.col("next_mn") - 1).alias("gap_end"),
        )
    )
    return (
        within.unionByName(boundary)
        .select(
            "gap_start",
            "gap_end",
            (F.col("gap_end") - F.col("gap_start") + 1).alias(
                "n_missing"
            ),
        )
        .orderBy("gap_start")
    )


ORACLE_ID_GAPS = """
WITH k AS (
  SELECT o_orderkey AS k FROM orders
  WHERE o_orderstatus = 'F' AND o_orderkey IS NOT NULL
), g AS (
  SELECT k, lead(k) OVER (ORDER BY k) AS nk FROM k
)
SELECT k + 1 AS gap_start, nk - 1 AS gap_end,
       nk - k - 1 AS n_missing
FROM g WHERE nk > k + 1 ORDER BY gap_start
"""


QUERIES = {
    "q_histogram": q_histogram,
    "q_id_gaps": q_id_gaps,
    "q_full_outer": q_full_outer,
    "q_dense_rank": q_dense_rank,
    "q_variant_extract": q_variant_extract,
    "q_large_orders": q_large_orders,
    "q_window_dist": q_window_dist,
    "q_regex_extract": q_regex_extract,
    "q_union_distinct": q_union_distinct,
    "q_first_last": q_first_last,
    "q_percentile": q_percentile,
    "q_hash_split": q_hash_split,
    "q_explode_pos": q_explode_pos,
    "q_limit_offset": q_limit_offset,
    "q_distinct_proj": q_distinct_proj,
    "q_cross_join": q_cross_join,
    "q_json_struct": q_json_struct,
    "q_cube": q_cube,
    "q_grouping_sets": q_grouping_sets,
    "q_exists_subquery": q_exists_subquery,
    "q_topk_per_group": q_topk_per_group,
    "q_window_ntile": q_window_ntile,
    "q_window_cume": q_window_cume,
    "q_having": q_having,
    "q_case_agg": q_case_agg,
    "q_string_agg": q_string_agg,
    "q_pivot": q_pivot,
    "q_moment_stats": q_moment_stats,
    "q_join_multi": q_join_multi,
    "q_unpivot": q_unpivot,
}

ORACLES = {
    "q_histogram": ORACLE_HISTOGRAM,
    "q_id_gaps": ORACLE_ID_GAPS,
    "q_full_outer": ORACLE_FULL_OUTER,
    "q_dense_rank": ORACLE_DENSE_RANK,
    "q_variant_extract": ORACLE_VARIANT_EXTRACT,
    "q_large_orders": ORACLE_LARGE_ORDERS,
    "q_window_dist": ORACLE_WINDOW_DIST,
    "q_regex_extract": ORACLE_REGEX_EXTRACT,
    "q_union_distinct": ORACLE_UNION_DISTINCT,
    "q_first_last": ORACLE_FIRST_LAST,
    "q_percentile": ORACLE_PERCENTILE,
    "q_hash_split": ORACLE_HASH_SPLIT,
    "q_explode_pos": ORACLE_EXPLODE_POS,
    "q_limit_offset": ORACLE_LIMIT_OFFSET,
    "q_distinct_proj": ORACLE_DISTINCT_PROJ,
    "q_cross_join": ORACLE_CROSS_JOIN,
    "q_json_struct": ORACLE_JSON_STRUCT,
    "q_cube": ORACLE_CUBE,
    "q_grouping_sets": ORACLE_GROUPING_SETS,
    "q_exists_subquery": ORACLE_EXISTS_SUBQUERY,
    "q_topk_per_group": ORACLE_TOPK_PER_GROUP,
    "q_window_ntile": ORACLE_WINDOW_NTILE,
    "q_window_cume": ORACLE_WINDOW_CUME,
    "q_having": ORACLE_HAVING,
    "q_case_agg": ORACLE_CASE_AGG,
    "q_string_agg": ORACLE_STRING_AGG,
    "q_pivot": ORACLE_PIVOT,
    "q_moment_stats": ORACLE_MOMENT_STATS,
    "q_join_multi": ORACLE_JOIN_MULTI,
    "q_unpivot": ORACLE_UNPIVOT,
}
