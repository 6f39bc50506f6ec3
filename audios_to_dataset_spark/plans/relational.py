"""Relational query plans over the TPC-H-ish testdata.

Each query id binds one reference operator (SURVEY.md §2) to the driver's
testdata tables. Reference citations are given per query; the Spark side is
pure DataFrame API so Catalyst handles pushdown/pruning/broadcast.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from ..catalog import load
from ._util import davg, davg_sql, dsum, dsum_sql, sround

# --------------------------------------------------------------------------
# Aggregations (SURVEY §2.4: A1-A3 + engine-capability breadth)
# --------------------------------------------------------------------------


def q_agg_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H-Q1-shaped pricing summary: count/sum/avg per flag+status.

    Reference analog: per-shard row count + logging (src/main.rs:712, 610)
    widened to a real grouped aggregation. Partial (map-side) aggregation is
    free from Catalyst's HashAggregate(partial)->Exchange->HashAggregate.
    """
    li = load(spark, sf_dir, "lineitem")
    return (
        li.groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.count("*").alias("n_rows"),
            dsum("l_quantity").alias("sum_qty"),
            dsum("l_extendedprice").alias("sum_price"),
            davg("l_discount").alias("avg_disc"),
        )
    )


ORACLE_AGG_COUNT = f"""
SELECT l_returnflag, l_linestatus,
       COUNT(*) AS n_rows,
       {dsum_sql('l_quantity')} AS sum_qty,
       {dsum_sql('l_extendedprice')} AS sum_price,
       {davg_sql('l_discount')} AS avg_disc
FROM lineitem
GROUP BY l_returnflag, l_linestatus
"""


def q_agg_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Grouped agg over orders by priority (engine-capability breadth)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.count("*").alias("n_orders"),
        dsum("o_totalprice").alias("total_price"),
    )


ORACLE_AGG_GROUP = f"""
SELECT o_orderpriority, COUNT(*) AS n_orders,
       {dsum_sql('o_totalprice')} AS total_price
FROM orders GROUP BY o_orderpriority
"""


def q_agg_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct-count agg — the analog of the reference's global key-set
    union (update_types_from_record, src/main.rs:166-176)."""
    e = load(spark, sf_dir, "events")
    return e.agg(
        F.countDistinct("event_type").alias("n_types"),
        F.countDistinct("user_id").alias("n_users"),
    )


ORACLE_AGG_DISTINCT = """
SELECT COUNT(DISTINCT event_type) AS n_types,
       COUNT(DISTINCT user_id) AS n_users
FROM events
"""


def q_agg_minmax(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Min/max per group — analog of the common-dir-prefix extremes trick
    (scripts/csv_path_rewriter.py:72-79)."""
    li = load(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.min("l_shipdate").alias("min_ship"),
        F.max("l_shipdate").alias("max_ship"),
    )


ORACLE_AGG_MINMAX = """
SELECT l_returnflag, MIN(l_shipdate) AS min_ship, MAX(l_shipdate) AS max_ship
FROM lineitem GROUP BY l_returnflag
"""


def q_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP over (returnflag, linestatus) — engine-capability breadth.

    Empty-input semantics: Spark emits NO rows for rollup/cube over an
    empty table, while the SQL standard (and DuckDB) emit the lone
    grand-total row; the oracle encodes the ENGINE's semantics with
    ``HAVING COUNT(*) > 0`` — a no-op on any non-empty input (every
    real group has >= 1 row) that removes only the standard's empty
    grand row. Found by the empty-table sweep."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.rollup("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n_rows"), dsum("l_quantity").alias("sum_qty"))
        .select(
            F.coalesce("l_returnflag", F.lit("ALL")).alias("rf"),
            F.coalesce("l_linestatus", F.lit("ALL")).alias("ls"),
            "n_rows",
            "sum_qty",
        )
    )


ORACLE_ROLLUP = f"""
SELECT COALESCE(l_returnflag, 'ALL') AS rf,
       COALESCE(l_linestatus, 'ALL') AS ls,
       COUNT(*) AS n_rows,
       {dsum_sql('l_quantity')} AS sum_qty
FROM lineitem GROUP BY ROLLUP(l_returnflag, l_linestatus)
HAVING COUNT(*) > 0
"""


# --------------------------------------------------------------------------
# Joins (SURVEY §2.3: J1-J3 + engine-capability inner/semi/anti)
# --------------------------------------------------------------------------


def q_join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Revenue per nation: customer ⋈ orders ⋈ nation.

    nation is broadcast (the reference's Arc-shared metadata index,
    src/main.rs:628-633, is exactly a broadcast hash join build side).
    """
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    n = load(spark, sf_dir, "nation")
    return (
        o.join(c, o.o_custkey == c.c_custkey)
        .join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .groupBy("n_name")
        .agg(
            F.count("*").alias("n_orders"),
            dsum("o_totalprice").alias("revenue"),
        )
    )


ORACLE_JOIN_INNER = f"""
SELECT n_name, COUNT(*) AS n_orders, {dsum_sql('o_totalprice')} AS revenue
FROM orders
JOIN customer ON o_custkey = c_custkey
JOIN nation ON c_nationkey = n_nationkey
GROUP BY n_name
"""


def q_join_left(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left join preserving customers with no orders (J1 is a LEFT join:
    metadata miss → empty record, src/main.rs:195-209)."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders")
    return (
        c.join(o, c.c_custkey == o.o_custkey, "left")
        .groupBy("c_custkey")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(dsum("o_totalprice"), F.lit(0.0)).alias("total_spend"),
        )
    )


ORACLE_JOIN_LEFT = f"""
SELECT c_custkey, COUNT(o_orderkey) AS n_orders,
       COALESCE({dsum_sql('o_totalprice')}, 0.0) AS total_spend
FROM customer LEFT JOIN orders ON c_custkey = o_custkey
GROUP BY c_custkey
"""


def q_join_fallback(spark: SparkSession, sf_dir: str) -> DataFrame:
    """3-level key-priority lookup: the reference's metadata_for_file probes
    by_relative_path, then by_name, then by_name[rel] (src/main.rs:195-209).

    Modeled as two LEFT broadcast joins + per-column COALESCE with the
    literal default '-' (J3, src/main.rs:204-207).
    """
    e = load(spark, sf_dir, "events")
    c = load(spark, sf_dir, "customer").select("c_custkey", "c_name")
    s = load(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        e.join(F.broadcast(c), e.user_id == c.c_custkey, "left")
        .join(F.broadcast(s), e.user_id == s.s_suppkey, "left")
        .select(
            "event_id",
            F.coalesce("c_name", "s_name", F.lit("-")).alias("resolved_name"),
        )
    )


ORACLE_JOIN_FALLBACK = """
SELECT event_id, COALESCE(c_name, s_name, '-') AS resolved_name
FROM events
LEFT JOIN customer ON user_id = c_custkey
LEFT JOIN supplier ON user_id = s_suppkey
"""


def q_join_semi_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi/anti joins. README.md:62 'rows without a matching audio file
    are skipped' is a left-semi of metadata against files."""
    c = load(spark, sf_dir, "customer")
    o = load(spark, sf_dir, "orders").select("o_custkey")
    semi = c.join(o, c.c_custkey == o.o_custkey, "left_semi").agg(
        F.count("*").alias("cnt")
    ).select(F.lit("semi").alias("kind"), "cnt")
    anti = c.join(o, c.c_custkey == o.o_custkey, "left_anti").agg(
        F.count("*").alias("cnt")
    ).select(F.lit("anti").alias("kind"), "cnt")
    return semi.unionByName(anti)


ORACLE_JOIN_SEMI_ANTI = """
SELECT 'semi' AS kind, COUNT(*) AS cnt FROM customer
WHERE EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
UNION ALL
SELECT 'anti' AS kind, COUNT(*) AS cnt FROM customer
WHERE NOT EXISTS (SELECT 1 FROM orders WHERE o_custkey = c_custkey)
"""


def q_dedup_first(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-wins dedup: the reference's or_insert build-side semantics
    (insert_record, src/main.rs:178-193) as row_number()==1."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return (
        e.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "user_id",
            F.col("event_id").alias("first_event_id"),
            F.col("event_type").alias("first_event_type"),
            F.col("ts").alias("first_ts"),
        )
    )


ORACLE_DEDUP_FIRST = """
SELECT user_id, event_id AS first_event_id,
       first_event_type, ts AS first_ts
FROM (
  SELECT user_id, event_id, event_type AS first_event_type, ts,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts NULLS FIRST, event_id) AS rn
  FROM events
) t WHERE rn = 1
"""


# --------------------------------------------------------------------------
# Windows (SURVEY §2.5: W1-W2 + rank/lag breadth)
# --------------------------------------------------------------------------


def q_window_rownum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Monotonic row id (W1: DuckDB id column bound to in-shard index,
    src/main.rs:807-809) — deterministic via (ts, event_id) ordering."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    return e.select(
        "event_id", "user_id", F.row_number().over(w).alias("rn")
    )


# NULLS FIRST pins DuckDB to Spark's ascending default: a row-id
# assignment must COVER unstamped rows (unlike the timeline ops, which
# drop them), so the NULL position is pinned instead (--nulls sweep)
ORACLE_WINDOW_ROWNUM = """
SELECT event_id, user_id,
       row_number() OVER (PARTITION BY user_id
                          ORDER BY ts NULLS FIRST, event_id) AS rn
FROM events
"""


def q_window_bucket(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Shard assignment (W2): floor((row_number-1)/N) over a deterministic
    order — exactly chunks(files_per_db).enumerate() (src/main.rs:714-724)
    with N=500 (the reference's --files-per-db default)."""
    # prune to the ordering key before the global-sort window so only one
    # slim column funnels through the single sort task
    o = load(spark, sf_dir, "orders").select("o_orderkey")
    w = Window.orderBy("o_orderkey")
    return (
        o.withColumn(
            "shard",
            F.floor((F.row_number().over(w) - F.lit(1)) / F.lit(500)),
        )
        .groupBy("shard")
        .agg(
            F.count("*").alias("n_rows"),
            F.min("o_orderkey").alias("min_key"),
            F.max("o_orderkey").alias("max_key"),
        )
    )


ORACLE_WINDOW_BUCKET = """
SELECT shard, COUNT(*) AS n_rows, MIN(o_orderkey) AS min_key,
       MAX(o_orderkey) AS max_key
FROM (
  SELECT o_orderkey,
         CAST(FLOOR((row_number() OVER (ORDER BY o_orderkey) - 1) / 500)
              AS BIGINT) AS shard
  FROM orders
) t GROUP BY shard
"""


def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """rank() per customer by order value (engine-capability breadth)."""
    o = load(spark, sf_dir, "orders")
    w = Window.partitionBy("o_custkey").orderBy(
        F.col("o_totalprice").desc(), "o_orderkey"
    )
    return o.select(
        "o_custkey", "o_orderkey", F.rank().over(w).alias("rk")
    )


ORACLE_WINDOW_RANK = """
SELECT o_custkey, o_orderkey,
       rank() OVER (PARTITION BY o_custkey
                    ORDER BY o_totalprice DESC, o_orderkey) AS rk
FROM orders
"""


def q_window_lag(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() inter-event gap in microseconds (exact integer arithmetic —
    no float drift between engines)."""
    e = load(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    prev_us = F.lag(F.unix_micros("ts")).over(w)
    return e.select(
        "event_id",
        "user_id",
        (F.unix_micros("ts") - prev_us).alias("gap_us"),
    )


ORACLE_WINDOW_LAG = """
SELECT event_id, user_id,
       epoch_us(ts) - lag(epoch_us(ts)) OVER (
         PARTITION BY user_id ORDER BY ts, event_id) AS gap_us
FROM events
"""


# --------------------------------------------------------------------------
# Sorts / limits / set ops (SURVEY §2.6)
# --------------------------------------------------------------------------


def q_sort_limit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-10 orders by price — Spark plans this as TakeOrderedAndProject
    (per-partition top-k, no global sort shuffle)."""
    o = load(spark, sf_dir, "orders")
    return (
        o.orderBy(F.col("o_totalprice").desc(), "o_orderkey")
        .select("o_orderkey", "o_custkey", "o_totalprice")
        .limit(10)
    )


ORACLE_SORT_LIMIT = """
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders ORDER BY o_totalprice DESC, o_orderkey LIMIT 10
"""


def q_set_ops(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT over nation keys present in customer vs supplier."""
    c = load(spark, sf_dir, "customer").select(
        F.col("c_nationkey").alias("k")
    ).distinct()
    s = load(spark, sf_dir, "supplier").select(
        F.col("s_nationkey").alias("k")
    ).distinct()
    both = c.intersect(s).select(F.lit("both").alias("op"), "k")
    cust_only = c.exceptAll(s).select(F.lit("cust_only").alias("op"), "k")
    return both.unionByName(cust_only)


ORACLE_SET_OPS = """
SELECT 'both' AS op, k FROM (
  SELECT DISTINCT c_nationkey AS k FROM customer
  INTERSECT
  SELECT DISTINCT s_nationkey AS k FROM supplier) t1
UNION ALL
SELECT 'cust_only' AS op, k FROM (
  SELECT DISTINCT c_nationkey AS k FROM customer
  EXCEPT
  SELECT DISTINCT s_nationkey AS k FROM supplier) t2
"""


# --------------------------------------------------------------------------
# Filters / projections / scalar derivations (SURVEY §2.2, §2.7)
# --------------------------------------------------------------------------


def q_filter_in(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-IN-list filter — the MIME allow-list shape (S4,
    src/main.rs:97-110). Predicates push to the parquet scan."""
    li = load(spark, sf_dir, "lineitem")
    return li.filter(
        F.col("l_returnflag").isin("A", "R")
        & (F.col("l_quantity") >= 10)
        & (F.col("l_quantity") <= 40)
        & (F.col("l_linestatus") == "F")
    ).select("l_orderkey", "l_linenumber", "l_quantity", "l_returnflag")


ORACLE_FILTER_IN = """
SELECT l_orderkey, l_linenumber, l_quantity, l_returnflag
FROM lineitem
WHERE l_returnflag IN ('A', 'R') AND l_quantity BETWEEN 10 AND 40
  AND l_linestatus = 'F'
"""


def q_scalar_arith(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar arithmetic projection — the duration=samples/rate shape
    (P4 arithmetic, src/main.rs:764)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        (F.col("value") * 2.0 + 1.0).alias("v_affine"),
        F.floor("value").cast("long").alias("v_floor"),
        F.abs("value").alias("v_abs"),
        (F.col("value") / F.lit(16000.0)).alias("v_ratio"),
    )


ORACLE_SCALAR_ARITH = """
SELECT event_id,
       value * 2.0 + 1.0 AS v_affine,
       CAST(FLOOR(value) AS BIGINT) AS v_floor,
       ABS(value) AS v_abs,
       value / 16000.0 AS v_ratio
FROM events
"""


def q_null_default(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COALESCE default fill — the transcription '-' default (J3,
    src/main.rs:204-207)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.coalesce("props", F.lit("-")).alias("props_filled"),
        F.coalesce(
            F.nullif("event_type", F.lit("error")), F.lit("-")
        ).alias("type_or_default"),
    )


ORACLE_NULL_DEFAULT = """
SELECT event_id,
       COALESCE(props, '-') AS props_filled,
       COALESCE(NULLIF(event_type, 'error'), '-') AS type_or_default
FROM events
"""


def q_struct_pack(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct pack/unpack round-trip — the audio struct assembly (P5,
    src/main.rs:462-470, 784-793)."""
    e = load(spark, sf_dir, "events")
    packed = e.select(
        "event_id",
        F.struct(
            F.col("event_type").alias("etype"), F.col("value").alias("val")
        ).alias("payload"),
    )
    return packed.select(
        "event_id",
        F.col("payload.etype").alias("etype"),
        F.col("payload.val").alias("val"),
    )


ORACLE_STRUCT_PACK = """
SELECT event_id, payload.etype AS etype, payload.val AS val FROM (
  SELECT event_id, struct_pack(etype := event_type, val := value) AS payload
  FROM events
) t
"""


def q_schema_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Type-widening union (A1/P8): conflicting types collapse to String
    (MetadataType::merge, src/main.rs:132-142) — bigint keys stringified
    and unioned with string-typed event ids."""
    o = load(spark, sf_dir, "orders")
    e = load(spark, sf_dir, "events")
    a = o.filter(F.col("o_orderkey") <= 1000).select(
        F.lit("order").alias("src"),
        F.col("o_orderkey").cast("string").alias("key"),
        F.col("o_orderpriority").alias("val"),
    )
    b = e.filter(F.col("event_id") <= 1000).select(
        F.lit("event").alias("src"),
        F.col("event_id").cast("string").alias("key"),
        F.col("event_type").alias("val"),
    )
    return a.unionByName(b)


ORACLE_SCHEMA_UNION = """
SELECT 'order' AS src, CAST(o_orderkey AS VARCHAR) AS key,
       o_orderpriority AS val
FROM orders WHERE o_orderkey <= 1000
UNION ALL
SELECT 'event' AS src, CAST(event_id AS VARCHAR) AS key, event_type AS val
FROM events WHERE event_id <= 1000
"""


def q_project_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Path normalization (P1/P2): backslash→slash + leading './' strip
    (normalize_path, src/main.rs:112-122) over synthesized paths."""
    d = load(spark, sf_dir, "documents")
    raw = F.concat(
        F.lit(".\\raw\\"), F.col("source"), F.lit("/"),
        F.col("lang"), F.lit(".txt"),
    )
    norm = F.regexp_replace(
        F.regexp_replace(raw, r"\\", "/"), r"^\./", ""
    )
    return d.select("doc_id", norm.alias("norm_path"))


ORACLE_PROJECT_NORMALIZE = r"""
SELECT doc_id,
       regexp_replace(
         replace('.\raw\' || source || '/' || lang || '.txt', '\', '/'),
         '^\./', '') AS norm_path
FROM documents
"""


def q_project_basename(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Basename extraction (P3): last path segment (src/main.rs:771-780;
    scripts/csv_path_rewriter.py:120)."""
    d = load(spark, sf_dir, "documents")
    path = F.concat(
        F.lit("data/"), F.col("source"), F.lit("/file_"),
        F.col("doc_id"), F.lit(".wav"),
    )
    return d.select(
        "doc_id",
        F.element_at(F.split(path, "/"), -1).alias("base_name"),
    )


ORACLE_PROJECT_BASENAME = """
SELECT doc_id,
       (string_split('data/' || source || '/file_' || doc_id || '.wav',
                     '/'))[-1] AS base_name
FROM documents
"""


def q_date_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface over orders (engine-capability breadth)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.year("o_orderdate").cast("long").alias("yr"),
        F.month("o_orderdate").cast("long").alias("mon"),
        F.date_trunc("month", "o_orderdate").alias("month_start"),
        F.datediff(
            F.col("o_orderdate"), F.lit("1995-01-01").cast("date")
        ).cast("long").alias("days_since"),
    )


ORACLE_DATE_FUNCS = """
SELECT o_orderkey,
       CAST(year(o_orderdate) AS BIGINT) AS yr,
       CAST(month(o_orderdate) AS BIGINT) AS mon,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(date_diff('day', DATE '1995-01-01', CAST(o_orderdate AS DATE))
            AS BIGINT) AS days_since
FROM orders
"""


def q_json_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON extraction from events.props (the reference parses JSONL
    metadata lines, src/main.rs:345)."""
    e = load(spark, sf_dir, "events")
    return e.select(
        "event_id",
        F.get_json_object("props", "$.k").cast("long").alias("k_val"),
    )


ORACLE_JSON_FUNCS = """
SELECT event_id, CAST(json_extract_string(props, '$.k') AS BIGINT) AS k_val
FROM events
"""


def q_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array/HOF surface over embeddings (P7 list projections,
    src/main.rs:511-565): size, element access, transform+aggregate, filter."""
    em = load(spark, sf_dir, "embeddings")
    vec_sum = F.aggregate(
        F.transform("embedding", lambda x: x.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    n_pos = F.size(F.filter("embedding", lambda x: x > 0))
    return em.select(
        "vec_id",
        F.size("embedding").cast("long").alias("dim"),
        F.element_at("embedding", 1).cast("double").alias("first_elem"),
        sround(vec_sum, 3).alias("vec_sum"),
        n_pos.cast("long").alias("n_pos"),
    )


ORACLE_ARRAY_FUNCS = """
SELECT vec_id,
       CAST(len(embedding) AS BIGINT) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_elem,
       round(list_sum(list_transform(embedding, x -> CAST(x AS DOUBLE)))
             * 1000.0) / 1000.0 + 0.0 AS vec_sum,
       CAST(len(list_filter(embedding, x -> x > 0)) AS BIGINT) AS n_pos
FROM embeddings
"""


QUERIES = {
    "q_agg_count": q_agg_count,
    "q_agg_group": q_agg_group,
    "q_agg_distinct": q_agg_distinct,
    "q_agg_minmax": q_agg_minmax,
    "q_rollup": q_rollup,
    "q_join_inner": q_join_inner,
    "q_join_left": q_join_left,
    "q_join_fallback": q_join_fallback,
    "q_join_semi_anti": q_join_semi_anti,
    "q_dedup_first": q_dedup_first,
    "q_window_rownum": q_window_rownum,
    "q_window_bucket": q_window_bucket,
    "q_window_rank": q_window_rank,
    "q_window_lag": q_window_lag,
    "q_sort_limit": q_sort_limit,
    "q_set_ops": q_set_ops,
    "q_filter_in": q_filter_in,
    "q_scalar_arith": q_scalar_arith,
    "q_null_default": q_null_default,
    "q_struct_pack": q_struct_pack,
    "q_schema_union": q_schema_union,
    "q_project_normalize": q_project_normalize,
    "q_project_basename": q_project_basename,
    "q_date_funcs": q_date_funcs,
    "q_json_funcs": q_json_funcs,
    "q_array_funcs": q_array_funcs,
}

ORACLES = {
    "q_agg_count": ORACLE_AGG_COUNT,
    "q_agg_group": ORACLE_AGG_GROUP,
    "q_agg_distinct": ORACLE_AGG_DISTINCT,
    "q_agg_minmax": ORACLE_AGG_MINMAX,
    "q_rollup": ORACLE_ROLLUP,
    "q_join_inner": ORACLE_JOIN_INNER,
    "q_join_left": ORACLE_JOIN_LEFT,
    "q_join_fallback": ORACLE_JOIN_FALLBACK,
    "q_join_semi_anti": ORACLE_JOIN_SEMI_ANTI,
    "q_dedup_first": ORACLE_DEDUP_FIRST,
    "q_window_rownum": ORACLE_WINDOW_ROWNUM,
    "q_window_bucket": ORACLE_WINDOW_BUCKET,
    "q_window_rank": ORACLE_WINDOW_RANK,
    "q_window_lag": ORACLE_WINDOW_LAG,
    "q_sort_limit": ORACLE_SORT_LIMIT,
    "q_set_ops": ORACLE_SET_OPS,
    "q_filter_in": ORACLE_FILTER_IN,
    "q_scalar_arith": ORACLE_SCALAR_ARITH,
    "q_null_default": ORACLE_NULL_DEFAULT,
    "q_struct_pack": ORACLE_STRUCT_PACK,
    "q_schema_union": ORACLE_SCHEMA_UNION,
    "q_project_normalize": ORACLE_PROJECT_NORMALIZE,
    "q_project_basename": ORACLE_PROJECT_BASENAME,
    "q_date_funcs": ORACLE_DATE_FUNCS,
    "q_json_funcs": ORACLE_JSON_FUNCS,
    "q_array_funcs": ORACLE_ARRAY_FUNCS,
}
