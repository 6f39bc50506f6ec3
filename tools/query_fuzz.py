"""SQLsmith-lite: randomized differential fuzzing of the relational core
(VERDICT r9 item 3).

The codec layer has mutation fuzz (18 formats, 24k trials) but the SQL
surface only had fixed queries. This tool generates random
filter/project/groupBy/window/join/set-op compositions over the testdata
schema
TWICE per seed — once as a PySpark DataFrame plan (the API the engine
uses) and once as a DuckDB SQL twin — runs both on the same parquet, and
compares row count, column names, and the order-insensitive canonical
value hash from ``tools/check.py``. Any divergence is a real
NULL/tie-break/cast/collation bug no hand-written query encodes.

Generation is DETERMINISTIC per seed (``random.Random(seed)`` drives
everything), so a failing seed is a one-integer repro; pin it in
``tests/test_query_fuzz.py`` as a regression fixture.

The grammar deliberately stays inside the cross-engine-exact subset the
repo's oracle conventions define (see CLAUDE.md):

- Integer arithmetic only at BIGINT width (no int32 overflow under
  Spark 4's ANSI mode), ``%`` by literals >= 2 only (both engines
  truncate toward zero), no division anywhere (ANSI DIVIDE_BY_ZERO).
- Float columns pass through untouched (same parquet bits on both
  sides) or through identical IEEE +,-,* trees suffixed ``+ 0.0`` to
  kill -0.0; floats never become group/distinct keys.
- Every ORDER BY carries an explicit NULLS FIRST and a total-order
  tie-break (the base's left-table primary key, which stays unique
  through every FK->PK join in ``BASES``); Spark and DuckDB default
  NULL ordering disagree, so it is always spelled out on both sides.
- ``concat(a, b)`` pairs with ``a || b`` (NULL-chaining), never
  ``concat_ws`` (NULL-skipping).
- char functions (substr/length/upper/lower) only touch known-ASCII
  columns: ``documents.text`` and ``events.props`` are excluded from
  the grammar entirely.
- timestamps: date_trunc on the Spark side pairs with
  ``CAST(date_trunc(...) AS TIMESTAMP)`` on DuckDB (whose 'day'
  truncation yields DATE); literals render as naive TIMESTAMP
  (session zone pinned UTC by ``session.tune``).

Round 11 (VERDICT r10 items 3 + 6): ``--nulls`` reruns any seed range
against a NULL-injected copy where ONLY non-key, non-order columns go
dirty (PKs and BASES join keys stay clean, preserving the order
contract that made r10 reject PK injection — see FUZZ_NULL_RULES);
LEFT-join bases sometimes filter their dimension BEFORE the join, so
left rows genuinely miss and extend with NULLs (the referentially
intact FK->PK paths never produced a NULL-extended row before); and an
``aggjoin`` shape joins two independently-filtered GROUP BY branches
on their group keys (the grouped-NULL-key join seam: both engines
group NULL keys into one row, but that row must not equi-join — an
inner join drops it, a LEFT join NULL-extends it).

Round 12 (VERDICT r11 item 6): a ``winjoin`` shape windows OVER a LEFT
join to a filtered dimension with PARTITION BY a right-table column —
the window partition key is the NULL-able join output itself, so every
miss row must land in ONE shared NULL partition on both engines while
the in-partition ORDER BY stays on the never-NULL left PK.

Usage:
    python tools/query_fuzz.py [--seeds N] [--start S] [--sf-dir DIR]
                               [--nulls] [--verbose]

Prints one line per divergent seed (with both query texts) and a final
``N seeds, 0 failures`` summary; exit 0 iff no divergence. Default 300
seeds at sf0.001 (~3-4 min).
"""

from __future__ import annotations

import argparse
import os
import random
import sys
from datetime import datetime
from types import SimpleNamespace

import duckdb

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from check import table_hash  # noqa: E402 — reuse the gate's comparator

# DuckDB 1.0.x mis-counts COUNT(date_trunc(d)) over outer-join miss rows
# (function-output NULL statistics survive the join; seed 105). The
# oracle-side IS NULL wrapper in ``gen_ts`` is active only on affected
# versions so a container upgrade retires it automatically.
_DUCKDB_DATE_TRUNC_BUG = tuple(
    int(p) for p in duckdb.__version__.split(".")[:2] if p.isdigit()
) < (1, 1)

# --- schema the generator knows (text/props/embedding excluded) -----------

SCHEMAS = {
    "region": [("r_regionkey", "int"), ("r_name", "str")],
    "nation": [("n_nationkey", "int"), ("n_name", "str"),
               ("n_regionkey", "int")],
    "customer": [("c_custkey", "int"), ("c_name", "str"),
                 ("c_nationkey", "int"), ("c_acctbal", "float"),
                 ("c_mktsegment", "str")],
    "supplier": [("s_suppkey", "int"), ("s_name", "str"),
                 ("s_nationkey", "int"), ("s_acctbal", "float")],
    "part": [("p_partkey", "int"), ("p_name", "str"), ("p_brand", "str"),
             ("p_type", "str"), ("p_size", "int"),
             ("p_retailprice", "float")],
    "orders": [("o_orderkey", "int"), ("o_custkey", "int"),
               ("o_orderstatus", "str"), ("o_totalprice", "float"),
               ("o_orderdate", "ts"), ("o_orderpriority", "str")],
    "lineitem": [("l_orderkey", "int"), ("l_partkey", "int"),
                 ("l_suppkey", "int"), ("l_linenumber", "int"),
                 ("l_quantity", "float"), ("l_extendedprice", "float"),
                 ("l_discount", "float"), ("l_tax", "float"),
                 ("l_returnflag", "str"), ("l_linestatus", "str"),
                 ("l_shipdate", "ts")],
    "documents": [("doc_id", "int"), ("lang", "str"), ("source", "str"),
                  ("n_chars", "int")],
    "embeddings": [("vec_id", "int"), ("label", "int")],
}

# Left-table TOTAL-ORDER key: stays unique through every base below
# because each join is FK->PK (the right side is unique per key).
# lineitem has NO small unique key in this synthetic testdata —
# (l_orderkey, l_linenumber) repeats (1161 dup pairs at sf0.001; found
# by this fuzzer's own first run: seeds 62/93/116/129 all picked
# different boundary rows at the LIMIT / different in-partition window
# order). Full lineitem ROWS are unique, so its order key is every
# column, non-floats first.
PKS = {
    "region": ["r_regionkey"], "nation": ["n_nationkey"],
    "customer": ["c_custkey"], "supplier": ["s_suppkey"],
    "part": ["p_partkey"], "orders": ["o_orderkey"],
    "lineitem": ["l_orderkey", "l_linenumber", "l_partkey", "l_suppkey",
                 "l_returnflag", "l_linestatus", "l_shipdate",
                 "l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    "documents": ["doc_id"], "embeddings": ["vec_id"],
}

# (left_table, join) where join = (right_table, left_key, right_key) | None
BASES = [
    ("orders", None), ("customer", None), ("lineitem", None),
    ("part", None), ("documents", None), ("supplier", None),
    ("nation", None), ("embeddings", None),
    ("orders", ("customer", "o_custkey", "c_custkey")),
    ("lineitem", ("orders", "l_orderkey", "o_orderkey")),
    ("customer", ("nation", "c_nationkey", "n_nationkey")),
    ("supplier", ("nation", "s_nationkey", "n_nationkey")),
    ("nation", ("region", "n_regionkey", "r_regionkey")),
    ("lineitem", ("part", "l_partkey", "p_partkey")),
]

_FALLBACK = {"int": [0, 1, 100], "float": [0.0, 1.0],
             "str": ["a"], "ts": [datetime(1995, 1, 1)]}

# --- --nulls mode (VERDICT r10 item 3) -------------------------------------
# Round 10 REJECTED fuzz NULL injection because injecting the PK
# (doc_id) breaks the generator's total-order contract. The injectable
# set below is exactly the complement: non-PK, non-join-key columns
# only (every PKS entry and every BASES join key stays clean), so the
# ORDER BY <left PK> tie-break stays total and FK->PK joins stay
# referentially intact while measures, names, group keys, and date
# columns go dirty. lineitem has NO injectable column (its order key is
# every column — see PKS) and is copied clean. Conditions key on the
# table's clean PK with distinct moduli (the tools/check.py pattern) so
# injection is deterministic and the null sets overlap but don't
# coincide. Both engines read the SAME injected parquet.
FUZZ_NULL_RULES = {
    "region": ("r_regionkey", (("r_name", 7, 2),)),
    "nation": ("n_nationkey", (("n_name", 5, 1),)),
    "customer": ("c_custkey", (("c_name", 11, 4), ("c_acctbal", 19, 7),
                               ("c_mktsegment", 13, 5))),
    "supplier": ("s_suppkey", (("s_name", 11, 4), ("s_acctbal", 19, 7))),
    "part": ("p_partkey", (("p_name", 11, 4), ("p_brand", 13, 5),
                           ("p_type", 7, 2), ("p_size", 17, 3),
                           ("p_retailprice", 19, 7))),
    "orders": ("o_orderkey", (("o_orderstatus", 13, 5),
                              ("o_totalprice", 19, 7),
                              ("o_orderdate", 23, 11),
                              ("o_orderpriority", 7, 2))),
    "documents": ("doc_id", (("lang", 13, 5), ("source", 23, 11),
                             ("n_chars", 19, 7))),
    "embeddings": ("vec_id", (("label", 13, 5),)),
}


def build_fuzz_nulls_dir(sf_dir: str) -> str:
    """Materialize a temp copy of the fuzzed tables with NULLs injected
    into non-key, non-order columns only (see FUZZ_NULL_RULES)."""
    import tempfile

    out = tempfile.mkdtemp(prefix="spark_graft_fuzz_nulls_")
    con = duckdb.connect()
    for t in SCHEMAS:
        src = os.path.join(sf_dir, f"{t}.parquet")
        dst = os.path.join(out, f"{t}.parquet")
        if t in FUZZ_NULL_RULES:
            key, rules = FUZZ_NULL_RULES[t]
            repl = ", ".join(
                f"CASE WHEN {key} % {m} = {r} THEN NULL"
                f" ELSE {col} END AS {col}"
                for col, m, r in rules
            )
            con.execute(
                f"COPY (SELECT * REPLACE ({repl}) FROM '{src}') "
                f"TO '{dst}' (FORMAT PARQUET)"
            )
        else:
            con.execute(
                f"COPY (SELECT * FROM '{src}') TO '{dst}' (FORMAT PARQUET)"
            )
    con.close()
    return out


def gather_lits(sf_dir: str) -> dict[str, list]:
    """Deterministic per-column literal pools: quantiles for ordered
    types, the first 64 distinct values for strings. Sampled once per
    run so predicates hit real selectivities."""
    con = duckdb.connect()
    lits: dict[str, list] = {}
    for t, cols in SCHEMAS.items():
        src = os.path.join(sf_dir, f"{t}.parquet")
        for c, typ in cols:
            try:
                if typ == "str":
                    vals = [r[0] for r in con.execute(
                        f"SELECT DISTINCT {c} FROM '{src}' "
                        f"WHERE {c} IS NOT NULL ORDER BY {c} LIMIT 64"
                    ).fetchall()]
                else:
                    (vals,) = con.execute(
                        f"SELECT quantile_disc({c},"
                        " [0.02,0.1,0.25,0.5,0.75,0.9,0.98])"
                        f" FROM '{src}'"
                    ).fetchone()
            except duckdb.Error:
                vals = None
            vals = [v for v in (vals or []) if v is not None]
            lits[c] = vals or list(_FALLBACK[typ])
    con.close()
    return lits


# --- dual-rendered expressions --------------------------------------------
# Every node is (spark Column, duckdb SQL string); the two are built in
# lockstep so the trees are structurally identical.


def _lit_sql(v) -> str:
    if isinstance(v, str):
        return "'" + v.replace("'", "''") + "'"
    if isinstance(v, datetime):
        return f"TIMESTAMP '{v.isoformat(sep=' ')}'"
    return repr(v)  # shortest-round-trip float / int


def _ctx(rng, base, lits):
    lt, join = base
    cols = list(SCHEMAS[lt])
    if join:
        cols += SCHEMAS[join[0]]
    by_type: dict[str, list[str]] = {}
    for c, typ in cols:
        by_type.setdefault(typ, []).append(c)
    return SimpleNamespace(rng=rng, cols=cols, by_type=by_type, lits=lits)


def _col(ctx, typ):
    from pyspark.sql import functions as F

    name = ctx.rng.choice(ctx.by_type[typ])
    c = F.col(name)
    if typ == "int":
        c = c.cast("bigint")  # one arithmetic width on both engines
        return c, f"CAST({name} AS BIGINT)"
    return c, name


def _lit_of(ctx, name):
    return ctx.rng.choice(ctx.lits[name])


def _any_lit(ctx, typ):
    pool = ctx.by_type.get(typ)
    if pool:
        return _lit_of(ctx, ctx.rng.choice(pool))
    return ctx.rng.choice(_FALLBACK[typ])


def gen_int(ctx, depth):
    from pyspark.sql import functions as F

    r = ctx.rng
    if depth <= 0 or r.random() < 0.45:
        if r.random() < 0.75 and ctx.by_type.get("int"):
            return _col(ctx, "int")
        v = int(_any_lit(ctx, "int")) if ctx.by_type.get("int") \
            else r.randint(0, 1000)
        return F.lit(v).cast("bigint"), f"CAST({v} AS BIGINT)"
    kind = r.choice(["add", "sub", "mul", "mod", "case", "coalesce",
                     "length", "abs"])
    if kind in ("add", "sub"):
        a, asql = gen_int(ctx, depth - 1)
        b, bsql = gen_int(ctx, depth - 1)
        op = "+" if kind == "add" else "-"
        return (a + b) if kind == "add" else (a - b), f"({asql} {op} {bsql})"
    if kind == "mul":
        a, asql = gen_int(ctx, depth - 1)
        k = r.randint(0, 9)
        return a * k, f"({asql} * {k})"
    if kind == "mod":
        a, asql = gen_int(ctx, depth - 1)
        m = r.randint(2, 13)
        return a % m, f"({asql} % {m})"
    if kind == "case":
        p, psql = gen_pred(ctx, depth - 1)
        a, asql = gen_int(ctx, depth - 1)
        b, bsql = gen_int(ctx, depth - 1)
        return (F.when(p, a).otherwise(b),
                f"CASE WHEN {psql} THEN {asql} ELSE {bsql} END")
    if kind == "coalesce":
        a, asql = gen_int(ctx, depth - 1)
        v = r.randint(0, 99)
        return (F.coalesce(a, F.lit(v).cast("bigint")),
                f"COALESCE({asql}, CAST({v} AS BIGINT))")
    if kind == "length" and ctx.by_type.get("str"):
        s, ssql = gen_str(ctx, depth - 1)
        return (F.length(s).cast("bigint"),
                f"CAST(length({ssql}) AS BIGINT)")
    a, asql = gen_int(ctx, depth - 1)
    return F.abs(a), f"abs({asql})"


def gen_str(ctx, depth):
    from pyspark.sql import functions as F

    r = ctx.rng
    if not ctx.by_type.get("str"):
        v = r.choice(["alpha", "beta", "gamma"])
        return F.lit(v), _lit_sql(v)
    if depth <= 0 or r.random() < 0.5:
        if r.random() < 0.8:
            return _col(ctx, "str")
        v = _any_lit(ctx, "str")
        return F.lit(v), _lit_sql(v)
    kind = r.choice(["upper", "lower", "substr", "concat", "case"])
    if kind in ("upper", "lower"):
        a, asql = gen_str(ctx, depth - 1)
        fn = F.upper if kind == "upper" else F.lower
        return fn(a), f"{kind}({asql})"
    if kind == "substr":
        a, asql = gen_str(ctx, depth - 1)
        start, n = r.randint(1, 3), r.randint(1, 8)
        return (F.substring(a, start, n), f"substr({asql}, {start}, {n})")
    if kind == "concat":
        a, asql = gen_str(ctx, depth - 1)
        b, bsql = gen_str(ctx, depth - 1)
        # concat == || : NULL if either side is NULL (never concat_ws)
        return F.concat(a, b), f"({asql} || {bsql})"
    p, psql = gen_pred(ctx, depth - 1)
    a, asql = gen_str(ctx, depth - 1)
    b, bsql = gen_str(ctx, depth - 1)
    return (F.when(p, a).otherwise(b),
            f"CASE WHEN {psql} THEN {asql} ELSE {bsql} END")


def gen_float(ctx, depth):
    """Float exprs stay bit-deterministic: raw column, or identical
    IEEE +,-,* trees with a trailing ``+ 0.0`` that kills -0.0."""
    from pyspark.sql import functions as F

    r = ctx.rng
    if not ctx.by_type.get("float"):
        return F.lit(1.5), "1.5"
    if depth <= 0 or r.random() < 0.6:
        return _col(ctx, "float")
    a, asql = gen_float(ctx, depth - 1)
    if r.random() < 0.5:
        b, bsql = gen_float(ctx, depth - 1)
        op = r.choice(["+", "-", "*"])
        c = {"+": a + b, "-": a - b, "*": a * b}[op]
        return c + 0.0, f"(({asql} {op} {bsql}) + 0.0)"
    k = round(r.uniform(-2, 2), 2)
    return (a * k) + 0.0, f"(({asql} * {_lit_sql(k)}) + 0.0)"


def gen_ts(ctx, depth):
    from pyspark.sql import functions as F

    r = ctx.rng
    name = r.choice(ctx.by_type["ts"])
    if depth <= 0 or r.random() < 0.5:
        return F.col(name), name
    unit = r.choice(["hour", "day", "month", "year"])
    # DuckDB's day/month/year truncation yields DATE; CAST back so both
    # sides compare as timestamps. The IS NULL guard is semantically a
    # no-op (date_trunc(NULL) IS NULL) but defeats a DuckDB 1.0.0
    # optimizer bug the LEFT-join shape exposed (seed 105, pinned):
    # COUNT(date_trunc(d)) over outer-join MISS rows counts them as
    # non-NULL (statistics mark date_trunc's output never-NULL from the
    # pre-join input stats), returning COUNT(*) instead of 0 — while
    # COUNT(d), MIN/MAX(date_trunc(d)), and string functions are all
    # correct. Spark was right; the guard keeps the oracle honest. On a
    # DuckDB with the fix (1.1+) the guard is dropped so the oracle
    # exercises the native path — and the version-gated regression test
    # (tests/test_query_fuzz.py seed 105) proves whichever path is
    # active still differentially matches.
    if _DUCKDB_DATE_TRUNC_BUG:
        return (F.date_trunc(unit, F.col(name)),
                f"CASE WHEN {name} IS NULL THEN NULL ELSE "
                f"CAST(date_trunc('{unit}', {name}) AS TIMESTAMP) END")
    return (F.date_trunc(unit, F.col(name)),
            f"CAST(date_trunc('{unit}', {name}) AS TIMESTAMP)")


def gen_scalar(ctx, depth, types=("int", "str", "float", "ts")):
    avail = [t for t in types if t in ctx.by_type or t in ("int", "str")]
    t = ctx.rng.choice(avail)
    fn = {"int": gen_int, "str": gen_str, "float": gen_float,
          "ts": gen_ts}[t]
    col, sql = fn(ctx, depth)
    return col, sql, t


_CMP = {"=": "=", "<": "<", "<=": "<=", ">": ">", ">=": ">=", "<>": "<>"}


def _cmp(a, b, op):
    return {"=": a == b, "<": a < b, "<=": a <= b, ">": a > b,
            ">=": a >= b, "<>": a != b}[op]


def gen_pred(ctx, depth):
    from pyspark.sql import functions as F

    r = ctx.rng
    if depth > 0 and r.random() < 0.35:
        kind = r.choice(["and", "or", "not"])
        a, asql = gen_pred(ctx, depth - 1)
        if kind == "not":
            return ~a, f"(NOT {asql})"
        b, bsql = gen_pred(ctx, depth - 1)
        if kind == "and":
            return a & b, f"({asql} AND {bsql})"
        return a | b, f"({asql} OR {bsql})"
    kind = r.choice(["int_cmp", "str_cmp", "float_cmp", "ts_cmp",
                     "null", "in", "like"])
    if kind == "float_cmp" and ctx.by_type.get("float"):
        c, csql = _col(ctx, "float")
        name = csql  # raw column name
        v = _lit_of(ctx, name)
        op = r.choice([">", "<", ">=", "<="])
        return _cmp(c, F.lit(v), op), f"({csql} {op} {_lit_sql(v)})"
    if kind == "ts_cmp" and ctx.by_type.get("ts"):
        name = r.choice(ctx.by_type["ts"])
        v = _lit_of(ctx, name)
        op = r.choice([">", "<", ">=", "<="])
        return (_cmp(F.col(name), F.lit(v), op),
                f"({name} {op} {_lit_sql(v)})")
    if kind == "str_cmp" and ctx.by_type.get("str"):
        name = r.choice(ctx.by_type["str"])
        v = _lit_of(ctx, name)
        op = r.choice(["=", "<>", "<", ">"])
        return (_cmp(F.col(name), F.lit(v), op),
                f"({name} {op} {_lit_sql(v)})")
    if kind == "null":
        name, _typ = r.choice(ctx.cols)
        if r.random() < 0.5:
            return F.col(name).isNull(), f"({name} IS NULL)"
        return F.col(name).isNotNull(), f"({name} IS NOT NULL)"
    if kind == "in":
        typ = r.choice([t for t in ("int", "str") if ctx.by_type.get(t)])
        name = r.choice(ctx.by_type[typ])
        vals = [_lit_of(ctx, name) for _ in range(r.randint(1, 4))]
        return (F.col(name).isin(vals),
                f"({name} IN ({', '.join(_lit_sql(v) for v in vals)}))")
    if kind == "like" and ctx.by_type.get("str"):
        name = r.choice(ctx.by_type["str"])
        sample = str(_lit_of(ctx, name))
        i = r.randint(0, max(0, len(sample) - 3))
        frag = "".join(ch for ch in sample[i:i + r.randint(1, 4)]
                       if ch.isalnum() or ch == " ") or "a"
        pat = r.choice([f"%{frag}%", f"{frag}%", f"%{frag}"])
        return F.col(name).like(pat), f"({name} LIKE {_lit_sql(pat)})"
    # fallback: int comparison (always available — every table has ints)
    a, asql = gen_int(ctx, min(depth, 1))
    b, bsql = gen_int(ctx, min(depth, 1))
    op = r.choice(list(_CMP))
    return _cmp(a, b, op), f"({asql} {op} {bsql})"


# --- query shapes ----------------------------------------------------------


def _order_sql(pks, prefix=""):
    return ", ".join(f"{prefix}{c} ASC NULLS FIRST" for c in pks)


def _order_cols(pks):
    from pyspark.sql import functions as F

    return [F.col(c).asc_nulls_first() for c in pks]


def _from_sql(base, rfilter=None):
    lt, join = base
    if not join:
        return lt, "inner"
    rt, lk, rk = join[:3]
    how = join[3]
    kw = "JOIN" if how == "inner" else "LEFT JOIN"
    rsrc = rt
    if rfilter is not None:
        # filtered dimension (VERDICT r10 item 6): the FK->PK BASES
        # paths are referentially intact, so a plain LEFT JOIN never
        # produces a NULL-extended row — filtering the right side
        # before the join manufactures real misses, fuzzing the
        # NULL-semantics seam joins create.
        rsrc = f"(SELECT * FROM {rt} WHERE {rfilter[1]}) {rt}"
    return f"{lt} {kw} {rsrc} ON {lt}.{lk} = {rt}.{rk}", how


def _load_base(spark, sf_dir, base, rfilter=None):
    from pyspark.sql import functions as F

    from audios_to_dataset_spark.catalog import load

    lt, join = base
    df = load(spark, sf_dir, lt)
    if join:
        rt, lk, rk, how = join
        right = load(spark, sf_dir, rt)
        if rfilter is not None:
            right = right.filter(rfilter[0])
        df = df.join(right, on=F.col(lk) == F.col(rk), how=how)
    return df


def gen_query(rng, lits):
    """One random query: returns (build_df(spark, sf_dir), sql, shape)."""
    base_l, base_j = rng.choice(BASES)
    rfilter = None
    if base_j:
        how = rng.choice(["inner", "left"])
        base = (base_l, (*base_j, how))
        if how == "left" and rng.random() < 0.6:
            # LEFT join to a FILTERED dimension: the right side loses
            # rows, so some left rows miss and extend with NULLs —
            # the join-made-NULL seam (VERDICT r10 item 6). The filter
            # predicate sees ONLY right-table columns.
            rctx = _ctx(rng, (base_j[0], None), lits)
            rfilter = gen_pred(rctx, 2)
    else:
        base = (base_l, None)
    ctx = _ctx(rng, (base_l, base_j), lits)
    from_sql, _how = _from_sql(base, rfilter)
    pks = PKS[base_l]

    n_pred = rng.randint(0, 2)
    preds = [gen_pred(ctx, 2) for _ in range(n_pred)]
    where_sql = ""
    if preds:
        where_sql = " WHERE " + " AND ".join(p[1] for p in preds)

    shape = rng.choice(["project", "project", "distinct", "group",
                        "group", "window", "setop", "aggjoin", "winjoin"])

    if shape == "winjoin" and base_j:
        # Window OVER a LEFT join, PARTITION BY a right-table column
        # (VERDICT r11 item 6): the join is forced to LEFT against a
        # FILTERED dimension so miss rows NULL-extend, and the window's
        # partition key is exactly that NULL-able join output — the
        # seam where all miss rows must collapse into ONE partition on
        # both engines, while Spark and DuckDB order NULLs oppositely
        # by default (the ORDER BY stays on the never-NULL left PK, so
        # in-partition order is total). The composition the aggjoin
        # shape almost but not quite covers.
        from pyspark.sql import Window
        from pyspark.sql import functions as F

        base2 = (base_l, (*base_j, "left"))
        rfilter2 = rfilter
        if rfilter2 is None:
            rctx = _ctx(rng, (base_j[0], None), lits)
            rfilter2 = gen_pred(rctx, 2)
        from_sql2, _h = _from_sql(base2, rfilter2)
        rcols = [c for c, t in SCHEMAS[base_j[0]] if t in ("int", "str")]
        pname = rng.choice(rcols)
        n = rng.randint(1, 2)
        exprs = [gen_scalar(ctx, 1) for _ in range(n)]
        over_sql = f"PARTITION BY {pname} ORDER BY {_order_sql(pks)}"
        w = Window.partitionBy(F.col(pname)).orderBy(*_order_cols(pks))
        wkind = rng.choice(["row_number", "lag", "running_sum"])
        if wkind == "row_number":
            wcol = F.row_number().over(w)
            wsql = f"row_number() OVER ({over_sql})"
            cap = rng.randint(1, 5)
        elif wkind == "lag":
            v, vsql = gen_int(ctx, 1)
            wcol = F.lag(v, 1).over(w)
            wsql = f"lag({vsql}, 1) OVER ({over_sql})"
            cap = None
        else:
            v, vsql = gen_int(ctx, 1)
            wcol = F.sum(v).over(
                w.rowsBetween(Window.unboundedPreceding,
                              Window.currentRow)).cast("bigint")
            wsql = (f"CAST(SUM({vsql}) OVER ({over_sql} ROWS BETWEEN"
                    " UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)")
            cap = None
        sel = ", ".join(f"{sql} AS c{i}"
                        for i, (_c, sql, _t2) in enumerate(exprs))
        inner = (f"SELECT {sel}, {pname} AS pk0, {wsql} AS w0"
                 f" FROM {from_sql2}{where_sql}")
        sql = f"SELECT * FROM ({inner}) sub" + (
            f" WHERE w0 <= {cap}" if cap else "")

        def build(spark, sf_dir):
            df = _load_base(spark, sf_dir, base2, rfilter2)
            for p, _s in preds:
                df = df.filter(p)
            out = df.select(
                *[c.alias(f"c{i}")
                  for i, (c, _s, _t2) in enumerate(exprs)],
                F.col(pname).alias("pk0"),
                wcol.alias("w0"))
            if cap:
                out = out.filter(F.col("w0") <= cap)
            return out

        return build, sql, shape

    if shape == "aggjoin":
        # Two independently-filtered GROUP BY branches over the SAME
        # base, joined on their group keys (round 11): fuzzes the
        # grouped-NULL-key join seam — both engines group NULL keys
        # into one row, but that row must NOT join (NULL ≠ NULL), so
        # an inner join drops it and a LEFT join NULL-extends it.
        # Output rows are unique per left-branch key, so the
        # order-insensitive hash needs no ORDER contract.
        n_keys = rng.randint(1, 2)
        keys = [gen_scalar(ctx, 1, types=("int", "str", "ts"))
                for _ in range(n_keys)]
        how = rng.choice(["JOIN", "LEFT JOIN"])
        branches = []
        for side in ("l", "r"):
            from pyspark.sql import functions as F

            predsb = [gen_pred(ctx, 2) for _ in range(rng.randint(0, 2))]
            aggs = []
            for i in range(rng.randint(1, 2)):
                a = rng.choice(["count_star", "sum"])
                if a == "count_star":
                    aggs.append((
                        F.count(F.lit(1)).alias(f"a{i}_{side}"),
                        f"CAST(COUNT(*) AS BIGINT) AS a{i}_{side}",
                    ))
                else:
                    c, csql = gen_int(ctx, 1)
                    aggs.append((
                        F.sum(c).cast("bigint").alias(f"a{i}_{side}"),
                        f"CAST(SUM({csql}) AS BIGINT) AS a{i}_{side}",
                    ))
            branches.append((predsb, aggs))
        key_sel = ", ".join(f"{sql} AS k{i}"
                            for i, (_c, sql, _t) in enumerate(keys))
        group_by = ", ".join(str(i + 1) for i in range(n_keys))
        subs = []
        for side, (predsb, aggs) in zip(("l", "r"), branches):
            wsql = (" WHERE " + " AND ".join(p[1] for p in predsb)
                    if predsb else "")
            agg_sel = ", ".join(s for _c, s in aggs)
            subs.append(
                f"(SELECT {key_sel}, {agg_sel} FROM {from_sql}{wsql}"
                f" GROUP BY {group_by})"
            )
        using = ", ".join(f"k{i}" for i in range(n_keys))
        sql = (f"SELECT * FROM {subs[0]} lft {how} {subs[1]} rgt"
               f" USING ({using})")

        def build(spark, sf_dir):
            outs = []
            for _side, (predsb, aggs) in zip(("l", "r"), branches):
                df = _load_base(spark, sf_dir, base, rfilter)
                for p, _s in predsb:
                    df = df.filter(p)
                g = df.groupBy(*[c.alias(f"k{i}")
                                 for i, (c, _s, _t) in enumerate(keys)])
                outs.append(g.agg(*[c for c, _s in aggs]))
            howp = "inner" if how == "JOIN" else "left"
            return outs[0].join(
                outs[1], [f"k{i}" for i in range(n_keys)], howp)

        return build, sql, shape

    if shape == "setop":
        # Two predicate branches over the SAME base, combined with a
        # distinct-semantics set operation (UNION / INTERSECT / EXCEPT).
        # Both engines treat NULLs as equal in set ops; float columns
        # are excluded like the distinct shape (−0.0/NaN equality).
        n = rng.randint(1, 3)
        exprs = [gen_scalar(ctx, 2, types=("int", "str", "ts"))
                 for _ in range(n)]
        preds2 = [gen_pred(ctx, 2) for _ in range(rng.randint(0, 2))]
        where2_sql = ""
        if preds2:
            where2_sql = " WHERE " + " AND ".join(p[1] for p in preds2)
        op = rng.choice(["UNION", "INTERSECT", "EXCEPT"])
        sel = ", ".join(f"{sql} AS c{i}"
                        for i, (_c, sql, _t) in enumerate(exprs))
        sql = (f"SELECT {sel} FROM {from_sql}{where_sql} {op} "
               f"SELECT {sel} FROM {from_sql}{where2_sql}")

        def build(spark, sf_dir):
            d1 = _load_base(spark, sf_dir, base, rfilter)
            d2 = _load_base(spark, sf_dir, base, rfilter)
            for p, _s in preds:
                d1 = d1.filter(p)
            for p, _s in preds2:
                d2 = d2.filter(p)
            cols = [c.alias(f"c{i}")
                    for i, (c, _s, _t) in enumerate(exprs)]
            d1, d2 = d1.select(*cols), d2.select(*cols)
            if op == "UNION":
                return d1.unionByName(d2).distinct()
            if op == "INTERSECT":
                return d1.intersect(d2)
            return d1.subtract(d2)  # EXCEPT (distinct semantics)

        return build, sql, shape

    if shape == "project":
        n = rng.randint(1, 5)
        exprs = [gen_scalar(ctx, 2) for _ in range(n)]
        limit = rng.randint(1, 50)
        sel = ", ".join(f"{sql} AS c{i}"
                        for i, (_c, sql, _t) in enumerate(exprs))
        sql = (f"SELECT {sel} FROM {from_sql}{where_sql} "
               f"ORDER BY {_order_sql(pks)} LIMIT {limit}")

        def build(spark, sf_dir):
            df = _load_base(spark, sf_dir, base, rfilter)
            for p, _s in preds:
                df = df.filter(p)
            df = df.orderBy(*_order_cols(pks)).limit(limit)
            return df.select(*[c.alias(f"c{i}")
                               for i, (c, _s, _t) in enumerate(exprs)])

        return build, sql, shape

    if shape == "distinct":
        n = rng.randint(1, 3)
        exprs = [gen_scalar(ctx, 2, types=("int", "str", "ts"))
                 for _ in range(n)]
        sel = ", ".join(f"{sql} AS c{i}"
                        for i, (_c, sql, _t) in enumerate(exprs))
        sql = f"SELECT DISTINCT {sel} FROM {from_sql}{where_sql}"

        def build(spark, sf_dir):
            df = _load_base(spark, sf_dir, base, rfilter)
            for p, _s in preds:
                df = df.filter(p)
            return df.select(*[c.alias(f"c{i}")
                               for i, (c, _s, _t) in
                               enumerate(exprs)]).distinct()

        return build, sql, shape

    if shape == "group":
        from pyspark.sql import functions as F

        n_keys = rng.randint(0, 2)
        keys = [gen_scalar(ctx, 1, types=("int", "str", "ts"))
                for _ in range(n_keys)]
        n_aggs = rng.randint(1, 4)
        aggs = []  # (Column, sql)
        for i in range(n_aggs):
            a = rng.choice(["count_star", "count", "sum", "min", "max"])
            if a == "count_star":
                aggs.append((F.count(F.lit(1)).alias(f"a{i}"),
                             f"CAST(COUNT(*) AS BIGINT) AS a{i}"))
            elif a == "count":
                c, csql, _t = gen_scalar(ctx, 1)
                aggs.append((F.count(c).alias(f"a{i}"),
                             f"CAST(COUNT({csql}) AS BIGINT) AS a{i}"))
            elif a == "sum":
                c, csql = gen_int(ctx, 1)
                aggs.append((F.sum(c).cast("bigint").alias(f"a{i}"),
                             f"CAST(SUM({csql}) AS BIGINT) AS a{i}"))
            else:
                c, csql, _t = gen_scalar(ctx, 1)
                fn = F.min if a == "min" else F.max
                aggs.append((fn(c).alias(f"a{i}"),
                             f"{a.upper()}({csql}) AS a{i}"))
        key_sel = ", ".join(f"{sql} AS k{i}"
                            for i, (_c, sql, _t) in enumerate(keys))
        agg_sel = ", ".join(sql for _c, sql in aggs)
        sel = ", ".join(x for x in (key_sel, agg_sel) if x)
        group_sql = ""
        having_sql = ""
        if keys:
            group_sql = " GROUP BY " + ", ".join(
                str(i + 1) for i in range(len(keys)))
            if rng.random() < 0.3:
                k = rng.randint(1, 5)
                having_sql = f" HAVING COUNT(*) > {k}"
        sql = f"SELECT {sel} FROM {from_sql}{where_sql}{group_sql}{having_sql}"

        def build(spark, sf_dir):
            df = _load_base(spark, sf_dir, base, rfilter)
            for p, _s in preds:
                df = df.filter(p)
            acols = [c for c, _s in aggs]
            if keys:
                g = df.groupBy(*[c.alias(f"k{i}")
                                 for i, (c, _s, _t) in enumerate(keys)])
                if having_sql:
                    out = g.agg(*acols,
                                F.count(F.lit(1)).alias("__hn"))
                    k = int(having_sql.rsplit(">", 1)[1])
                    return out.filter(F.col("__hn") > k).drop("__hn")
                return g.agg(*acols)
            return df.agg(*acols)

        return build, sql, shape

    # window shape
    from pyspark.sql import Window
    from pyspark.sql import functions as F

    # raw COLUMN partition key only: a literal would read as positional
    # in SQL (`PARTITION BY 1`) and constant in the DataFrame API
    ptyp = rng.choice([t for t in ("int", "str") if ctx.by_type.get(t)])
    pname = rng.choice(ctx.by_type[ptyp])
    part_c, part_sql = F.col(pname), pname
    n = rng.randint(1, 3)
    exprs = [gen_scalar(ctx, 1) for _ in range(n)]
    over_sql = (f"PARTITION BY {part_sql} "
                f"ORDER BY {_order_sql(pks)}")
    w = (Window.partitionBy(part_c)
         .orderBy(*_order_cols(pks)))
    wkind = rng.choice(["row_number", "lag", "lead", "running_sum"])
    if wkind == "row_number":
        wcol = F.row_number().over(w)
        wsql = f"row_number() OVER ({over_sql})"
        cap = rng.randint(1, 5)
    elif wkind in ("lag", "lead"):
        v, vsql = gen_int(ctx, 1)
        fn = F.lag if wkind == "lag" else F.lead
        wcol = fn(v, 1).over(w)
        wsql = f"{wkind}({vsql}, 1) OVER ({over_sql})"
        cap = None
    else:
        v, vsql = gen_int(ctx, 1)
        wcol = F.sum(v).over(
            w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        wsql = (f"CAST(SUM({vsql}) OVER ({over_sql} ROWS BETWEEN"
                " UNBOUNDED PRECEDING AND CURRENT ROW) AS BIGINT)")
        wcol = wcol.cast("bigint")
        cap = None
    sel = ", ".join(f"{sql} AS c{i}"
                    for i, (_c, sql, _t2) in enumerate(exprs))
    inner = (f"SELECT {sel}, {wsql} AS w0 FROM {from_sql}{where_sql}")
    sql = f"SELECT * FROM ({inner}) sub" + (
        f" WHERE w0 <= {cap}" if cap else "")

    def build(spark, sf_dir):
        df = _load_base(spark, sf_dir, base, rfilter)
        for p, _s in preds:
            df = df.filter(p)
        out = df.select(*[c.alias(f"c{i}")
                          for i, (c, _s, _t2) in enumerate(exprs)],
                        wcol.alias("w0"))
        if cap:
            out = out.filter(F.col("w0") <= cap)
        return out

    return build, sql, "window"


# --- runner -----------------------------------------------------------------


def run_seed(spark, con, sf_dir, lits, seed):
    """Returns (ok, detail, sql, shape, n_rows)."""
    rng = random.Random(seed)
    build, sql, shape = gen_query(rng, lits)
    df = build(spark, sf_dir)
    srows = [tuple(r) for r in df.collect()]
    scols = list(df.columns)
    res = con.execute(sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    if len(srows) != len(orows):
        return (False,
                f"rowcount spark={len(srows)} duckdb={len(orows)}",
                sql, shape, len(srows))
    if sorted(scols) != sorted(ocols):
        return (False, f"cols spark={sorted(scols)} duckdb={sorted(ocols)}",
                sql, shape, len(srows))
    hs = table_hash(scols, srows)
    ho = table_hash(ocols, orows)
    if hs != ho:
        order_s = sorted(range(len(scols)), key=lambda i: scols[i])
        order_o = sorted(range(len(ocols)), key=lambda i: ocols[i])
        from check import canon
        ls = sorted("\x1f".join(canon(r[i]) for i in order_s)
                    for r in srows)
        lo = sorted("\x1f".join(canon(r[i]) for i in order_o)
                    for r in orows)
        diff = next((f"spark={a[:160]} duckdb={b[:160]}"
                     for a, b in zip(ls, lo) if a != b), "tail rows differ")
        return False, f"value-hash mismatch: {diff}", sql, shape, len(srows)
    return True, "", sql, shape, len(srows)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seeds", type=int, default=300)
    ap.add_argument("--start", type=int, default=1)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--nulls", action="store_true",
                    help="run against a NULL-injected copy (non-key,"
                         " non-order columns only — see FUZZ_NULL_RULES)")
    ap.add_argument("--verbose", action="store_true")
    args = ap.parse_args()
    if args.nulls:
        args.sf_dir = build_fuzz_nulls_dir(args.sf_dir)
        print(f"NULL-injected fuzz copy: {args.sf_dir}")

    from audios_to_dataset_spark.session import get_session

    spark = get_session("query_fuzz")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in SCHEMAS:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{args.sf_dir}/{t}.parquet'"
        )
    lits = gather_lits(args.sf_dir)

    failures = []
    shapes: dict[str, int] = {}
    for seed in range(args.start, args.start + args.seeds):
        try:
            ok, detail, sql, shape, n = run_seed(
                spark, con, args.sf_dir, lits, seed)
        except Exception as e:  # either engine erroring IS a finding
            failures.append(seed)
            print(f"FAIL seed={seed}: engine error "
                  f"{type(e).__name__}: {str(e)[:300]}")
            continue
        shapes[shape] = shapes.get(shape, 0) + 1
        if ok:
            if args.verbose:
                print(f"OK   seed={seed} [{shape}] {n} rows")
        else:
            failures.append(seed)
            print(f"FAIL seed={seed} [{shape}]: {detail}\n  SQL: {sql}")
    print(f"shapes: {shapes}")
    print(f"\n{args.seeds} seeds, {len(failures)} failures"
          + (f": {failures}" if failures else ""))
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
