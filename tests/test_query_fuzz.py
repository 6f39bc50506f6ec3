"""Randomized differential fuzz of the relational core (VERDICT r9
item 3): every seed generates one filter/project/groupBy/window/join/set-op
composition twice — a PySpark DataFrame plan and a DuckDB SQL twin —
and compares rows/schema/value-hash on the same sf0.001 parquet.

Two tiers:

- ``test_fuzz_smoke`` (default suite): 25 seeds, ~30 s — keeps the
  generator itself from rotting.
- ``test_fuzz_deep`` (``-m query_fuzz``, excluded from the default run
  like the partition_invariance tier): 300 seeds, the bar VERDICT r9
  set. The CLI twin is ``python tools/query_fuzz.py --seeds 300``.

Any divergence found by either tier (or a longer CLI run) should be
pinned here as an explicit seed in ``REGRESSION_SEEDS`` so it re-runs
forever even after the generator evolves.
"""

from __future__ import annotations

import os
import sys

import duckdb
import pytest

sys.path.insert(
    0, os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                    "tools"))

import query_fuzz  # noqa: E402

# Seeds that ever exposed a divergence get pinned here with a short
# note. 62/93/116/129: the fuzzer's own first 300-seed run caught its
# order contract being non-total — this testdata's lineitem repeats
# (l_orderkey, l_linenumber) (1161 dup pairs at sf0.001), so LIMIT
# boundaries and window orders keyed on it picked different rows per
# engine; lineitem's order key is now the full column set (rows are
# unique). A generator-twin finding, not an engine divergence — but the
# same trap (assuming TPC-H PK uniqueness of this synthetic data) could
# bite a declared query, so the seeds stay pinned.
# 105: the round-11 LEFT-join-to-filtered-dimension shape's FIRST run
# caught a DuckDB 1.0.0 optimizer bug — COUNT(date_trunc(d)) over
# outer-join MISS rows returns COUNT(*) instead of 0 (date_trunc's
# output statistics say never-NULL from the pre-join input), while
# COUNT(d) / MIN / MAX are correct; Spark was right. The oracle twin of
# gen_ts now wraps date_trunc in a semantically-no-op IS NULL guard.
REGRESSION_SEEDS: list[int] = [62, 93, 116, 129, 105]


@pytest.fixture(scope="module")
def fuzz_env(sf_dir_module="/root/testdata/sf0.001"):
    con = duckdb.connect()
    for t in query_fuzz.SCHEMAS:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM "
            f"'{sf_dir_module}/{t}.parquet'"
        )
    lits = query_fuzz.gather_lits(sf_dir_module)
    yield con, lits, sf_dir_module
    con.close()


def _run_range(spark, fuzz_env, start, n):
    con, lits, sf = fuzz_env
    bad = []
    for seed in range(start, start + n):
        ok, detail, sql, shape, _n = query_fuzz.run_seed(
            spark, con, sf, lits, seed)
        if not ok:
            bad.append((seed, shape, detail, sql))
    assert not bad, bad


def test_fuzz_smoke(spark, fuzz_env):
    _run_range(spark, fuzz_env, 1, 25)


def test_fuzz_regressions(spark, fuzz_env):
    con, lits, sf = fuzz_env
    for seed in REGRESSION_SEEDS:
        ok, detail, sql, shape, _n = query_fuzz.run_seed(
            spark, con, sf, lits, seed)
        assert ok, (seed, shape, detail, sql)


def test_date_trunc_outer_join_guard_is_load_bearing():
    """Deterministic pin of the DuckDB 1.0.0 bug the r11 LEFT-join fuzz
    shape caught (seed 105 at the time — seed→query mapping drifts with
    the grammar, so the pin is a minimal repro, not the seed):
    COUNT(date_trunc(d)) over outer-join MISS rows returns COUNT(*)
    instead of 0. On an affected version (< 1.1,
    ``_DUCKDB_DATE_TRUNC_BUG``) the unguarded query must REPRODUCE the
    bug (else the version gate is stale and should be tightened) and
    the IS NULL guard must fix it; on a fixed version both forms must
    agree — either way the gen_ts guard never rots silently."""
    con = duckdb.connect()
    try:
        con.execute("CREATE TABLE t_probe(k INT)")
        con.execute("INSERT INTO t_probe VALUES (1),(2),(3)")
        con.execute("CREATE TABLE d_probe(k INT, d TIMESTAMP)")
        con.execute("INSERT INTO d_probe VALUES (1, '2020-01-01')")
        base = (
            "SELECT t_probe.k, COUNT({expr}) AS c FROM t_probe"
            " LEFT JOIN d_probe ON t_probe.k = d_probe.k"
            " GROUP BY 1 ORDER BY 1"
        )
        raw = con.execute(
            base.format(expr="date_trunc('day', d_probe.d)")
        ).fetchall()
        guarded = con.execute(
            base.format(
                expr="CASE WHEN d_probe.d IS NULL THEN NULL"
                     " ELSE date_trunc('day', d_probe.d) END")
        ).fetchall()
        assert guarded == [(1, 1), (2, 0), (3, 0)]
        if query_fuzz._DUCKDB_DATE_TRUNC_BUG:
            assert raw == [(1, 1), (2, 1), (3, 1)], (
                "unguarded COUNT no longer reproduces the bug —"
                " tighten _DUCKDB_DATE_TRUNC_BUG", raw)
        else:
            assert raw == guarded, (
                "DuckDB >= 1.1 still mis-counts: re-widen the"
                " _DUCKDB_DATE_TRUNC_BUG version gate", raw)
    finally:
        con.close()


@pytest.mark.query_fuzz
def test_fuzz_deep(spark, fuzz_env):
    _run_range(spark, fuzz_env, 1, 300)


@pytest.fixture(scope="module")
def fuzz_nulls_env():
    """NULL-injected copy (VERDICT r10 item 3): non-key, non-order
    columns only — PKs and join keys stay clean so the generator's
    order contract holds (the reason r10 rejected PK injection)."""
    import shutil

    d = query_fuzz.build_fuzz_nulls_dir("/root/testdata/sf0.001")
    con = duckdb.connect()
    for t in query_fuzz.SCHEMAS:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{d}/{t}.parquet'")
    lits = query_fuzz.gather_lits(d)
    yield con, lits, d
    con.close()
    shutil.rmtree(d, ignore_errors=True)


def test_fuzz_nulls_smoke(spark, fuzz_nulls_env):
    _run_range(spark, fuzz_nulls_env, 1, 25)


@pytest.mark.query_fuzz
def test_fuzz_nulls_deep(spark, fuzz_nulls_env):
    _run_range(spark, fuzz_nulls_env, 1, 200)


def test_fuzz_null_rules_never_touch_keys():
    """The --nulls injectable set must stay disjoint from every PK and
    every BASES join key — the exact contract that makes NULL fuzz
    compatible with the generator's total-order / referential
    assumptions (r10 rejected PK injection for breaking them)."""
    join_keys = set()
    for _lt, join in query_fuzz.BASES:
        if join:
            _rt, lk, rk = join
            join_keys |= {lk, rk}
    for t, (key, rules) in query_fuzz.FUZZ_NULL_RULES.items():
        pks = set(query_fuzz.PKS[t])
        assert key in pks, (t, key)
        injected = {col for col, _m, _r in rules}
        assert not injected & pks, (t, injected & pks)
        assert not injected & join_keys, (t, injected & join_keys)
        cols = {c for c, _typ in query_fuzz.SCHEMAS[t]}
        assert injected <= cols, (t, injected - cols)
    # lineitem's order key is every column -> it must have NO rules
    assert "lineitem" not in query_fuzz.FUZZ_NULL_RULES
