"""Driver-contract consistency: the registry stays well-formed."""

from __future__ import annotations

import inspect

import __spark_entry__ as entry_mod


def test_every_oracle_has_a_query():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    # every declared query now carries a full value-hash oracle — keep
    # it that way (a new rows-only query must be a deliberate decision)
    assert set(qs) - set(oracles) == set()


def test_query_callables_take_spark_and_sfdir():
    for name, fn in entry_mod.queries().items():
        params = list(inspect.signature(fn).parameters)
        assert len(params) == 2, f"{name} must take (spark, sf_dir)"


def test_no_duplicate_registration():
    # all_queries raises on duplicates; reaching here means none
    assert len(entry_mod.queries()) >= 70


def test_entry_smoke(spark):
    df = entry_mod.entry(spark)
    assert df.columns == ["n_name", "n_orders", "revenue"]
    assert df.count() == 25
