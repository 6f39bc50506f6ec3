"""Driver-contract consistency: the registry stays well-formed."""

from __future__ import annotations

import inspect

import __spark_entry__ as entry_mod


def test_every_oracle_has_a_query():
    qs = entry_mod.queries()
    oracles = entry_mod.oracle_sql()
    assert set(oracles) <= set(qs)
    # rows-only set is intentional and small
    assert set(qs) - set(oracles) == {"q_multimodal_embed", "q_stream_dedup"}


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
