"""As-of join semantics on a hand-built timeline."""

from __future__ import annotations

import datetime as dt

from audios_to_dataset_spark.operators.asof import as_of_join


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_asof_basics(spark):
    quotes = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:00:00"), 100.0),
            (1, _ts("2024-01-01 10:05:00"), 101.0),
            (2, _ts("2024-01-01 10:02:00"), 50.0),
        ],
        "sym int, qt timestamp, price double",
    )
    trades = spark.createDataFrame(
        [
            (1, _ts("2024-01-01 10:03:00"), "t1"),   # after first quote
            (1, _ts("2024-01-01 10:05:00"), "t2"),   # exactly at 2nd (<=)
            (2, _ts("2024-01-01 10:00:00"), "t3"),   # before any quote
            (3, _ts("2024-01-01 12:00:00"), "t4"),   # key with no quotes
        ],
        "sym int, tt timestamp, tid string",
    )
    out = {
        r.tid: r.asof_price
        for r in as_of_join(
            trades, quotes,
            left_key="sym", right_key="sym",
            left_time="tt", right_time="qt",
            right_value_cols=["price"],
        ).collect()
    }
    assert out == {"t1": 100.0, "t2": 101.0, "t3": None, "t4": None}


def test_asof_tie_prefers_greatest_payload(spark):
    right = spark.createDataFrame(
        [(1, _ts("2024-01-01 09:00:00"), 7), (1, _ts("2024-01-01 09:00:00"), 9)],
        "k int, rt timestamp, v int",
    )
    left = spark.createDataFrame(
        [(1, _ts("2024-01-01 10:00:00"), "x")], "k int, lt timestamp, id string"
    )
    row = as_of_join(
        left, right, "k", "k", "lt", "rt", ["v"]
    ).first()
    assert row.asof_v == 9  # documented tie contract: greatest payload
