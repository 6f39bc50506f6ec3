"""Range join: bucketed candidates vs brute-force ground truth."""

from __future__ import annotations

import datetime as dt
import random

from audios_to_dataset_spark.operators.rangejoin import range_join


def test_range_join_matches_bruteforce(spark):
    rng = random.Random(5)
    base = dt.datetime(2024, 1, 1)
    rows = [
        (i, rng.randrange(3), base + dt.timedelta(seconds=rng.randrange(7200)))
        for i in range(200)
    ]
    df = spark.createDataFrame(rows, "id long, k int, t timestamp")
    left = df.select(
        df.id.alias("lid"), df.k.alias("lk"), df.t.alias("lt")
    )
    right = df.select(
        df.id.alias("rid"), df.k.alias("rk"), df.t.alias("rt")
    )
    got = {
        (r.lid, r.r_rid)
        for r in range_join(
            left, right, "lk", "rk", "lt", "rt",
            lower_us=0, upper_us=600_000_000,  # 10 minutes
        ).collect()
    }
    expected = {
        (a, b)
        for a, ka, ta in rows
        for b, kb, tb in rows
        if ka == kb and ta < tb <= ta + dt.timedelta(minutes=10)
    }
    assert got == expected
    assert len(expected) > 100  # non-trivial


def test_range_join_left_duplicates_and_nulls(spark):
    """Left-outer mode must keep duplicate left rows 1:1 with their
    matches and must not drop matches for rows containing NULLs (the
    r1 ADVICE bug: rejoining on all left columns multiplied duplicates
    and lost NULL-keyed rows to null-unsafe equality)."""
    base = dt.datetime(2024, 1, 1)
    # two IDENTICAL left rows (dup), one left row with a NULL extra col,
    # one unmatched left row
    left = spark.createDataFrame(
        [
            (1, "x", base),
            (1, "x", base),                      # exact duplicate
            (2, None, base),                     # NULL in a value column
            (3, "z", base + dt.timedelta(days=30)),  # no match
        ],
        "lk int, note string, lt timestamp",
    )
    right = spark.createDataFrame(
        [
            (1, base + dt.timedelta(minutes=1)),
            (2, base + dt.timedelta(minutes=2)),
        ],
        "rk int, rt timestamp",
    )
    out = range_join(
        left, right, "lk", "rk", "lt", "rt",
        lower_us=0, upper_us=600_000_000, how="left",
    ).collect()
    # 2 dup rows × 1 match each + 1 NULL-note row match + 1 unmatched
    assert len(out) == 4
    matched = [r for r in out if r.r_rk is not None]
    assert len(matched) == 3
    # the NULL-note row kept its match
    assert any(r.lk == 2 and r.note is None and r.r_rk == 2 for r in out)
    # the unmatched row survives null-padded
    assert any(r.lk == 3 and r.r_rk is None for r in out)


def test_range_join_rejects_bad_bounds(spark):
    df = spark.createDataFrame([(1, 1, dt.datetime(2024, 1, 1))],
                               "id long, k int, t timestamp")
    try:
        range_join(df, df, "k", "k", "t", "t", lower_us=5, upper_us=5)
        raise AssertionError("expected ValueError")
    except ValueError:
        pass
