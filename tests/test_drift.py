"""q_value_drift vs a pure-python replay of the binned divergence."""

from __future__ import annotations

from collections import Counter

import pandas as pd

from audios_to_dataset_spark.plans.events import (
    DRIFT_BIN_WIDTH,
    DRIFT_SPLIT_US,
    q_value_drift,
)


def test_value_drift_matches_python_replay(spark, sf_dir):
    got = {r.event_type: r for r in q_value_drift(spark, sf_dir).collect()}
    df = pd.read_parquet(sf_dir + "/events.parquet")
    # testdata ts is TIMESTAMP(NANOS); epoch µs mirrors catalog.load
    us = df["ts"].values.astype("datetime64[us]").astype("int64")
    a: dict = {}
    b: dict = {}
    for et, u, v in zip(df["event_type"], us, df["value"]):
        tgt = a if u < DRIFT_SPLIT_US else b
        tgt.setdefault(et, Counter())[int(v // DRIFT_BIN_WIDTH)] += 1
    for et, row in got.items():
        ca, cb = a.get(et, Counter()), b.get(et, Counter())
        ta, tb = sum(ca.values()), sum(cb.values())
        bins = set(ca) | set(cb)
        assert row.n_bins == len(bins)
        assert row.n_events_a == ta
        assert row.n_events_b == tb
        exp = sum(
            (ca[x] / ta - cb[x] / tb) ** 2 / (ca[x] / ta + cb[x] / tb) * 1e6
            for x in bins
        )
        assert abs(row.drift_ppm - exp) < 0.01
    assert set(got) == set(a) | set(b)
