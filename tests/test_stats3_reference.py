"""Independent pure-Python references for the round-12 statistics wave
(plans/stats3.py) — a THIRD implementation in a different paradigm so a
formula the Spark plan and its DuckDB twin encode identically-wrong
cannot survive.
"""

from __future__ import annotations

import math

import pandas as pd

DAY_US = 86_400_000_000


def _events(sf_dir):
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def _orders(sf_dir):
    return pd.read_parquet(f"{sf_dir}/orders.parquet")


def _ts_us(col):
    # parquet DATE loads as datetime64[s] / object in newer pandas —
    # normalize to ns before the int64 view so the epoch scale is fixed
    s = pd.to_datetime(col).astype("datetime64[ns]")
    return s.astype("int64") // 1_000


def _daily_revenue(sf_dir):
    o = _orders(sf_dir).dropna(subset=["o_orderdate", "o_totalprice"])
    day = _ts_us(o["o_orderdate"]) // DAY_US
    return (
        o.assign(day=day).groupby("day")["o_totalprice"].sum()
        .sort_index()
    )


def test_ljung_box_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.stats3 import LB_LAGS, q_ljung_box

    row = q_ljung_box(spark, sf_dir).collect()[0]
    e = _events(sf_dir).dropna(subset=["ts"])
    day = _ts_us(e["ts"]) // DAY_US
    x = day.value_counts().sort_index().to_list()
    n = len(x)
    m = sum(x) / n
    s0 = sum((v - m) ** 2 for v in x)
    q = 0.0
    for k in range(1, LB_LAGS + 1):
        ck = sum((x[t] - m) * (x[t + k] - m) for t in range(n - k))
        rk = ck / s0
        assert abs(row[f"r{k}"] - rk) < 1e-6, (k, row[f"r{k}"], rk)
        q += rk * rk / (n - k)
    q *= n * (n + 2)
    assert row["n_days"] == n and row["dof"] == LB_LAGS
    assert abs(row["q_lb"] - q) < 1e-3 * max(1.0, abs(q))


def test_runs_test_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.stats3 import q_runs_test

    row = q_runs_test(spark, sf_dir).collect()[0]
    rev = _daily_revenue(sf_dir)
    n = len(rev)
    m = rev.sum() / n
    signs = [1 if v > m else 0 for v in rev]
    runs = 1 + sum(1 for a, b in zip(signs, signs[1:]) if a != b)
    n1 = sum(signs)
    n2 = n - n1
    mu = 2 * n1 * n2 / n + 1
    var = 2 * n1 * n2 * (2 * n1 * n2 - n) / (n * n * (n - 1))
    z = (runs - mu) / math.sqrt(var)
    assert (row["n_days"], row["n_above"], row["n_below"],
            row["n_runs"]) == (n, n1, n2, runs)
    assert abs(row["z_runs"] - z) < 1e-6


def test_cvm_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.stats3 import (
        CVM_A,
        CVM_B,
        q_cvm_test,
    )

    row = q_cvm_test(spark, sf_dir).collect()[0]
    e = _events(sf_dir).dropna(subset=["value"])
    xs = sorted(e[e.event_type == CVM_A]["value"])
    ys = sorted(e[e.event_type == CVM_B]["value"])
    n, m = len(xs), len(ys)
    pooled = sorted(set(xs) | set(ys))
    from bisect import bisect_right

    t = 0.0
    for v in pooled:
        fx = bisect_right(xs, v) / n
        gy = bisect_right(ys, v) / m
        w = (bisect_right(xs, v) - bisect_right(xs, v - 1e-9)
             + bisect_right(ys, v) - bisect_right(ys, v - 1e-9))
        t += w * (fx - gy) ** 2
    t *= n * m / (n + m) ** 2
    assert (row["n_x"], row["n_y"]) == (n, m)
    assert abs(row["t_cvm"] - t) < 1e-6 * max(1.0, abs(t))


def test_durbin_watson_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.stats3 import q_durbin_watson

    row = q_durbin_watson(spark, sf_dir).collect()[0]
    rev = _daily_revenue(sf_dir)
    n = len(rev)
    days = list(rev.index)
    vals = list(rev)
    sx, sy = sum(days), sum(vals)
    sxx = sum(d * d for d in days)
    sxy = sum(d * v for d, v in zip(days, vals))
    b = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    a = (sy - b * sx) / n
    e = [v - (a + b * d) for d, v in zip(days, vals)]
    dw = (sum((e[i] - e[i - 1]) ** 2 for i in range(1, n))
          / sum(v * v for v in e))
    assert row["n_days"] == n
    assert abs(row["slope"] - b) < 1e-6 * max(1.0, abs(b))
    assert abs(row["intercept"] - a) < 1e-4 * max(1.0, abs(a))
    assert abs(row["dw"] - dw) < 1e-6
