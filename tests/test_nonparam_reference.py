"""Independent pure-Python references for the round-10 nonparametric /
attribution family (Theil-Sen, Mann-Whitney, Welch's t, last-touch
attribution) — a THIRD implementation in a different paradigm so a
formula both the Spark plan and its DuckDB twin encode
identically-wrong cannot survive.
"""

from __future__ import annotations

import math

import pandas as pd

US_PER_DAY = 86_400_000_000


def test_theil_sen_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.nonparam import q_theil_sen

    row = q_theil_sen(spark, sf_dir).collect()[0].asDict()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet").dropna(
        subset=["o_orderdate", "o_totalprice"]
    )
    o["day"] = (o["o_orderdate"].astype("datetime64[us]")
                .astype("int64") // US_PER_DAY)
    daily = sorted(o.groupby("day")["o_totalprice"].sum().items())
    slopes = []
    for i in range(len(daily)):
        for j in range(i + 1, len(daily)):
            (d1, r1), (d2, r2) = daily[i], daily[j]
            slopes.append((r2 - r1) / (d2 - d1))
    slopes.sort()
    k = (len(slopes) + 1) // 2  # lower median, q_exact_median convention
    assert row["n_days"] == len(daily)
    assert row["n_pairs"] == len(slopes)
    assert abs(row["slope"] - slopes[k - 1]) < 1e-4


def test_mann_whitney_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.nonparam import (
        MW_A, MW_B, q_mann_whitney,
    )

    row = q_mann_whitney(spark, sf_dir).collect()[0].asDict()
    e = pd.read_parquet(f"{sf_dir}/events.parquet").dropna(
        subset=["value"]
    )
    xs = [(float(v), 1) for v in e.loc[e.event_type == MW_A, "value"]]
    ys = [(float(v), 2) for v in e.loc[e.event_type == MW_B, "value"]]
    allv = sorted(xs + ys)
    n1, n2 = len(xs), len(ys)
    n = n1 + n2
    # average ranks with ties
    r1 = 0.0
    tie = 0.0
    i = 0
    while i < len(allv):
        j = i
        while j < len(allv) and allv[j][0] == allv[i][0]:
            j += 1
        t = j - i
        avg = (i + 1 + j) / 2.0  # mean of ranks i+1..j
        r1 += avg * sum(1 for k in range(i, j) if allv[k][1] == 1)
        tie += t ** 3 - t
        i = j
    u1 = r1 - n1 * (n1 + 1) / 2.0
    var = (n1 * n2 / 12.0) * ((n + 1) - tie / (n * (n - 1)))
    z = (u1 - n1 * n2 / 2.0) / math.sqrt(var)
    assert row["n1"] == n1 and row["n2"] == n2
    assert abs(row["u1"] - u1) < 1e-3
    assert abs(row["z"] - z) < 1e-4


def test_welch_t_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.nonparam import q_welch_t

    row = q_welch_t(spark, sf_dir).collect()[0].asDict()
    o = pd.read_parquet(f"{sf_dir}/orders.parquet").dropna(
        subset=["o_custkey", "o_totalprice"]
    )
    g = {0: [], 1: []}
    for _, r in o.iterrows():
        g[int(r["o_custkey"]) % 2].append(float(r["o_totalprice"]))
    m = {k: sum(v) / len(v) for k, v in g.items()}
    var = {k: sum((x - m[k]) ** 2 for x in v) / (len(v) - 1)
           for k, v in g.items()}
    a, b = var[1] / len(g[1]), var[0] / len(g[0])
    t = (m[1] - m[0]) / math.sqrt(a + b)
    df = (a + b) ** 2 / (a * a / (len(g[1]) - 1) + b * b / (len(g[0]) - 1))
    assert row["n_treat"] == len(g[1]) and row["n_ctrl"] == len(g[0])
    assert abs(row["mean_diff"] - (m[1] - m[0])) < 1e-4
    assert abs(row["t_stat"] - t) < 1e-4
    assert abs(row["df"] - df) < 1e-3


def test_attribution_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.nonparam import (
        ATTR_CHANNELS, ATTR_WINDOW_US, q_attribution,
    )

    got = {r["channel"]: r for r in
           (x.asDict() for x in q_attribution(spark, sf_dir).collect())}
    e = pd.read_parquet(f"{sf_dir}/events.parquet").dropna(subset=["ts"])
    e["t_us"] = e["ts"].astype("datetime64[us]").astype("int64")
    expect: dict[str, list[float]] = {}
    for _, g in e.groupby("user_id", dropna=False):
        rows = sorted(zip(g["t_us"], g["event_id"], g["event_type"],
                          g["value"]),
                      key=lambda r: (r[0], r[1]))
        last_t = last_c = None
        for t_us, _, et, v in rows:
            if et == "purchase" and pd.notna(v):
                if last_t is not None and last_t >= t_us - ATTR_WINDOW_US:
                    expect.setdefault(last_c, []).append(float(v))
                else:
                    expect.setdefault("direct", []).append(float(v))
            if et in ATTR_CHANNELS:
                last_t, last_c = t_us, et
    assert set(got) == set(expect)
    for ch, vals in expect.items():
        assert got[ch]["n_conv"] == len(vals)
        assert abs(got[ch]["revenue"] - sum(vals)) < 1e-5
