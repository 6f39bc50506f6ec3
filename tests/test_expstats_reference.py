"""Independent pure-Python references for the round-10 experiment-
health family (Wasserstein drift, lagged cross-correlation, SMD
balance, CUPED) — a THIRD implementation in a different paradigm so a
formula both the Spark plan and its DuckDB twin encode
identically-wrong cannot survive.
"""

from __future__ import annotations

import math

import pandas as pd

TOL = 1e-6
US_PER_HOUR = 3_600_000_000


def _scores(sf_dir: str):
    em = pd.read_parquet(f"{sf_dir}/embeddings.parquet").dropna(
        subset=["vec_id", "embedding", "label"]
    )
    out = []
    for _, r in em.iterrows():
        e = [float(x) for x in r["embedding"]]
        nrm = math.sqrt(sum(x * x for x in e))
        if nrm > 0:
            s = round((e[0] / nrm + 1.0) / 2.0 * 1e6) / 1e6
            out.append((int(r["vec_id"]), s))
    return out


def test_wasserstein_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.expstats import W_BINS, q_wasserstein

    got = {r["bin"]: r for r in
           (x.asDict() for x in q_wasserstein(spark, sf_dir).collect())}
    ref = [0] * W_BINS
    cur = [0] * W_BINS
    for vid, s in _scores(sf_dir):
        b = min(int(s * W_BINS), W_BINS - 1)
        (ref if vid % 2 == 0 else cur)[b] += 1
    t_ref, t_cur = sum(ref), sum(cur)
    w1 = cr = cc = 0.0
    for b in range(W_BINS):
        cr += ref[b]
        cc += cur[b]
        gap = abs(cr / t_ref - cc / t_cur) / W_BINS
        w1 += gap
        r = got[b]
        assert r["n_ref"] == ref[b] and r["n_cur"] == cur[b]
        assert abs(r["contrib"] - gap) < TOL
    assert abs(got[-1]["contrib"] - w1) < TOL


def test_xcorr_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.expstats import (
        XCORR_A, XCORR_B, XCORR_K, q_xcorr,
    )

    got = {r["lag"]: r for r in
           (x.asDict() for x in q_xcorr(spark, sf_dir).collect())}
    e = pd.read_parquet(f"{sf_dir}/events.parquet").dropna(subset=["ts"])
    e = e[e["event_type"].isin([XCORR_A, XCORR_B])]
    e["h"] = (e["ts"].astype("datetime64[us]").astype("int64")
              // US_PER_HOUR)
    lo, hi = int(e["h"].min()), int(e["h"].max())
    a = {h: 0 for h in range(lo, hi + 1)}
    b = dict(a)
    for _, r in e.iterrows():
        (a if r["event_type"] == XCORR_A else b)[int(r["h"])] += 1
    assert len(got) == 2 * XCORR_K + 1
    for lag in range(-XCORR_K, XCORR_K + 1):
        xs, ys = [], []
        for h in range(lo, hi + 1):
            h2 = h + lag
            if lo <= h2 <= hi:
                xs.append(a[h])
                ys.append(b[h2])
        n = len(xs)
        sx, sy = sum(xs), sum(ys)
        sxy = sum(x * y for x, y in zip(xs, ys))
        sxx, syy = sum(x * x for x in xs), sum(y * y for y in ys)
        den = (n * sxx - sx * sx) * (n * syy - sy * sy)
        r = got[lag]
        assert r["n_hours"] == n
        if den > 0:
            assert abs(r["r"] - (n * sxy - sx * sy) / math.sqrt(den)) < TOL


def test_smd_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.expstats import q_smd_balance

    got = {r["covariate"]: r for r in
           (x.asDict() for x in q_smd_balance(spark, sf_dir).collect())}
    c = pd.read_parquet(f"{sf_dir}/customer.parquet")
    o = pd.read_parquet(f"{sf_dir}/orders.parquet").dropna(
        subset=["o_custkey"]
    )
    agg = o.groupby("o_custkey").agg(
        cnt=("o_orderkey", "size"), maxp=("o_totalprice", "max")
    )
    covs = {"acctbal": {}, "n_orders": {}, "max_price": {}}
    for _, r in c.iterrows():
        g = int(r["c_custkey"]) % 2
        if pd.notna(r["c_acctbal"]):
            covs["acctbal"].setdefault(g, []).append(float(r["c_acctbal"]))
        row = agg.loc[int(r["c_custkey"])] if int(r["c_custkey"]) in \
            agg.index else None
        covs["n_orders"].setdefault(g, []).append(
            float(row["cnt"]) if row is not None else 0.0)
        mp = float(row["maxp"]) if row is not None and \
            pd.notna(row["maxp"]) else 0.0
        covs["max_price"].setdefault(g, []).append(mp)
    for name, groups in covs.items():
        x0, x1 = groups[0], groups[1]
        m0, m1 = sum(x0) / len(x0), sum(x1) / len(x1)
        v0 = sum((v - m0) ** 2 for v in x0) / (len(x0) - 1)
        v1 = sum((v - m1) ** 2 for v in x1) / (len(x1) - 1)
        smd = (m1 - m0) / math.sqrt((v1 + v0) / 2.0)
        r = got[name]
        assert r["n_treat"] == len(x1) and r["n_ctrl"] == len(x0)
        assert abs(r["mean_treat"] - m1) < 1e-4
        assert abs(r["mean_ctrl"] - m0) < 1e-4
        assert abs(r["smd"] - smd) < 1e-4


def test_cuped_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.expstats import q_cuped

    row = q_cuped(spark, sf_dir).collect()[0].asDict()
    e = pd.read_parquet(f"{sf_dir}/events.parquet").dropna(
        subset=["ts", "user_id", "value"]
    )
    e["t_us"] = e["ts"].astype("datetime64[us]").astype("int64")
    mid = (int(e["t_us"].min()) + int(e["t_us"].max())) // 2
    xs, ys = [], []
    for _, g in e.groupby("user_id"):
        xs.append(float(g.loc[g["t_us"] < mid, "value"].sum()))
        ys.append(float(g.loc[g["t_us"] >= mid, "value"].sum()))
    n = len(xs)
    mx, my = sum(xs) / n, sum(ys) / n
    cxy = sum((x - mx) * (y - my) for x, y in zip(xs, ys)) / (n - 1)
    vx = sum((x - mx) ** 2 for x in xs) / (n - 1)
    vy = sum((y - my) ** 2 for y in ys) / (n - 1)
    assert row["n_users"] == n
    assert abs(row["theta"] - cxy / vx) < 1e-4
    assert abs(row["var_y"] - vy) < 1e-4
    assert abs(row["var_adj"] - (vy - cxy * cxy / vx)) < 1e-4
    assert abs(row["reduction"] - cxy * cxy / (vx * vy)) < 1e-4


def test_mcc_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.evalmetrics import q_mcc

    row = q_mcc(spark, sf_dir).collect()[0].asDict()
    em = pd.read_parquet(f"{sf_dir}/embeddings.parquet").dropna(
        subset=["vec_id", "embedding", "label"]
    )
    lab = {int(r["vec_id"]): int(r["label"]) for _, r in em.iterrows()}
    tp = fp = fn = tn = 0
    for vid, s in _scores(sf_dir):
        pos = lab[vid] % 2 == 1
        pred = s >= 0.5
        if pred and pos:
            tp += 1
        elif pred:
            fp += 1
        elif pos:
            fn += 1
        else:
            tn += 1
    den = (tp + fp) * (tp + fn) * (tn + fp) * (tn + fn)
    mcc = (tp * tn - fp * fn) / math.sqrt(den)
    assert (row["tp"], row["fp"], row["fn"], row["tn"]) == (tp, fp, fn, tn)
    assert abs(row["mcc"] - mcc) < TOL


def test_best_split_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.evalmetrics import (
        SPLIT_BINS, q_best_split,
    )

    row = q_best_split(spark, sf_dir).collect()[0].asDict()
    em = pd.read_parquet(f"{sf_dir}/embeddings.parquet").dropna(
        subset=["vec_id", "embedding", "label"]
    )
    lab = {int(r["vec_id"]): int(r["label"]) for _, r in em.iterrows()}
    pos = [0] * SPLIT_BINS
    neg = [0] * SPLIT_BINS
    for vid, s in _scores(sf_dir):
        b = min(int(s * SPLIT_BINS), SPLIT_BINS - 1)
        (pos if lab[vid] % 2 == 1 else neg)[b] += 1
    tp, tn_ = sum(pos), sum(neg)
    n = tp + tn_

    def h(p):
        return (-(p * math.log(p) + (1 - p) * math.log(1 - p))
                if 0.0 < p < 1.0 else 0.0)

    best = None
    for b in range(SPLIT_BINS):
        lp = sum(pos[: b + 1])
        lnn = sum(neg[: b + 1])
        nl, nr = lp + lnn, n - lp - lnn
        if nl == 0 or nr == 0:
            continue
        gain = (h(tp / n) - (nl / n) * h(lp / nl)
                - (nr / n) * h((tp - lp) / nr))
        gain = round(gain * 1e9) / 1e9
        if best is None or gain > best[0]:
            best = (gain, b, nl, nr)
    g, b, nl, nr = best
    assert row["split_bin"] == b
    assert row["n_left"] == nl and row["n_right"] == nr
    assert abs(row["gain"] - g) < TOL
