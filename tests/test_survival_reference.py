"""Independent pure-Python references for the round-10 survival /
risk-statistics family — a THIRD implementation in a different
paradigm (imperative loops over pandas rows), so a formula both the
Spark plan and its DuckDB twin encode identically-wrong cannot survive
(the VP8L distance-map lesson).

The references read the same sf0.001 parquet the differential gate
uses and re-derive the Kaplan-Meier estimator, the log-rank test, the
WOE/IV scorecard, Benjamini-Hochberg adjustment, the Markov entropy
rate, and the sorted-neighborhood pass from their textbook
definitions.
"""

from __future__ import annotations

import math

import pandas as pd

US_PER_DAY = 86_400_000_000
TOL = 1e-6


def _intervals(sf_dir: str, with_seg: bool = False):
    o = pd.read_parquet(f"{sf_dir}/orders.parquet").dropna(
        subset=["o_custkey", "o_orderdate"]
    )
    o["day"] = (
        o["o_orderdate"].astype("datetime64[us]").astype("int64")
        // US_PER_DAY
    )
    if with_seg:
        c = pd.read_parquet(f"{sf_dir}/customer.parquet")
        o = o.merge(c[["c_custkey", "c_mktsegment"]], left_on="o_custkey",
                    right_on="c_custkey", how="inner")
        o["grp"] = (o["c_mktsegment"] == "BUILDING").astype(int)
    horizon = int(o["day"].max())
    ivals = []  # (t_days, is_event, grp)
    for _, g in o.groupby("o_custkey"):
        days = sorted(zip(g["day"], g["o_orderkey"]))
        grp = int(g["grp"].iloc[0]) if with_seg else 0
        for i, (d, _) in enumerate(days):
            if i + 1 < len(days):
                ivals.append((int(days[i + 1][0] - d), True, grp))
            else:
                ivals.append((horizon - int(d), False, grp))
    return ivals


def test_kaplan_meier_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.survival import q_kaplan_meier

    got = {r["t_days"]: r for r in
           (x.asDict() for x in q_kaplan_meier(spark, sf_dir).collect())}
    ivals = _intervals(sf_dir)
    n = len(ivals)
    spine: dict[int, list[int]] = {}
    for t, ev, _ in ivals:
        de = spine.setdefault(t, [0, 0])
        de[0 if ev else 1] += 1
    surv, cumh, at_risk = 1.0, 0.0, n
    n_checked = 0
    for t in sorted(spine):
        d, c = spine[t]
        if d > 0:
            surv *= 1.0 - d / at_risk
            cumh += d / at_risk
            r = got[t]
            assert r["n_risk"] == at_risk
            assert r["n_events"] == d
            assert r["n_censored"] == c
            assert abs(r["survival"] - surv) < TOL, t
            assert abs(r["cum_hazard"] - cumh) < TOL, t
            n_checked += 1
        at_risk -= d + c
    assert n_checked == len(got) > 0


def test_logrank_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.survival import q_logrank

    row = q_logrank(spark, sf_dir).collect()[0].asDict()
    ivals = _intervals(sf_dir, with_seg=True)
    spine: dict[int, list[int]] = {}
    for t, ev, grp in ivals:
        cell = spine.setdefault(t, [0, 0, 0, 0])  # d1 c1 d2 c2
        idx = (0 if ev else 1) if grp == 1 else (2 if ev else 3)
        cell[idx] += 1
    n1 = sum(1 for _, _, g in ivals if g == 1)
    n2 = len(ivals) - n1
    o1 = e1 = v = 0.0
    for t in sorted(spine):
        d1, c1, d2, c2 = spine[t]
        d, n = d1 + d2, n1 + n2
        if d > 0:
            o1 += d1
            e1 += d * n1 / n
            if n > 1:
                v += (d * n1 / n) * (n2 / n) * ((n - d) / (n - 1))
        n1 -= d1 + c1
        n2 -= d2 + c2
    chi2 = (o1 - e1) ** 2 / v
    assert row["o1"] == o1
    assert abs(row["e1"] - e1) < TOL
    assert abs(row["v"] - v) < TOL
    assert abs(row["chi2"] - chi2) < 1e-4


def test_woe_iv_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.survival import (
        WOE_BIN_W, WOE_SMOOTH, q_woe_iv,
    )

    got = {r["bin"]: r for r in
           (x.asDict() for x in q_woe_iv(spark, sf_dir).collect())}
    o = pd.read_parquet(f"{sf_dir}/orders.parquet").dropna(
        subset=["o_totalprice", "o_orderstatus"]
    )
    o["bin"] = (o["o_totalprice"] // WOE_BIN_W).astype(int)
    bins = {}
    for _, r in o.iterrows():
        g, b = bins.setdefault(int(r["bin"]), [0, 0])
        if r["o_orderstatus"] == "F":
            bins[int(r["bin"])][1] = b + 1
        else:
            bins[int(r["bin"])][0] = g + 1
    G = sum(g for g, _ in bins.values())
    B = sum(b for _, b in bins.values())
    k = len(bins)
    iv_tot = 0.0
    for bid, (g, b) in bins.items():
        gs = (g + WOE_SMOOTH) / (G + WOE_SMOOTH * k)
        bs = (b + WOE_SMOOTH) / (B + WOE_SMOOTH * k)
        woe = math.log(gs / bs)
        iv = (gs - bs) * woe
        iv_tot += iv
        r = got[f"{bid:04d}"]
        assert r["n_good"] == g and r["n_bad"] == b
        assert abs(r["woe"] - woe) < TOL
        assert abs(r["iv"] - iv) < TOL
    t = got["~~total~~"]
    assert t["n_orders"] == G + B
    assert abs(t["iv"] - iv_tot) < TOL


def test_bh_fdr_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.survival import q_bh_fdr

    rows = [x.asDict() for x in q_bh_fdr(spark, sf_dir).collect()]
    o = pd.read_parquet(f"{sf_dir}/orders.parquet").dropna(
        subset=["o_custkey", "o_orderstatus"]
    )
    c = pd.read_parquet(f"{sf_dir}/customer.parquet").dropna(
        subset=["c_mktsegment"]
    )
    j = o.merge(c[["c_custkey", "c_mktsegment"]], left_on="o_custkey",
                right_on="c_custkey")
    cells = j.groupby(["c_mktsegment", "o_orderstatus"]).size()
    seg_t = cells.groupby(level=0).sum()
    st_t = cells.groupby(level=1).sum()
    tot = cells.sum()
    p = {}
    for seg in seg_t.index:
        g_stat = 0.0
        for st in st_t.index:
            obs = cells.get((seg, st), 0)
            if obs > 0:
                e = seg_t[seg] * st_t[st] / tot
                g_stat += 2.0 * obs * math.log(obs / e)
        p[seg] = math.exp(-g_stat / 2.0)
    m = len(p)
    ordered = sorted(p.items(), key=lambda kv: (kv[1], kv[0]))
    raw = [pv * m / (i + 1) for i, (_, pv) in enumerate(ordered)]
    adj = list(raw)
    for i in range(m - 2, -1, -1):
        adj[i] = min(adj[i], adj[i + 1])
    expect = {seg: min(a, 1.0) for (seg, _), a in zip(ordered, adj)}
    assert len(rows) == m > 0
    for r in rows:
        assert abs(r["p_value"] - p[r["segment"]]) < 1e-4
        assert abs(r["p_adj"] - expect[r["segment"]]) < 1e-4


def test_entropy_rate_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.survival import q_entropy_rate

    got = {r["from_type"]: r for r in
           (x.asDict() for x in q_entropy_rate(spark, sf_dir).collect())}
    e = pd.read_parquet(f"{sf_dir}/events.parquet").dropna(subset=["ts"])
    counts: dict[str, dict[str, int]] = {}
    for _, g in e.groupby("user_id"):
        seq = [t for _, _, t in
               sorted(zip(g["ts"], g["event_id"], g["event_type"]))]
        for a, b in zip(seq, seq[1:]):
            counts.setdefault(a, {})[b] = counts.get(a, {}).get(b, 0) + 1
    n_all = sum(sum(d.values()) for d in counts.values())
    rate = 0.0
    for s, d in counts.items():
        n_s = sum(d.values())
        h = -sum((v / n_s) * math.log(v / n_s) for v in d.values())
        r = got[s]
        assert r["n_pairs"] == n_s
        assert abs(r["h_nats"] - h) < TOL
        rate += (n_s / n_all) * h
    t = got["~~total~~"]
    assert t["n_pairs"] == n_all
    assert abs(t["h_nats"] - rate) < TOL


def _lev(a: str, b: str) -> int:
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def test_sorted_neighborhood_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.survival import (
        SN_BLOCK_K, SN_CMP_LEN, SN_EDIT_MAX, SN_WINDOW,
        q_sorted_neighborhood,
    )

    got = {(r["doc_a"], r["doc_b"]): r["edit_dist"] for r in
           (x.asDict() for x in
            q_sorted_neighborhood(spark, sf_dir).collect())}
    d = pd.read_parquet(f"{sf_dir}/documents.parquet").dropna(
        subset=["doc_id", "text", "lang"]
    )
    import re

    rows = []
    for _, r in d.iterrows():
        norm = re.sub(r"[^a-z0-9]", "", r["text"].lower())[:SN_CMP_LEN]
        rows.append((r["lang"], norm[:SN_BLOCK_K], norm, int(r["doc_id"])))
    blocks: dict[tuple, list] = {}
    for lang, blk, norm, did in rows:
        blocks.setdefault((lang, blk), []).append((norm, did))
    expect = {}
    for members in blocks.values():
        members.sort()
        for i, (na, da) in enumerate(members):
            for j in range(i + 1, min(i + 1 + SN_WINDOW, len(members))):
                nb, db = members[j]
                dist = _lev(na, nb)
                if dist <= SN_EDIT_MAX:
                    expect[(da, db)] = dist
    assert got == expect
