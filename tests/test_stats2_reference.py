"""Independent pure-Python references for the round-11 statistics wave
(plans/stats2.py) — a THIRD implementation in a different paradigm so a
formula the Spark plan and its DuckDB twin encode identically-wrong
cannot survive.
"""

from __future__ import annotations

import math
from collections import Counter

import pandas as pd


def _orders(sf_dir):
    return pd.read_parquet(f"{sf_dir}/orders.parquet")


def _events(sf_dir):
    return pd.read_parquet(f"{sf_dir}/events.parquet")


def test_anova_f_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.stats2 import TOTAL, q_anova_f

    out = {r["grp"]: r for r in q_anova_f(spark, sf_dir).collect()}
    o = _orders(sf_dir).dropna(subset=["o_orderpriority", "o_totalprice"])
    groups = {g: list(v) for g, v in o.groupby("o_orderpriority")
              ["o_totalprice"]}
    n = sum(len(v) for v in groups.values())
    k = len(groups)
    gm = sum(sum(v) for v in groups.values()) / n
    ssb = sum(len(v) * (sum(v) / len(v) - gm) ** 2
              for v in groups.values())
    ssw = sum(sum((x - sum(v) / len(v)) ** 2 for x in v)
              for v in groups.values())
    f = (ssb / (k - 1)) / (ssw / (n - k))
    t = out[TOTAL]
    assert t["df1"] == k - 1 and t["df2"] == n - k
    assert abs(t["f_stat"] - f) < 1e-3 * max(1.0, abs(f))
    assert abs(t["eta_sq"] - ssb / (ssb + ssw)) < 1e-6
    for g, v in groups.items():
        assert out[g]["n"] == len(v)
        assert abs(out[g]["mean"] - sum(v) / len(v)) < 1e-4


def test_cohens_d_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.stats2 import q_cohens_d

    row = q_cohens_d(spark, sf_dir).collect()[0]
    o = _orders(sf_dir).dropna(subset=["o_custkey", "o_totalprice"])
    g0 = list(o[o.o_custkey % 2 == 0]["o_totalprice"])
    g1 = list(o[o.o_custkey % 2 == 1]["o_totalprice"])
    m0, m1 = sum(g0) / len(g0), sum(g1) / len(g1)
    v0 = sum((x - m0) ** 2 for x in g0) / (len(g0) - 1)
    v1 = sum((x - m1) ** 2 for x in g1) / (len(g1) - 1)
    sp = math.sqrt(((len(g0) - 1) * v0 + (len(g1) - 1) * v1)
                   / (len(g0) + len(g1) - 2))
    d = (m1 - m0) / sp
    nn = len(g0) + len(g1)
    assert row["n_ctrl"] == len(g0) and row["n_treat"] == len(g1)
    assert abs(row["pooled_sd"] - sp) < 1e-3
    assert abs(row["cohens_d"] - d) < 1e-6
    assert abs(row["hedges_g"] - d * (1 - 3 / (4 * nn - 9))) < 1e-6


def test_kendall_tau_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.stats2 import q_kendall_tau

    row = q_kendall_tau(spark, sf_dir).collect()[0]
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet").dropna(
        subset=["l_quantity", "l_discount"]
    )
    assert row["n_rows"] == len(li)
    # verify the full-table tau against a histogram-based O(grid²)
    # pairwise reference (exact, no sampling — the grid is ~50×11)
    cells = Counter(zip(li["l_quantity"], li["l_discount"]))
    keys = list(cells)
    C = D = 0
    for i, (q1, d1) in enumerate(keys):
        for q2, d2 in keys[i + 1:]:
            if (q1 - q2) * ((d1 - d2)) > 0:
                C += cells[(q1, d1)] * cells[(q2, d2)]
            elif (q1 - q2) * (d1 - d2) < 0:
                D += cells[(q1, d1)] * cells[(q2, d2)]
    qt = Counter(li["l_quantity"])
    dt = Counter(li["l_discount"])
    N = len(li)
    N0 = N * (N - 1) // 2
    TX = sum(v * (v - 1) // 2 for v in qt.values())
    TY = sum(v * (v - 1) // 2 for v in dt.values())
    tau_full = (C - D) / math.sqrt((N0 - TX) * (N0 - TY))
    assert row["concordant"] == C and row["discordant"] == D
    assert row["t_x"] == TX and row["t_y"] == TY
    assert abs(row["tau_b"] - tau_full) < 1e-6


def test_kruskal_wallis_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.stats2 import (
        TOTAL, q_kruskal_wallis,
    )

    out = {r["event_type"]: r for r in
           q_kruskal_wallis(spark, sf_dir).collect()}
    e = _events(sf_dir).dropna(subset=["value", "event_type"])
    vals = sorted(e["value"])
    # average ranks with ties
    rank_of = {}
    i = 0
    while i < len(vals):
        j = i
        while j < len(vals) and vals[j] == vals[i]:
            j += 1
        rank_of[vals[i]] = (i + 1 + j) / 2
        i = j
    groups = {g: [rank_of[v] for v in gv]
              for g, gv in e.groupby("event_type")["value"]}
    n = len(vals)
    h = 12 / (n * (n + 1)) * sum(
        (sum(r) ** 2) / len(r) for r in groups.values()
    ) - 3 * (n + 1)
    tie = sum(t ** 3 - t for t in Counter(vals).values())
    h_adj = h / (1 - tie / (n ** 3 - n))
    t = out[TOTAL]
    assert t["df"] == len(groups) - 1
    assert abs(t["h_stat"] - h) < 1e-4
    assert abs(t["h_adj"] - h_adj) < 1e-4
    for g, r in groups.items():
        assert out[g]["n"] == len(r)
        assert abs(out[g]["mean_rank"] - sum(r) / len(r)) < 1e-4


def test_jensen_shannon_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.stats2 import q_jensen_shannon

    out = {r["source"]: r for r in
           q_jensen_shannon(spark, sf_dir).collect()}
    d = pd.read_parquet(f"{sf_dir}/documents.parquet").dropna(
        subset=["lang", "source"]
    )
    langs = sorted(d["lang"].unique())
    n_tot = len(d)
    qdist = {la: (d["lang"] == la).sum() / n_tot for la in langs}
    for src, g in d.groupby("source"):
        p = {la: (g["lang"] == la).sum() / len(g) for la in langs}
        jsd = 0.0
        for la in langs:
            m = (p[la] + qdist[la]) / 2
            if p[la] > 0:
                jsd += 0.5 * p[la] * math.log(p[la] / m)
            if qdist[la] > 0:
                jsd += 0.5 * qdist[la] * math.log(qdist[la] / m)
        assert out[src]["n_docs"] == len(g)
        assert abs(out[src]["jsd_nats"] - jsd) < 1e-6
        assert abs(out[src]["jsd_bits"] - jsd / math.log(2)) < 1e-6


def test_permutation_entropy_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.stats2 import (
        q_permutation_entropy,
    )

    out = {r["pattern"]: r for r in
           q_permutation_entropy(spark, sf_dir).collect()}
    e = _events(sf_dir).dropna(subset=["ts", "user_id", "value"])
    pats: Counter = Counter()

    def cmp3(a, b):
        return 0 if a < b else (1 if a == b else 2)

    for _, g in e.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        v = list(g["value"])
        for i in range(len(v) - 2):
            pats[cmp3(v[i], v[i + 1]) * 9 + cmp3(v[i], v[i + 2]) * 3
                 + cmp3(v[i + 1], v[i + 2])] += 1
    n = sum(pats.values())
    h = -sum((c / n) * math.log(c / n) for c in pats.values())
    for pat, c in pats.items():
        assert out[pat]["n"] == c
        assert abs(out[pat]["share"] - c / n) < 1e-6
    t = out[-1]
    assert t["n"] == n
    assert abs(t["entropy"] - h) < 1e-5
    if len(pats) > 1:
        assert abs(t["norm_entropy"] - h / math.log(len(pats))) < 1e-5


def test_brier_decomposition_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.evalmetrics import CAL_BINS
    from audios_to_dataset_spark.plans.stats2 import (
        q_brier_decomposition,
    )

    row = q_brier_decomposition(spark, sf_dir).collect()[0]
    em = pd.read_parquet(f"{sf_dir}/embeddings.parquet").dropna(
        subset=["vec_id", "embedding", "label"]
    )
    rows = []
    for _, r in em.iterrows():
        e = [float(x) for x in r["embedding"]]
        nrm = math.sqrt(sum(x * x for x in e))
        if nrm <= 0:
            continue
        score = round((e[0] / nrm + 1.0) / 2.0, 6)
        rows.append((score, 1 if int(r["label"]) % 2 == 1 else 0))
    n = len(rows)
    brier = sum((s - y) ** 2 for s, y in rows) / n
    bins: dict = {}
    for s, y in rows:
        b = min(int(s * CAL_BINS), CAL_BINS - 1)
        bins.setdefault(b, []).append((s, y))
    obar = sum(y for _, y in rows) / n
    rel = sum(len(v) * (sum(s for s, _ in v) / len(v)
                        - sum(y for _, y in v) / len(v)) ** 2
              for v in bins.values()) / n
    res = sum(len(v) * (sum(y for _, y in v) / len(v) - obar) ** 2
              for v in bins.values()) / n
    assert row["n_total"] == n
    assert abs(row["brier"] - brier) < 1e-6
    assert abs(row["reliability"] - rel) < 1e-6
    assert abs(row["resolution"] - res) < 1e-6
    assert abs(row["uncertainty"] - obar * (1 - obar)) < 1e-6


def test_macro_f1_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.evalmetrics import N_CLASSES
    from audios_to_dataset_spark.plans.stats2 import q_macro_f1

    row = q_macro_f1(spark, sf_dir).collect()[0]
    em = pd.read_parquet(f"{sf_dir}/embeddings.parquet").dropna(
        subset=["vec_id", "label"]
    )
    pairs = [
        (int(t), int((t + 1) % N_CLASSES) if v % 3 == 0 else int(t))
        for v, t in zip(em["vec_id"], em["label"])
    ]
    classes = sorted({t for t, _ in pairs} | {p for _, p in pairs})
    ps, rs, fs, wfs = [], [], [], []
    tp_tot = 0
    for c in classes:
        tp = sum(1 for t, p in pairs if t == c and p == c)
        n_true = sum(1 for t, _ in pairs if t == c)
        n_pred = sum(1 for _, p in pairs if p == c)
        p = tp / n_pred if n_pred else 0.0
        r = tp / n_true if n_true else 0.0
        f = 2 * p * r / (p + r) if p + r else 0.0
        ps.append(p)
        rs.append(r)
        fs.append(f)
        wfs.append(n_true * f)
        tp_tot += tp
    k = len(classes)
    assert row["n_classes"] == k
    assert abs(row["accuracy"] - tp_tot / len(pairs)) < 1e-9
    assert abs(row["macro_precision"] - sum(ps) / k) < 1e-6
    assert abs(row["macro_recall"] - sum(rs) / k) < 1e-6
    assert abs(row["macro_f1"] - sum(fs) / k) < 1e-6
    assert abs(row["weighted_f1"] - sum(wfs) / len(pairs)) < 1e-6


def test_rank_overlap_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.stats2 import (
        RBO_K, RBO_P, q_rank_overlap,
    )

    out = {r["d"]: r for r in q_rank_overlap(spark, sf_dir).collect()}
    li = pd.read_parquet(f"{sf_dir}/lineitem.parquet").dropna(
        subset=["l_partkey"]
    )
    li = li.assign(rev=li.l_extendedprice * (1.0 - li.l_discount))
    agg = li.groupby("l_partkey").agg(
        qty=("l_quantity", "sum"), rev=("rev", "sum")
    ).reset_index()
    a = list(
        agg.sort_values(["qty", "l_partkey"], ascending=[False, True])
        ["l_partkey"].head(RBO_K)
    )
    b = list(
        agg.sort_values(["rev", "l_partkey"], ascending=[False, True])
        ["l_partkey"].head(RBO_K)
    )
    rbo = 0.0
    for d in range(1, RBO_K + 1):
        x = len(set(a[:d]) & set(b[:d]))
        assert out[d]["n_common"] == x
        assert abs(out[d]["overlap"] - x / d) < 1e-9
        rbo += (1 - RBO_P) * RBO_P ** (d - 1) * x / d
    assert abs(out[-1]["rbo"] - rbo) < 1e-6


def test_drawdown_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.stats2 import (
        DD_INFLOW, q_drawdown,
    )

    out = {r["user_id"]: r for r in q_drawdown(spark, sf_dir).collect()}
    e = _events(sf_dir).dropna(subset=["ts", "user_id", "value"])
    for uid, g in e.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        bal = peak = 0.0
        maxdd = -math.inf
        first = True
        for _, r in g.iterrows():
            sv = r["value"] if r["event_type"] == DD_INFLOW \
                else -r["value"]
            bal += sv
            peak = bal if first else max(peak, bal)
            first = False
            maxdd = max(maxdd, peak - bal)
        row = out[uid]
        assert row["n_events"] == len(g)
        assert abs(row["final_balance"] - bal) < 1e-6
        assert abs(row["peak_balance"] - peak) < 1e-6
        assert abs(row["max_drawdown"] - maxdd) < 1e-6


def test_lorenz_gini_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.stats2 import (
        LORENZ_BINS, q_lorenz_gini,
    )

    out = {r["bin"]: r for r in q_lorenz_gini(spark, sf_dir).collect()}
    o = _orders(sf_dir).dropna(subset=["o_custkey", "o_totalprice"])
    spend = o.groupby("o_custkey")["o_totalprice"].sum()
    lo, hi, s_tot, n = spend.min(), spend.max(), spend.sum(), len(spend)
    binned: dict = {}
    for v in spend:
        b = min(int((v - lo) / (hi - lo) * LORENZ_BINS),
                LORENZ_BINS - 1) if hi > lo else 0
        binned.setdefault(b, []).append(v)
    cum_n = cum_s = 0.0
    prev_p = prev_l = 0.0
    area = 0.0
    for b in range(LORENZ_BINS):
        vs = binned.get(b, [])
        cum_n += len(vs)
        cum_s += sum(vs)
        p, el = cum_n / n, cum_s / s_tot
        assert out[b]["n"] == len(vs)
        assert abs(out[b]["cum_pop_share"] - p) < 1e-9
        assert abs(out[b]["cum_spend_share"] - el) < 1e-6
        area += (p - prev_p) * (el + prev_l)
        prev_p, prev_l = p, el
    assert abs(out[-1]["gini"] - (1.0 - area)) < 1e-6


def test_bollinger_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.stats2 import (
        BOLL_KSD, BOLL_W, q_bollinger,
    )

    out = {r["event_id"]: r for r in q_bollinger(spark, sf_dir).collect()}
    e = _events(sf_dir).dropna(subset=["ts", "user_id", "value"])
    n_full = 0
    for _, g in e.groupby("user_id"):
        g = g.sort_values(["ts", "event_id"])
        vals = list(zip(g["event_id"], g["value"]))
        for i, (eid, v) in enumerate(vals):
            row = out[eid]
            w = [x for _, x in vals[max(0, i - BOLL_W + 1):i + 1]]
            assert row["n_w"] == len(w)
            if len(w) < BOLL_W:
                assert row["mean_w"] is None
                continue
            n_full += 1
            mean = sum(w) / len(w)
            sd = math.sqrt(max(
                sum(x * x for x in w) / len(w) - mean * mean, 0.0))
            assert abs(row["mean_w"] - mean) < 1e-6
            assert abs(row["sd_w"] - sd) < 1e-6
            assert row["breakout"] == (
                1 if abs(v - mean) - BOLL_KSD * sd > 1e-12 else 0
            ) or abs(abs(v - mean) - BOLL_KSD * sd) < 1e-9
    assert n_full > 0


def test_tail_index_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.stats2 import (
        HILL_KS, q_tail_index,
    )

    out = {r["k"]: r for r in q_tail_index(spark, sf_dir).collect()}
    o = _orders(sf_dir).dropna(subset=["o_custkey", "o_totalprice"])
    spend = sorted(
        (v for v in o.groupby("o_custkey")["o_totalprice"].sum()
         if v > 0),
        reverse=True,
    )
    for k in HILL_KS:
        if len(spend) < k + 1:
            assert k not in out
            continue
        xs = spend[:k]
        xk1 = spend[k]
        alpha = k / sum(math.log(x) - math.log(xk1) for x in xs)
        assert abs(out[k]["x_k1"] - xk1) < 1e-4
        assert abs(out[k]["hill_alpha"] - alpha) < 1e-5
    assert out  # at least one k emitted at this SF
