"""Independent pure-Python references for the time-series and ranking
operators — a THIRD implementation in a different paradigm (imperative
loops over pandas rows), so a formula both the Spark plan and its
DuckDB twin encode identically-wrong cannot survive (the VP8L
distance-map lesson: round-trip agreement proves nothing when both
sides share the table).

The references read the same sf0.001 parquet the differential gate
uses and re-derive OHLC, time-weighted averages, interpolation, LTTB
selection, NDCG/MAP/MRR, kappa, ECE/PR-AUC, and the length Gini from
their textbook definitions.
"""

from __future__ import annotations

import math

import pandas as pd
import pytest


def _events(sf_dir: str) -> pd.DataFrame:
    df = pd.read_parquet(f"{sf_dir}/events.parquet")
    df = df.dropna(subset=["ts", "value", "event_id", "event_type"])
    # normalize whatever resolution pandas picked to integer micros
    df["t_us"] = df["ts"].astype("datetime64[us]").astype("int64")
    return df


def _embeddings(sf_dir: str) -> pd.DataFrame:
    return pd.read_parquet(f"{sf_dir}/embeddings.parquet")


def test_ohlc_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.timeseries import q_ohlc

    got = {
        (r["win_start"], r["event_type"]): r
        for r in (x.asDict() for x in q_ohlc(spark, sf_dir).collect())
    }
    df = _events(sf_dir)
    HOUR = 3_600_000_000
    df["h_us"] = df["t_us"] // HOUR * HOUR
    n_groups = 0
    for (h_us, et), g in df.groupby(["h_us", "event_type"]):
        rows = sorted(
            g[["t_us", "event_id", "value"]].itertuples(index=False)
        )
        key_ts = pd.Timestamp(h_us * 1000)
        r = got[(key_ts, et)]
        assert r["n_events"] == len(rows)
        assert r["open_v"] == rows[0][2]
        assert r["close_v"] == rows[-1][2]
        assert r["low_v"] == min(v for _, _, v in rows)
        assert r["high_v"] == max(v for _, _, v in rows)
        assert abs(r["sum_value"] - sum(v for _, _, v in rows)) < 1e-5
        n_groups += 1
    assert n_groups == len(got) > 0


def test_time_weighted_avg_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.timeseries import (
        q_time_weighted_avg,
    )

    got = {
        r["event_type"]: r
        for r in (
            x.asDict()
            for x in q_time_weighted_avg(spark, sf_dir).collect()
        )
    }
    df = _events(sf_dir)
    for et, g in df.groupby("event_type"):
        rows = sorted(
            g[["t_us", "event_id", "value"]].itertuples(index=False)
        )
        num = 0.0
        tot = 0
        for (t0, _, v), (t1, _, _) in zip(rows, rows[1:]):
            num += v * (t1 - t0)
            tot += t1 - t0
        r = got[et]
        assert r["n_intervals"] == len(rows) - 1
        assert r["total_us"] == tot
        if tot:
            assert r["twa"] == pytest.approx(num / tot, abs=1e-4)


def test_interpolate_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.timeseries import q_interpolate

    got = {
        (r["event_type"], r["win_start"]): r["y_interp"]
        for r in (
            x.asDict() for x in q_interpolate(spark, sf_dir).collect()
        )
    }
    df = _events(sf_dir)
    HOUR = 3_600_000_000
    h0 = df["t_us"].min() // HOUR * HOUR
    h1 = df["t_us"].max() // HOUR * HOUR
    n = 0
    for et, g in df.groupby("event_type"):
        rows = sorted(
            g[["t_us", "event_id", "value"]].itertuples(index=False)
        )
        for gt in range(int(h0), int(h1) + 1, HOUR):
            prev = [r for r in rows if r[0] <= gt]
            nxt = [r for r in rows if r[0] >= gt]
            if not prev or not nxt:
                continue
            p, x = prev[-1], nxt[0]
            exp = (
                p[2]
                if x[0] == p[0]
                else p[2] + (x[2] - p[2]) * (gt - p[0]) / (x[0] - p[0])
            )
            key = (et, pd.Timestamp(gt * 1000))
            assert got[key] == pytest.approx(exp, abs=1e-5), key
            n += 1
    assert n == len(got) > 0


def test_lttb_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.timeseries import (
        LTTB_BUCKETS as B,
        q_lttb,
    )

    got = {
        (r["event_type"], r["b"]): r
        for r in (x.asDict() for x in q_lttb(spark, sf_dir).collect())
    }
    df = _events(sf_dir)
    n_checked = 0
    for et, g in df.groupby("event_type"):
        rows = sorted(
            g[["t_us", "event_id", "value"]].itertuples(index=False)
        )
        tmin, tmax = rows[0][0], max(r[0] for r in rows)
        # endpoints under the total order
        first = rows[0]
        last = max(rows, key=lambda r: (r[0], r[1], r[2]))
        assert got[(et, 0)]["sel_value"] == first[2]
        assert got[(et, B - 1)]["sel_value"] == last[2]
        buckets: dict[int, list] = {}
        for t, eid, v in rows:
            b = (t - tmin) * B // (tmax - tmin + 1)
            buckets.setdefault(b, []).append((t, eid, v))
        for b in range(1, B - 1):
            if b not in buckets or b - 1 not in buckets or b + 1 not in buckets:
                assert (et, b) not in got
                continue
            ln, rn = buckets[b - 1], buckets[b + 1]
            ax = sum(t - tmin for t, _, _ in ln) / len(ln)
            ay = sum(v for _, _, v in ln) / len(ln)
            bx = sum(t - tmin for t, _, _ in rn) / len(rn)
            by = sum(v for _, _, v in rn) / len(rn)
            best = max(
                buckets[b],
                key=lambda r: (
                    abs(
                        (ax - (r[0] - tmin)) * (by - r[2])
                        - (bx - (r[0] - tmin)) * (ay - r[2])
                    ),
                    -(r[0] - tmin),
                    -r[1],
                    -r[2],
                ),
            )
            assert got[(et, b)]["sel_value"] == best[2], (et, b)
            n_checked += 1
    assert n_checked > 0


def test_ranking_metrics_match_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.evalmetrics import (
        RANK_K,
        q_map_at_k,
        q_mrr,
        q_ndcg,
    )

    em = _embeddings(sf_dir).dropna(subset=["vec_id", "embedding", "label"])
    rows = []
    for r in em.itertuples(index=False):
        e = [float(x) for x in r.embedding]
        nrm = math.sqrt(sum(x * x for x in e))
        if nrm <= 0:
            continue
        score = round(((e[0] / nrm + 1.0) / 2.0) * 1e6) / 1e6
        rows.append(
            (int(r.label), int(r.vec_id), score, r.vec_id % 3 != 0)
        )
    per_label: dict[int, list] = {}
    for lab, vid, score, rel in rows:
        per_label.setdefault(lab, []).append((score, vid, rel))
    ndcg = {
        r["label"]: r
        for r in (x.asDict() for x in q_ndcg(spark, sf_dir).collect())
    }
    mrr = {
        r["label"]: r
        for r in (x.asDict() for x in q_mrr(spark, sf_dir).collect())
    }
    mapk = {
        r["label"]: r
        for r in (x.asDict() for x in q_map_at_k(spark, sf_dir).collect())
    }
    for lab, lst in per_label.items():
        ranked = sorted(lst, key=lambda r: (-r[0], r[1]))
        rels = [rel for _, _, rel in ranked]
        n_rel = sum(rels)
        w = [1.0 / math.log2(i + 2) for i in range(RANK_K)]
        dcg = sum(
            w[i] for i in range(min(RANK_K, len(ranked))) if rels[i]
        )
        idcg = sum(w[: min(n_rel, RANK_K)])
        r = ndcg[lab]
        assert r["n_rel"] == n_rel
        assert r["dcg"] == pytest.approx(dcg, abs=1e-6)
        if n_rel:
            assert r["ndcg"] == pytest.approx(dcg / idcg, abs=1e-6)
        # MRR
        first = next((i + 1 for i, x in enumerate(rels) if x), None)
        assert mrr[lab]["first_rel_rank"] == first
        # MAP@K
        cum = 0
        ap_num = 0.0
        for i, x in enumerate(rels):
            if x:
                cum += 1
                if i < RANK_K:
                    ap_num += cum / (i + 1)
        denom = min(n_rel, RANK_K)
        exp_ap = ap_num / denom if denom else 0.0
        assert mapk[lab]["ap"] == pytest.approx(exp_ap, abs=1e-6)


def test_kappa_ece_prauc_gini_match_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.evalmetrics import (
        CAL_BINS,
        N_CLASSES,
        q_cohen_kappa,
        q_ece,
        q_pr_auc,
    )
    from audios_to_dataset_spark.plans.textmetrics import q_gini_length

    em = _embeddings(sf_dir).dropna(subset=["vec_id", "label"])
    # kappa
    pa = [
        (int(l) + 1) % N_CLASSES if v % 3 == 0 else int(l)
        for v, l in zip(em.vec_id, em.label)
    ]
    pb = [
        (int(l) + 2) % N_CLASSES if v % 5 == 0 else int(l)
        for v, l in zip(em.vec_id, em.label)
    ]
    n = len(pa)
    po = sum(a == b for a, b in zip(pa, pb)) / n
    pe = sum(
        pa.count(c) * pb.count(c) for c in range(N_CLASSES)
    ) / (n * n)
    r = q_cohen_kappa(spark, sf_dir).collect()[0].asDict()
    assert r["n_total"] == n
    assert r["po"] == pytest.approx(po, abs=1e-9)
    assert r["pe"] == pytest.approx(pe, abs=1e-9)
    assert r["kappa"] == pytest.approx((po - pe) / (1 - pe), abs=1e-9)

    # scored rows shared by ECE / PR-AUC
    emf = _embeddings(sf_dir).dropna(
        subset=["vec_id", "embedding", "label"]
    )
    scored = []
    for x in emf.itertuples(index=False):
        e = [float(v) for v in x.embedding]
        nrm = math.sqrt(sum(v * v for v in e))
        if nrm <= 0:
            continue
        s = round(((e[0] / nrm + 1.0) / 2.0) * 1e6) / 1e6
        scored.append((s, int(x.label) % 2 == 1))
    # ECE
    bins: dict[int, list] = {}
    for s, pos in scored:
        bins.setdefault(min(int(s * CAL_BINS), CAL_BINS - 1), []).append(
            (s, pos)
        )
    ece = sum(
        abs(
            sum(p for _, p in g) / len(g)
            - sum(s for s, _ in g) / len(g)
        )
        * len(g)
        for g in bins.values()
    ) / len(scored)
    r = q_ece(spark, sf_dir).collect()[0].asDict()
    assert r["n_total"] == len(scored)
    assert r["ece"] == pytest.approx(ece, abs=1e-9)

    # PR-AUC (tie-aware AP over distinct descending thresholds)
    from collections import Counter

    hist_pos = Counter(s for s, p in scored if p)
    hist_neg = Counter(s for s, p in scored if not p)
    thresholds = sorted(set(s for s, _ in scored), reverse=True)
    tp = fp = 0
    ap = 0.0
    P = sum(hist_pos.values())
    for t in thresholds:
        tp += hist_pos.get(t, 0)
        fp += hist_neg.get(t, 0)
        ap += hist_pos.get(t, 0) * (tp / (tp + fp))
    r = q_pr_auc(spark, sf_dir).collect()[0].asDict()
    assert r["n_pos"] == P
    assert r["pr_auc"] == pytest.approx(ap / P, abs=1e-6)

    # Gini of doc length per source
    docs = pd.read_parquet(f"{sf_dir}/documents.parquet").dropna(
        subset=["doc_id", "source", "n_chars"]
    )
    got = {
        r["source"]: r
        for r in (
            x.asDict() for x in q_gini_length(spark, sf_dir).collect()
        )
    }
    for src, g in docs.groupby("source"):
        xs = sorted(
            (int(c), int(d)) for c, d in zip(g.n_chars, g.doc_id)
        )
        nn = len(xs)
        sx = sum(c for c, _ in xs)
        six = sum((i + 1) * c for i, (c, _) in enumerate(xs))
        gini = (2 * six - (nn + 1) * sx) / (nn * sx)
        assert got[src]["gini"] == pytest.approx(gini, abs=1e-9)


def test_psi_matches_naive_reference(spark, sf_dir):
    import math as _m

    from audios_to_dataset_spark.plans.evalmetrics import (
        CAL_BINS,
        PSI_SMOOTH,
        q_psi,
    )

    em = _embeddings(sf_dir).dropna(
        subset=["vec_id", "embedding", "label"]
    )
    ref: dict[int, int] = {b: 0 for b in range(CAL_BINS)}
    cur: dict[int, int] = {b: 0 for b in range(CAL_BINS)}
    for x in em.itertuples(index=False):
        e = [float(v) for v in x.embedding]
        nrm = _m.sqrt(sum(v * v for v in e))
        if nrm <= 0:
            continue
        s = round(((e[0] / nrm + 1.0) / 2.0) * 1e6) / 1e6
        b = min(int(s * CAL_BINS), CAL_BINS - 1)
        (ref if x.vec_id % 2 == 0 else cur)[b] += 1
    t_ref, t_cur = sum(ref.values()), sum(cur.values())
    psi = 0.0
    for b in range(CAL_BINS):
        p = (ref[b] + PSI_SMOOTH) / (t_ref + PSI_SMOOTH * CAL_BINS)
        q = (cur[b] + PSI_SMOOTH) / (t_cur + PSI_SMOOTH * CAL_BINS)
        psi += (p - q) * _m.log(p / q)
    rows = {r["bin"]: r for r in
            (x.asDict() for x in q_psi(spark, sf_dir).collect())}
    assert rows[-1]["n_ref"] == t_ref and rows[-1]["n_cur"] == t_cur
    assert rows[-1]["contrib"] == pytest.approx(psi, abs=1e-7)
    for b in range(CAL_BINS):
        assert rows[b]["n_ref"] == ref[b] and rows[b]["n_cur"] == cur[b]
