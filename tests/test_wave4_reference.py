"""Independent pure-Python references for the round-10 fourth wave
(simplified silhouette, RANGE-frame trailing aggregates, RFM
segmentation) — a THIRD implementation in a different paradigm so a
formula both the Spark plan and its DuckDB twin encode
identically-wrong cannot survive.
"""

from __future__ import annotations

import math

import pandas as pd

US_PER_DAY = 86_400_000_000
US_PER_HOUR = 3_600_000_000


def test_silhouette_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.similarity import q_silhouette

    got = {r["label"]: r for r in
           (x.asDict() for x in q_silhouette(spark, sf_dir).collect())}
    em = pd.read_parquet(f"{sf_dir}/embeddings.parquet").dropna(
        subset=["vec_id", "embedding", "label"]
    )
    pts = [(int(r["label"]), [float(x) for x in r["embedding"]])
           for _, r in em.iterrows()]
    d = len(pts[0][1])
    cents: dict[int, list[float]] = {}
    for lab in {l for l, _ in pts}:
        vs = [v for l, v in pts if l == lab]
        cents[lab] = [sum(v[i] for v in vs) / len(vs) for i in range(d)]
    sizes = {lab: sum(1 for l, _ in pts if l == lab) for lab, _ in pts}
    sils: dict[int, list[float]] = {}
    for lab, v in pts:
        if sizes[lab] == 1:  # singleton cluster → s = 0 (ADVICE r10)
            sils.setdefault(lab, []).append(0.0)
            continue
        dist = {cl: math.sqrt(sum((v[i] - c[i]) ** 2 for i in range(d)))
                for cl, c in cents.items()}
        a = dist[lab]
        b = min(dv for cl, dv in dist.items() if cl != lab)
        if max(a, b) > 0:
            sils.setdefault(lab, []).append((b - a) / max(a, b))
    for lab, ss in sils.items():
        r = got[lab]
        assert abs(r["mean_sil"] - sum(ss) / len(ss)) < 1e-4
    allv = [s for ss in sils.values() for s in ss]
    assert abs(got[-1]["mean_sil"] - sum(allv) / len(allv)) < 1e-4
    assert got[-1]["n_points"] == len(pts)


def test_range_frame_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.events import (
        RANGE_FRAME_US, q_range_frame,
    )

    got = {r["event_id"]: r for r in
           (x.asDict() for x in q_range_frame(spark, sf_dir).collect())}
    e = pd.read_parquet(f"{sf_dir}/events.parquet").dropna(subset=["ts"])
    e["t_us"] = e["ts"].astype("datetime64[us]").astype("int64")
    n_checked = 0
    for _, g in e.groupby("user_id", dropna=False):
        rows = list(zip(g["event_id"], g["t_us"], g["value"]))
        for eid, t, _v in rows:
            frame = [(t2, v2) for _, t2, v2 in rows
                     if t - RANGE_FRAME_US <= t2 <= t]
            r = got[eid]
            assert r["n_1h"] == len(frame)
            vals = [v for _, v in frame if pd.notna(v)]
            if vals:
                assert abs(r["sum_1h"] - sum(vals)) < 1e-4
            else:
                assert r["sum_1h"] is None
            n_checked += 1
    assert n_checked == len(got) > 0


def test_rfm_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.analytics import (
        RFM_F_ORDERS, RFM_M_SPEND, RFM_R_DAYS, q_rfm,
    )

    got = {r["segment"]: r for r in
           (x.asDict() for x in q_rfm(spark, sf_dir).collect())}
    o = pd.read_parquet(f"{sf_dir}/orders.parquet").dropna(
        subset=["o_custkey", "o_orderdate"]
    )
    o["day"] = (o["o_orderdate"].astype("datetime64[us]")
                .astype("int64") // US_PER_DAY)
    horizon = int(o["day"].max())

    def band(v, edges, desc):
        for i, e in enumerate(edges):
            if (v >= e) if desc else (v <= e):
                return i + 1
        return 4

    segs: dict[str, list[float]] = {}
    for _, g in o.groupby("o_custkey"):
        rec = horizon - int(g["day"].max())
        nord = len(g)
        spend = float(g["o_totalprice"].sum())
        seg = (f"R{band(rec, RFM_R_DAYS, False)}"
               f"F{band(nord, RFM_F_ORDERS, True)}"
               f"M{band(spend, RFM_M_SPEND, True)}")
        segs.setdefault(seg, []).append(spend)
    assert set(got) == set(segs)
    for seg, spends in segs.items():
        assert got[seg]["n_customers"] == len(spends)
        assert abs(got[seg]["avg_spend"]
                   - sum(spends) / len(spends)) < 1e-3
