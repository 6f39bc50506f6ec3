"""q_dsir_select vs a pure-python replay (independent of both engines)."""

from __future__ import annotations

import hashlib
from collections import Counter

import pandas as pd

from audios_to_dataset_spark.plans.textops2 import (
    DSIR_BUCKETS,
    DSIR_TARGET_LANG,
    q_dsir_select,
)


def _bucket(tok: str) -> int:
    h = hashlib.md5(("dsir:" + tok).encode()).hexdigest()[:15]
    return int(h, 16) % DSIR_BUCKETS


def test_dsir_select_matches_python_replay(spark, sf_dir):
    got = {r.doc_id: r for r in q_dsir_select(spark, sf_dir).collect()}
    df = pd.read_parquet(sf_dir + "/documents.parquet")
    B = DSIR_BUCKETS
    raw: Counter = Counter()
    tgt: Counter = Counter()
    docs = {}
    for r in df.itertuples():
        toks = [t for t in r.text.lower().split(" ") if t]
        bs = [_bucket(t) for t in toks]
        docs[r.doc_id] = (r.lang, Counter(bs))
        raw.update(bs)
        if r.lang == DSIR_TARGET_LANG:
            tgt.update(bs)
    R, T = sum(raw.values()), sum(tgt.values())
    delta = {
        b: ((tgt[b] + 1) / (T + B) - (raw[b] + 1) / (R + B)) * 1e6
        for b in raw
    }
    assert set(got) == set(docs)
    for doc_id, (lang, cnts) in docs.items():
        row = got[doc_id]
        exp = sum(c * delta[b] for b, c in cnts.items())
        assert row.lang == lang
        assert row.n_toks == sum(cnts.values())
        assert abs(row.dsir_score_ppm - exp) < 0.01


def test_dsir_target_lang_scores_highest_on_average(spark, sf_dir):
    rows = q_dsir_select(spark, sf_dir).collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append(r.dsir_score_ppm)
    means = {k: sum(v) / len(v) for k, v in by_lang.items()}
    assert max(means, key=means.get) == DSIR_TARGET_LANG
