"""Independent pure-Python reference for the densified chi-squared
test (ADVICE r10: zero cells must contribute E exactly) — a THIRD
implementation so a formula the Spark plan and its DuckDB twin encode
identically-wrong cannot survive.
"""

from __future__ import annotations

import pandas as pd


def test_chi2_densified_matches_naive_reference(spark, sf_dir):
    from audios_to_dataset_spark.plans.infostats import (
        TOTAL, q_chi2_independence,
    )

    out = q_chi2_independence(spark, sf_dir).collect()
    got_total = next(r for r in out if r["lang"] == TOTAL)
    got_cells = {(r["lang"], r["source"]): r for r in out
                 if r["lang"] != TOTAL}

    d = pd.read_parquet(f"{sf_dir}/documents.parquet").dropna(
        subset=["lang", "source"]
    )
    obs = d.groupby(["lang", "source"]).size()
    langs = sorted(d["lang"].unique())
    sources = sorted(d["source"].unique())
    n = len(d)
    row_t = d.groupby("lang").size()
    col_t = d.groupby("source").size()

    chi2 = 0.0
    n_zero = 0
    for lang in langs:
        for src in sources:
            e = row_t[lang] * col_t[src] / n
            o = int(obs.get((lang, src), 0))
            if o == 0:
                n_zero += 1
            contrib = (o - e) ** 2 / e
            chi2 += contrib
            r = got_cells[(lang, src)]
            assert r["n_obs"] == o
            assert abs(r["contrib"] - contrib) < 1e-6

    # the densified spine is the FULL r×c grid — every combination has
    # a row, including the zero cells the contingency groupBy drops
    assert len(got_cells) == len(langs) * len(sources)
    dof = (len(langs) - 1) * (len(sources) - 1)
    v = (chi2 / (n * min(len(langs) - 1, len(sources) - 1))) ** 0.5
    assert got_total["dof"] == dof
    assert abs(got_total["chi2"] - chi2) < 1e-4
    assert abs(got_total["cramers_v"] - v) < 1e-6
    # the gate data has holes in the grid, so this test really does
    # exercise the zero-cell path (it would vacuously pass otherwise)
    assert n_zero > 0
