"""End-to-end curation CLI: every stage monotonically shrinks the corpus,
the packed output round-trips, and the run is deterministic."""

from __future__ import annotations

import os

from audios_to_dataset_spark.curate import run_curation


def test_curate_e2e(spark, tmp_path):
    out = str(tmp_path / "shards")
    report = run_curation(
        spark,
        "/root/testdata/sf0.001/documents.parquet",
        out,
        seq_len=128,
        cap=3,
        est_threshold=0.5,
    )
    assert (
        report["input"]
        >= report["after_exact_dedup"]
        >= report["after_near_dedup"]
        >= report["after_quality_gate"]
        >= report["after_source_cap"]
        > 0
    )
    # partitioned layout by lang
    langs = [d for d in os.listdir(out) if d.startswith("lang=")]
    assert langs
    back = spark.read.parquet(out)
    assert back.count() == report["after_source_cap"]
    # packing invariant: within a lang, seq_id is nondecreasing in doc_id
    rows = back.select("lang", "doc_id", "seq_id", "n_tok").collect()
    by_lang: dict = {}
    for r in rows:
        by_lang.setdefault(r.lang, []).append((r.doc_id, r.seq_id))
    for pairs in by_lang.values():
        pairs.sort()
        seqs = [s for _, s in pairs]
        assert seqs == sorted(seqs)

    # determinism: a second run reports identical counts
    report2 = run_curation(
        spark,
        "/root/testdata/sf0.001/documents.parquet",
        str(tmp_path / "shards2"),
        seq_len=128,
        cap=3,
        est_threshold=0.5,
    )
    assert {k: v for k, v in report.items() if k != "output"} == {
        k: v for k, v in report2.items() if k != "output"
    }


def test_curate_gopher_gate_stage(spark, tmp_path):
    """--gopher-min-stop wires the Gopher rule gate into the pipeline:
    the stage count appears in the report, shrinks the corpus (the
    50-word floor bites on this corpus), and survivors all satisfy the
    word-count band."""
    out = str(tmp_path / "shards_g")
    report = run_curation(
        spark,
        "/root/testdata/sf0.001/documents.parquet",
        out,
        seq_len=128,
        cap=100,
        est_threshold=0.5,
        gopher_min_stop=1,  # synthetic corpus carries only 'the'
    )
    assert "after_gopher_gate" in report
    assert (
        report["after_near_dedup"]
        >= report["after_gopher_gate"]
        >= report["after_quality_gate"]
    )
    assert report["after_gopher_gate"] > 0
    back = spark.read.parquet(out)
    from pyspark.sql import functions as F

    n_words = F.size(
        F.filter(F.split(F.lower("text"), " "), lambda t: t != "")
    )
    bad = back.filter((n_words < 50) | (n_words > 100_000)).count()
    assert bad == 0


def test_curate_weighted_sample_stage(spark, tmp_path):
    from audios_to_dataset_spark.curate import run_curation

    out = str(tmp_path / "sampled")
    report = run_curation(
        spark,
        "/root/testdata/sf0.001/documents.parquet",
        out,
        seq_len=128,
        cap=10,
        est_threshold=0.5,
        sample_k=5,
    )
    assert report["after_weighted_sample"] == 5
    back = spark.read.parquet(out)
    assert back.count() == 5
    # reproducible draw: same k selects the same doc_ids
    report2 = run_curation(
        spark,
        "/root/testdata/sf0.001/documents.parquet",
        str(tmp_path / "sampled2"),
        seq_len=128,
        cap=10,
        est_threshold=0.5,
        sample_k=5,
    )
    a = {r.doc_id for r in back.collect()}
    b = {
        r.doc_id
        for r in spark.read.parquet(str(tmp_path / "sampled2")).collect()
    }
    assert a == b and report2["after_weighted_sample"] == 5
