"""Partitioned-sink semantics: layout, pruning, dynamic overwrite."""

from __future__ import annotations

import os

from pyspark.sql import functions as F

from audios_to_dataset_spark.catalog import load
from audios_to_dataset_spark.sinks.partitioned import (
    read_partitioned,
    write_partitioned,
)


def _explain(df) -> str:
    import contextlib
    import io

    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        df.explain("formatted")
    return buf.getvalue()


def test_layout_roundtrip_and_pruning(spark, sf_dir, tmp_path):
    out = str(tmp_path / "bylang")
    docs = load(spark, sf_dir, "documents")
    write_partitioned(docs, out, ["lang"])

    langs = {r.lang for r in docs.select("lang").distinct().collect()}
    dirs = {d for d in os.listdir(out) if d.startswith("lang=")}
    assert dirs == {f"lang={lg}" for lg in langs}

    back = read_partitioned(spark, out)
    assert back.count() == docs.count()

    # a lang predicate becomes a partition filter, not a data filter
    plan = _explain(back.filter(F.col("lang") == "en"))
    assert "PartitionFilters" in plan
    assert "isnotnull(lang" in plan or "lang#" in plan


def test_dynamic_overwrite_keeps_other_partitions(spark, sf_dir, tmp_path):
    out = str(tmp_path / "dyn")
    docs = load(spark, sf_dir, "documents")
    write_partitioned(docs, out, ["lang"])
    before = {
        r.lang: r.n
        for r in read_partitioned(spark, out)
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert len(before) > 1

    # rewrite ONE partition with half its rows; others must be untouched
    target = sorted(before)[0]
    half = docs.filter(
        (F.col("lang") == target) & (F.col("doc_id") % 2 == 0)
    )
    write_partitioned(half, out, ["lang"])
    after = {
        r.lang: r.n
        for r in read_partitioned(spark, out)
        .groupBy("lang").agg(F.count(F.lit(1)).alias("n")).collect()
    }
    assert after[target] == half.count()
    for lg, n in before.items():
        if lg != target:
            assert after[lg] == n, f"partition {lg} was clobbered"

    # conf restored after the write
    assert (
        spark.conf.get("spark.sql.sources.partitionOverwriteMode", "static")
        == "static"
    )


def test_static_overwrite_truncates_everything(spark, sf_dir, tmp_path):
    out = str(tmp_path / "static")
    docs = load(spark, sf_dir, "documents")
    write_partitioned(docs, out, ["lang"])
    target = docs.select("lang").distinct().orderBy("lang").first().lang
    one = docs.filter(F.col("lang") == target)
    write_partitioned(one, out, ["lang"], dynamic=False)
    left = {
        r.lang for r in read_partitioned(spark, out)
        .select("lang").distinct().collect()
    }
    assert left == {target}
