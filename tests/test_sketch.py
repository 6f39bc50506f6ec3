"""HLL sketch, PageRank, and bloom semi-join properties.

Cross-engine value parity is covered by the driver oracle
(plans/sketches.py); these tests pin the *algorithmic* guarantees the
oracle can't express: estimator accuracy, rank-mass conservation,
bloom's no-false-negative contract, and the broadcast plan shape.
"""

from __future__ import annotations

from pyspark.sql import functions as F

from audios_to_dataset_spark.operators.bloom import bloom_semi_join
from audios_to_dataset_spark.operators.graph import pagerank
from audios_to_dataset_spark.operators.sketch import hll_estimate


def test_hll_accuracy(spark):
    # 5000 distinct values, one group; m=256 → typical error ~6.5%.
    df = spark.range(5000).select(
        F.lit("g").alias("g"), F.col("id").alias("v")
    )
    est = hll_estimate(df, "v", ["g"], m=256).collect()[0].hll_estimate
    assert abs(est / 5000.0 - 1.0) < 0.2


def test_hll_duplicates_dont_inflate(spark):
    # 100 distinct values repeated 50x each must estimate ~100, not 5000.
    df = spark.range(5000).select(
        F.lit("g").alias("g"), (F.col("id") % 100).alias("v")
    )
    est = hll_estimate(df, "v", ["g"], m=64).collect()[0].hll_estimate
    assert abs(est / 100.0 - 1.0) < 0.35


def test_pagerank_mass_and_dangling(spark):
    # a -> b, a -> c, b -> c; c dangling. Ranks must stay a probability
    # distribution and favor the sink c.
    edges = spark.createDataFrame(
        [(1, 2), (1, 3), (2, 3)], "src long, dst long"
    )
    ranks = {r.id: r.rank for r in pagerank(edges, iters=10).collect()}
    assert abs(sum(ranks.values()) - 1.0) < 1e-9
    assert ranks[3] > ranks[2] > ranks[1] > 0


def test_bloom_semi_join_contract(spark):
    probe = spark.range(0, 2000).select(F.col("id").alias("k"))
    build = spark.range(0, 300).select((F.col("id") * 3).alias("bk"))
    passed = bloom_semi_join(probe, build, "k", "bk", m_bits=1024, k=2)
    got = {r.k for r in passed.collect()}
    true = {r.bk for r in build.collect()}
    # no false negatives; pruning actually happened; supersets only
    assert true <= got
    assert len(got) < 2000

    # plan: probe side must be filtered via broadcast joins (no shuffle
    # of the probe table before the semi joins)
    plan = passed._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan and "LeftSemi" in plan
    assert "SortMergeJoin" not in plan


def test_histogram_quantiles_uniform(spark):
    from audios_to_dataset_spark.operators.sketch import histogram_quantiles

    df = spark.range(10000).select(
        F.lit("g").alias("g"), F.col("id").cast("double").alias("v")
    )
    row = histogram_quantiles(
        df, "v", ["g"], lo=0.0, hi=10000.0, bins=1000, quantiles=[50, 95]
    ).collect()[0]
    assert row.n_rows == 10000
    # bin width 10: estimates land on the bin's upper edge
    assert abs(row.p50_est - 5000.0) <= 10.0
    assert abs(row.p95_est - 9500.0) <= 10.0


def _py_spread16(x: int) -> int:
    x &= 0xFFFF
    for s, mask in ((8, 0x00FF00FF), (4, 0x0F0F0F0F),
                    (2, 0x33333333), (1, 0x55555555)):
        x = (x | (x << s)) & mask
    return x


def test_morton_matches_reference_bit_interleave(spark):
    from audios_to_dataset_spark.operators.zorder import morton2

    rows = [(3, 5), (0, 0), (65535, 65535), (1234, 4321), (65536 + 7, 9)]
    df = spark.createDataFrame(rows, "x long, y long")
    got = {
        (r.x, r.y): r.z
        for r in df.select(
            "x", "y", morton2(F.col("x"), F.col("y")).alias("z")
        ).collect()
    }
    for x, y in rows:
        assert got[(x, y)] == _py_spread16(x) | (_py_spread16(y) << 1)


def test_hll_merge_equals_direct(spark, sf_dir):
    """Register-wise max across per-source sketches must give the exact
    same estimate as one direct HLL over all documents (max is
    associative) — the mergeability contract q_hll_union relies on."""
    from pyspark.sql import functions as F

    from audios_to_dataset_spark.catalog import load
    from audios_to_dataset_spark.operators.sketch import (
        hll_estimate,
        hll_estimate_from_registers,
        hll_registers,
    )

    d = load(spark, sf_dir, "documents")
    regs = hll_registers(d, "text", ["source"], m=64)
    merged = (
        regs.groupBy("reg")
        .agg(F.max("m_j").alias("m_j"))
        .withColumn("g", F.lit("all"))
    )
    via_merge = hll_estimate_from_registers(merged, ["g"], m=64).first()

    direct = hll_estimate(
        d.withColumn("g", F.lit("all")), "text", ["g"], m=64
    ).first()
    assert via_merge.registers_hit == direct.registers_hit
    assert via_merge.hll_estimate == direct.hll_estimate  # bit-identical


def test_weighted_sample_biases_toward_long_docs(spark, sf_dir):
    """Efraimidis-Spirakis with w = n_chars must over-represent long
    documents: the sampled mean length exceeds the corpus mean (fully
    deterministic — keys are md5-derived, no RNG)."""
    from audios_to_dataset_spark.plans.sketches import (
        WSAMPLE_K,
        q_weighted_sample,
    )

    sample = q_weighted_sample(spark, sf_dir)
    rows = sample.collect()
    assert len(rows) == WSAMPLE_K
    assert len({r.doc_id for r in rows}) == WSAMPLE_K  # w/o replacement
    from audios_to_dataset_spark.catalog import load
    from pyspark.sql import functions as F

    corpus_mean = (
        load(spark, sf_dir, "documents")
        .agg(F.avg("n_chars"))
        .collect()[0][0]
    )
    sample_mean = sum(r.n_chars for r in rows) / len(rows)
    assert sample_mean > corpus_mean


def test_bootstrap_ci_brackets_the_mean(spark, sf_dir):
    from audios_to_dataset_spark.plans.sketches import q_bootstrap_ci

    rows = q_bootstrap_ci(spark, sf_dir).collect()
    assert len(rows) > 0
    for r in rows:
        assert r.ci_lo < r.ci_hi
        # the point estimate sits inside the replica spread
        assert r.ci_lo <= r.mean_value <= r.ci_hi
