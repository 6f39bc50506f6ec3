"""Plan-level evidence that AQE skew-join handling actually fires
(VERDICT r5 item 7): the --skew sweep proves ANSWERS stay correct under
a hot key, but nothing pinned that the session's
``spark.sql.adaptive.skewJoin.enabled`` produces a split plan. This
test executes a deliberately skewed sort-merge join and asserts the
FINAL adaptive plan carries ``SortMergeJoin(skew=true)`` with a
``skewed`` AQEShuffleRead on the hot side.

Local caveat, encoded in the conf overrides: at local[32] test sizes no
partition crosses the production defaults
(skewedPartitionThresholdInBytes = 256 MB, advisory = 64 MB), so the
optimizer would correctly decline — the test lowers the thresholds to
the ~100 KB scale of the fixture and disables partition coalescing
(which otherwise raises the median by merging the many near-empty
non-hot partitions, the factor*median test then masking the skew at
these toy sizes). On a real cluster the default thresholds express the
same shape at MB/GB scale. Broadcast is disabled because a broadcastable
dim side is the OTHER mitigation — here we pin the shuffled-join path.
"""

from __future__ import annotations

from pyspark.sql import functions as F

_OVERRIDES = {
    "spark.sql.autoBroadcastJoinThreshold": "-1",
    "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "100k",
    "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64k",
    "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2.0",
    "spark.sql.adaptive.coalescePartitions.enabled": "false",
}


def test_aqe_splits_skewed_sort_merge_join(spark):
    saved = {k: spark.conf.get(k, None) for k in _OVERRIDES}
    try:
        for k, v in _OVERRIDES.items():
            spark.conf.set(k, v)
        # 90% of 200k rows on one key (~13 MB post-shuffle partition vs
        # a ~tens-of-KB median) — the single-hot-user shape of --skew
        big = spark.range(0, 200_000).select(
            F.when(F.col("id") % 10 < 9, F.lit(7))
            .otherwise(F.col("id") % 50)
            .alias("k"),
            F.concat(F.lit("x" * 64), F.col("id").cast("string")).alias(
                "pad"
            ),
        )
        dim = spark.range(0, 50).select(
            F.col("id").alias("k"), F.col("id").alias("v")
        )
        j = big.join(dim, "k")
        # collect() (not count()) so THIS DataFrame's queryExecution is
        # the one that runs and finalizes its adaptive plan
        assert len(j.collect()) == 200_000
        plan = j._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "SortMergeJoin(skew=true)" in plan, plan[:2000]
        assert "AQEShuffleRead skewed" in plan, plan[:2000]
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
