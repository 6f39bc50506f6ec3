"""Range join: match rows whose timestamps fall in an interval around the
left row's time — without a nested-loop explosion.

Spark plans a raw time-inequality join as BroadcastNestedLoopJoin (or a
cartesian) — quadratic and undistributable. The scale path is bucketed
candidates: quantize time into buckets of the interval width; a left
interval ``(t+lo, t+hi]`` overlaps at most two buckets, so exploding the
left side to its two candidate buckets turns the join into an EQUI-join
on (key, bucket) followed by the exact interval filter. One shuffle,
linear in matches, skew handled like any equi-join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def range_join(
    left: DataFrame,
    right: DataFrame,
    left_key: str,
    right_key: str,
    left_time: str,
    right_time: str,
    lower_us: int,
    upper_us: int,
    how: str = "inner",
) -> DataFrame:
    """Join right rows with ``left_time + lower_us < right_time <=
    left_time + upper_us`` on matching keys.

    Returns all left columns plus all right columns (caller projects).
    ``how`` supports inner/left (left keeps unmatched left rows).
    """
    if upper_us <= lower_us:
        raise ValueError("upper_us must exceed lower_us")
    width = upper_us - lower_us

    # Tag every left row with a unique id BEFORE exploding so left-outer
    # semantics can rejoin on the tag alone: rejoining on the left's
    # value columns would multiply duplicate left rows (2 dups × m
    # matches → 4m rows) and silently drop matches whose key columns
    # contain NULL (null-unsafe equality).
    if how == "left":
        left = left.withColumn("_row_tag", F.monotonically_increasing_id())

    lt = F.unix_micros(F.col(left_time))
    rt = F.unix_micros(F.col(right_time))

    start = lt + F.lit(lower_us)
    b0 = F.floor(start / F.lit(width))
    l_exploded = left.withColumn(
        "_bucket", F.explode(F.array(b0, b0 + 1))
    )
    r_bucketed = right.withColumn("_bucket", F.floor(rt / F.lit(width)))

    cond = (
        (l_exploded[left_key] == r_bucketed[right_key])
        & (l_exploded["_bucket"] == r_bucketed["_bucket"])
    )
    joined = l_exploded.join(r_bucketed, cond, "inner").filter(
        (F.unix_micros(r_bucketed[right_time])
         > F.unix_micros(l_exploded[left_time]) + F.lit(lower_us))
        & (F.unix_micros(r_bucketed[right_time])
           <= F.unix_micros(l_exploded[left_time]) + F.lit(upper_us))
    )
    l_cols = [l_exploded[c] for c in left.columns]
    r_cols = [
        r_bucketed[c].alias(f"r_{c}") for c in right.columns
    ]
    matched = joined.select(*l_cols, *r_cols)
    if how == "inner":
        return matched
    if how == "left":
        # Unmatched lefts via anti-join on the tag, padded with NULL
        # right columns, then unioned back — no equality on value
        # columns anywhere.
        unmatched = left.join(
            matched.select("_row_tag"), on="_row_tag", how="left_anti"
        )
        for c, t in zip(right.columns, [f.dataType for f in right.schema]):
            unmatched = unmatched.withColumn(
                f"r_{c}", F.lit(None).cast(t)
            )
        return matched.unionByName(unmatched).drop("_row_tag")
    raise ValueError(f"unsupported how={how!r}")
