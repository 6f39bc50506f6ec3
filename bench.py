"""Benchmark harness: runs the headline queries at $SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS] and prints ONE
JSON line: {"metric": ..., "value": total_sec, "unit": "sec",
"queries": {name: sec}, "sf": ...}.

Execution is forced through the noop sink (full computation, no driver
collect) so we measure the engine, not result transfer.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from audios_to_dataset_spark.plans import all_queries  # noqa: E402
from audios_to_dataset_spark.session import get_session  # noqa: E402

# Headline set: one per operator family, weighted toward what dominates a
# 100 TB run (scans, joins, aggs, windows, dedup, similarity). The O(N^2)
# brute-force correctness baselines stay out — their scale path (LSH) is in.
HEADLINE = [
    "q_agg_count",
    "q_join_inner",
    "q_join_left",
    "q_filter_in",
    "q_window_rownum",
    "q_window_rank",
    "q_sort_limit",
    "q_tumbling_window",
    "q_session_gap",
    "q_dedup_first",
    "q_dedup_exact",
    "q_dedup_minhash_lsh",
    "q_text_stats",
    "q_lang_id",
    "q_cosine_scores",
    "q_ann_topk",
]


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else -1.0

    spark = get_session("bench")
    spark.sparkContext.setLogLevel("ERROR")
    queries = all_queries()

    # JVM/codegen warmup on a cheap query so q1 doesn't pay session startup.
    queries["q_sort_limit"](spark, sf_dir).write.mode("overwrite").format(
        "noop"
    ).save()

    timings: dict[str, float] = {}
    for name in HEADLINE:
        fn = queries[name]
        t0 = time.perf_counter()
        fn(spark, sf_dir).write.mode("overwrite").format("noop").save()
        timings[name] = round(time.perf_counter() - t0, 3)

    total = round(sum(timings.values()), 3)
    print(
        json.dumps(
            {
                "metric": "headline_queries_total",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
