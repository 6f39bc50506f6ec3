"""Fast partition-invariance contract (VERDICT r6 item 6).

The full sweep — every declared query differentially checked on
local[1] with ONE shuffle partition (`SPARK_GRAFT_CPUS=1 python
tools/check.py /root/testdata/sf0.01`) — proves no result depends on
partition count or merge order, the axis AQE/repartition changes at
scale. It takes ~45 min, so it runs only when aggregation/window order
contracts change. This marker pins the ~20 queries whose results
actually carry an order contract (cumulative packing, rank tie-breaks,
streaming replays, iterative graph fixpoints, shard assignment) as a
cheap pre-commit subset: `python -m pytest -m partition_invariance`.

Excluded from the default run via pytest.ini addopts so `pytest
tests/ -x -q` stays ~90 s.
"""

from __future__ import annotations

import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# Every query whose value hash encodes an ORDER contract: if any of
# these depends on partition count or merge order, one shuffle
# partition vs 32 flips the hash.
ORDER_CONTRACT_QUERIES = [
    # cumulative/ordered packing (NULL-id rows must be dropped, see
    # CLAUDE.md combined-sweep note)
    "q_seq_pack", "q_compaction_plan", "q_cdc_chunks", "q_cdc_merge",
    # rank/row_number tie-breaks
    "q_window_rownum", "q_window_rank", "q_dense_rank", "q_window_ntile",
    "q_window_bucket",
    # event ordering / sessionization
    "q_event_sequence", "q_rolling_sum", "q_session_gap",
    "q_tumbling_window",
    # streaming replays (watermark + state merge order)
    "q_stream_outer_join", "q_stream_record_high", "q_stream_media_meta",
    "q_stream_attribution",
    # iterative fixpoints + hash-derived assignment
    "q_split_assign", "q_knn_graph", "q_kcore",
    # global shuffle / incremental merge / manifest zones
    "q_global_shuffle", "q_incremental_agg", "q_zone_map",
    # round-8: stride-scheduled interleave (per-source rank -> pos_key)
    "q_interleave_mixture",
    # round-9: mode tie-break; two-level gap detection (LEAD windows
    # within bucket + over the bucket summary); histogram-AUC
    # cumulative sum over the quantized score histogram
    "q_mode_value", "q_id_gaps", "q_auc",
    # round-9 second wave: first/last-by-total-order bars, lead-based
    # durations, LOCF bracketing, argmax survivor selection, per-label
    # rank lists
    "q_ohlc", "q_time_weighted_avg", "q_interpolate", "q_lttb",
    "q_ndcg", "q_map_at_k",
    # round-9 third wave: histogram-cumulative PR curve, per-source
    # length ranks, per-anchor negative ranks
    "q_pr_auc", "q_gini_length", "q_hard_negatives", "q_lift_curve",
    # round-10: histogram-rank cumulative windows (tie ranks/quantile
    # walks over distinct-value spines) and the top-K rank spine
    "q_spearman", "q_winsorized_mean", "q_zipf_slope",
    # round-10 survival family: product-limit / risk-set cumulatives
    # over the day-gap spine, BH rank + reverse cummin, per-block
    # sorted-neighborhood ranks, timeline lag pairs
    "q_kaplan_meier", "q_logrank", "q_bh_fdr", "q_entropy_rate",
    "q_sorted_neighborhood",
    # round-10 second wave: CDF cumulative over the fixed score spine
    "q_wasserstein",
    # round-10 third wave: slope-histogram selection, rank-sum spine
    # cumulative, last-touch timeline windows, split-gain argmax
    "q_theil_sen", "q_mann_whitney", "q_attribution", "q_best_split",
    # round-11: 2-D prefix sums over the densified contingency grid,
    # rank-sum spine cumulative, per-user timeline windows (trailing
    # bands, running peak, ordinal patterns), top-K rank spines
    "q_kendall_tau", "q_kruskal_wallis", "q_bollinger", "q_drawdown",
    "q_permutation_entropy", "q_rank_overlap", "q_lorenz_gini",
    "q_stream_bollinger", "q_tail_index",
]


@pytest.mark.partition_invariance
def test_order_contract_queries_on_one_partition():
    """Differential check of the order-contract subset on local[1]
    with one shuffle partition — must end '0 failures'."""
    env = dict(os.environ, SPARK_GRAFT_CPUS="1")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "tools", "check.py"),
         "/root/testdata/sf0.01", *ORDER_CONTRACT_QUERIES],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=1800,
    )
    tail = "\n".join(proc.stdout.strip().splitlines()[-5:])
    assert proc.returncode == 0, f"check failed:\n{tail}\n{proc.stderr[-2000:]}"
    assert "0 failures" in proc.stdout, tail
