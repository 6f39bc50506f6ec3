"""Declarative query plans exposed through ``__spark_entry__``.

Each module defines two dicts:

- ``QUERIES``: name -> ``fn(spark, sf_dir) -> DataFrame``
- ``ORACLES``: name -> ANSI-SQL string DuckDB runs on the same parquet
  (omitted for non-SQL-expressible ops → the driver does a rows-only check)

``all_queries()`` / ``all_oracles()`` merge every module; this is the single
source of truth for the driver contract.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession


def _modules():
    from ..streaming import events as streaming_events
    from . import (
        analytics,
        curation,
        dedup,
        evalmetrics,
        events,
        multimodal,
        paths,
        relational,
        relational2,
        similarity,
        sketches,
        textmetrics,
        textops,
        textops2,
        timeseries,
        tpch2,
        versioning,
    )

    # Order matters: the driver's correctness gate samples queries in
    # iteration order. Module order is no longer the window mechanism:
    # ``all_queries`` reorders by ``_ROTATION_FIRST`` (below), which
    # front-loads every query that has never produced a CORRECTNESS row.
    return (sketches, analytics, textops, events, tpch2, versioning, paths,
            textops2, dedup, similarity, multimodal, streaming_events,
            curation, relational, relational2, evalmetrics, timeseries,
            textmetrics)


# ROUND 9 rotation (VERDICT r8 item 1: preserve the full-attestation
# invariant under growth). As of CORRECTNESS_r08 every one of the 328
# r8-declared queries has a green driver row; the ONLY exposure is new
# queries, so all round-9 additions sit at positions 1-N of the driver's
# 50-query window and are attested immediately. Also re-attested inside
# the window: q_interleave_mixture (weight derivation changed this
# round — guarded digit extraction, ADVICE r8). Keep new queries ≤50
# per round so the window always covers them.
_ROTATION_FIRST = (
    # --- round-9 additions (second wave) ---
    "q_ohlc", "q_time_weighted_avg", "q_interpolate", "q_lttb",
    "q_ndcg", "q_mrr", "q_map_at_k", "q_cohen_kappa",
    "q_readability", "q_heaps_law", "q_clustering_coeff", "q_ogg_pages",
    "q_pr_auc", "q_ece", "q_gini_length", "q_ebml_walk",
    "q_hard_negatives", "q_psi", "q_lift_curve",
    # --- round-9 additions ---
    "q_bq_recall", "q_embed_dim_stats",
    "q_auc", "q_calibration_bins", "q_confusion_matrix",
    "q_mode_value", "q_decay_weights",
    "q_histogram", "q_id_gaps",
    "q_audio_clipping", "q_audio_windows", "q_audio_aac",
    # --- changed-in-r9 (re-attest) ---
    "q_interleave_mixture",
    # q_dbscan's planes now auto-scale (prefix-identical at gate scale,
    # so its result is unchanged — re-attested anyway since the plan
    # and oracle both changed)
    "q_dbscan",
)


def all_queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    merged: dict[str, Callable[[SparkSession, str], DataFrame]] = {}
    for mod in _modules():
        overlap = merged.keys() & mod.QUERIES.keys()
        if overlap:
            raise ValueError(f"duplicate query ids: {overlap}")
        merged.update(mod.QUERIES)
    front = {n: merged[n] for n in _ROTATION_FIRST if n in merged}
    front.update((n, fn) for n, fn in merged.items() if n not in front)
    return front


def all_oracles() -> dict[str, str]:
    merged: dict[str, str] = {}
    for mod in _modules():
        merged.update(mod.ORACLES)
    return merged
