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
        events,
        multimodal,
        paths,
        relational,
        relational2,
        similarity,
        sketches,
        textops,
        textops2,
        tpch2,
        versioning,
    )

    # Order matters: the driver's correctness gate samples queries in
    # iteration order. Module order is no longer the window mechanism:
    # ``all_queries`` reorders by ``_ROTATION_FIRST`` (below), which
    # front-loads every query that has never produced a CORRECTNESS row.
    return (sketches, analytics, textops, events, tpch2, versioning, paths,
            textops2, dedup, similarity, multimodal, streaming_events,
            curation, relational, relational2)


# ROUND 5 rotation (VERDICT r4 item 1): the 89 queries absent from every
# CORRECTNESS_r01..r04 file, front-loaded so the driver's first-50 window
# finally covers them. Priority within the list: the round-4 flagship
# families first (multimodal media decoders, textops2/q_bm25, tpch2,
# versioning, the PQ similarity family), then events and the rest — the
# 39 past position 50 are the frozen ROUND 6 window; do not reorder or
# insert ahead of them until CORRECTNESS_r05.json lands.
_ROTATION_FIRST = (
    # --- r5 driver window (positions 1-50) ---
    "q_image_resize", "q_video_frames", "q_png_pixels", "q_gif_pixels",
    "q_audio_stats", "q_audio_ulaw",
    "q_rarity_score", "q_bpe_merges", "q_source_cap", "q_seq_pack",
    "q_source_lang_bias", "q_next_word", "q_text_chunks", "q_lm_score",
    "q_bm25", "q_bpe_apply", "q_dsir_select", "q_fertility",
    "q_forecast_revenue", "q_priority_wait", "q_market_share", "q_profit",
    "q_supplier_variety", "q_disjunctive_filter", "q_supplier_concentration",
    "q_purchase_intervals", "q_seasonality", "q_top_supplier",
    "q_upsert_latest", "q_snapshot_diff", "q_version_retention",
    "q_ingest_novelty",
    "q_pq_codes", "q_ann_pq", "q_ann_pq_recall", "q_pq_distortion",
    "q_ann_multiprobe", "q_ann_ivf_kmeans", "q_dedup_semantic",
    "q_ann_lsh_recall", "q_cluster_purity", "q_semdedup_keep",
    "q_scd2", "q_ewma", "q_lateness", "q_concurrency",
    "q_behavior_diversity", "q_tumbling_window", "q_session_gap",
    "q_sliding_window",
    # --- r6 window (positions 51-89) ---
    "q_gap_fill", "q_anomaly_zscore", "q_rolling_sum", "q_event_sequence",
    "q_transitions", "q_session_window", "q_map_funcs", "q_value_drift",
    "q_burstiness", "q_stream_hll", "q_stream_outer_join", "q_stream_drift",
    "q_text_redact", "q_stopword_strip", "q_vocab", "q_tfidf",
    "q_token_diversity", "q_bigram_pmi", "q_chunk_dedup", "q_quality_filter",
    "q_source_dedup", "q_mixture_plan",
    "q_dup_spans", "q_cdc_chunks", "q_ngram_novelty", "q_sparse_cosine",
    "q_lsh_recall_text",
    "q_global_shuffle", "q_dataset_card", "q_k_anonymity", "q_l_diversity",
    "q_full_outer", "q_dense_rank", "q_variant_extract", "q_large_orders",
    "q_window_dist", "q_unpivot",
    "q_common_prefix", "q_path_rewrite",
    # --- r5-session additions (positions 90+, still inside the r6
    # window of 51-100): never driver-checked, appended after the
    # frozen 51-89 block rather than inserted ahead of it ---
    "q_jpeg_pixels", "q_mjpeg_frames", "q_dedup_embedding_recall",
    "q_audio_alaw", "q_audio_pcm8", "q_audio_float32", "q_png_palette",
    "q_png_16bit", "q_audio_adpcm", "q_gif_interlace", "q_audio_resample",
    "q_audio_downmix", "q_image_headers", "q_audio_trim",
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
