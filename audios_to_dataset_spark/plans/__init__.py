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


# ROUND 6 rotation (VERDICT r5 item 1): the 53 queries absent from every
# CORRECTNESS_r01..r05 file, front-loaded so the driver's first-50 window
# finally covers them. Positions 1-50 are the frozen r6 window — the
# round-5 flagship media/codec additions first (q_jpeg_pixels,
# q_mjpeg_frames, the q_audio_* codec family, the PNG/GIF variants,
# q_image_headers, q_dedup_embedding_recall), then the events / textops /
# relational remainder. Positions 51-53 are the three stragglers
# carried to the ROUND 7 head — chosen because each has an already
# driver-checked analog (q_common_prefix ~ q_agg_minmax r1,
# q_path_rewrite ~ q_project_normalize r1, q_dense_rank ~
# q_window_rownum r1). New round-6 queries append AFTER the stragglers
# (they join the r7 head); do not reorder or insert ahead of position 53
# until CORRECTNESS_r06.json lands.
_ROTATION_FIRST = (
    # --- r6 driver window (positions 1-50) ---
    "q_jpeg_pixels", "q_mjpeg_frames", "q_dedup_embedding_recall",
    "q_audio_alaw", "q_audio_pcm8", "q_audio_float32", "q_png_palette",
    "q_png_16bit", "q_audio_adpcm", "q_gif_interlace", "q_audio_resample",
    "q_audio_downmix", "q_image_headers", "q_audio_trim",
    "q_gap_fill", "q_anomaly_zscore", "q_rolling_sum", "q_event_sequence",
    "q_transitions", "q_session_window", "q_map_funcs", "q_value_drift",
    "q_burstiness", "q_stream_hll", "q_stream_outer_join", "q_stream_drift",
    "q_text_redact", "q_stopword_strip", "q_vocab", "q_tfidf",
    "q_token_diversity", "q_bigram_pmi", "q_chunk_dedup", "q_quality_filter",
    "q_source_dedup", "q_mixture_plan",
    "q_dup_spans", "q_cdc_chunks", "q_ngram_novelty", "q_sparse_cosine",
    "q_lsh_recall_text",
    "q_global_shuffle", "q_dataset_card", "q_k_anonymity", "q_l_diversity",
    "q_full_outer", "q_variant_extract", "q_large_orders",
    "q_window_dist", "q_unpivot",
    # --- r7 head (positions 51+): the three stragglers, then any
    # round-6 additions appended below ---
    "q_common_prefix", "q_path_rewrite", "q_dense_rank",
    # round-6 additions (never driver-checked yet):
    "q_jpeg_progressive", "q_media_null_content",
    "q_decontaminate_ngram", "q_bfs_hops", "q_rle_frames",
    "q_audio_normalize", "q_link_predict", "q_hll_overlap",
    "q_stream_record_high",
    "q_image_dhash", "q_image_neardup", "q_split_leakage",
    "q_msvc_frames", "q_audio_fingerprint", "q_audio_neardup",
    "q_t_closeness", "q_audio_headers", "q_mixture_temperature",
    "q_robust_outliers", "q_ks_drift", "q_cms_join_estimate",
    "q_video_headers", "q_tga_pixels", "q_stream_media_meta",
    "q_cdc_merge", "q_dbscan", "q_ico_pixels", "q_pnm_pixels",
    "q_flac_decode", "q_kmv_overlap", "q_split_assign",
    "q_matryoshka_recall", "q_incremental_agg", "q_label_noise",
    "q_coreset", "q_changepoint", "q_tiff_pixels", "q_webp_pixels",
    "q_qoi_pixels", "q_acf", "q_audio_aiff", "q_audio_au",
    "q_audio_extensible", "q_zone_map", "q_url_dedup", "q_html_strip",
    "q_pii_audit", "q_sole_offender", "q_exif_scrub", "q_audio_vad",
    "q_key_skew_audit", "q_dir_rollup", "q_class_balance", "q_gif_anim",
    "q_image_tiles", "q_audio_zcr", "q_audio_transcode",
    "q_graph_health", "q_dedup_mixture_shift", "q_token_drift",
    "q_ab_test",
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
