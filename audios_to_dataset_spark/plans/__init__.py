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


# ROUND 7 rotation (VERDICT r6 item 1): CORRECTNESS_r01..r06 covers 247 of
# the 311 declared queries; the 64 never-checked remainders are front-loaded
# here so the driver's first-50 window covers 50 of them this round.
# Positions 1-50 are the frozen r7 window — the round-6 flagship codec /
# analytics additions (q_jpeg_progressive, q_media_null_content,
# q_flac_decode, q_qoi_pixels, q_gif_anim, q_dbscan, q_split_assign, ...).
# Positions 51-64 are the 14 stragglers carried to the ROUND 8 head — chosen
# as the tail because each has an already driver-checked analog or sibling
# (q_exif_scrub ~ q_jpeg_pixels r6, q_audio_vad/q_audio_zcr ~ the r6
# q_audio_* family, q_dir_rollup ~ q_agg_count r1, q_token_drift ~
# q_value_drift r6, ...). New round-7 queries append AFTER position 64
# (they join the r8 head); do not reorder or insert ahead of position 64
# until CORRECTNESS_r07.json lands.
_ROTATION_FIRST = (
    # --- r7 driver window (positions 1-50) ---
    "q_common_prefix", "q_path_rewrite", "q_dense_rank",
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
    "q_pii_audit",
    # --- r8 head (positions 51+): the 14 stragglers, then the
    # round-7 additions (never driver-checked yet) ---
    "q_sole_offender", "q_exif_scrub", "q_audio_vad",
    "q_key_skew_audit", "q_dir_rollup", "q_class_balance", "q_gif_anim",
    "q_image_tiles", "q_audio_zcr", "q_audio_transcode",
    "q_graph_health", "q_dedup_mixture_shift", "q_token_drift",
    "q_ab_test",
    # round-7 additions: the completed-VP8L family, the int8 retrieval
    # gate, the window/audio/curation audits
    "q_webp_lz77", "q_webp_palette", "q_webp_predictor", "q_webp_color",
    "q_webp_meta", "q_webp_anim", "q_webp_exif_scrub",
    "q_sq_recall", "q_window_cume", "q_audio_dropout", "q_audio_dc",
    "q_gopher_rules",
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
