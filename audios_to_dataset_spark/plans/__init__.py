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


# ROUND 8 rotation (VERDICT r7 item 1): CORRECTNESS_r01..r07 covers 297 of
# the 323 declared queries, all green. The 26 never-driver-checked
# remainders are front-loaded at positions 1-26 so the driver's first-50
# window attests every one of them this round; after r8 lands, every
# declared query has a green CORRECTNESS row. New round-8 queries append
# AFTER position 26 (positions 27-50 of the window are free, so up to 24
# new queries are also driver-checked this round). Do not reorder or
# insert ahead of position 26 until CORRECTNESS_r08.json lands.
_ROTATION_FIRST = (
    # --- r8 driver window head (positions 1-26): the never-checked 26 ---
    # the 14 r6 stragglers
    "q_sole_offender", "q_exif_scrub", "q_audio_vad",
    "q_key_skew_audit", "q_dir_rollup", "q_class_balance", "q_gif_anim",
    "q_image_tiles", "q_audio_zcr", "q_audio_transcode",
    "q_graph_health", "q_dedup_mixture_shift", "q_token_drift",
    "q_ab_test",
    # the round-7 additions: the completed-VP8L family, the int8
    # retrieval gate, the window/audio/curation audits
    "q_webp_lz77", "q_webp_palette", "q_webp_predictor", "q_webp_color",
    "q_webp_meta", "q_webp_anim", "q_webp_exif_scrub",
    "q_sq_recall", "q_window_cume", "q_audio_dropout", "q_audio_dc",
    "q_gopher_rules",
    # --- round-8 additions (positions 27+, inside the 50-window) ---
    "q_char_collision", "q_interleave_mixture", "q_code_detect",
    "q_boilerplate_prefix", "q_dedup_threshold_sweep",
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
