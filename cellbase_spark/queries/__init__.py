"""Query modules — importing this package populates the registry.

One module per SURVEY.md §2 family. Each module registers its query keys
via cellbase_spark.registry.register.

The per-round correctness gate records a bounded prefix (~50 keys) of
registry order. GATE_PRIORITY below pins that prefix explicitly each
round so every key accumulates an official oracle row across rounds:
round 1 covered aggregates..llm_dedup, round 2 covered scans/scalars/
setops/windows/specialty/timeseries/llm_dedup/llm_similarity (95 unique
keys so far). The full battery always runs locally regardless of order
(scripts/check_oracle.py).
"""

# Round-12 gate priority (VERDICT r11 task #1 — FIRST commit of the
# round). Order: (a) ALL 26 round-11 keys that have NEVER appeared in a
# driver sample (the full BM25 index lifecycle, ANN/band DELETE verbs +
# lifecycle, both restart-recovery keys, and the 13 round-11 codec
# lanes), then (b) the first 24 (alphabetical) of the 49 keys whose
# newest official green row is r6-vintage (derived from the
# CORRECTNESS_r01..r11 union by script; 26+24 = exactly the 50-key gate
# prefix). The remaining 25 r6-vintage keys ride the round-13 rotation.
# New round-12 keys append at the tail as they land. The full battery
# always runs locally regardless of order (scripts/check_oracle.py).
GATE_PRIORITY = [
    # -- (a) never driver-sampled (round-11 additions), judge-verified
    #    green via check_oracle in the r11 verdict session
    "q_ann_index_delete",
    "q_ann_index_delete_compact",
    "q_ann_index_lifecycle",
    "q_dedup_band_delete",
    "q_bm25_indexed",
    "q_bm25_indexed_update",
    "q_bm25_indexed_compact",
    "q_bm25_indexed_delete",
    "q_bm25_indexed_delete_compact",
    "q_bm25_indexed_lifecycle",
    "q_stream_run_recovery",
    "q_stream_run_recovery_stateful",
    "q_mm_decode_jpeg_progressive",
    "q_mm_decode_png16",
    "q_mm_decode_gif_anim",
    "q_mm_decode_tiff",
    "q_mm_decode_tiff_lzw",
    "q_mm_decode_tiff16",
    "q_mm_decode_wav24",
    "q_mm_decode_wav_float",
    "q_mm_decode_wav_g711",
    "q_mm_decode_adpcm",
    "q_mm_decode_adpcm_stereo",
    "q_mm_decode_flac",
    "q_mm_decode_webp",
    "q_mm_decode_y4m420",
    # -- (b) 24 stalest keys (newest official row = r6; first 24 of 49
    #    alphabetically — the other 25 rotate in next round)
    "q_agg_groupby",
    "q_bpe_pairs",
    "q_chunk_documents",
    "q_compact_files",
    "q_contamination",
    "q_dedup_band_update",
    "q_dedup_incremental",
    "q_dedup_incremental_capped",
    "q_dedup_incremental_full",
    "q_degree_distribution",
    "q_fn_array",
    "q_fn_conditional",
    "q_fn_date",
    "q_fn_math",
    "q_fn_string",
    "q_fn_struct",
    "q_intersect_except",
    "q_join_anti",
    "q_join_broadcast",
    "q_join_cross",
    "q_join_full",
    "q_join_prefilter",
    "q_join_range",
    "q_join_salted",
    # -- (c) NEW round-12 keys appended here as they land
    "q_scan_ods",
    "q_scan_csv_dialect",
    "q_point_lookup_bucketed",
    "q_roundtrip_ods_pyds",
]

# Import order populates the registry; GATE_PRIORITY (not import order)
# decides the gate prefix via registry._ordered_keys().
from cellbase_spark.queries import scans  # noqa: F401
from cellbase_spark.queries import scalars  # noqa: F401
from cellbase_spark.queries import setops  # noqa: F401
from cellbase_spark.queries import windows  # noqa: F401
from cellbase_spark.queries import specialty  # noqa: F401
from cellbase_spark.queries import timeseries  # noqa: F401
from cellbase_spark.queries import llm_dedup  # noqa: F401  (q_dedup_clusters missed round 1)
from cellbase_spark.queries import llm_similarity  # noqa: F401
from cellbase_spark.queries import llm_text  # noqa: F401
from cellbase_spark.queries import llm_multimodal  # noqa: F401
from cellbase_spark.queries import pipeline  # noqa: F401
from cellbase_spark.queries import quality  # noqa: F401
from cellbase_spark.queries import streaming  # noqa: F401
from cellbase_spark.queries import udfs  # noqa: F401
from cellbase_spark.queries import tpch  # noqa: F401
from cellbase_spark.queries import tpch_full  # noqa: F401
# Officially green in round 1:
from cellbase_spark.queries import aggregates  # noqa: F401
from cellbase_spark.queries import analytics  # noqa: F401
from cellbase_spark.queries import corpus  # noqa: F401
from cellbase_spark.queries import filters  # noqa: F401
from cellbase_spark.queries import graph  # noqa: F401
from cellbase_spark.queries import grouping  # noqa: F401
from cellbase_spark.queries import joins  # noqa: F401
from cellbase_spark.queries import layout  # noqa: F401
