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

# Round-10 gate priority (VERDICT r9 task #1 — FIRST commit of the
# round). Order: (a) the 3 round-9 keys that have NEVER appeared in a
# driver sample, then (b) ALL 47 keys whose newest official green row
# is r4-vintage (derived from the CORRECTNESS_r01..r09 union by
# script; 3+47 = exactly the ~50-key gate prefix). After this round,
# every key has an official row and none predates r5. New round-10
# keys append at the tail as they land (the prefix is already full,
# so they ride the next rotation unless a slot frees up). The full
# battery always runs locally regardless of order
# (scripts/check_oracle.py).
GATE_PRIORITY = [
    # -- (a) never driver-sampled (round-9 additions)
    "q_ann_index_update_trained",
    "q_mix_temperature",
    "q_stream_run_ann_trained",
    # -- (b) the 47 r4-vintage keys (newest official row = r4)
    "q_agg_approx_distinct",
    "q_ann_lsh",
    "q_bm25",
    "q_boilerplate",
    "q_bucketed_join",
    "q_chunk_cdc",
    "q_contain_fuzzy",
    "q_copurchase_lift",
    "q_dedup_near",
    "q_dedup_simhash",
    "q_dpp_join",
    "q_embed_centroid",
    "q_event_transitions",
    "q_json_variant",
    "q_lang_confusion",
    "q_length_histogram",
    "q_max_concurrency",
    "q_merge_upsert",
    "q_mix_reweight",
    "q_mm_decode_meta",
    "q_mm_decode_real",
    "q_mm_features",
    "q_mm_frame_sample",
    "q_mm_resize",
    "q_multimodal_join",
    "q_neardup_eval",
    "q_ngram_jaccard",
    "q_pack_sequences",
    "q_pii_mask",
    "q_point_lookup",
    "q_profile_table",
    "q_quality_checks",
    "q_quality_gopher",
    "q_repetition_ratio",
    "q_roundtrip_xlsx_pyds",
    "q_rrf_fusion",
    "q_sample_hash",
    "q_sample_stratified",
    "q_scan_orc",
    "q_scan_parquet",
    "q_scan_xlsx_pyds",
    "q_split_train_test",
    "q_stream_run_tws",
    "q_stream_run_upsert",
    "q_tpch_q21",
    "q_vocab_oov",
    "q_winsorize",
    # -- (c) NEW round-10 keys appended here as they land
    "q_ann_index_compact",
    "q_mm_decode_jpeg",
    "q_ann_index_compact_partial",
    "q_mm_decode_jpeg_color",
    "q_mm_decode_gif",
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
