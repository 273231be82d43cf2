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

# Round-3 gate priority: (a) the four keys red/landmined in round 2,
# now fixed (decimal->double casts; array outputs stringified), then
# (b) every family with zero official rows yet: streaming, UDFs, TPC-H,
# llm_text, plus the first multimodal keys. pipeline/quality/remaining
# multimodal spill past the ~50-key budget and lead round 4.
GATE_PRIORITY = [
    # round-2 red rows, re-check first
    "q_window_running_sum",
    "q_window_range_frame",
    "q_phonetic_key",
    "q_embed_quantize",
    # streaming family (no official rows yet)
    "q_stream_tumbling",
    "q_stream_sliding",
    "q_stream_session",
    "q_stream_dedup",
    "q_stream_run_tumbling",
    "q_stream_run_sliding",
    "q_stream_run_session",
    "q_stream_run_dedup",
    "q_stream_run_stateful",
    "q_stream_run_late",
    "q_stream_run_join",
    "q_stream_run_join_interval",
    "q_stream_run_replay",
    "q_stream_run_sink",
    # UDF surface
    "q_udf_scalar",
    "q_udf_pandas",
    "q_udaf_grouped",
    "q_udtf_bigrams",
    # TPC-H (19 keys, none official yet)
    "q_tpch_q2",
    "q_tpch_q4",
    "q_tpch_q6",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q9",
    "q_tpch_q10",
    "q_tpch_q11",
    "q_tpch_q12",
    "q_tpch_q13",
    "q_tpch_q14",
    "q_tpch_q15",
    "q_tpch_q16",
    "q_tpch_q17",
    "q_tpch_q18",
    "q_tpch_q19",
    "q_tpch_q20",
    "q_tpch_q21",
    "q_tpch_q22",
    # llm_text family
    "q_text_tokenfreq",
    "q_tfidf",
    "q_lang_id",
    "q_text_quality",
    "q_token_count",
    "q_fingerprint",
    "q_fuzzy_name_match",
    "q_token_entropy",
    "q_kl_source_drift",
    "q_vocab_oov",
    "q_boilerplate",
    "q_quality_gopher",
    "q_contain_fuzzy",
    # first multimodal + ANN stragglers (~keys 50-53)
    "q_ann_lsh",
    "q_mm_decode_real",
    "q_mm_decode_meta",
    "q_multimodal_join",
    # round-4 head: new sources, rest of multimodal, pipeline, quality
    "q_scan_xlsx_pyds",
    "q_roundtrip_xlsx_pyds",
    "q_mm_frame_sample",
    "q_mm_resize",
    "q_mm_features",
    "q_scan_orc",
    "q_merge_upsert",
    "q_sample_hash",
    "q_sample_stratified",
    "q_split_train_test",
    "q_pack_sequences",
    "q_repetition_ratio",
    "q_length_histogram",
    "q_pii_mask",
    "q_agg_approx_percentile",
    "q_mix_reweight",
    "q_profile_table",
    "q_quality_checks",
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
