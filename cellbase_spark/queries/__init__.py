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

# Round-15 gate priority (VERDICT r14 task #2, derived by
# scripts/derive_gate_rotation.py). Order: (a) ALL 41 keys whose newest
# official green row is r9-vintage — sampling them lifts the registry's
# minimum vintage to r10; (b) the 9 stalest r10-vintage keys
# (alphabetical). No new keys this round yet; any round-15 additions go
# to the head when they land. The full battery always runs locally
# (check_oracle.py).
GATE_PRIORITY = [
    "q_tpch_q3_bucketed_attach",  # new in r15 (S26): gate head
    "q_pipeline_e2e_neardup",
    "q_pq_eval_trained",
    "q_stream_dedup",
    "q_stream_run_dedup",
    "q_stream_run_join",
    "q_stream_run_join_interval",
    "q_stream_run_late",
    "q_stream_run_replay",
    "q_stream_run_session",
    "q_stream_run_sink",
    "q_stream_run_sliding",
    "q_stream_run_stateful",
    "q_stream_run_tumbling",
    "q_stream_session",
    "q_stream_sliding",
    "q_stream_tumbling",
    "q_text_quality",
    "q_text_tokenfreq",
    "q_tfidf",
    "q_token_count",
    "q_token_entropy",
    "q_tpch_q10",
    "q_tpch_q11",
    "q_tpch_q12",
    "q_tpch_q13",
    "q_tpch_q14",
    "q_tpch_q15",
    "q_tpch_q16",
    "q_tpch_q17",
    "q_tpch_q19",
    "q_tpch_q20",
    "q_tpch_q22",
    "q_tpch_q7",
    "q_tpch_q8",
    "q_tpch_q9",
    "q_udaf_grouped",
    "q_udf_pandas",
    "q_udf_scalar",
    "q_udtf_bigrams",
    "q_window_range_frame",
    "q_window_running_sum",
    "q_ann_index_update_trained",
    "q_ann_lsh",
    "q_bm25",
    "q_boilerplate",
    "q_bucketed_join",
    "q_chunk_cdc",
    "q_contain_fuzzy",
    "q_copurchase_lift",
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
from cellbase_spark.queries import facade  # noqa: F401
