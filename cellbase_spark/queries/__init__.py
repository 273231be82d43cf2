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

# Round-13 gate priority (VERDICT r12 task #1 — FIRST commit of the
# round, derived by scripts/derive_gate_rotation.py). Order: (z) NEW
# round-13 keys inserted at the HEAD as they land so they earn a driver
# row in the same round they ship (pushing the tail r8-vintage fill out
# of the 50-slot prefix — those stay r8-vintage, still inside the
# "no key older than r8" criterion); then (a) the 4 round-12 keys that
# have NEVER appeared in a driver sample; (b) ALL 25 keys whose newest
# official green row is r6-vintage; (c) the 21 stalest r8-vintage keys
# (alphabetical). 4+25+21 = the 50-key gate prefix before (z) grows.
# With the 5 round-13 keys at the head, the last 5 r8-vintage fills
# (q_embed_neardup/outliers/project, q_ewma, q_gap_fill) ride the
# round-14 rotation instead — still r8-vintage, inside the freshness
# criterion. The full battery always runs locally (check_oracle.py).
GATE_PRIORITY = [
    # -- (z) new round-13 keys (head: sampled the round they land)
    "q_facade_e2e",
    "q_schema_evolution",
    "q_pipeline_incremental",
    "q_facade_ann",
    "q_vacuum",
    # -- (a) never driver-sampled (round-12 additions), judge-verified
    #    green via check_oracle in the r12 verdict session
    "q_point_lookup_bucketed",
    "q_scan_csv_dialect",
    "q_scan_ods",
    "q_roundtrip_ods_pyds",
    "q_join_semi",
    "q_json_extract",
    "q_map_functions",
    "q_sample_weighted",
    "q_scan_text",
    "q_sessionize_batch",
    "q_sessionize_twophase",
    "q_skyline",
    "q_sort_multi",
    "q_star_join",
    "q_stream_run_dedup_incremental",
    "q_topk_global",
    "q_topk_per_group",
    "q_tpch_q18",
    "q_tpch_q21_bucketed",
    "q_tpch_q3",
    "q_tpch_q3_bucketed",
    "q_tpch_q5_bucketed",
    "q_tpch_q9_bucketed",
    "q_union",
    "q_window_dist",
    "q_window_laglead",
    "q_window_moving_avg",
    "q_window_rank",
    "q_zorder",
    "q_agg_regression",
    "q_ann_batch_probe",
    "q_ann_eval_trained",
    "q_ann_index_update",
    "q_ann_ivf",
    "q_ann_ivf_indexed",
    "q_ann_ivfpq_indexed",
    "q_ann_lsh_indexed",
    "q_ann_pq",
    "q_anomaly_mad",
    "q_bpe_encode",
    "q_bpe_train",
    "q_dedup_clusters",
    "q_dedup_exact",
    "q_dedup_generations",
    "q_dedup_minhash",
    "q_embed_neardup",
    "q_embed_outliers",
    "q_embed_project",
    "q_ewma",
    "q_gap_fill",
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
