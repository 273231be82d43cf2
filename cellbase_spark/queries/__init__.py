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

# Round-6 gate priority (VERDICT r5 item 1: burn down official-record
# staleness). Order: (a) keys whose CODE changed this round (the
# sessionize microsecond-gap fix from ADVICE, the Q18 loud guard, any
# NEW round-6 keys inserted as they land), then (b) the 17 keys whose
# newest official green row is r1-vintage, then (c) the 41 r2-vintage
# keys. The driver witnesses a ~50-key prefix; whatever r2 tail falls
# off stays covered by the local battery (scripts/check_oracle.py).
GATE_PRIORITY = [
    # -- changed round 6: unix_micros gap predicates (ADVICE high)
    "q_sessionize_batch",
    "q_sessionize_twophase",
    # -- changed round 6: loud fractional-quantity guard on the LONG lane
    "q_tpch_q18",
    # -- changed round 6: integer lane math + DECIMAL(38,0) wide lanes
    "q_agg_groupby",
    # -- changed round 6: single-pass Arrow centroid partials
    "q_embed_outliers",
    # -- NEW round-6 keys get inserted here as they land
    "q_tpch_q5_bucketed",
    "q_tpch_q3_bucketed",
    "q_tpch_q21_bucketed",
    "q_tpch_q9_bucketed",
    "q_dedup_incremental",
    "q_dedup_incremental_capped",
    "q_dedup_incremental_full",
    "q_dedup_band_update",
    "q_compact_files",
    "q_stream_run_dedup_incremental",
    # -- r1-vintage official rows (17)
    "q_bpe_pairs",
    "q_chunk_documents",
    "q_contamination",
    "q_degree_distribution",
    "q_join_anti",
    "q_join_broadcast",
    "q_join_cross",
    "q_join_full",
    "q_join_prefilter",
    "q_join_salted",
    "q_join_semi",
    "q_sample_weighted",
    "q_scan_text",
    "q_skyline",
    "q_star_join",
    "q_tpch_q3",
    "q_zorder",
    # -- r2-vintage official rows (41): scalar fns + plain ops first
    "q_fn_string",
    "q_fn_date",
    "q_fn_math",
    "q_fn_conditional",
    "q_fn_array",
    "q_fn_struct",
    "q_map_functions",
    "q_json_extract",
    "q_sort_multi",
    "q_topk_global",
    "q_union",
    "q_intersect_except",
    "q_window_rank",
    "q_window_laglead",
    "q_window_moving_avg",
    "q_window_dist",
    "q_topk_per_group",
    "q_join_range",
    "q_join_asof",
    "q_subquery_correlated",
    "q_lateral_topk",
    "q_unpivot",
    "q_gap_fill",
    "q_scd2_intervals",
    "q_agg_regression",
    "q_anomaly_mad",
    "q_ewma",
    "q_dedup_exact",
    "q_dedup_minhash",
    "q_dedup_clusters",
    "q_embed_neardup",
    "q_sim_topk",
    "q_knn_join",
    "q_knn_join_smj",
    "q_ann_ivf",
    "q_scan_csv",
    "q_scan_excel",
    "q_scan_workbook",
    "q_scan_jsonl",
    "q_roundtrip_write",
    "q_partitioned_write",
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
