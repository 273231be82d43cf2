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

# Round-14 gate priority (VERDICT r13 task #4, derived by
# scripts/derive_gate_rotation.py). Order: (z) the 4 new round-14 keys
# at the head (the three attach keys + q_facade_edit) PLUS the 2 sketch keys
# whose contract changed from rows-only to full-hash this round (their
# old driver rows certify the retired weaker check, so they re-earn a
# row under the new contract); then (a) ALL 34 keys whose newest
# official green row is r8-vintage — sampling them lifts the registry's
# minimum vintage to r9; (b) the 12 stalest r9-vintage keys
# (alphabetical). The two r9 keys the head insertions displace
# (q_pipeline_e2e_neardup, q_pq_eval_trained, q_stream_dedup, q_stream_run_dedup,
# q_stream_run_join) stay r9-vintage — inside the
# >= r9 floor this rotation establishes. The full battery always runs
# locally (check_oracle.py).
GATE_PRIORITY = [
    "q_dedup_incremental_attach",
    "q_point_lookup_attach",
    "q_bm25_index_attach",
    "q_ann_index_attach",
    "q_facade_edit",
    "q_agg_approx_distinct",
    "q_agg_approx_percentile",
    "q_embed_neardup",
    "q_embed_outliers",
    "q_embed_project",
    "q_ewma",
    "q_gap_fill",
    "q_ivf_train",
    "q_join_asof",
    "q_k_anonymity",
    "q_k_suppress",
    "q_knn_join",
    "q_knn_join_smj",
    "q_lateral_topk",
    "q_lm_perplexity",
    "q_pagerank_bucketed",
    "q_partitioned_write",
    "q_pipeline_e2e",
    "q_pq_eval",
    "q_pq_train",
    "q_quality_percentile_gate",
    "q_roundtrip_write",
    "q_scan_csv",
    "q_scan_excel",
    "q_scan_jsonl",
    "q_scan_workbook",
    "q_scd2_intervals",
    "q_sim_topk",
    "q_snapshot_diff",
    "q_span_runs",
    "q_stream_run_ann",
    "q_subquery_correlated",
    "q_tpch_q2",
    "q_tpch_q4",
    "q_tpch_q6",
    "q_unpivot",
    "q_ann_index_trained",
    "q_ann_ivfpq_rerank",
    "q_ann_ivfpq_trained",
    "q_embed_quantize",
    "q_fingerprint",
    "q_fuzzy_name_match",
    "q_kl_source_drift",
    "q_lang_id",
    "q_phonetic_key",
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
