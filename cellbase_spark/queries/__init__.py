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

# Round-5 gate priority (VERDICT r4 items 1-3): keys whose CODE changed
# this round lead (the r4 red `q_agg_approx_percentile` fix, the
# re-keyed `q_dedup_canonical`, the scratch-path/conf-scoping fixes, any
# NEW round-5 keys); then the ~45 r1-vintage keys whose official driver
# rows are three rounds of refactors old (aggregates, grouping,
# analytics, filters, joins, graph, layout, corpus, scan_text). The full
# battery always runs locally regardless of order
# (scripts/check_oracle.py + scripts/driver_sim.py).
GATE_PRIORITY = [
    # -- changed this round: r4 red-row fix + re-keyed canonical
    "q_agg_approx_percentile",
    "q_dedup_canonical",
    # -- changed this round: recursion-limit scoping (plan changed)
    "q_sql_recursive",
    # -- NEW round-5 keys get inserted here as they land
    "q_ann_eval",
    "q_cc_iterative",
    "q_span_dedup",
    "q_minhash_shingle",
    "q_cluster_size_histogram",
    "q_tokenizer_fertility",
    "q_data_card",
    "q_dedup_minhash_capped",
    "q_dedup_full",
    "q_mm_decode_png",
    "q_mm_decode_wav",
    "q_mm_decode_y4m",
    "q_mm_mixed_corpus",
    "q_stream_run_timer",
    "q_source_overlap",
    "q_embed_outliers",
    "q_zscore_normalize",
    "q_sessionize_batch",
    "q_sessionize_twophase",
    # -- changed round 5: Q18 window accumulator decimal -> long lane
    "q_tpch_q18",
    # -- changed late round 5: Q5 join reorder; graph persist path
    "q_tpch_q5",
    "q_triangle_count",
    "q_pagerank",
    # -- r1-vintage official rows: aggregates (8)
    "q_agg_global",
    "q_agg_groupby",
    "q_agg_count_distinct",
    "q_agg_having",
    "q_agg_median",
    "q_agg_stats",
    "q_agg_corr",
    "q_agg_mode",
    # -- r1-vintage: grouping (5)
    "q_agg_rollup",
    "q_agg_cube",
    "q_agg_grouping_sets",
    "q_pivot",
    "q_agg_collect",
    # -- r1-vintage: analytics (3)
    "q_funnel",
    "q_retention",
    "q_histogram_equidepth",
    # -- r1-vintage: filters (6)
    "q_project",
    "q_filter_compound",
    "q_filter_nulls",
    "q_filter_in_between_like",
    "q_distinct",
    "q_doc_quality_filter",
    # -- r1-vintage: joins (12)
    "q_join_inner",
    "q_join_left",
    "q_join_full",
    "q_join_semi",
    "q_join_anti",
    "q_join_broadcast",
    "q_join_cross",
    "q_star_join",
    "q_tpch_q3",
    "q_join_salted",
    "q_tpch_q9",  # r3-vintage but bench-drifted in r4: re-witness
    # -- r1-vintage: graph
    "q_degree_distribution",
    # -- r1-vintage: layout (3)
    "q_zorder",
    "q_skyline",
    "q_join_prefilter",
    # -- r1-vintage: corpus + scan_text (5)
    "q_contamination",
    "q_chunk_documents",
    "q_sample_weighted",
    "q_bpe_pairs",
    "q_scan_text",
    # -- scratch-path scoping only (behavior identical, gated r2/r4;
    # re-witness when prefix room allows — local battery covers them)
    "q_dpp_join",
    "q_bucketed_join",
    "q_partitioned_write",
    "q_scan_jsonl",
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
