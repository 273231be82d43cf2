"""Projection / filter / predicate queries (SURVEY.md §2.2 P1-P5, L8).

The reference's query model is a caller-supplied per-row predicate over a
materialized row array (SURVEY.md §3.1); here every predicate is a Catalyst
expression, so it folds, reorders, and pushes down to the parquet scan
(visible as PushedFilters in the physical plan) — at 100 TB the filter
happens in row-group pruning and the vectorized reader, not in Python.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cellbase_spark.io import load_table
from cellbase_spark.registry import register


@register(
    "q_project",
    family="filter",
    oracle="""
SELECT c_custkey AS id,
       c_name AS name,
       c_acctbal * 1.1 AS boosted,
       c_nationkey + 100 AS nk_offset,
       c_mktsegment
FROM customer
""",
)
def q_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Project / rename / computed columns. Per-row IEEE arithmetic is
    bit-identical across engines, so raw doubles need no rounding."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        F.col("c_custkey").alias("id"),
        F.col("c_name").alias("name"),
        (F.col("c_acctbal") * 1.1).alias("boosted"),
        (F.col("c_nationkey") + 100).alias("nk_offset"),
        "c_mktsegment",
    )


@register(
    "q_filter_compound",
    family="filter",
    oracle="""
SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_returnflag, l_linestatus
FROM lineitem
WHERE (l_quantity > 30 AND l_discount < 0.05)
   OR (l_returnflag = 'R' AND NOT (l_linestatus = 'F'))
""",
)
def q_filter_compound(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Compound AND/OR/NOT predicate, pushed to the scan."""
    li = load_table(spark, sf_dir, "lineitem")
    pred = ((F.col("l_quantity") > 30) & (F.col("l_discount") < 0.05)) | (
        (F.col("l_returnflag") == "R") & (~(F.col("l_linestatus") == "F"))
    )
    return li.where(pred).select(
        "l_orderkey", "l_linenumber", "l_quantity", "l_discount", "l_returnflag", "l_linestatus"
    )


@register(
    "q_filter_nulls",
    family="filter",
    oracle="""
SELECT o_orderkey,
       NULLIF(o_orderstatus, 'P') AS st,
       NULLIF(o_orderstatus, 'P') IS NULL AS is_open,
       COALESCE(NULLIF(o_orderstatus, 'P'), 'NONE') AS st_or_none,
       NULLIF(o_orderstatus, 'P') IS NOT DISTINCT FROM 'F' AS nse_f
FROM orders
""",
)
def q_filter_nulls(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NULL semantics: nullif / isNull / coalesce / null-safe equality
    (Spark `eqNullSafe` == SQL IS NOT DISTINCT FROM). The reference's
    blank-cell handling analog (SURVEY.md §2.2 P3)."""
    o = load_table(spark, sf_dir, "orders")
    st = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    return o.select(
        "o_orderkey",
        st.alias("st"),
        st.isNull().alias("is_open"),
        F.coalesce(st, F.lit("NONE")).alias("st_or_none"),
        st.eqNullSafe(F.lit("F")).alias("nse_f"),
    )


@register(
    "q_filter_in_between_like",
    family="filter",
    oracle="""
SELECT c_custkey, c_name, c_acctbal, c_mktsegment,
       (c_name LIKE '%42%') AS has42,
       regexp_matches(c_name, '[13579]$') AS odd_tail
FROM customer
WHERE c_mktsegment IN ('BUILDING', 'MACHINERY', 'AUTOMOBILE')
  AND c_acctbal BETWEEN 0 AND 7500
""",
)
def q_filter_in_between_like(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Membership / range / pattern predicates: isin, between, like, rlike."""
    c = load_table(spark, sf_dir, "customer")
    return c.where(
        F.col("c_mktsegment").isin("BUILDING", "MACHINERY", "AUTOMOBILE")
        & F.col("c_acctbal").between(0, 7500)
    ).select(
        "c_custkey",
        "c_name",
        "c_acctbal",
        "c_mktsegment",
        F.col("c_name").like("%42%").alias("has42"),
        F.col("c_name").rlike("[13579]$").alias("odd_tail"),
    )


@register(
    "q_distinct",
    family="filter",
    oracle="SELECT DISTINCT c_nationkey, c_mktsegment FROM customer",
)
def q_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distinct = hash-aggregate on all columns (partial+final; shuffle
    carries only distinct pairs)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select("c_nationkey", "c_mktsegment").distinct()


@register(
    "q_doc_quality_filter",
    family="filter",
    oracle="""
SELECT doc_id, lang, source, n_chars
FROM documents
WHERE lang IN ('en', 'de', 'fr')
  AND n_chars BETWEEN 120 AND 5000
  AND regexp_matches(text, '^[a-z0-9 ]+$')
  AND length(text) >= 40
""",
)
def q_doc_quality_filter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Language-partitioned document quality filter (SURVEY.md §2.8 L8):
    lang allowlist + length bounds + charset regex — the shape of a
    pre-training corpus quality gate, fully pushed into the scan."""
    d = load_table(spark, sf_dir, "documents")
    return d.where(
        F.col("lang").isin("en", "de", "fr")
        & F.col("n_chars").between(120, 5000)
        & F.col("text").rlike("^[a-z0-9 ]+$")
        & (F.length("text") >= 40)
    ).select("doc_id", "lang", "source", "n_chars")
