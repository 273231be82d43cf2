"""Sort / limit / top-k / set operations (SURVEY.md §2.6 O1-O4).

The reference sorts materialized row arrays in GDScript (SURVEY.md §2.6);
here ORDER BY is Spark's range-partitioned sort (sampled boundaries ->
shuffle -> per-partition sort) and global top-k is TakeOrderedAndProject,
which never materializes a full sort at any scale.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cellbase_spark.io import load_table
from cellbase_spark.registry import register


@register(
    "q_sort_multi",
    family="setop",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_totalprice,
       ROW_NUMBER() OVER (
         ORDER BY NULLIF(o_orderstatus, 'P') DESC NULLS LAST,
                  o_totalprice ASC, o_orderkey ASC
       ) AS rn
FROM orders
WHERE o_totalprice > 250000
""",
)
def q_sort_multi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-key sort with NULLS placement; rank materialized via
    row_number over the same order (unique o_orderkey tiebreak) so the
    order is observable under the driver's order-insensitive compare."""
    o = load_table(spark, sf_dir, "orders").where(F.col("o_totalprice") > 250000)
    st = F.nullif(F.col("o_orderstatus"), F.lit("P"))
    order = [st.desc_nulls_last(), F.col("o_totalprice").asc(), F.col("o_orderkey").asc()]
    w = Window.orderBy(*order)
    return o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.row_number().over(w).alias("rn"),
    ).orderBy(*order)


@register(
    "q_topk_global",
    family="setop",
    oracle="""
SELECT o_orderkey, o_custkey, o_totalprice
FROM orders
ORDER BY o_totalprice DESC, o_orderkey ASC
LIMIT 100
""",
)
def q_topk_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global top-k: orderBy+limit compiles to TakeOrderedAndProject —
    each partition keeps a k-heap, the driver merges k*partitions rows;
    no full shuffle-sort even at 100 TB. Unique-key tiebreak makes the
    k-set deterministic."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.select("o_orderkey", "o_custkey", "o_totalprice")
        .orderBy(F.col("o_totalprice").desc(), F.col("o_orderkey").asc())
        .limit(100)
    )


@register(
    "q_union",
    family="setop",
    oracle="""
SELECT 'customer' AS src, c_nationkey AS nk FROM customer
UNION ALL
SELECT 'supplier' AS src, s_nationkey AS nk FROM supplier
""",
)
def q_union(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL via unionByName — a zero-shuffle concatenation of the
    two scans (appending sheets, the reference analog)."""
    c = load_table(spark, sf_dir, "customer")
    s = load_table(spark, sf_dir, "supplier")
    return c.select(F.lit("customer").alias("src"), F.col("c_nationkey").alias("nk")).unionByName(
        s.select(F.lit("supplier").alias("src"), F.col("s_nationkey").alias("nk"))
    )


@register(
    "q_intersect_except",
    family="setop",
    oracle="""
WITH buyers AS (SELECT DISTINCT o_custkey AS k FROM orders),
     rich AS (SELECT c_custkey AS k FROM customer WHERE c_acctbal > 5000)
SELECT 'both' AS tag, k FROM (SELECT k FROM rich INTERSECT SELECT k FROM buyers)
UNION ALL
SELECT 'rich_only' AS tag, k FROM (SELECT k FROM rich EXCEPT SELECT k FROM buyers)
""",
)
def q_intersect_except(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT / EXCEPT (distinct semantics both engines); Spark plans
    them as left-semi / left-anti aggregates."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer")
    buyers = o.select(F.col("o_custkey").alias("k")).distinct()
    rich = c.where(F.col("c_acctbal") > 5000).select(F.col("c_custkey").alias("k"))
    both = rich.intersect(buyers).select(F.lit("both").alias("tag"), "k")
    only = rich.subtract(buyers).select(F.lit("rich_only").alias("tag"), "k")
    return both.unionByName(only)
