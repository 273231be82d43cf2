"""Aggregation queries (SURVEY.md §2.4 A1-A9).

The reference has no aggregation operators (game code loops and sums by
hand, SURVEY.md §2.4); these are the engine's Spark-native equivalents.
Spark executes every groupBy/agg here as a two-phase HashAggregate
(partial map-side combine, then final after the key shuffle) — nothing is
hand-implemented, so the same plan scales from 60k rows to 100 TB with the
shuffle volume bounded by group cardinality, not input size.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cellbase_spark.functions.exact import davg, davg_sql, dsum, dsum_sql
from cellbase_spark.io import load_table
from cellbase_spark.registry import register

_Q1_CUTOFF = "1998-09-02 00:00:00"


@register(
    "q_agg_groupby",
    family="agg",
    oracle=f"""
SELECT l_returnflag, l_linestatus,
       {dsum_sql('l_quantity', 'sum_qty')},
       {dsum_sql('l_extendedprice', 'sum_base_price')},
       {dsum_sql('l_extendedprice * (1 - l_discount)', 'sum_disc_price')},
       {dsum_sql('l_extendedprice * (1 - l_discount) * (1 + l_tax)', 'sum_charge')},
       {davg_sql('l_quantity', 'avg_qty')},
       {davg_sql('l_extendedprice', 'avg_price')},
       {davg_sql('l_discount', 'avg_disc')},
       COUNT(*) AS count_order
FROM lineitem
WHERE l_shipdate <= TIMESTAMP '{_Q1_CUTOFF}'
GROUP BY l_returnflag, l_linestatus
""",
)
def q_agg_groupby(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Flagship: TPC-H Q1-shape pricing summary (scan+filter+agg+sort).

    Filter is pushed to the parquet scan; aggregation is partial+final
    hash-agg on a 6-group key space (shuffle carries 6 rows per partition).
    """
    li = load_table(spark, sf_dir, "lineitem")
    return (
        li.where(F.col("l_shipdate") <= F.lit(_Q1_CUTOFF).cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            dsum("l_quantity", "sum_qty"),
            dsum("l_extendedprice", "sum_base_price"),
            dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "sum_disc_price"),
            dsum(
                F.col("l_extendedprice")
                * (1 - F.col("l_discount"))
                * (1 + F.col("l_tax")),
                "sum_charge",
            ),
            davg("l_quantity", "avg_qty"),
            davg("l_extendedprice", "avg_price"),
            davg("l_discount", "avg_disc"),
            F.count(F.lit(1)).alias("count_order"),
        )
        .orderBy("l_returnflag", "l_linestatus")
    )


@register(
    "q_agg_global",
    family="agg",
    oracle=f"""
SELECT COUNT(*) AS n_rows,
       {dsum_sql('o_totalprice', 'sum_price')},
       {davg_sql('o_totalprice', 'avg_price')},
       MIN(o_totalprice) AS min_price,
       MAX(o_totalprice) AS max_price,
       COUNT(DISTINCT o_custkey) AS n_custs
FROM orders
""",
)
def q_agg_global(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Global (grand-total) aggregate over orders — no grouping keys; the
    partial aggregate reduces each partition to one row before the single
    final reduce."""
    o = load_table(spark, sf_dir, "orders")
    return o.agg(
        F.count(F.lit(1)).alias("n_rows"),
        dsum("o_totalprice", "sum_price"),
        davg("o_totalprice", "avg_price"),
        F.min("o_totalprice").alias("min_price"),
        F.max("o_totalprice").alias("max_price"),
        F.countDistinct("o_custkey").alias("n_custs"),
    )


@register(
    "q_agg_count_distinct",
    family="agg",
    oracle="""
SELECT c_mktsegment,
       COUNT(DISTINCT c_nationkey) AS n_nations,
       COUNT(DISTINCT c_custkey) AS n_keys,
       COUNT(*) AS n_rows
FROM customer
GROUP BY c_mktsegment
""",
)
def q_agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """COUNT(DISTINCT) — Spark expands to a two-shuffle expand+agg plan
    (exact, unlike approx_count_distinct)."""
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").agg(
        F.countDistinct("c_nationkey").alias("n_nations"),
        F.countDistinct("c_custkey").alias("n_keys"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q_agg_approx_distinct",
    family="agg",
    # HLL estimates are engine-specific — no hash oracle (driver records
    # the weaker rows-only check; tests assert the +-5% envelope vs exact).
    oracle=None,
)
def q_agg_approx_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """approx_count_distinct (HyperLogLog++): one pass, fixed memory per
    group — the 100 TB substitute for exact COUNT(DISTINCT) whose expand
    plan doubles shuffle volume."""
    o = load_table(spark, sf_dir, "orders")
    return o.groupBy("o_orderpriority").agg(
        F.approx_count_distinct("o_custkey", rsd=0.02).alias("approx_custs"),
        F.count(F.lit(1)).alias("n_rows"),
    )


@register(
    "q_agg_having",
    family="agg",
    oracle=f"""
SELECT o_custkey,
       {dsum_sql('o_totalprice', 'total_spent')},
       COUNT(*) AS n_orders
FROM orders
GROUP BY o_custkey
HAVING SUM(CAST(o_totalprice AS DECIMAL(25,10))) > 1500000
""",
)
def q_agg_having(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HAVING = post-aggregation filter (`.agg(...).where(...)`)."""
    o = load_table(spark, sf_dir, "orders")
    return (
        o.groupBy("o_custkey")
        .agg(
            dsum("o_totalprice", "total_spent"),
            F.count(F.lit(1)).alias("n_orders"),
            F.sum(F.col("o_totalprice").cast("decimal(25,10)")).alias("_exact"),
        )
        .where(F.col("_exact") > 1500000)
        .drop("_exact")
    )


@register(
    "q_agg_median",
    family="agg",
    oracle="""
SELECT l_returnflag,
       quantile_cont(l_quantity, 0.5) AS med_qty,
       quantile_cont(l_quantity, 0.9) AS p90_qty,
       COUNT(*) AS n
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_agg_median(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact percentiles (median / p90) per group via the exact
    `percentile` aggregate — both engines sort the group and linearly
    interpolate between the same order statistics, so results match
    bit-for-bit. At 100 TB prefer approx_percentile (t-digest, one pass,
    fixed memory); the exact form is the correctness anchor."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.groupBy("l_returnflag").agg(
        F.expr("percentile(l_quantity, 0.5)").alias("med_qty"),
        F.expr("percentile(l_quantity, 0.9)").alias("p90_qty"),
        F.count(F.lit(1)).alias("n"),
    )


@register(
    "q_agg_stats",
    family="agg",
    oracle="""
SELECT o_orderpriority,
       COUNT(*) AS n,
       CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(25,10))), 4) AS DOUBLE) AS sum_price,
       (CAST(ROUND(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(30,4))), 0) AS DOUBLE)
        - CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(25,10))), 4) AS DOUBLE)
          * CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(25,10))), 4) AS DOUBLE) / COUNT(*))
         / (COUNT(*) - 1) AS var_price,
       sqrt((CAST(ROUND(SUM(CAST(o_totalprice * o_totalprice AS DECIMAL(30,4))), 0) AS DOUBLE)
             - CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(25,10))), 4) AS DOUBLE)
               * CAST(ROUND(SUM(CAST(o_totalprice AS DECIMAL(25,10))), 4) AS DOUBLE) / COUNT(*))
            / (COUNT(*) - 1)) AS std_price
FROM orders
GROUP BY o_orderpriority
""",
)
def q_agg_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible variance/stddev: built from EXACT decimal moments
    (sum x, sum x^2 — per-row x*x is IEEE-identical everywhere, the
    decimal sums are order-independent) and one fixed IEEE formula.
    Native var_samp/stddev use streaming (Welford/merge) accumulation
    whose low bits depend on partitioning — this formulation gives the
    same answer on 1 core or 1000 executors, which is what makes the
    statistic trustworthy across reruns at 100 TB."""
    o = load_table(spark, sf_dir, "orders")
    price = F.col("o_totalprice")
    # Scale choices are load-bearing (see functions/exact.py): squares
    # cast to DECIMAL at scale 4 (a scale-10 cast of a ~1e10 double rounds
    # differently per engine in the last digits), and each sum is ROUNDed
    # so that value*10^scale < 2^53 before the decimal->double cast —
    # beyond that, DuckDB's hugeint-based conversion loses ulps the JVM's
    # exact BigDecimal conversion keeps (sum x^2 ~ 2.5e14 -> scale 0).
    s1 = F.round(F.sum(price.cast("decimal(25,10)")), 4).cast("double")
    s2 = F.round(F.sum((price * price).cast("decimal(30,4)")), 0).cast("double")
    n = F.count(F.lit(1))
    var = (s2 - s1 * s1 / n) / (n - 1)
    return o.groupBy("o_orderpriority").agg(
        n.alias("n"),
        s1.alias("sum_price"),
        var.alias("var_price"),
        F.sqrt(var).alias("std_price"),
    )


@register(
    "q_agg_corr",
    family="agg",
    oracle="""
SELECT l_returnflag,
       COUNT(*) AS n,
       (COUNT(*) * CAST(ROUND(SUM(CAST(l_quantity * l_extendedprice AS DECIMAL(30,4))), 0) AS DOUBLE)
        - CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(25,10))), 4) AS DOUBLE)
          * CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(25,10))), 4) AS DOUBLE))
       / (sqrt(COUNT(*) * CAST(ROUND(SUM(CAST(l_quantity * l_quantity AS DECIMAL(30,4))), 0) AS DOUBLE)
               - CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(25,10))), 4) AS DOUBLE)
                 * CAST(ROUND(SUM(CAST(l_quantity AS DECIMAL(25,10))), 4) AS DOUBLE))
          * sqrt(COUNT(*) * CAST(ROUND(SUM(CAST(l_extendedprice * l_extendedprice AS DECIMAL(30,4))), 0) AS DOUBLE)
                 - CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(25,10))), 4) AS DOUBLE)
                   * CAST(ROUND(SUM(CAST(l_extendedprice AS DECIMAL(25,10))), 4) AS DOUBLE)))
         AS corr_qty_price
FROM lineitem
GROUP BY l_returnflag
""",
)
def q_agg_corr(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Reproducible Pearson correlation from exact decimal moments
    (sum x, sum y, sum xy, sum x^2, sum y^2) + one fixed IEEE formula —
    partitioning-independent, unlike native corr()'s streaming
    co-moment accumulation. Same scale rules as q_agg_stats: per-row
    products cast at scale 4, each sum ROUNDed so value*10^scale < 2^53
    before the decimal->double cast."""
    li = load_table(spark, sf_dir, "lineitem")
    x, y = F.col("l_quantity"), F.col("l_extendedprice")

    def dsum_sc(c, cast_prec, round_scale):
        return F.round(F.sum(c.cast(cast_prec)), round_scale).cast("double")

    n = F.count(F.lit(1))
    sx = dsum_sc(x, "decimal(25,10)", 4)
    sy = dsum_sc(y, "decimal(25,10)", 4)
    sxy = dsum_sc(x * y, "decimal(30,4)", 0)
    sxx = dsum_sc(x * x, "decimal(30,4)", 0)
    syy = dsum_sc(y * y, "decimal(30,4)", 0)
    corr = (n * sxy - sx * sy) / (F.sqrt(n * sxx - sx * sx) * F.sqrt(n * syy - sy * sy))
    return li.groupBy("l_returnflag").agg(n.alias("n"), corr.alias("corr_qty_price"))


@register(
    "q_agg_mode",
    family="agg",
    oracle="""
WITH c AS (
  SELECT l_returnflag, CAST(l_quantity AS BIGINT) AS qty, COUNT(*) AS n
  FROM lineitem GROUP BY 1, 2
), r AS (
  SELECT l_returnflag, qty, n,
         ROW_NUMBER() OVER (PARTITION BY l_returnflag ORDER BY n DESC, qty ASC) AS rk
  FROM c
)
SELECT l_returnflag, qty AS mode_qty, n AS mode_n FROM r WHERE rk = 1
""",
)
def q_agg_mode(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic per-group mode (most frequent quantity per return
    flag): count + row_number with an explicit tie-break instead of the
    native mode() aggregate, whose tie winner is engine- and
    partitioning-dependent. Two map-combinable aggs + one tiny window
    (|groups x distinct values| rows)."""
    from pyspark.sql import Window

    li = load_table(spark, sf_dir, "lineitem")
    c = (
        li.select("l_returnflag", F.col("l_quantity").cast("bigint").alias("qty"))
        .groupBy("l_returnflag", "qty")
        .agg(F.count(F.lit(1)).alias("n"))
    )
    w = Window.partitionBy("l_returnflag").orderBy(F.col("n").desc(), F.col("qty").asc())
    return (
        c.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("l_returnflag", F.col("qty").alias("mode_qty"), F.col("n").alias("mode_n"))
    )
