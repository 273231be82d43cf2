"""Window function queries (SURVEY.md §2.5 W1-W7).

No reference analog (SURVEY.md §2.5) — all via pyspark.sql.Window. Window
execution shuffles once on partitionBy keys then sorts within partitions;
determinism rule: every ORDER BY carries a unique-key tiebreak, and any
windowed float SUM goes through decimal (see functions/exact.py) because
windowed summation order is engine-internal (DuckDB uses a segment tree).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cellbase_spark.functions.exact import DEC
from cellbase_spark.io import load_table
from cellbase_spark.registry import register


@register(
    "q_window_rank",
    family="window",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal,
       ROW_NUMBER()   OVER w AS rn,
       RANK()         OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS rnk,
       DENSE_RANK()   OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS drnk,
       NTILE(4)       OVER w AS quartile,
       PERCENT_RANK() OVER (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC) AS prnk,
       FIRST_VALUE(c_custkey) OVER w AS top_cust,
       LAST_VALUE(c_custkey)  OVER (PARTITION BY c_mktsegment
                                    ORDER BY c_acctbal DESC, c_custkey ASC
                                    ROWS BETWEEN UNBOUNDED PRECEDING
                                         AND UNBOUNDED FOLLOWING) AS bottom_cust
FROM customer
WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal DESC, c_custkey ASC)
""",
)
def q_window_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ranking family: row_number/rank/dense_rank/ntile/percent_rank +
    first/last in group. rank/percent_rank deliberately order by the
    non-unique value (tie semantics are the point); position-dependent
    fns (row_number/ntile/first/last) get the unique tiebreak."""
    c = load_table(spark, sf_dir, "customer")
    w_u = Window.partitionBy("c_mktsegment").orderBy(
        F.col("c_acctbal").desc(), F.col("c_custkey").asc()
    )
    w_t = Window.partitionBy("c_mktsegment").orderBy(F.col("c_acctbal").desc())
    w_full = w_u.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return c.select(
        "c_custkey",
        "c_mktsegment",
        "c_acctbal",
        F.row_number().over(w_u).alias("rn"),
        F.rank().over(w_t).alias("rnk"),
        F.dense_rank().over(w_t).alias("drnk"),
        F.ntile(4).over(w_u).alias("quartile"),
        F.percent_rank().over(w_t).alias("prnk"),
        F.first("c_custkey").over(w_u).alias("top_cust"),
        F.last("c_custkey").over(w_full).alias("bottom_cust"),
    )


@register(
    "q_window_laglead",
    family="window",
    oracle="""
SELECT event_id, user_id, ts, event_type, value,
       LAG(value)        OVER w AS prev_value,
       LAG(value, 2, -1.0) OVER w AS prev2_value,
       LEAD(event_type)  OVER w AS next_type,
       ts - LAG(ts) OVER w AS gap
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC)
""",
)
def q_window_laglead(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag/lead over each user's event timeline (with default value and
    offset-2 variants) + inter-event gap as an interval."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy(F.col("ts").asc(), F.col("event_id").asc())
    return e.select(
        "event_id",
        "user_id",
        "ts",
        "event_type",
        "value",
        F.lag("value").over(w).alias("prev_value"),
        F.lag("value", 2, -1.0).over(w).alias("prev2_value"),
        F.lead("event_type").over(w).alias("next_type"),
        (F.col("ts") - F.lag("ts").over(w)).alias("gap"),
    )


@register(
    "q_window_running_sum",
    family="window",
    oracle="""
SELECT o_orderkey, o_custkey, o_orderdate,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,10)))
            OVER (PARTITION BY o_custkey
                  ORDER BY o_orderdate ASC, o_orderkey ASC
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
            AS DECIMAL(25,2)) AS DOUBLE) AS running_spend,
       COUNT(*) OVER (PARTITION BY o_custkey
                      ORDER BY o_orderdate ASC, o_orderkey ASC
                      ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS n_so_far
FROM orders
""",
)
def q_window_running_sum(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-customer running spend (rows frame). Decimal accumulation:
    windowed float sums are engine-order-dependent; decimal is exact.
    The FINAL column is cast to double on both sides: the driver's canon
    compares pandas reprs, and Spark hands it Decimal('...0') while
    DuckDB's .df() hands float64 — numerically equal, string-unequal
    (round-2 hash FAIL). 2-dp sums stay exactly representable in double
    far past 100 TB row counts, so the cast loses nothing."""
    o = load_table(spark, sf_dir, "orders")
    w = (
        Window.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").asc(), F.col("o_orderkey").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return o.select(
        "o_orderkey",
        "o_custkey",
        "o_orderdate",
        F.sum(F.col("o_totalprice").cast(DEC)).over(w).cast("decimal(25,2)").cast("double").alias("running_spend"),
        F.count(F.lit(1)).over(w).alias("n_so_far"),
    )


@register(
    "q_window_moving_avg",
    family="window",
    oracle="""
SELECT event_id, user_id, ts,
       CAST(ROUND(SUM(CAST(value AS DECIMAL(25,10))) OVER w, 4) AS DOUBLE)
         / COUNT(*) OVER w AS moving_avg,
       COUNT(*) OVER w AS frame_n
FROM events
WINDOW w AS (PARTITION BY user_id ORDER BY ts ASC, event_id ASC
             ROWS BETWEEN 3 PRECEDING AND CURRENT ROW)
""",
)
def q_window_moving_avg(spark: SparkSession, sf_dir: str) -> DataFrame:
    """4-row moving average of event value per user (bounded rows frame);
    decimal-sum / count keeps it bit-identical cross-engine."""
    e = load_table(spark, sf_dir, "events")
    w = (
        Window.partitionBy("user_id")
        .orderBy(F.col("ts").asc(), F.col("event_id").asc())
        .rowsBetween(-3, Window.currentRow)
    )
    s = F.round(F.sum(F.col("value").cast(DEC)).over(w), 4).cast("double")
    n = F.count(F.lit(1)).over(w)
    return e.select(
        "event_id",
        "user_id",
        "ts",
        (s / n).alias("moving_avg"),
        n.alias("frame_n"),
    )


@register(
    "q_window_range_frame",
    family="window",
    oracle="""
SELECT o_orderkey, o_orderpriority, o_totalprice,
       COUNT(*) OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC
                      RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW) AS n_in_band,
       CAST(CAST(SUM(CAST(o_totalprice AS DECIMAL(25,10)))
            OVER (PARTITION BY o_orderpriority ORDER BY o_totalprice ASC
                  RANGE BETWEEN 10000 PRECEDING AND CURRENT ROW)
            AS DECIMAL(25,2)) AS DOUBLE) AS band_total
FROM orders
""",
)
def q_window_range_frame(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Value-based RANGE frame: for each order, how many orders of the
    same priority are priced within 10k below it. Range frames are
    defined on the order value, so no unique tiebreak is needed (all
    peers share the frame).

    NOT executed as a literal sliding range frame: Spark's
    SlidingWindowFunctionFrame re-aggregates the whole frame per output
    row — O(n x band) per partition (9.4 s at sf0.1 vs DuckDB's 0.5 s
    segment tree). Instead the band decomposes into two O(n) cumulative
    prefixes: agg[p-10000, p] = agg(<= p) - agg(< p-10000). Pass 1 is a
    cumulative RANGE-unbounded window (streaming frame, peers share
    values). Pass 2 resolves agg(< p-10000) with the as-of union trick:
    probe rows at key p-10000 sort BEFORE point rows at the same key
    (strict inequality), and last(value, ignorenulls) carries the latest
    prefix forward. Exact decimal prefixes make the subtraction
    bit-identical to the direct band sum. Same rewrite DuckDB does
    internally; at 100 TB both passes stay one shuffle each."""
    o = load_table(spark, sf_dir, "orders")
    w_cum = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("o_totalprice").asc())
        .rangeBetween(Window.unboundedPreceding, Window.currentRow)
    )
    cum = o.select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        F.count(F.lit(1)).over(w_cum).alias("own_cnt"),
        F.sum(F.col("o_totalprice").cast(DEC)).over(w_cum).alias("own_sum"),
    )
    # IEEE p - 10000 is exactly the boundary Spark/DuckDB's range frame
    # computes, so comparisons against point keys are bit-identical.
    points = cum.select(
        "o_orderpriority",
        F.col("o_totalprice").alias("k"),
        F.lit(1).alias("is_pt"),
        F.col("own_cnt").alias("pt_cnt"),
        F.col("own_sum").alias("pt_sum"),
        F.lit(None).cast("long").alias("o_orderkey"),
        F.lit(None).cast("double").alias("o_totalprice"),
        F.lit(None).cast("long").alias("own_cnt_p"),
        F.lit(None).cast(DEC).alias("own_sum_p"),
    )
    probes = cum.select(
        "o_orderpriority",
        (F.col("o_totalprice") - 10000).alias("k"),
        F.lit(0).alias("is_pt"),
        F.lit(None).cast("long").alias("pt_cnt"),
        F.lit(None).cast(DEC).alias("pt_sum"),
        "o_orderkey",
        "o_totalprice",
        F.col("own_cnt").alias("own_cnt_p"),
        F.col("own_sum").alias("own_sum_p"),
    )
    w_asof = (
        Window.partitionBy("o_orderpriority")
        .orderBy(F.col("k").asc(), F.col("is_pt").asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    u = points.unionByName(probes).select(
        "*",
        F.last("pt_cnt", ignorenulls=True).over(w_asof).alias("excl_cnt"),
        F.last("pt_sum", ignorenulls=True).over(w_asof).alias("excl_sum"),
    )
    return u.where(F.col("is_pt") == 0).select(
        "o_orderkey",
        "o_orderpriority",
        "o_totalprice",
        (F.col("own_cnt_p") - F.coalesce(F.col("excl_cnt"), F.lit(0))).alias(
            "n_in_band"
        ),
        (
            F.col("own_sum_p")
            - F.coalesce(F.col("excl_sum"), F.lit(0).cast(DEC))
        )
        .cast("decimal(25,2)")
        .cast("double")  # driver canon: Decimal repr != float64 repr (r2 hash FAIL)
        .alias("band_total"),
    )


@register(
    "q_topk_per_group",
    family="window",
    oracle="""
SELECT n_name, c_custkey, c_name, c_acctbal, rk
FROM (
  SELECT n.n_name, c.c_custkey, c.c_name, c.c_acctbal,
         ROW_NUMBER() OVER (PARTITION BY n.n_name
                            ORDER BY c.c_acctbal DESC, c.c_custkey ASC) AS rk
  FROM customer c JOIN nation n ON c.c_nationkey = n.n_nationkey
) WHERE rk <= 3
""",
)
def q_topk_per_group(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 customers by balance per nation: rank-filter pattern. The
    window shuffle partitions by nation; at 100 TB a pre-aggregation
    (AQE) or a per-partition heap keeps state bounded by k*groups."""
    c = load_table(spark, sf_dir, "customer")
    n = load_table(spark, sf_dir, "nation")
    w = Window.partitionBy("n_name").orderBy(F.col("c_acctbal").desc(), F.col("c_custkey").asc())
    return (
        c.join(F.broadcast(n), c.c_nationkey == n.n_nationkey)
        .select("n_name", "c_custkey", "c_name", "c_acctbal")
        .withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") <= 3)
    )


@register(
    "q_window_dist",
    family="window",
    oracle="""
SELECT s_suppkey, s_nationkey, s_acctbal,
       cume_dist() OVER w AS cdist,
       nth_value(s_acctbal, 2) OVER (PARTITION BY s_nationkey
                                     ORDER BY s_acctbal ASC, s_suppkey ASC
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND UNBOUNDED FOLLOWING) AS second_low
FROM supplier
WINDOW w AS (PARTITION BY s_nationkey ORDER BY s_acctbal ASC, s_suppkey ASC)
""",
)
def q_window_dist(spark: SparkSession, sf_dir: str) -> DataFrame:
    """cume_dist + nth_value (explicit full frame — engines default value-
    function frames differently); unique (acctbal, suppkey) sort keys make
    both deterministic."""
    s = load_table(spark, sf_dir, "supplier")
    w = Window.partitionBy("s_nationkey").orderBy(
        F.col("s_acctbal").asc(), F.col("s_suppkey").asc()
    )
    wfull = w.rowsBetween(Window.unboundedPreceding, Window.unboundedFollowing)
    return s.select(
        "s_suppkey",
        "s_nationkey",
        "s_acctbal",
        F.cume_dist().over(w).alias("cdist"),
        F.nth_value("s_acctbal", 2).over(wfull).alias("second_low"),
    )
