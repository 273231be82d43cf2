"""TPC-H completion battery (SURVEY.md §2.12 continuation, J22-J32).

With this module every one of the 22 classic TPC-H query *shapes* is
registered (Q1 is the flagship in aggregates.py; Q3/Q5 in
grouping/joins; Q4/Q6/Q10/Q12/Q14/Q18/Q19/Q22 in tpch.py). The driver
testdata has no ``partsupp`` table and omits several columns
(l_commitdate, l_receiptdate, o_comment, p_container, ps_supplycost,
ps_availqty), so Q2/Q9/Q11/Q13/Q16/Q17/Q20/Q21 are *adapted shapes*:
the same plan skeleton — correlated min, nested IN, double EXISTS/NOT
EXISTS, group-HAVING vs a global scalar — re-pointed at columns that
exist, with ``lineitem`` standing in for partsupp as the part↔supplier
association. Cellbase itself has no join operator at all (SURVEY.md
§2.3 [HIGH]); this battery is north-star decision-support coverage.

Scale notes (100 TB): each query keeps exactly the unavoidable big
shuffles (lineitem groupBy / lineitem⋈orders) and broadcasts every
dimension; Q21 replaces the literal double self-join with a two-level
aggregate reusing ONE orderkey partitioning (see q_tpch_q21).

Determinism (SURVEY.md §5.2): money sums go through the exact-decimal
helpers; l_quantity is integral-valued double (sums exact in any
order); per-row IEEE arithmetic (division, fixed-tree multiply chains)
is bit-identical across engines, so double equality joins/filters on
derived mins/avgs are safe.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from cellbase_spark.functions.exact import davg, dsum, dsum_sql
from cellbase_spark.io import load_table
from cellbase_spark.registry import register


# --------------------------------------------------------------------------
# Q2 — minimum-cost supplier (correlated MIN subquery)
# --------------------------------------------------------------------------

@register(
    "q_tpch_q2",
    family="tpch",
    oracle="""
WITH ps AS (
  SELECT l_partkey, l_suppkey,
         MIN(l_extendedprice / l_quantity) AS unit_cost
  FROM lineitem GROUP BY l_partkey, l_suppkey
),
eu AS (
  SELECT s.s_suppkey, s.s_name, s.s_acctbal, n.n_name
  FROM supplier s
  JOIN nation n ON s.s_nationkey = n.n_nationkey
  JOIN region r ON n.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'EUROPE'
)
SELECT eu.s_acctbal, eu.s_name, eu.n_name,
       p.p_partkey, p.p_name, ps.unit_cost
FROM ps
JOIN eu ON ps.l_suppkey = eu.s_suppkey
JOIN part p ON ps.l_partkey = p.p_partkey
WHERE p.p_size < 25 AND p.p_type = 'LARGE'
  AND ps.unit_cost = (
    SELECT MIN(ps2.unit_cost)
    FROM ps ps2 JOIN eu e2 ON ps2.l_suppkey = e2.s_suppkey
    WHERE ps2.l_partkey = ps.l_partkey
  )
ORDER BY eu.s_acctbal DESC, eu.n_name, eu.s_name, p.p_partkey
LIMIT 100
""",
)
def q_tpch_q2(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q2 shape (minimum-cost supplier): the correlated
    MIN-subquery becomes a window MIN over the part key — one pass, no
    re-scan. Adapted: lineitem stands in for partsupp, unit cost =
    MIN(l_extendedprice / l_quantity) per (part, supplier); per-row IEEE
    division then MIN is bit-identical across engines, so the
    cost = min_cost double equality is exact. Plan: lineitem groupBy
    (partkey, suppkey) is the one big shuffle; the EUROPE supplier dim
    and the size/type-filtered part dim both broadcast; the window MIN
    re-partitions by partkey only the ~|filtered parts| × |suppliers|
    survivor rows."""
    from pyspark.sql import Window

    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "EUROPE")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_size") < 25) & (F.col("p_type") == "LARGE")
    )
    eu = (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(F.broadcast(r), n.n_regionkey == r.r_regionkey)
        .select("s_suppkey", "s_name", "s_acctbal", "n_name")
    )
    ps = (
        l.groupBy("l_partkey", "l_suppkey")
        .agg(F.min(F.col("l_extendedprice") / F.col("l_quantity")).alias("unit_cost"))
        .join(eu, F.col("l_suppkey") == eu.s_suppkey)  # supplier-derived scales with SF
        .join(p, F.col("l_partkey") == p.p_partkey)
    )
    w = Window.partitionBy("l_partkey")
    return (
        ps.withColumn("min_cost", F.min("unit_cost").over(w))
        .where(F.col("unit_cost") == F.col("min_cost"))
        .select("s_acctbal", "s_name", "n_name", "p_partkey", "p_name", "unit_cost")
        .orderBy(
            F.col("s_acctbal").desc(), "n_name", "s_name", F.col("p_partkey").asc()
        )
        .limit(100)
    )


# --------------------------------------------------------------------------
# Q7 — volume shipping between two nations
# --------------------------------------------------------------------------

@register(
    "q_tpch_q7",
    family="tpch",
    oracle=f"""
SELECT supp_nation, cust_nation, l_year,
       {dsum_sql('volume', 'revenue')}
FROM (
  SELECT n1.n_name AS supp_nation, n2.n_name AS cust_nation,
         EXTRACT(year FROM l.l_shipdate) AS l_year,
         l.l_extendedprice * (1 - l.l_discount) AS volume
  FROM lineitem l
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  WHERE ((n1.n_name = 'NATION_1' AND n2.n_name = 'NATION_2')
      OR (n1.n_name = 'NATION_2' AND n2.n_name = 'NATION_1'))
    AND l.l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l.l_shipdate <  TIMESTAMP '1998-01-01 00:00:00'
) shipping
GROUP BY supp_nation, cust_nation, l_year
""",
)
def q_tpch_q7(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q7 (volume shipping): both nation dims are pre-filtered to
    the two nations of interest BEFORE the big join, so the broadcast
    hash joins against supplier/customer act as semi-filters — lineitem
    rows from other supplier nations never reach the orderkey shuffle.
    The OR-of-two-pairs predicate runs post-join on the two surviving
    nation-name columns. Year buckets come from the shipdate already in
    hand (no second date column needed)."""
    wanted = ["NATION_1", "NATION_2"]
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name").isin(wanted))
    s = (
        load_table(spark, sf_dir, "supplier")
        .join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    c = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .select("c_custkey", F.col("n_name").alias("cust_nation"))
    )
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_custkey")
    return (
        l.join(s, l.l_suppkey == s.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(c, o.o_custkey == c.c_custkey)
        .where(
            (
                (F.col("supp_nation") == wanted[0])
                & (F.col("cust_nation") == wanted[1])
            )
            | (
                (F.col("supp_nation") == wanted[1])
                & (F.col("cust_nation") == wanted[0])
            )
        )
        .groupBy(
            "supp_nation",
            "cust_nation",
            F.year("l_shipdate").cast("bigint").alias("l_year"),
        )
        .agg(dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "revenue"))
    )


# --------------------------------------------------------------------------
# Q8 — national market share
# --------------------------------------------------------------------------

@register(
    "q_tpch_q8",
    family="tpch",
    oracle=f"""
SELECT o_year,
       CASE WHEN total = 0 THEN 0.0 ELSE nation_rev / total END AS mkt_share
FROM (
  SELECT EXTRACT(year FROM o.o_orderdate) AS o_year,
         {dsum_sql("CASE WHEN n1.n_name = 'NATION_5' THEN l.l_extendedprice * (1 - l.l_discount) ELSE 0 END", 'nation_rev')},
         {dsum_sql('l.l_extendedprice * (1 - l.l_discount)', 'total')}
  FROM lineitem l
  JOIN orders o   ON o.o_orderkey = l.l_orderkey
  JOIN part p     ON p.p_partkey = l.l_partkey
  JOIN supplier s ON s.s_suppkey = l.l_suppkey
  JOIN nation n1  ON s.s_nationkey = n1.n_nationkey
  JOIN customer c ON c.c_custkey = o.o_custkey
  JOIN nation n2  ON c.c_nationkey = n2.n_nationkey
  JOIN region r   ON n2.n_regionkey = r.r_regionkey
  WHERE r.r_name = 'AMERICA' AND p.p_type = 'ECONOMY'
    AND o.o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND o.o_orderdate <  TIMESTAMP '1998-01-01 00:00:00'
  GROUP BY o_year
) shares
""",
)
def q_tpch_q8(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q8 (national market share): numerator and denominator are
    ONE conditional aggregate (no second pass, no self-join) — the
    CASE-guarded decimal sum and the unconditional one share a hash-agg.
    Both land as round-2 doubles, so the final IEEE division is
    bit-identical across engines. Part (type filter) and the
    AMERICA-customer dim broadcast; lineitem⋈orders is the single
    shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    o = load_table(spark, sf_dir, "orders").where(
        (F.col("o_orderdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("o_orderdate") < F.lit("1998-01-01").cast("timestamp"))
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_type") == "ECONOMY")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    r = load_table(spark, sf_dir, "region").where(F.col("r_name") == "AMERICA")
    cust_am = (
        load_table(spark, sf_dir, "customer")
        .join(F.broadcast(n), F.col("c_nationkey") == n.n_nationkey)
        .join(F.broadcast(r), F.col("n_regionkey") == r.r_regionkey)
        .select("c_custkey")
    )
    supp_n = (
        s.join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey)
        .select("s_suppkey", F.col("n_name").alias("supp_nation"))
    )
    vol = F.col("l_extendedprice") * (1 - F.col("l_discount"))
    agg = (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(supp_n, l.l_suppkey == supp_n.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .join(cust_am, o.o_custkey == cust_am.c_custkey)
        .groupBy(F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(
            dsum(
                F.when(F.col("supp_nation") == "NATION_5", vol).otherwise(0.0),
                "nation_rev",
            ),
            dsum(vol, "total"),
        )
    )
    return agg.select(
        "o_year",
        F.when(F.col("total") == 0, F.lit(0.0))
        .otherwise(F.col("nation_rev") / F.col("total"))
        .alias("mkt_share"),
    )


# --------------------------------------------------------------------------
# Q9 — product-type profit by nation and year
# --------------------------------------------------------------------------

@register(
    "q_tpch_q9",
    family="tpch",
    oracle=f"""
SELECT n.n_name AS nation, EXTRACT(year FROM o.o_orderdate) AS o_year,
       {dsum_sql('l.l_extendedprice * (1 - l.l_discount) - 0.1 * p.p_retailprice * l.l_quantity', 'sum_profit')}
FROM lineitem l
JOIN part p     ON p.p_partkey = l.l_partkey
JOIN supplier s ON s.s_suppkey = l.l_suppkey
JOIN orders o   ON o.o_orderkey = l.l_orderkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
WHERE p.p_name LIKE '%red%'
GROUP BY nation, o_year
""",
)
def q_tpch_q9(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 shape (product-type profit): adapted — testdata has no
    partsupp.ps_supplycost, so unit cost is proxied as
    0.1 * p_retailprice (same plan: a per-row profit expression spanning
    lineitem AND two broadcast dims, summed by nation × year). The
    multiply/subtract tree is written identically in both engines, so
    per-row doubles agree bit-for-bit before the exact-decimal sum. The
    %red% part filter broadcasts and semi-filters lineitem before the
    orderkey shuffle."""
    l = load_table(spark, sf_dir, "lineitem")
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    o = load_table(spark, sf_dir, "orders").select("o_orderkey", "o_orderdate")
    supp_n = s.join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.1) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(p, l.l_partkey == p.p_partkey)
        .join(supp_n, l.l_suppkey == supp_n.s_suppkey)
        .join(o, l.l_orderkey == o.o_orderkey)
        .groupBy("nation", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(dsum(profit, "sum_profit"))
    )


# --------------------------------------------------------------------------
# Q11 — important stock (group-HAVING vs a global scalar)
# --------------------------------------------------------------------------

@register(
    "q_tpch_q11",
    family="tpch",
    oracle="""
WITH sval AS (
  SELECT l.l_partkey AS partkey,
         CAST(ROUND(SUM(CAST(l.l_extendedprice * l.l_quantity
                             AS DECIMAL(25,10))), 2) AS DOUBLE) AS stock_value
  FROM lineitem l
  JOIN supplier s ON l.l_suppkey = s.s_suppkey
  JOIN nation n   ON s.s_nationkey = n.n_nationkey
  WHERE n.n_name = 'NATION_3'
  GROUP BY l.l_partkey
)
SELECT partkey, stock_value
FROM sval
WHERE stock_value > (
  SELECT CAST(SUM(CAST(stock_value AS DECIMAL(25,10))) AS DOUBLE) * 0.001
  FROM sval
)
""",
)
def q_tpch_q11(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q11 shape (important stock): adapted — value =
    Σ l_extendedprice × l_quantity over one nation's suppliers, with
    lineitem standing in for partsupp. The global threshold is a
    1-row aggregate of the ALREADY-GROUPED per-part values (not a
    second scan of lineitem), broadcast back as a cross join — the
    classic HAVING-vs-scalar-subquery plan. Per-part values are round-2
    doubles first, so the threshold sum and the > compare are identical
    in both engines. One shuffle: the partkey group-by."""
    l = load_table(spark, sf_dir, "lineitem")
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_3")
    supp = s.join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey).select(
        "s_suppkey"
    )
    sval = (
        l.join(supp, l.l_suppkey == supp.s_suppkey)
        .groupBy(F.col("l_partkey").alias("partkey"))
        .agg(dsum(F.col("l_extendedprice") * F.col("l_quantity"), "stock_value"))
    )
    # Threshold: exact decimal sum of the (exactly-representable) round-2
    # per-part doubles, THEN one double multiply — order-independent,
    # unlike a raw double sum.
    threshold = sval.agg(
        (
            F.sum(F.col("stock_value").cast("decimal(25,10)")).cast("double")
            * F.lit(0.001)
        ).alias("threshold")
    )
    return (
        sval.crossJoin(F.broadcast(threshold))
        .where(F.col("stock_value") > F.col("threshold"))
        .select("partkey", "stock_value")
    )


# --------------------------------------------------------------------------
# Q13 — customer order-count distribution
# --------------------------------------------------------------------------

@register(
    "q_tpch_q13",
    family="tpch",
    oracle="""
SELECT c_count, COUNT(*) AS custdist
FROM (
  SELECT c.c_custkey, COUNT(o.o_orderkey) AS c_count
  FROM customer c
  LEFT JOIN orders o
    ON c.c_custkey = o.o_custkey AND o.o_orderpriority <> '1-URGENT'
  GROUP BY c.c_custkey
) c_orders
GROUP BY c_count
""",
)
def q_tpch_q13(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q13 shape (customer distribution): LEFT OUTER join with the
    filter INSIDE the join condition (adapted: o_orderpriority <>
    '1-URGENT' for the missing o_comment NOT LIKE), so customers whose
    only orders are urgent still appear with c_count = 0 — the part a
    WHERE clause would get wrong. Double aggregation: count per
    customer (shuffle on custkey), then the tiny distribution re-agg on
    c_count."""
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    o = load_table(spark, sf_dir, "orders").select(
        "o_orderkey", "o_custkey", "o_orderpriority"
    )
    per_cust = (
        c.join(
            o,
            (c.c_custkey == o.o_custkey) & (o.o_orderpriority != "1-URGENT"),
            "left",
        )
        .groupBy("c_custkey")
        .agg(F.count("o_orderkey").alias("c_count"))
    )
    return per_cust.groupBy("c_count").agg(F.count(F.lit(1)).alias("custdist"))


# --------------------------------------------------------------------------
# Q15 — top supplier (scalar-MAX subquery)
# --------------------------------------------------------------------------

@register(
    "q_tpch_q15",
    family="tpch",
    oracle=f"""
WITH revenue AS (
  SELECT l_suppkey AS supplier_no,
         {dsum_sql('l_extendedprice * (1 - l_discount)', 'total_revenue')}
  FROM lineitem
  WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
    AND l_shipdate <  TIMESTAMP '1996-04-01 00:00:00'
  GROUP BY l_suppkey
)
SELECT s.s_suppkey, s.s_name, r.total_revenue
FROM supplier s JOIN revenue r ON s.s_suppkey = r.supplier_no
WHERE r.total_revenue = (SELECT MAX(total_revenue) FROM revenue)
ORDER BY s.s_suppkey
""",
)
def q_tpch_q15(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q15 (top supplier): the revenue view is computed ONCE and
    reused for both the scalar MAX and the equality filter (the spec's
    CREATE VIEW, as a cached-by-plan common subexpression). Per-supplier
    revenue lands as a round-2 double, MAX of doubles is exact, so the
    tie-preserving equality matches DuckDB row-for-row. Supplier dim
    broadcasts onto the ≤|suppliers| survivor rows."""
    l = load_table(spark, sf_dir, "lineitem").where(
        (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp"))
        & (F.col("l_shipdate") < F.lit("1996-04-01").cast("timestamp"))
    )
    revenue = l.groupBy(F.col("l_suppkey").alias("supplier_no")).agg(
        dsum(F.col("l_extendedprice") * (1 - F.col("l_discount")), "total_revenue")
    )
    best = revenue.agg(F.max("total_revenue").alias("best_rev"))
    s = load_table(spark, sf_dir, "supplier").select("s_suppkey", "s_name")
    return (
        revenue.crossJoin(F.broadcast(best))
        .where(F.col("total_revenue") == F.col("best_rev"))
        .join(s, F.col("supplier_no") == F.col("s_suppkey"))
        .select("s_suppkey", "s_name", "total_revenue")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q16 — supplier-part relationship counts (NOT IN + COUNT DISTINCT)
# --------------------------------------------------------------------------

@register(
    "q_tpch_q16",
    family="tpch",
    oracle="""
SELECT p.p_brand, p.p_type, p.p_size,
       COUNT(DISTINCT l.l_suppkey) AS supplier_cnt
FROM lineitem l JOIN part p ON l.l_partkey = p.p_partkey
WHERE p.p_brand <> 'Brand#1'
  AND p.p_type <> 'PROMO'
  AND p.p_size IN (1, 4, 9, 16, 25, 36, 49)
  AND l.l_suppkey NOT IN (
    SELECT s_suppkey FROM supplier WHERE s_acctbal < 0
  )
GROUP BY p.p_brand, p.p_type, p.p_size
""",
)
def q_tpch_q16(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q16 shape (supplier-part relationship): adapted — lineitem
    is the part↔supplier association (no partsupp), and the NOT IN
    excludes negative-balance suppliers (no s_comment complaints
    column). NOT IN over a provably non-null key column is planned as a
    broadcast LEFT ANTI join — no null-aware machinery needed. Part dim
    (three pushed predicates) broadcasts; the only shuffle is the
    COUNT DISTINCT's (group, suppkey) expand."""
    l = load_table(spark, sf_dir, "lineitem").select("l_partkey", "l_suppkey")
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") != "Brand#1")
        & (F.col("p_type") != "PROMO")
        & (F.col("p_size").isin(1, 4, 9, 16, 25, 36, 49))
    )
    bad = load_table(spark, sf_dir, "supplier").where(F.col("s_acctbal") < 0).select(
        "s_suppkey"
    )
    return (
        l.join(bad, l.l_suppkey == bad.s_suppkey, "left_anti")
        .join(p, F.col("l_partkey") == p.p_partkey)
        .groupBy("p_brand", "p_type", "p_size")
        .agg(F.countDistinct("l_suppkey").alias("supplier_cnt"))
    )


# --------------------------------------------------------------------------
# Q17 — small-quantity-order revenue (correlated AVG)
# --------------------------------------------------------------------------

@register(
    "q_tpch_q17",
    family="tpch",
    oracle=f"""
SELECT {dsum_sql('l.l_extendedprice', 'sum_small_qty_rev')} ,
       CAST(COUNT(*) AS BIGINT) AS n_lines
FROM lineitem l
JOIN part p ON p.p_partkey = l.l_partkey
WHERE p.p_brand = 'Brand#3' AND p.p_size < 10
  AND l.l_quantity < (
    SELECT 0.2 * (CAST(ROUND(SUM(CAST(l2.l_quantity AS DECIMAL(25,10))), 4)
                       AS DOUBLE) / COUNT(l2.l_quantity))
    FROM lineitem l2 WHERE l2.l_partkey = l.l_partkey
  )
""",
)
def q_tpch_q17(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q17 shape (small-quantity revenue): the correlated
    per-part AVG becomes ONE grouped aggregate over the lineitem rows of
    the filtered parts, broadcast back — lineitem is scanned once per
    side but never self-joined row-to-row. Adapted filter: p_brand +
    p_size (no p_container). The threshold is exact-decimal avg × 0.2
    (both factors bit-identical across engines), and l_quantity is an
    integral double, so the < compare is exact."""
    p = load_table(spark, sf_dir, "part").where(
        (F.col("p_brand") == "Brand#3") & (F.col("p_size") < 10)
    ).select("p_partkey")
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    lp = l.join(p, l.l_partkey == p.p_partkey).select(
        "l_partkey", "l_quantity", "l_extendedprice"
    )
    thresholds = lp.groupBy(F.col("l_partkey").alias("t_partkey")).agg(
        (F.lit(0.2) * davg("l_quantity", "aq")).alias("qty_threshold")
    )
    return (
        lp.join(thresholds, lp.l_partkey == F.col("t_partkey"))
        .where(F.col("l_quantity") < F.col("qty_threshold"))
        .agg(
            dsum(F.col("l_extendedprice"), "sum_small_qty_rev"),
            F.count(F.lit(1)).alias("n_lines"),
        )
    )


# --------------------------------------------------------------------------
# Q20 — suppliers with excess volume (nested IN subqueries)
# --------------------------------------------------------------------------

@register(
    "q_tpch_q20",
    family="tpch",
    oracle="""
WITH pq AS (
  SELECT l_partkey, l_suppkey,
         SUM(CASE WHEN l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
                   AND l_shipdate <  TIMESTAMP '1997-01-01 00:00:00'
                  THEN l_quantity ELSE 0 END) AS qty96,
         SUM(l_quantity) AS qty_all
  FROM lineitem GROUP BY l_partkey, l_suppkey
)
SELECT s.s_suppkey, s.s_name
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey
WHERE n.n_name = 'NATION_4'
  AND s.s_suppkey IN (
    SELECT pq.l_suppkey
    FROM pq JOIN part p ON pq.l_partkey = p.p_partkey
    WHERE p.p_name LIKE 'small%' AND pq.qty96 > 0.5 * pq.qty_all
  )
ORDER BY s.s_suppkey
""",
)
def q_tpch_q20(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q20 shape (excess-volume suppliers): the nested
    IN (SELECT ... IN (SELECT ...)) collapses to one conditional
    aggregate + two broadcast joins + a LEFT SEMI. Adapted: with no
    ps_availqty, 'excess' means more than half of a (part, supplier)
    pair's lifetime quantity shipped inside 1996 — qty96 and qty_all
    come from the SAME hash-agg pass (CASE-guarded sum), not two scans.
    Quantities are integral doubles: sums and the 0.5× compare are
    exact. One shuffle (the pair group-by); part and the survivor
    suppkey set broadcast."""
    l = load_table(spark, sf_dir, "lineitem")
    in96 = (F.col("l_shipdate") >= F.lit("1996-01-01").cast("timestamp")) & (
        F.col("l_shipdate") < F.lit("1997-01-01").cast("timestamp")
    )
    pq = l.groupBy("l_partkey", "l_suppkey").agg(
        F.sum(F.when(in96, F.col("l_quantity")).otherwise(0.0)).alias("qty96"),
        F.sum("l_quantity").alias("qty_all"),
    )
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("small%")).select(
        "p_partkey"
    )
    excess = (
        pq.join(p, pq.l_partkey == p.p_partkey)
        .where(F.col("qty96") > F.lit(0.5) * F.col("qty_all"))
        .select("l_suppkey")
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_4")
    return (
        s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey)
        .join(excess, s.s_suppkey == excess.l_suppkey, "left_semi")
        .select("s_suppkey", "s_name")
        .orderBy("s_suppkey")
    )


# --------------------------------------------------------------------------
# Q21 — suppliers who kept orders waiting (EXISTS + NOT EXISTS self-joins)
# --------------------------------------------------------------------------

@register(
    "q_tpch_q21",
    family="tpch",
    oracle="""
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_7'
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > l1.l_shipdate
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
""",
)
def q_tpch_q21(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 shape (suppliers who kept orders waiting): adapted —
    'late' is judged by l_shipdate (no commitdate/receiptdate): a
    supplier 'kept the order waiting' when it is a strictly-latest
    shipper on a multi-supplier order. The oracle states it as the
    spec's EXISTS + NOT EXISTS double self-join; the Spark plan compiles
    both away into window functions over a SINGLE lineitem exchange:
    hashpartitioning(l_orderkey) satisfies the clustering of BOTH the
    per-(order, supplier) max window and the order-level window, so the
    per-supplier latest ship date, the supplier set, and the top-2
    stats (max / its multiplicity / runner-up) all come from one
    shuffle + in-partition sorts. 'No OTHER supplier shipped later' is
    then one comparison against max-excluding-self, derived from a
    collect_set bounded by suppliers-per-order (<= 7 here; the per-order
    supplier fan-in, never the table). Round-4 rewrite: 8 exchanges /
    12 hash-aggs -> 3 exchanges / 2 hash-aggs, sf0.1 best-of-5
    1.58 s -> 1.33 s with far lower variance."""
    l = load_table(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_suppkey", "l_shipdate"
    )
    w_pair = Window.partitionBy("l_orderkey", "l_suppkey")
    w_ord = Window.partitionBy("l_orderkey")
    df = l.withColumn("s_max", F.max("l_shipdate").over(w_pair)).withColumn(
        "pairs", F.collect_set(F.struct("l_suppkey", "s_max")).over(w_ord)
    )
    df = df.select(
        "l_orderkey",
        "l_suppkey",
        "l_shipdate",
        "s_max",
        F.size("pairs").alias("n_supp"),
        F.expr("array_max(transform(pairs, p -> p.s_max))").alias("m1"),
        F.expr(
            "size(filter(pairs, p -> p.s_max = "
            "array_max(transform(pairs, q -> q.s_max))))"
        ).alias("n_at_m1"),
        F.expr(
            "array_max(transform(filter(pairs, p -> p.s_max < "
            "array_max(transform(pairs, q -> q.s_max))), p -> p.s_max))"
        ).alias("m2"),
    ).withColumn(
        "other_max",
        F.when(
            (F.col("s_max") < F.col("m1")) | (F.col("n_at_m1") > 1), F.col("m1")
        ).otherwise(F.col("m2")),
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "s_name"
    )
    o = load_table(spark, sf_dir, "orders").where(
        F.col("o_orderstatus") == "F"
    ).select("o_orderkey")
    # the orders join reuses the okey partitioning the windows installed
    # (only the filtered orders side shuffles); sn is nation-filtered ->
    # bounded -> broadcast
    l1 = (
        df.where(
            (F.col("n_supp") >= 2) & (F.col("other_max") <= F.col("l_shipdate"))
        )
        .join(sn, F.col("l_suppkey") == sn.s_suppkey)
        .join(o, F.col("l_orderkey") == o.o_orderkey)
    )
    return (
        l1.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "q_tpch_q21_bucketed",
    family="tpch",
    oracle="""
SELECT s.s_name, COUNT(*) AS numwait
FROM supplier s
JOIN nation n ON s.s_nationkey = n.n_nationkey AND n.n_name = 'NATION_7'
JOIN lineitem l1 ON l1.l_suppkey = s.s_suppkey
JOIN orders o ON o.o_orderkey = l1.l_orderkey AND o.o_orderstatus = 'F'
WHERE EXISTS (
    SELECT 1 FROM lineitem l2
    WHERE l2.l_orderkey = l1.l_orderkey AND l2.l_suppkey <> l1.l_suppkey
  )
  AND NOT EXISTS (
    SELECT 1 FROM lineitem l3
    WHERE l3.l_orderkey = l1.l_orderkey AND l3.l_suppkey <> l1.l_suppkey
      AND l3.l_shipdate > l1.l_shipdate
  )
GROUP BY s.s_name
ORDER BY numwait DESC, s.s_name
LIMIT 20
""",
)
def q_tpch_q21_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q21 on the SHARED bucketed fact layout: the plain form's
    whole cost is one lineitem exchange feeding the orderkey windows
    plus the filtered-orders shuffle — on the layout BOTH disappear.
    The bucketed lineitem scan reports HashPartitioning(l_orderkey, 32),
    which satisfies the clustering of both windows (l_orderkey is a
    prefix/subset of each partitionBy) with only a cheap partition-LOCAL
    sort for the (l_orderkey, l_suppkey) window order; the orders join
    is then bucket⋈bucket with trusted scan order on the orders side —
    zero exchanges end to end except the final ~400-row s_name agg
    (pinned in tests/test_plans.py: at most ONE shuffle Exchange in the
    whole plan). Same window algebra and oracle as q_tpch_q21 —
    identical results.

    At 100 TB this is the difference between shuffling the full fact
    table per run and reading it in place: the layout is paid once at
    ingest, and every orderkey-clustered query (Q3/Q5/Q21 here) rides
    the same files. Round 7: o_orderstatus is denormalized into the
    bucketed lineitem, so the orders bucket-join is gone too — the
    status filter is applied AFTER the windows (it is per-order
    constant, so filtering l1 afterwards ≡ the orders join) and the
    only Exchange left is the final s_name agg.

    Round 9: the F-status filter moved from after the windows INTO the
    bucketed scan (the r8-verdict endgame item). Correctness argument:
    o_orderstatus is per-order constant and every window partitions by
    l_orderkey, so l2/l3 witnesses for an l1 row live in the SAME order
    — dropping a non-F order removes its l1 rows AND only witnesses no
    surviving l1 row needs. The pushed filter (PushedFilters, pinned)
    halves the window input instead of paying the status lane through
    both windows; a Filter preserves the scan's HashPartitioning and
    sort order, so the zero-exchange window plan is unchanged."""
    from cellbase_spark.queries.joins import _fact_bucketed_layout

    t_l, _ = _fact_bucketed_layout(spark, sf_dir)
    l = (
        spark.table(t_l)
        .where(F.col("o_orderstatus") == "F")
        .select("l_orderkey", "l_suppkey", "l_shipdate")
    )
    w_pair = Window.partitionBy("l_orderkey", "l_suppkey")
    w_ord = Window.partitionBy("l_orderkey")
    df = l.withColumn("s_max", F.max("l_shipdate").over(w_pair)).withColumn(
        "pairs", F.collect_set(F.struct("l_suppkey", "s_max")).over(w_ord)
    )
    df = df.select(
        "l_orderkey",
        "l_suppkey",
        "l_shipdate",
        "s_max",
        F.size("pairs").alias("n_supp"),
        F.expr("array_max(transform(pairs, p -> p.s_max))").alias("m1"),
        F.expr(
            "size(filter(pairs, p -> p.s_max = "
            "array_max(transform(pairs, q -> q.s_max))))"
        ).alias("n_at_m1"),
        F.expr(
            "array_max(transform(filter(pairs, p -> p.s_max < "
            "array_max(transform(pairs, q -> q.s_max))), p -> p.s_max))"
        ).alias("m2"),
    ).withColumn(
        "other_max",
        F.when(
            (F.col("s_max") < F.col("m1")) | (F.col("n_at_m1") > 1), F.col("m1")
        ).otherwise(F.col("m2")),
    )
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation").where(F.col("n_name") == "NATION_7")
    sn = s.join(F.broadcast(n), s.s_nationkey == n.n_nationkey).select(
        "s_suppkey", "s_name"
    )
    l1 = (
        df.where(
            (F.col("n_supp") >= 2)
            & (F.col("other_max") <= F.col("l_shipdate"))
        )
        .join(F.broadcast(sn), F.col("l_suppkey") == sn.s_suppkey)
    )
    return (
        l1.groupBy("s_name")
        .agg(F.count(F.lit(1)).alias("numwait"))
        .orderBy(F.col("numwait").desc(), "s_name")
        .limit(20)
    )


@register(
    "q_tpch_q9_bucketed",
    family="tpch",
    oracle="""
SELECT n.n_name AS nation,
       CAST(EXTRACT(year FROM o.o_orderdate) AS BIGINT) AS o_year,
       CAST(ROUND(SUM(CAST(l.l_extendedprice * (1 - l.l_discount)
                           - 0.1 * p.p_retailprice * l.l_quantity
                           AS DECIMAL(25,10))), 2) AS DOUBLE) AS sum_profit
FROM lineitem l
JOIN part p     ON l.l_partkey = p.p_partkey AND p.p_name LIKE '%red%'
JOIN supplier s ON l.l_suppkey = s.s_suppkey
JOIN nation n   ON s.s_nationkey = n.n_nationkey
JOIN orders o   ON l.l_orderkey = o.o_orderkey
GROUP BY nation, o_year
""",
)
def q_tpch_q9_bucketed(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q9 on the DENORMALIZED bucketed fact layout (round 7): the
    round-6 form's one fact⋈fact join (lineitem⋈orders for o_orderdate)
    is gone — o_orderdate is baked into the bucketed lineitem at ingest,
    so the plan is one pruned fact scan plus two dim broadcasts (%red%
    part for p_retailprice, supplier⋈nation for the nation name) feeding
    the ~(nations x years)-row final agg — the only Exchange, with no
    Sort anywhere (pinned in tests/test_plans.py). Same profit
    expression and oracle as q_tpch_q9 — identical results.

    Fourth query on the same layout files (Q3/Q5/Q21 ride it too): the
    amortization argument in one repo — at 100 TB you pay the denorm
    join + bucketed write once at ingest and every order-attribute
    lookup in the workload becomes a pruned column read."""
    from cellbase_spark.queries.joins import _fact_bucketed_layout

    t_l, _ = _fact_bucketed_layout(spark, sf_dir)
    l = spark.table(t_l)
    p = load_table(spark, sf_dir, "part").where(F.col("p_name").like("%red%"))
    s = load_table(spark, sf_dir, "supplier")
    n = load_table(spark, sf_dir, "nation")
    supp_n = s.join(F.broadcast(n), F.col("s_nationkey") == n.n_nationkey).select(
        "s_suppkey", F.col("n_name").alias("nation")
    )
    profit = F.col("l_extendedprice") * (1 - F.col("l_discount")) - F.lit(0.1) * F.col(
        "p_retailprice"
    ) * F.col("l_quantity")
    return (
        l.join(F.broadcast(p), l.l_partkey == p.p_partkey)
        .join(F.broadcast(supp_n), l.l_suppkey == supp_n.s_suppkey)
        .groupBy("nation", F.year("o_orderdate").cast("bigint").alias("o_year"))
        .agg(dsum(profit, "sum_profit"))
    )
