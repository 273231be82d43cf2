"""Data-quality operators (SURVEY.md §2 extensions Q1-Q2): table
profiling and declarative constraint checks, the Deequ/Great-Expectations
verbs a 100 TB training-data pipeline runs before every ingest.

Cellbase analog: none — the reference trusts its spreadsheet input
entirely. These are north-star extensions.

Both operators are single-scan: every metric/check folds into ONE
aggregate over the table (conditional aggregation, not one pass per
rule), so profiling 100 TB costs exactly one read. The exception is
referential integrity, which is inherently a join — expressed as a
broadcast-built anti join so the fact side still streams once.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cellbase_spark.io import load_table
from cellbase_spark.registry import register


@register(
    "q_profile_table",
    family="quality",
    oracle="""
WITH m AS (
  SELECT
    COUNT(*) AS row_count,
    CAST(COUNT(*) - COUNT(o_totalprice) AS BIGINT) AS tp_nulls,
    CAST(COUNT(DISTINCT o_totalprice) AS BIGINT) AS tp_distinct,
    MIN(o_totalprice) AS tp_min, MAX(o_totalprice) AS tp_max,
    CAST(COUNT(*) - COUNT(o_custkey) AS BIGINT) AS ck_nulls,
    CAST(COUNT(DISTINCT o_custkey) AS BIGINT) AS ck_distinct,
    CAST(MIN(o_custkey) AS DOUBLE) AS ck_min,
    CAST(MAX(o_custkey) AS DOUBLE) AS ck_max,
    CAST(COUNT(DISTINCT o_orderstatus) AS BIGINT) AS st_distinct
  FROM orders
)
SELECT col, metric, value FROM (
  SELECT '__table__' AS col, 'row_count' AS metric, CAST(row_count AS DOUBLE) AS value FROM m
  UNION ALL SELECT 'o_totalprice', 'null_count', CAST(tp_nulls AS DOUBLE) FROM m
  UNION ALL SELECT 'o_totalprice', 'distinct_count', CAST(tp_distinct AS DOUBLE) FROM m
  UNION ALL SELECT 'o_totalprice', 'min', tp_min FROM m
  UNION ALL SELECT 'o_totalprice', 'max', tp_max FROM m
  UNION ALL SELECT 'o_custkey', 'null_count', CAST(ck_nulls AS DOUBLE) FROM m
  UNION ALL SELECT 'o_custkey', 'distinct_count', CAST(ck_distinct AS DOUBLE) FROM m
  UNION ALL SELECT 'o_custkey', 'min', ck_min FROM m
  UNION ALL SELECT 'o_custkey', 'max', ck_max FROM m
  UNION ALL SELECT 'o_orderstatus', 'distinct_count', CAST(st_distinct AS DOUBLE) FROM m
)
""",
)
def q_profile_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Single-pass table profiler (long format: column, metric, value).
    All metrics fold into ONE aggregate row over ONE scan of orders —
    never a loop of per-column jobs — then unpivot to rows with stack()
    (an Expand node, zero shuffle). min/max on doubles transfer exactly;
    counts cast to double for the uniform value column. At 100 TB swap
    COUNT(DISTINCT) for approx_count_distinct and the plan is unchanged."""
    o = load_table(spark, sf_dir, "orders")
    m = o.agg(
        F.count(F.lit(1)).alias("row_count"),
        F.sum(F.col("o_totalprice").isNull().cast("long")).alias("tp_nulls"),
        F.countDistinct("o_totalprice").alias("tp_distinct"),
        F.min("o_totalprice").alias("tp_min"),
        F.max("o_totalprice").alias("tp_max"),
        F.sum(F.col("o_custkey").isNull().cast("long")).alias("ck_nulls"),
        F.countDistinct("o_custkey").alias("ck_distinct"),
        F.min("o_custkey").cast("double").alias("ck_min"),
        F.max("o_custkey").cast("double").alias("ck_max"),
        F.countDistinct("o_orderstatus").alias("st_distinct"),
    )
    return m.selectExpr(
        """stack(10,
          '__table__',    'row_count',      cast(row_count as double),
          'o_totalprice', 'null_count',     cast(tp_nulls as double),
          'o_totalprice', 'distinct_count', cast(tp_distinct as double),
          'o_totalprice', 'min',            tp_min,
          'o_totalprice', 'max',            tp_max,
          'o_custkey',    'null_count',     cast(ck_nulls as double),
          'o_custkey',    'distinct_count', cast(ck_distinct as double),
          'o_custkey',    'min',            ck_min,
          'o_custkey',    'max',            ck_max,
          'o_orderstatus','distinct_count', cast(st_distinct as double)
        ) as (col, metric, value)"""
    )


@register(
    "q_quality_checks",
    family="quality",
    oracle="""
WITH agg AS (
  SELECT
    CAST(COUNT(*) - COUNT(DISTINCT o_orderkey) AS BIGINT) AS pk_dups,
    CAST(SUM(CASE WHEN o_totalprice <= 0 THEN 1 ELSE 0 END) AS BIGINT) AS bad_price,
    CAST(SUM(CASE WHEN o_orderstatus NOT IN ('F','O','P') THEN 1 ELSE 0 END) AS BIGINT) AS bad_status
  FROM orders
),
fk AS (
  SELECT CAST(COUNT(*) AS BIGINT) AS orphans
  FROM orders o
  WHERE NOT EXISTS (SELECT 1 FROM customer c WHERE c.c_custkey = o.o_custkey)
)
SELECT chk, violations, violations = 0 AS pass FROM (
  SELECT 'pk_unique_orderkey' AS chk, pk_dups AS violations FROM agg
  UNION ALL SELECT 'price_positive', bad_price FROM agg
  UNION ALL SELECT 'status_in_enum', bad_status FROM agg
  UNION ALL SELECT 'fk_custkey_in_customer', orphans FROM fk
)
""",
)
def q_quality_checks(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Declarative constraint suite -> one verdict row per check
    (check, violations, pass). The three scan-local rules (PK uniqueness,
    range, enum) share ONE conditional aggregate over orders; referential
    integrity is a LEFT ANTI join whose build side is the deduplicated
    customer key column (broadcast at dim scale). Violations COUNT, not
    boolean-only — the 100 TB triage question is always 'how many'."""
    o = load_table(spark, sf_dir, "orders")
    c = load_table(spark, sf_dir, "customer").select("c_custkey")
    agg = o.agg(
        (F.count(F.lit(1)) - F.countDistinct("o_orderkey")).alias("pk_dups"),
        F.sum((F.col("o_totalprice") <= 0).cast("long")).alias("bad_price"),
        F.sum((~F.col("o_orderstatus").isin("F", "O", "P")).cast("long")).alias(
            "bad_status"
        ),
    )
    orphans = (
        o.join(c, o.o_custkey == c.c_custkey, "left_anti")  # customer scales with SF
        .agg(F.count(F.lit(1)).alias("orphans"))
    )
    checks = agg.selectExpr(
        """stack(3,
          'pk_unique_orderkey', pk_dups,
          'price_positive',     bad_price,
          'status_in_enum',     bad_status
        ) as (chk, violations)"""
    ).unionByName(
        orphans.select(
            F.lit("fk_custkey_in_customer").alias("chk"),
            F.col("orphans").alias("violations"),
        )
    )
    return checks.select(
        "chk", "violations", (F.col("violations") == 0).alias("pass")
    )
