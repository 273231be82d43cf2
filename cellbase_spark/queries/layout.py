"""Data-layout & join-strategy operators (SURVEY.md §2 extensions:
Z-order clustering keys, two-phase distributed skyline, bloom-style
prefiltered semi-join).

These three keys exist to demonstrate *scale strategies*, with exact
oracles proving the strategy changes nothing about the result:
- q_zorder: the multi-dimensional clustering key used for file skipping
  (Delta/Iceberg OPTIMIZE ZORDER) computed with pure integer bit algebra;
- q_skyline: partial-elimination + global pass, the canonical
  "local reduce then exact global" pattern (same shape as partial
  aggregation), vs a naive NOT EXISTS oracle;
- q_join_prefilter: a hand-rolled runtime filter (the plan Spark's own
  bloom-filter runtime filtering / DPP produces), vs the plain semi join.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cellbase_spark.io import load_table
from cellbase_spark.registry import register


def _interleave_bits(x: str, y: str, bits: int = 8) -> str:
    """SQL expression interleaving the low `bits` of integer expressions
    x (even positions) and y (odd positions) — a Z-order / Morton key.
    Plain `>> & <<` operators, valid verbatim in Spark SQL and DuckDB."""
    terms = []
    for i in range(bits):
        terms.append(f"((({x} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({y} >> {i}) & 1) << {2 * i + 1})")
    return " + ".join(terms)


_ZX = "CAST(c_nationkey AS BIGINT)"
_ZY = "CAST(floor((c_acctbal + 1000.0) / 43.0) AS BIGINT)"
_ZEXPR = _interleave_bits(_ZX, _ZY)


@register(
    "q_zorder",
    family="layout",
    oracle=f"""
SELECT c_custkey, c_nationkey,
       {_ZY} AS bal_bucket,
       CAST({_ZEXPR} AS BIGINT) AS zkey
FROM customer
""",
)
def q_zorder(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (nationkey, acctbal-bucket):
    interleave 8 bits of each dimension so rows close in EITHER dimension
    land close in the sort order. Writing the table sorted by zkey makes
    parquet min/max zone maps prune on BOTH columns — the layout step
    behind Delta/Iceberg `OPTIMIZE ZORDER BY`, here as a narrow map of
    integer bit ops (whole-stage codegen, zero shuffle; the production
    write is `repartitionByRange(zkey).sortWithinPartitions(zkey)`)."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        "c_nationkey",
        F.expr(_ZY).alias("bal_bucket"),
        F.expr(_ZEXPR).cast("bigint").alias("zkey"),
    )


@register(
    "q_skyline",
    family="layout",
    oracle="""
WITH pts AS (
  SELECT o_totalprice, o_orderdate, COUNT(*) AS n_orders
  FROM orders GROUP BY o_totalprice, o_orderdate
)
SELECT p.o_totalprice, p.o_orderdate, p.n_orders
FROM pts p
WHERE NOT EXISTS (
  SELECT 1 FROM pts q
  WHERE q.o_totalprice >= p.o_totalprice AND q.o_orderdate >= p.o_orderdate
    AND (q.o_totalprice > p.o_totalprice OR q.o_orderdate > p.o_orderdate)
)
""",
)
def q_skyline(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pareto skyline of orders on (totalprice, orderdate), both
    maximized: a point survives iff nothing is >= on both axes with one
    strict. O(n log n) sweep instead of the oracle's O(n^2) NOT EXISTS:
    after sorting by (price desc, date desc), a point is dominated iff
    the running max of date over STRICTLY PRIOR rows reaches its date
    (equal pairs were merged by the groupBy, so ties are duplicates of
    the same point, not mutual domination).

    Two-phase for scale: skyline() is idempotent under union, so phase 1
    runs the sweep inside 32 hash shards (narrow, parallel, eliminates
    ~all points), phase 2 re-runs it on the few survivors in one task.
    Same shape as partial->final aggregation."""
    o = load_table(spark, sf_dir, "orders")
    pts = o.groupBy("o_totalprice", "o_orderdate").agg(
        F.count(F.lit(1)).alias("n_orders")
    )

    def sweep(df: DataFrame, part_keys: list[str]) -> DataFrame:
        w = (
            Window.partitionBy(*part_keys)
            .orderBy(F.col("o_totalprice").desc(), F.col("o_orderdate").desc())
            .rowsBetween(Window.unboundedPreceding, -1)
            if part_keys
            else Window.orderBy(
                F.col("o_totalprice").desc(), F.col("o_orderdate").desc()
            ).rowsBetween(Window.unboundedPreceding, -1)
        )
        rm = F.max("o_orderdate").over(w)
        return (
            df.withColumn("_rm", rm)
            .where(F.col("_rm").isNull() | (F.col("o_orderdate") > F.col("_rm")))
            .drop("_rm")
        )

    shard = F.pmod(F.xxhash64("o_totalprice", "o_orderdate"), F.lit(32)).alias("_s")
    partial = sweep(pts.withColumn("_s", shard), ["_s"]).drop("_s")
    return sweep(partial, [])


@register(
    "q_join_prefilter",
    family="layout",
    oracle="""
WITH urgent AS (SELECT o_orderkey FROM orders WHERE o_orderpriority = '1-URGENT')
SELECT COUNT(*) AS n_rows,
       COUNT(DISTINCT l.l_orderkey) AS n_orders,
       CAST(ROUND(SUM(CAST(l.l_quantity AS DECIMAL(18,2))), 2) AS DOUBLE) AS sum_qty
FROM lineitem l WHERE EXISTS (SELECT 1 FROM urgent u WHERE u.o_orderkey = l.l_orderkey)
""",
)
def q_join_prefilter(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime-filter (bloom-style) semi join: lineitem rows for urgent
    orders. Phase 1 broadcasts the ~1K distinct md5-hash BUCKETS of the
    build side's keys and drops probe rows whose bucket can't match (the
    cheap, false-positive-permitting membership test a bloom filter
    gives); phase 2 is the exact semi join on the survivors. Result is
    identical to the plain semi join (the oracle) — the prefilter only
    removes rows the join would drop anyway.

    At 100 TB this is the difference between shuffling the full probe
    table and shuffling the ~matching fraction; Spark's own
    spark.sql.optimizer.runtime.bloomFilter does this automatically for
    shuffle joins — this key pins the plan shape explicitly."""
    li = load_table(spark, sf_dir, "lineitem")
    urgent = (
        load_table(spark, sf_dir, "orders")
        .where(F.col("o_orderpriority") == "1-URGENT")
        .select("o_orderkey")
    )
    # Bucket hash is engine-internal (the oracle is the PLAIN semi join —
    # any hash gives the identical result), so use JVM-native xxhash64
    # instead of the md5 string path reserved for cross-engine randomness.
    bucket_of = lambda c: F.pmod(F.xxhash64(F.col(c)), F.lit(1024))
    buckets = urgent.select(bucket_of("o_orderkey").alias("_b")).distinct()
    prefiltered = li.withColumn("_b", bucket_of("l_orderkey")).join(
        F.broadcast(buckets), "_b", "left_semi"
    )
    joined = prefiltered.join(
        urgent, prefiltered.l_orderkey == urgent.o_orderkey, "left_semi"
    )
    return joined.agg(
        F.count(F.lit(1)).alias("n_rows"),
        F.countDistinct("l_orderkey").alias("n_orders"),
        F.round(F.sum(F.col("l_quantity").cast("decimal(18,2)")), 2)
        .cast("double")
        .alias("sum_qty"),
    )
