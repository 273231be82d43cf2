"""Graph-analytics operators (SURVEY.md §2 extensions G1-G2) over a
deterministic derived edge set — the pair-graph staples beyond the
connected components already shipped in operators/dedup.py.

Edge set: distinct (u, v) = (o_custkey, o_orderkey mod 1500) with u < v —
arbitrary but engine-independent, giving a sparse ~|orders| graph that
both engines derive identically from the same parquet.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cellbase_spark.io import load_table
from cellbase_spark.registry import register

_EDGES_SQL = """
SELECT DISTINCT LEAST(o_custkey, o_orderkey % 1500) AS u,
       GREATEST(o_custkey, o_orderkey % 1500) AS v
FROM orders WHERE o_custkey <> o_orderkey % 1500
"""


def _edges(spark: SparkSession, sf_dir: str) -> DataFrame:
    o = load_table(spark, sf_dir, "orders")
    m = F.col("o_orderkey") % 1500
    return (
        o.where(F.col("o_custkey") != m)
        .select(
            F.least(F.col("o_custkey"), m).alias("u"),
            F.greatest(F.col("o_custkey"), m).alias("v"),
        )
        .distinct()
    )


@register(
    "q_triangle_count",
    family="graph",
    oracle=f"""
WITH e AS ({_EDGES_SQL})
SELECT COUNT(*) AS n_triangles
FROM e e1 JOIN e e2 ON e1.v = e2.u JOIN e e3 ON e1.u = e3.u AND e2.v = e3.v
""",
)
def q_triangle_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Triangle counting by oriented wedge closure: every edge is stored
    once as (u < v), so each triangle u<v<w is counted exactly once by
    joining wedges (u,v)+(v,w) against the closing edge (u,w). Two
    equi-join shuffles on node keys — the standard distributed algorithm
    (orientation kills the 6x duplication AND caps wedge fan-out by
    high-degree nodes' ORDER, not their degree). At 100 TB: partition
    edges by u, broadcast nothing, let AQE handle the wedge skew."""
    e = _edges(spark, sf_dir).localCheckpoint(eager=True)
    e1 = e.select(F.col("u").alias("a"), F.col("v").alias("b"))
    e2 = e.select(F.col("u").alias("b"), F.col("v").alias("c"))
    e3 = e.select(F.col("u").alias("a"), F.col("v").alias("c"))
    wedges = e1.join(e2, "b")
    return wedges.join(e3, ["a", "c"]).agg(F.count(F.lit(1)).alias("n_triangles"))


@register(
    "q_degree_distribution",
    family="graph",
    oracle=f"""
WITH e AS ({_EDGES_SQL}),
d AS (
  SELECT node, COUNT(*) AS degree FROM (
    SELECT u AS node FROM e UNION ALL SELECT v FROM e
  ) GROUP BY node
)
SELECT degree, COUNT(*) AS n_nodes FROM d GROUP BY degree
""",
)
def q_degree_distribution(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Degree distribution of the derived graph: two map-side-combinable
    hash aggs (node degree, then histogram). The first shuffle carries
    one row per node, the second one row per distinct degree."""
    e = _edges(spark, sf_dir)
    deg = (
        e.select(F.col("u").alias("node"))
        .unionAll(e.select(F.col("v").alias("node")))
        .groupBy("node")
        .agg(F.count(F.lit(1)).alias("degree"))
    )
    return deg.groupBy("degree").agg(F.count(F.lit(1)).alias("n_nodes"))
