"""User-defined function surface (SURVEY.md §2.10 U1-U4).

The reference's entire scalar story is "user writes GDScript on row
objects" (SURVEY.md §2.7); this family is the engine's governed version of
that escape hatch. Design rules, in priority order:

1. Built-ins first — everything in queries/scalars.py stays JVM-side in
   whole-stage codegen. UDFs exist for logic Spark genuinely can't express.
2. When Python is unavoidable, Arrow-batched pandas UDFs (U2/U3): one
   Python worker round-trip per batch, vectorized numpy/pandas inside —
   10-100x over row-at-a-time.
3. Row-at-a-time @udf (U1) is demonstrated because it's part of the API
   surface, on a deliberately small projection.

Oracle-exactness: every UDF here computes something mirrorable in ANSI SQL
using only exact operations (string ops, IEEE single-op arithmetic on
doubles, exact min/max) so the DuckDB hash-match holds bit-for-bit — no
transcendentals, no accumulation-order dependence (see functions/exact.py).
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.functions import pandas_udf, udf

from pyspark.sql.types import DoubleType, IntegerType, StringType

from cellbase_spark.io import load_table
from cellbase_spark.registry import register

# DataType instances (not DDL strings): a DDL return type is parsed through
# the active SparkContext, which doesn't exist at import time.


@udf(StringType())
def _first_token(s: str | None) -> str | None:
    """Row-at-a-time scalar UDF: first whitespace token."""
    if s is None:
        return None
    parts = s.split(" ")
    return parts[0] if parts else None


@udf(IntegerType())
def _token_count_py(s: str | None) -> int | None:
    if s is None:
        return None
    return len([t for t in s.split(" ") if t])


@register(
    "q_udf_scalar",
    family="udf",
    oracle="""
SELECT doc_id,
       string_split(text, ' ')[1] AS first_tok,
       len(list_filter(string_split(text, ' '), t -> len(t) > 0)) AS n_toks
FROM documents
""",
)
def q_udf_scalar(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U1: scalar Python UDF (tokenize-ish text ops). Each row crosses the
    JVM->Python socket individually — correct but the slow path; the oracle
    shows the same logic is expressible in SQL, which is the real lesson.
    """
    d = load_table(spark, sf_dir, "documents")
    return d.select(
        "doc_id",
        _first_token(F.col("text")).alias("first_tok"),
        _token_count_py(F.col("text")).alias("n_toks"),
    )


@pandas_udf(DoubleType())
def _disc_price(price: pd.Series, discount: pd.Series) -> pd.Series:
    """Vectorized: per-row IEEE multiply chain (bit-identical to SQL)."""
    return price * (1.0 - discount)


@pandas_udf(DoubleType())
def _clipped(value: pd.Series, lo: pd.Series, hi: pd.Series) -> pd.Series:
    return value.clip(lower=lo, upper=hi)


@register(
    "q_udf_pandas",
    family="udf",
    oracle="""
SELECT l_orderkey, l_linenumber,
       l_extendedprice * (1.0 - l_discount) AS disc_price,
       CASE WHEN l_quantity < 5.0 THEN 5.0
            WHEN l_quantity > 45.0 THEN 45.0
            ELSE l_quantity END AS qty_clipped
FROM lineitem
""",
)
def q_udf_pandas(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U2: Arrow-batched pandas UDFs over lineitem. Data moves JVM->Python
    as Arrow record batches and is processed with vectorized pandas —
    the only acceptable Python shape on a 100 TB hot path (still ~an order
    slower than staying in codegen; scalars.py is the preferred form)."""
    li = load_table(spark, sf_dir, "lineitem")
    return li.select(
        "l_orderkey",
        "l_linenumber",
        _disc_price(F.col("l_extendedprice"), F.col("l_discount")).alias("disc_price"),
        _clipped(F.col("l_quantity"), F.lit(5.0), F.lit(45.0)).alias("qty_clipped"),
    )


def _minmax_scale(pdf: pd.DataFrame) -> pd.DataFrame:
    """Grouped-map kernel: per-group min-max normalization of acctbal.

    Exact-by-construction: min/max are exact selections and the per-row
    (x - min) / (max - min) is two IEEE ops on identical doubles — no
    accumulation order to diverge from the SQL oracle.
    """
    lo = pdf["c_acctbal"].min()
    hi = pdf["c_acctbal"].max()
    out = pdf[["c_custkey", "c_mktsegment", "c_acctbal"]].copy()
    out["scaled"] = (pdf["c_acctbal"] - lo) / (hi - lo)
    return out


@register(
    "q_udaf_grouped",
    family="udf",
    oracle="""
SELECT c_custkey, c_mktsegment, c_acctbal,
       (c_acctbal - MIN(c_acctbal) OVER (PARTITION BY c_mktsegment))
         / (MAX(c_acctbal) OVER (PARTITION BY c_mktsegment)
            - MIN(c_acctbal) OVER (PARTITION BY c_mktsegment)) AS scaled
FROM customer
""",
)
def q_udaf_grouped(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U3: grouped-map applyInPandas — each c_mktsegment group becomes one
    pandas DataFrame in a Python worker.

    Scale note: a group must fit in one worker's memory, and parallelism is
    bounded by group count (5 segments here). For high-cardinality keys
    this is the right custom-aggregation tool at 100 TB; for few fat groups
    prefer a window-function rewrite (the oracle shows it) or salt the key.
    """
    c = load_table(spark, sf_dir, "customer")
    return c.groupBy("c_mktsegment").applyInPandas(
        _minmax_scale,
        schema="c_custkey long, c_mktsegment string, c_acctbal double, scaled double",
    )


@register(
    "q_udtf_bigrams",
    family="udf",
    oracle="""
WITH toks AS (
  SELECT doc_id,
         unnest(string_split(text, ' ')) AS tok,
         generate_subscripts(string_split(text, ' '), 1) AS pos
  FROM documents
)
SELECT doc_id, CAST(pos AS INT) AS pos,
       tok || ' ' || lead(tok) OVER (PARTITION BY doc_id ORDER BY pos) AS bigram
FROM toks
QUALIFY bigram IS NOT NULL
""",
)
def q_udtf_bigrams(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U4: Python UDTF (Spark >= 3.5) — one input row expands to many
    output rows (text -> position-stamped bigrams), the table-function
    analog of posexplode for logic explode can't express.

    Runs per-row in a Python worker; the equivalent built-in pipeline
    (split + posexplode + window lead) is preferred on a hot path — the
    oracle is exactly that pipeline in SQL.
    """
    from pyspark.sql.functions import lit, udtf

    @udtf(returnType="doc_id bigint, pos int, bigram string")
    class Bigrams:
        def eval(self, doc_id: int, text: str):  # noqa: ANN001
            if text is None:
                return
            toks = text.split(" ")
            for i in range(len(toks) - 1):
                yield doc_id, i + 1, toks[i] + " " + toks[i + 1]

    spark.udtf.register("cb_bigrams", Bigrams)
    load_table(spark, sf_dir, "documents").createOrReplaceTempView("cb_documents")
    return spark.sql(
        "SELECT b.doc_id, b.pos, b.bigram "
        "FROM cb_documents d, LATERAL cb_bigrams(d.doc_id, d.text) b"
    )
