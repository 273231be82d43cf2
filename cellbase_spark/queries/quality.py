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


@register(
    "q_winsorize",
    family="quality",
    oracle="""
WITH bounds AS (
  SELECT c_mktsegment,
         quantile_cont(c_acctbal, 0.05) AS p05,
         quantile_cont(c_acctbal, 0.95) AS p95
  FROM customer GROUP BY c_mktsegment
)
SELECT c.c_mktsegment,
       COUNT(*) AS n,
       CAST(SUM(CASE WHEN c.c_acctbal < b.p05 THEN 1 ELSE 0 END) AS BIGINT) AS n_low,
       CAST(SUM(CASE WHEN c.c_acctbal > b.p95 THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
       b.p05, b.p95,
       CAST(ROUND(SUM(CAST(
           least(greatest(c.c_acctbal, b.p05), b.p95) AS DECIMAL(25,10))), 4)
         AS DOUBLE) AS sum_winsorized
FROM customer c JOIN bounds b ON c.c_mktsegment = b.c_mktsegment
GROUP BY c.c_mktsegment, b.p05, b.p95
""",
)
def q_winsorize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group winsorization: clamp c_acctbal to the segment's
    [p05, p95] band and report per-segment clamp counts and the exact
    sum of the winsorized values — the outlier-robust normalization pass
    a feature/reward pipeline runs before training statistics.

    Scale shape: pass 1 computes exact per-segment percentiles (5 rows;
    at 100 TB swap `percentile` for approx_percentile — mergeable
    sketch, same plan); the 5-row bounds relation broadcasts back onto
    the fact scan; pass 2 is one conditional hash agg (partial+final).
    Determinism: both engines linearly interpolate the same order
    statistics bit-identically (cf. q_agg_median); min/max clamping is
    exact; the winsorized sum aggregates through DECIMAL (order-free)."""
    c = load_table(spark, sf_dir, "customer")
    bounds = c.groupBy("c_mktsegment").agg(
        F.expr("percentile(c_acctbal, 0.05)").alias("p05"),
        F.expr("percentile(c_acctbal, 0.95)").alias("p95"),
    )
    clamped = c.join(F.broadcast(bounds), "c_mktsegment").select(
        "c_mktsegment",
        "c_acctbal",
        "p05",
        "p95",
        F.least(F.greatest(F.col("c_acctbal"), F.col("p05")), F.col("p95")).alias(
            "wins"
        ),
    )
    return clamped.groupBy("c_mktsegment", "p05", "p95").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum(F.when(F.col("c_acctbal") < F.col("p05"), 1).otherwise(0)).alias(
            "n_low"
        ),
        F.sum(F.when(F.col("c_acctbal") > F.col("p95"), 1).otherwise(0)).alias(
            "n_high"
        ),
        F.round(F.sum(F.col("wins").cast("decimal(25,10)")), 4)
        .cast("double")
        .alias("sum_winsorized"),
    ).select("c_mktsegment", "n", "n_low", "n_high", "p05", "p95", "sum_winsorized")


@register(
    "q_data_card",
    family="quality",
    oracle="""
WITH sl AS (
  SELECT source, lang, COUNT(*) AS c FROM documents GROUP BY source, lang
), top AS (
  SELECT source, lang AS top_lang, c,
         ROW_NUMBER() OVER (PARTITION BY source ORDER BY c DESC, lang ASC) AS rk
  FROM sl
), agg AS (
  SELECT source,
         COUNT(*) AS n_docs,
         CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS total_tokens,
         CAST(SUM(n_chars) AS BIGINT) AS total_chars,
         COUNT(DISTINCT lang) AS n_langs
  FROM documents GROUP BY source
)
SELECT a.source, a.n_docs, a.total_tokens, a.total_chars, a.n_langs,
       t.top_lang, round(t.c / a.n_docs, 6) AS top_lang_share
FROM agg a JOIN top t ON a.source = t.source AND t.rk = 1
""",
)
def q_data_card(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source data card — the one-page curation summary shipped with
    a training mix: volume (docs/tokens/chars), language breadth, and
    dominance of the top language per source. Argmax ties break
    alphabetically (total order), so the card is deterministic.

    Scale shape: ONE source-keyed agg over the corpus (map-side
    partials) plus a (source,lang)-count frame whose cardinality is
    bounded by |sources| x |langs| — the ranking window runs on that
    tiny frame, never on the data."""
    from pyspark.sql import Window as W

    d = load_table(spark, sf_dir, "documents")
    sl = d.groupBy("source", "lang").agg(F.count(F.lit(1)).alias("c"))
    w = W.partitionBy("source").orderBy(F.col("c").desc(), F.col("lang").asc())
    top = (
        sl.withColumn("rk", F.row_number().over(w))
        .where(F.col("rk") == 1)
        .select("source", F.col("lang").alias("top_lang"), "c")
    )
    agg = d.groupBy("source").agg(
        F.count(F.lit(1)).alias("n_docs"),
        F.sum(F.size(F.split("text", " "))).alias("total_tokens"),
        F.sum("n_chars").alias("total_chars"),
        F.countDistinct("lang").alias("n_langs"),
    )
    return agg.join(top, "source").select(
        "source",
        "n_docs",
        "total_tokens",
        "total_chars",
        "n_langs",
        "top_lang",
        F.round(F.col("c") / F.col("n_docs"), 6).alias("top_lang_share"),
    )


@register(
    "q_zscore_normalize",
    family="quality",
    oracle="""
WITH u AS (
  SELECT c_custkey, c_mktsegment,
         CAST(CAST(c_acctbal AS DECIMAL(12,2)) * 100 AS BIGINT) AS cents
  FROM customer
), st AS (
  SELECT c_mktsegment,
         COUNT(*) AS n,
         CAST(SUM(cents) AS DOUBLE) AS s,
         CAST(SUM(CAST(cents * cents AS DECIMAL(38,0))) AS DOUBLE) AS sq
  FROM u GROUP BY c_mktsegment
)
SELECT u.c_custkey, u.c_mktsegment,
       round(CASE WHEN sq / n - (s / n) * (s / n) <= 0 THEN 0.0
                  ELSE (u.cents - s / n) / sqrt(sq / n - (s / n) * (s / n))
             END, 6) AS z
FROM u JOIN st ON u.c_mktsegment = st.c_mktsegment
""",
)
def q_zscore_normalize(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group feature standardization: z-score of c_acctbal within its
    market segment — the normalization pass feature/reward pipelines run
    before training, emitted per ROW (it rewrites the column, unlike
    q_winsorize's per-group report).

    Scale shape: ONE exact-moment agg (sum + sum-of-squares in fixed-
    point lanes: cents in a codegen LONG, squared cents through
    DECIMAL(38,0) so the lane never overflows at any scale), 5-row stats
    broadcast back onto the fact scan, then a narrow per-row map.
    Determinism: the moments are exact integers; mean/var/z replay the
    SAME IEEE expression tree in both engines (decimal->double is
    round-to-nearest in both; IEEE sqrt is correctly rounded), so the
    round(6) hash matches bit-for-bit."""
    c = load_table(spark, sf_dir, "customer")
    u = c.select(
        "c_custkey",
        "c_mktsegment",
        (F.col("c_acctbal").cast("decimal(12,2)") * 100).cast("bigint").alias("cents"),
    )
    st = u.groupBy("c_mktsegment").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("cents").cast("double").alias("s"),
        F.sum((F.col("cents") * F.col("cents")).cast("decimal(38,0)"))
        .cast("double")
        .alias("sq"),
    )
    j = u.join(F.broadcast(st), "c_mktsegment")
    mean = F.col("s") / F.col("n")
    var = F.col("sq") / F.col("n") - mean * mean
    z = F.when(var <= 0, F.lit(0.0)).otherwise(
        (F.col("cents") - mean) / F.sqrt(var)
    )
    return j.select("c_custkey", "c_mktsegment", F.round(z, 6).alias("z"))


@register(
    "q_k_anonymity",
    family="quality",
    oracle="""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
         COUNT(*) AS sz
  FROM customer
  GROUP BY 1, 2, 3
),
ks AS (SELECT UNNEST([2, 5, 10]) AS k)
SELECT CAST(k AS INTEGER) AS k,
       CAST(COALESCE(SUM(CASE WHEN sz < k THEN sz END), 0) AS BIGINT) AS at_risk_rows,
       CAST(COALESCE(SUM(CASE WHEN sz < k THEN 1 END), 0) AS BIGINT) AS at_risk_classes,
       CAST(COUNT(*) AS BIGINT) AS total_classes,
       round(COALESCE(SUM(CASE WHEN sz < k THEN sz END), 0)
             / (SELECT COUNT(*) FROM customer), 6) AS at_risk_frac
FROM classes, ks
GROUP BY k
""",
)
def q_k_anonymity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit — the privacy gate a training-data pipeline
    runs before release: group the table by its quasi-identifier tuple
    (nationality, market segment, account-balance band here) and, for
    each policy threshold k in {2, 5, 10}, report how many rows sit in
    equivalence classes smaller than k (re-identifiable under that
    policy), how many classes violate, and the at-risk row fraction.
    The pipeline response to a non-zero row is suppression or
    coarsening of the offending classes (the bal_band generalization
    IS one coarsening step).

    Scale shape: ONE groupBy over the quasi-identifiers (map-side
    combined; class count << row count), then a 3-way conditional agg
    over the class-size relation and a 1-row total broadcast — the
    table is read once regardless of how many k policies are audited."""
    c = load_table(spark, sf_dir, "customer")
    classes = (
        c.groupBy(
            "c_nationkey",
            "c_mktsegment",
            F.floor(F.col("c_acctbal") / 1000.0).cast("bigint").alias("bal_band"),
        )
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    total = c.agg(F.count(F.lit(1)).alias("_total"))
    ks = spark.range(1).select(
        F.explode(F.array(F.lit(2), F.lit(5), F.lit(10))).alias("k")
    )
    return (
        classes.crossJoin(F.broadcast(ks))
        .groupBy("k")
        .agg(
            F.coalesce(
                F.sum(F.when(F.col("sz") < F.col("k"), F.col("sz"))), F.lit(0)
            ).alias("at_risk_rows"),
            F.coalesce(
                F.sum(F.when(F.col("sz") < F.col("k"), F.lit(1))), F.lit(0)
            ).alias("at_risk_classes"),
            F.count(F.lit(1)).alias("total_classes"),
        )
        .crossJoin(F.broadcast(total))
        .select(
            F.col("k").cast("int").alias("k"),
            F.col("at_risk_rows").cast("bigint").alias("at_risk_rows"),
            F.col("at_risk_classes").cast("bigint").alias("at_risk_classes"),
            F.col("total_classes").cast("bigint").alias("total_classes"),
            F.round(F.col("at_risk_rows") / F.col("_total"), 6).alias("at_risk_frac"),
        )
    )


@register(
    "q_k_suppress",
    family="quality",
    oracle="""
WITH classes AS (
  SELECT c_nationkey, c_mktsegment,
         CAST(FLOOR(c_acctbal / 1000.0) AS BIGINT) AS bal_band,
         COUNT(*) AS sz
  FROM customer
  GROUP BY 1, 2, 3
)
SELECT c.c_custkey,
       CASE WHEN k.sz >= 5 THEN c.c_nationkey END AS nationkey_out,
       CASE WHEN k.sz >= 5 THEN c.c_mktsegment END AS mktsegment_out,
       CASE WHEN k.sz >= 5 THEN CAST(FLOOR(c.c_acctbal / 1000.0) AS BIGINT) END AS bal_band_out,
       CAST(k.sz < 5 AS BOOLEAN) AS suppressed
FROM customer c
JOIN classes k
  ON c.c_nationkey = k.c_nationkey AND c.c_mktsegment = k.c_mktsegment
 AND CAST(FLOOR(c.c_acctbal / 1000.0) AS BIGINT) = k.bal_band
""",
)
def q_k_suppress(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity ENFORCEMENT (k=5): the release-side verb behind
    q_k_anonymity's audit — every row whose quasi-identifier class
    holds fewer than 5 members gets its QI columns suppressed (NULLed),
    so the released table is 5-anonymous by construction (suppressed
    rows form one class of NULLs; surviving classes all have >= 5
    members).

    Scale shape: the class-size relation is bounded by QI cardinality
    (nations x segments x balance bands — config-scale, NOT row-scale),
    so the join back is a broadcast and the whole verb is one scan +
    one small agg + a map: no row-scale shuffle at any size."""
    c = load_table(spark, sf_dir, "customer")
    band = F.floor(F.col("c_acctbal") / 1000.0).cast("bigint")
    classes = (
        c.groupBy(
            F.col("c_nationkey").alias("_nk"),
            F.col("c_mktsegment").alias("_seg"),
            band.alias("_cband"),
        )
        .agg(F.count(F.lit(1)).alias("sz"))
    )
    ok = F.col("sz") >= 5
    return (
        c.withColumn("_band", band)
        .join(
            F.broadcast(classes),
            (F.col("c_nationkey") == F.col("_nk"))
            & (F.col("c_mktsegment") == F.col("_seg"))
            & (F.col("_band") == F.col("_cband")),
        )
        .select(
            "c_custkey",
            F.when(ok, F.col("c_nationkey")).alias("nationkey_out"),
            F.when(ok, F.col("c_mktsegment")).alias("mktsegment_out"),
            F.when(ok, F.col("_band")).alias("bal_band_out"),
            (~ok).alias("suppressed"),
        )
    )


@register(
    "q_quality_percentile_gate",
    family="quality",
    oracle="""
WITH q AS (
  SELECT doc_id, source,
         len(string_split(text, ' ')) AS n_tokens,
         0.4 * least(1.0, len(string_split(text, ' ')) / 50.0)
         + 0.3 * (1.0 - (length(text) - length(regexp_replace(text, '[0-9]', '', 'g')))
                        / length(text))
         + 0.3 * least(1.0, ((length(text) - (len(string_split(text, ' ')) - 1))
                             / len(string_split(text, ' '))) / 8.0) AS quality
  FROM documents
), r AS (
  SELECT *,
         ROW_NUMBER() OVER (PARTITION BY source
                            ORDER BY quality DESC, doc_id ASC) AS rn,
         COUNT(*) OVER (PARTITION BY source) AS cnt
  FROM q
)
SELECT source,
       CAST(MAX(cnt) AS BIGINT) AS n_total,
       CAST(COUNT(*) FILTER (WHERE rn <= CAST(ceil(cnt * 0.5) AS BIGINT))
            AS BIGINT) AS n_kept,
       CAST(SUM(n_tokens) FILTER (WHERE rn <= CAST(ceil(cnt * 0.5) AS BIGINT))
            AS BIGINT) AS kept_tokens,
       ROUND(MIN(quality) FILTER (WHERE rn <= CAST(ceil(cnt * 0.5) AS BIGINT)), 6)
         AS cutoff_quality
FROM r GROUP BY source
""",
)
def q_quality_percentile_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source TOP-50% quality gate — the relative form of corpus
    filtering (absolute thresholds like q_quality_gopher under-select
    clean sources and over-select noisy ones; production mixtures often
    keep the best X% of EACH source instead). Ranks every document
    within its source by the q_text_quality soft score (deterministic
    doc_id tiebreak), keeps rank <= ceil(n/2), and reports per source:
    total/kept counts, kept token mass, and the realized quality cutoff
    (the number that becomes next batch's absolute threshold).

    Scale shape: one scan computes the score (narrow, codegen'd); ONE
    shuffle keyed on source for the rank window + the same-keyed final
    agg (no second exchange — the window output is already hash-
    partitioned by source). A mega-source skews the per-source sort; at
    100 TB that is the documented two-phase sessionize-style rewrite
    (rank via distributed sort per key); here source cardinality is the
    report dimension, not a hot key."""
    from pyspark.sql import Window

    d = load_table(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    quality = (
        F.lit(0.4) * F.least(F.lit(1.0), F.size(toks) / F.lit(50.0))
        + F.lit(0.3)
        * (
            F.lit(1.0)
            - (F.length("text") - F.length(F.regexp_replace("text", "[0-9]", "")))
            / F.length("text")
        )
        + F.lit(0.3)
        * F.least(
            F.lit(1.0),
            ((F.length("text") - (F.size(toks) - F.lit(1))) / F.size(toks))
            / F.lit(8.0),
        )
    )
    q = d.select(
        "doc_id",
        "source",
        F.size(toks).alias("n_tokens"),
        quality.alias("quality"),
    )
    w = Window.partitionBy("source")
    r = q.select(
        "*",
        F.row_number()
        .over(w.orderBy(F.col("quality").desc(), F.col("doc_id").asc()))
        .alias("rn"),
        F.count(F.lit(1)).over(w).alias("cnt"),
    )
    kept = F.col("rn") <= F.ceil(F.col("cnt") * F.lit(0.5))
    return r.groupBy("source").agg(
        F.max("cnt").alias("n_total"),
        F.sum(F.when(kept, 1).otherwise(0)).alias("n_kept"),
        F.sum(F.when(kept, F.col("n_tokens"))).alias("kept_tokens"),
        F.round(F.min(F.when(kept, F.col("quality"))), 6).alias("cutoff_quality"),
    )
