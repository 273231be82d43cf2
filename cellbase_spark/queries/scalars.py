"""Scalar function battery (SURVEY.md §2.7 F1-F7).

The reference defers all scalar work to user GDScript; here every function
is a Spark built-in (JVM-side, whole-stage-codegen'd — zero Python in the
row path). Oracle SQL bridges the dialect gaps probed empirically:

- DuckDB CAST(double AS INT) ROUNDS, Spark truncates -> oracle uses TRUNC.
- DuckDB ceil/floor return DECIMAL, Spark LONG -> oracle casts to BIGINT.
- DuckDB date_trunc/last_day return DATE, Spark TIMESTAMP/DATE -> compare
  as VARCHAR (DATE values render differently through pandas).
- DuckDB dayofweek is 0=Sunday, Spark 1=Sunday -> +1.
- No pmod in DuckDB -> ((a % b) + b) % b.
- libm functions (exp/log/pow) may differ by ulps between JVM and C ->
  ROUND(..., 6); sqrt is IEEE-correctly-rounded -> raw.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from cellbase_spark.io import load_table
from cellbase_spark.registry import register


@register(
    "q_fn_string",
    family="function",
    oracle="""
SELECT c_custkey,
       upper(c_mktsegment) AS seg_up,
       lower(c_name) AS name_lo,
       trim(concat('  ', c_name, ' ')) AS trimmed,
       substring(c_name, 1, 8) AS prefix,
       concat_ws('|', c_mktsegment, c_name) AS joined,
       string_split(c_name, '#')[2] AS id_part,
       length(c_name) AS name_len,
       regexp_extract(c_name, '#(0*)([1-9][0-9]*)', 2) AS id_digits,
       regexp_replace(c_name, '0+', '0', 'g') AS squeezed,
       lpad(CAST(c_nationkey AS VARCHAR), 4, '0') AS nk_pad,
       instr(c_name, '#') AS hash_pos
FROM customer
""",
)
def q_fn_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """String family: upper/lower/trim/substring/concat_ws/split/length/
    regexp_extract/regexp_replace/lpad/instr."""
    c = load_table(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_mktsegment").alias("seg_up"),
        F.lower("c_name").alias("name_lo"),
        F.trim(F.concat(F.lit("  "), F.col("c_name"), F.lit(" "))).alias("trimmed"),
        F.substring("c_name", 1, 8).alias("prefix"),
        F.concat_ws("|", "c_mktsegment", "c_name").alias("joined"),
        F.element_at(F.split("c_name", "#"), 2).alias("id_part"),
        F.length("c_name").alias("name_len"),
        F.regexp_extract("c_name", "#(0*)([1-9][0-9]*)", 2).alias("id_digits"),
        F.regexp_replace("c_name", "0+", "0").alias("squeezed"),
        F.lpad(F.col("c_nationkey").cast("string"), 4, "0").alias("nk_pad"),
        F.instr("c_name", "#").alias("hash_pos"),
    )


@register(
    "q_fn_date",
    family="function",
    oracle="""
SELECT o_orderkey, o_orderdate,
       year(o_orderdate) AS yr,
       month(o_orderdate) AS mo,
       dayofmonth(o_orderdate) AS dom,
       dayofweek(o_orderdate) + 1 AS dow,
       CAST(date_trunc('month', o_orderdate) AS TIMESTAMP) AS month_start,
       CAST(CAST(o_orderdate AS DATE) + INTERVAL 30 DAY AS DATE)::VARCHAR AS plus30,
       datediff('day', CAST(o_orderdate AS DATE), DATE '2002-01-01') AS days_to_2002,
       CAST(last_day(o_orderdate) AS VARCHAR) AS month_end,
       CAST(epoch(o_orderdate) AS BIGINT) AS epoch_s
FROM orders
""",
)
def q_fn_date(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time family. DATE-typed results are compared as strings
    (pandas renders Spark dates and DuckDB dates differently); timestamps
    compare natively at us precision."""
    o = load_table(spark, sf_dir, "orders")
    d = F.col("o_orderdate")
    return o.select(
        "o_orderkey",
        "o_orderdate",
        F.year(d).alias("yr"),
        F.month(d).alias("mo"),
        F.dayofmonth(d).alias("dom"),
        F.dayofweek(d).alias("dow"),
        F.date_trunc("month", d).alias("month_start"),
        F.date_add(d.cast("date"), 30).cast("string").alias("plus30"),
        F.datediff(F.lit("2002-01-01").cast("date"), d.cast("date")).alias("days_to_2002"),
        F.last_day(d).cast("string").alias("month_end"),
        F.unix_timestamp(d).alias("epoch_s"),
    )


@register(
    "q_fn_math",
    family="function",
    oracle="""
SELECT p_partkey,
       round(p_retailprice / 7, 4) AS seventh,
       abs(p_retailprice - 1000) AS dist1k,
       CAST(ceil(p_retailprice) AS BIGINT) AS ceil_p,
       CAST(floor(p_retailprice) AS BIGINT) AS floor_p,
       round(pow(p_retailprice, 0.5), 6) AS pow_half,
       sqrt(p_retailprice) AS sqrt_p,
       round(ln(p_retailprice), 6) AS ln_p,
       round(exp(p_retailprice / 1000), 6) AS exp_scaled,
       ((p_size % 7) + 7) % 7 AS size_mod7,
       CAST(sign(p_retailprice - 1200) AS DOUBLE) AS sign_delta
FROM part
""",
)
def q_fn_math(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Math family; libm-backed fns rounded to 6dp (JVM vs C libm ulps),
    IEEE-exact ops (abs/sqrt/mod/sign) raw."""
    p = load_table(spark, sf_dir, "part")
    price = F.col("p_retailprice")
    return p.select(
        "p_partkey",
        F.round(price / 7, 4).alias("seventh"),
        F.abs(price - 1000).alias("dist1k"),
        F.ceil(price).alias("ceil_p"),
        F.floor(price).alias("floor_p"),
        F.round(F.pow(price, 0.5), 6).alias("pow_half"),
        F.sqrt(price).alias("sqrt_p"),
        F.round(F.log(price), 6).alias("ln_p"),
        F.round(F.exp(price / 1000), 6).alias("exp_scaled"),
        F.pmod(F.col("p_size"), 7).alias("size_mod7"),
        F.signum(price - 1200).alias("sign_delta"),
    )


@register(
    "q_fn_conditional",
    family="function",
    oracle="""
SELECT s_suppkey,
       CASE WHEN s_acctbal < 0 THEN 'debt'
            WHEN s_acctbal < 5000 THEN 'mid'
            ELSE 'rich' END AS band,
       coalesce(nullif(s_name, 'Supplier#000000001'), '<first>') AS name_or_tag,
       least(s_acctbal, 5000.0) AS capped,
       greatest(CAST(s_nationkey AS BIGINT), 10) AS nk_floor10,
       CAST(trunc(s_acctbal) AS BIGINT) AS bal_int,
       CAST(s_suppkey AS VARCHAR) AS key_str
FROM supplier
""",
)
def q_fn_conditional(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional/cast family: when/otherwise, coalesce+nullif, least/
    greatest, numeric + string casts. Spark's double->int cast truncates;
    the oracle spells TRUNC explicitly (DuckDB's cast rounds)."""
    s = load_table(spark, sf_dir, "supplier")
    bal = F.col("s_acctbal")
    return s.select(
        "s_suppkey",
        F.when(bal < 0, "debt").when(bal < 5000, "mid").otherwise("rich").alias("band"),
        F.coalesce(F.nullif(F.col("s_name"), F.lit("Supplier#000000001")), F.lit("<first>")).alias(
            "name_or_tag"
        ),
        F.least(bal, F.lit(5000.0)).alias("capped"),
        F.greatest(F.col("s_nationkey").cast("bigint"), F.lit(10).cast("bigint")).alias(
            "nk_floor10"
        ),
        bal.cast("long").alias("bal_int"),
        F.col("s_suppkey").cast("string").alias("key_str"),
    )


@register(
    "q_fn_array",
    family="function",
    oracle="""
SELECT vec_id, label,
       len(embedding) AS dim,
       CAST(embedding[1] AS DOUBLE) AS first_el,
       CAST(embedding[64] AS DOUBLE) AS last_el,
       len(list_filter(embedding, x -> x > 0)) AS n_pos,
       list_reduce(list_transform(embedding, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
                   (a, b) -> a + b) AS sq_norm,
       CAST(list_sort(embedding)[64] AS DOUBLE) AS max_el
FROM embeddings
""",
)
def q_fn_array(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Array + higher-order functions on the embedding column: size,
    element_at, filter, transform, aggregate (sequential fold -> identical
    IEEE order in both engines -> exact match), sort_array.

    This is the scale path for vector math: higher-order fns run inside
    codegen on the JVM — no Python, no explode, no shuffle.
    """
    e = load_table(spark, sf_dir, "embeddings")
    emb = F.col("embedding")
    return e.select(
        "vec_id",
        "label",
        F.size(emb).alias("dim"),
        F.element_at(emb, 1).cast("double").alias("first_el"),
        F.element_at(emb, 64).cast("double").alias("last_el"),
        F.size(F.filter(emb, lambda x: x > 0)).alias("n_pos"),
        F.aggregate(
            F.transform(emb, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        ).alias("sq_norm"),
        F.element_at(F.sort_array(emb), 64).cast("double").alias("max_el"),
    )


@register(
    "q_fn_struct",
    family="function",
    oracle="""
SELECT n_nationkey,
       struct_pack(key := n_nationkey, name := n_name).name AS s_name,
       struct_pack(key := n_nationkey, name := n_name).key * 2 AS s_key2,
       array_to_string(map_keys(MAP {'nation': n_name, 'region': CAST(n_regionkey AS VARCHAR)}), ',') AS mkeys,
       (MAP {'nation': n_name, 'region': CAST(n_regionkey AS VARCHAR)}['nation'])[1] AS mval
FROM nation
""",
)
def q_fn_struct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Struct/map construction + field access; outputs are extracted
    scalars so the comparison is representation-independent."""
    n = load_table(spark, sf_dir, "nation")
    st = F.struct(F.col("n_nationkey").alias("key"), F.col("n_name").alias("name"))
    mp = F.create_map(
        F.lit("nation"), F.col("n_name"), F.lit("region"), F.col("n_regionkey").cast("string")
    )
    return n.select(
        "n_nationkey",
        st.getField("name").alias("s_name"),
        (st.getField("key") * 2).alias("s_key2"),
        F.array_join(F.map_keys(mp), ",").alias("mkeys"),
        F.element_at(mp, F.lit("nation")).alias("mval"),
    )


@register(
    "q_json_extract",
    family="function",
    oracle="""
SELECT event_id,
       CAST(json_extract_string(props, '$.k') AS INTEGER) AS k_int,
       json_extract_string(props, '$.missing') AS missing,
       (CAST(json_extract_string(props, '$.k') AS INTEGER) > 50) AS k_gt50
FROM events
""",
)
def q_json_extract(spark: SparkSession, sf_dir: str) -> DataFrame:
    """JSON-in-a-cell projection (events.props): get_json_object — the
    engine's reading of the reference's 'script parses JSON from a cell
    itself' pattern, kept as a codegen'd JVM path."""
    e = load_table(spark, sf_dir, "events")
    k = F.get_json_object("props", "$.k").cast("int")
    return e.select(
        "event_id",
        k.alias("k_int"),
        F.get_json_object("props", "$.missing").alias("missing"),
        (k > 50).alias("k_gt50"),
    )


# Soundex-style consonant classes, identically spelled in both engines via
# translate(). Letters -> digit classes; vowels/h/w/y -> 0 (dropped later).
_SDX_FROM = "BFPVCGJKQSXZDTLMNRAEIOUYHW"
_SDX_TO = "11112222222233455600000000"


@register(
    "q_phonetic_key",
    family="scalar",
    oracle=f"""
WITH tok AS (
  SELECT UPPER(string_split(text, ' ')[1]) AS t FROM documents
),
keyed AS (
  SELECT t,
         SUBSTRING(t, 1, 1) ||
         RPAD(SUBSTRING(REPLACE(
             REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(REGEXP_REPLACE(
             REGEXP_REPLACE(REGEXP_REPLACE(
               TRANSLATE(SUBSTRING(t, 2), '{_SDX_FROM}', '{_SDX_TO}'),
             '1+', '1', 'g'), '2+', '2', 'g'), '3+', '3', 'g'),
             '4+', '4', 'g'), '5+', '5', 'g'), '6+', '6', 'g'),
           '0', ''), 1, 3), 3, '0') AS pkey
  FROM tok
)
SELECT pkey, COUNT(*) AS n_docs,
       array_to_string(list_sort(list(DISTINCT t)), ',') AS words
FROM keyed GROUP BY pkey
""",
)
def q_phonetic_key(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Phonetic blocking key (Soundex variant, L37): first-letter +
    3-digit consonant-class code, built ONLY from engine-portable
    primitives — translate / per-class regexp run-collapse (DuckDB's RE2
    has no backreferences, so runs collapse class-by-class) / rpad.
    Native soundex() exists in Spark but not DuckDB; spelling the algebra
    out keeps the oracle exact AND keeps the whole key inside JVM codegen
    (zero Python). The fuzzy-match use: group/block candidate names by
    pkey before an expensive pairwise metric — at 100 TB this is the
    shuffle-key that turns O(n^2) matching into per-block work.

    `words` is emitted as a comma-joined string, not array<string>: the
    driver's canonicalizer sort_values over an object column of ndarrays
    raises `unhashable type: 'numpy.ndarray'` (round-2 ERR)."""
    d = load_table(spark, sf_dir, "documents")
    t = F.upper(F.split(F.col("text"), " ").getItem(0))
    tail = F.expr(
        f"translate(substring(upper(split(text, ' ')[0]), 2), "
        f"'{_SDX_FROM}', '{_SDX_TO}')"
    )
    for d_ in "123456":
        tail = F.regexp_replace(tail, d_ + "+", d_)
    code = F.rpad(F.substring(F.replace(tail, F.lit("0"), F.lit("")), 1, 3), 3, "0")
    return (
        d.select(t.alias("t"), F.concat(F.substring(t, 1, 1), code).alias("pkey"))
        .groupBy("pkey")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.array_join(F.sort_array(F.collect_set("t")), ",").alias("words"),
        )
    )


@register(
    "q_map_functions",
    family="scalar",
    oracle="""
WITH cnt AS (
  SELECT user_id, event_type,
         COUNT(*) AS c,
         COUNT(DISTINCT DATE_TRUNC('day', ts)) AS d
  FROM events GROUP BY user_id, event_type
)
SELECT user_id, event_type, CAST(c * 10 + d AS BIGINT) AS score
FROM cnt WHERE c * 10 + d >= 25
""",
)
def q_map_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface battery (F6 upgrade): per-user maps
    event_type -> count and event_type -> active-days are built with
    map_from_entries over order-stabilized entry lists, combined with
    map_zip_with (same key set by construction), thresholded with
    map_filter, then exploded back to rows. The relational oracle proves
    the map algebra is semantics-preserving — the map hop costs no extra
    shuffle (one user-keyed agg in, one explode out), and all four map
    higher-order functions stay JVM-side."""
    e = load_table(spark, sf_dir, "events")
    per_type = e.groupBy("user_id", "event_type").agg(
        F.count(F.lit(1)).alias("c"),
        F.countDistinct(F.date_trunc("day", F.col("ts"))).alias("d"),
    )
    maps = per_type.groupBy("user_id").agg(
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "c")))
        ).alias("m_cnt"),
        F.map_from_entries(
            F.sort_array(F.collect_list(F.struct("event_type", "d")))
        ).alias("m_days"),
    )
    scored = maps.select(
        "user_id",
        F.map_filter(
            F.map_zip_with("m_cnt", "m_days", lambda k, c, d: c * 10 + d),
            lambda k, v: v >= 25,
        ).alias("m_score"),
    )
    ex = scored.select("user_id", F.explode("m_score").alias("event_type", "score"))
    return ex.select("user_id", "event_type", "score")


@register(
    "q_json_variant",
    family="scalar",
    oracle="""
SELECT event_type,
       COUNT(*) AS n,
       CAST(SUM(CAST(json_extract_string(props, '$.k') AS INT)) AS BIGINT) AS sum_k,
       MIN(CAST(json_extract_string(props, '$.k') AS INT)) AS min_k,
       MAX(CAST(json_extract_string(props, '$.k') AS INT)) AS max_k
FROM events
GROUP BY event_type
""",
)
def q_json_variant(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured processing through Spark 4's VARIANT type:
    `parse_json` shreds the JSON once into the binary variant encoding,
    then typed `variant_get` paths extract without re-parsing — the
    engine-native path for JSON-heavy event tables (vs per-expression
    string re-parsing with get_json_object, cf. q_json_extract).

    Scale: parse + extract are narrow per-row kernels ahead of one
    two-phase hash agg; at 100 TB the variant binary columnar layout
    (and shredded parquet variant subcolumns) replaces repeated string
    JSON scans. Integer sums — exact, no float rounding needed."""
    ev = load_table(spark, sf_dir, "events")
    k = F.expr("variant_get(parse_json(props), '$.k', 'int')")
    return (
        ev.select("event_type", k.alias("k"))
        .groupBy("event_type")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("k").alias("sum_k"),
            F.min("k").alias("min_k"),
            F.max("k").alias("max_k"),
        )
    )
