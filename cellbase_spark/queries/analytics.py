"""Product-analytics operators over ``events``/``orders`` (SURVEY.md §2
extensions A10-A12): ordered funnel analysis, retention cohorts, and
equi-depth histograms — the classic event-analytics battery a cellbase
user graduating to an analytics engine expects.

Scale notes: the funnel is the textbook one-shuffle design (collect each
user's events once, fold the step machine over the sorted array) instead
of one join per funnel step; retention is two hash aggs + a per-user
broadcast join; the histogram's global ntile is the exact form of what
approx_percentile boundaries replace at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cellbase_spark.io import load_table
from cellbase_spark.registry import register


@register(
    "q_funnel",
    family="analytics",
    oracle="""
WITH u AS (SELECT DISTINCT user_id FROM events),
v AS (SELECT user_id, MIN(ts) AS vt FROM events WHERE event_type = 'view' GROUP BY 1),
c AS (SELECT e.user_id, MIN(e.ts) AS ct
      FROM events e JOIN v ON e.user_id = v.user_id AND e.ts > v.vt
      WHERE e.event_type = 'click' GROUP BY 1),
p AS (SELECT e.user_id, MIN(e.ts) AS pt
      FROM events e JOIN c ON e.user_id = c.user_id AND e.ts > c.ct
      WHERE e.event_type = 'purchase' GROUP BY 1)
SELECT u.user_id, v.vt AS view_ts, c.ct AS click_ts, p.pt AS purchase_ts,
       (CASE WHEN v.vt IS NULL THEN 0 WHEN c.ct IS NULL THEN 1
             WHEN p.pt IS NULL THEN 2 ELSE 3 END) AS funnel_depth
FROM u LEFT JOIN v ON u.user_id = v.user_id
       LEFT JOIN c ON u.user_id = c.user_id
       LEFT JOIN p ON u.user_id = p.user_id
""",
)
def q_funnel(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered 3-step funnel (view -> click -> purchase): per user, the
    first view, the first click strictly after it, and the first purchase
    strictly after that, plus the reached depth.

    ONE shuffle total: collect each user's (ts, type) events, sort the
    array, and fold a 3-state step machine over it — versus the oracle's
    one-join-per-step algebra (which at 100 TB would shuffle the events
    table once per funnel step). Adding a step here is one more branch in
    the fold, not another join. Funnels over long histories: cap the
    collected array with a time-window filter first."""
    ev = load_table(spark, sf_dir, "events")
    per_user = ev.groupBy("user_id").agg(
        F.sort_array(F.collect_list(F.struct("ts", "event_type"))).alias("evs")
    )
    fold = F.expr(
        """aggregate(
  evs,
  struct(cast(null as timestamp) AS vt, cast(null as timestamp) AS ct,
         cast(null as timestamp) AS pt),
  (s, e) -> CASE
    WHEN e.event_type = 'view' AND s.vt IS NULL
      THEN struct(e.ts AS vt, s.ct AS ct, s.pt AS pt)
    WHEN e.event_type = 'click' AND s.ct IS NULL AND s.vt IS NOT NULL AND e.ts > s.vt
      THEN struct(s.vt AS vt, e.ts AS ct, s.pt AS pt)
    WHEN e.event_type = 'purchase' AND s.pt IS NULL AND s.ct IS NOT NULL AND e.ts > s.ct
      THEN struct(s.vt AS vt, s.ct AS ct, e.ts AS pt)
    ELSE s END)"""
    )
    out = per_user.select("user_id", fold.alias("f")).select(
        "user_id",
        F.col("f.vt").alias("view_ts"),
        F.col("f.ct").alias("click_ts"),
        F.col("f.pt").alias("purchase_ts"),
        F.when(F.col("f.vt").isNull(), 0)
        .when(F.col("f.ct").isNull(), 1)
        .when(F.col("f.pt").isNull(), 2)
        .otherwise(3)
        .alias("funnel_depth"),
    )
    return out


@register(
    "q_retention",
    family="analytics",
    oracle="""
WITH cohort AS (
  SELECT user_id, date_trunc('day', MIN(ts)) AS cohort_day FROM events GROUP BY 1
), act AS (
  SELECT DISTINCT user_id, date_trunc('day', ts) AS d FROM events
)
SELECT c.cohort_day, date_diff('day', c.cohort_day, a.d) AS day_offset,
       COUNT(*) AS n_users
FROM act a JOIN cohort c ON a.user_id = c.user_id
GROUP BY 1, 2
""",
)
def q_retention(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Retention cohort grid: users bucketed by first-seen day, counted on
    every later active day as an offset from their cohort. Two hash aggs
    (first-seen per user; distinct user-days) + a join on user_id; the
    cohort side is one row per user, so at scale it broadcasts or
    co-partitions with the activity agg (both keyed by user_id — Spark
    reuses the exchange)."""
    ev = load_table(spark, sf_dir, "events")
    cohort = ev.groupBy("user_id").agg(
        F.date_trunc("day", F.min("ts")).alias("cohort_day")
    )
    act = ev.select(
        "user_id", F.date_trunc("day", F.col("ts")).alias("d")
    ).distinct()
    return (
        act.join(cohort, "user_id")
        .groupBy("cohort_day", F.datediff(F.col("d"), F.col("cohort_day")).alias("day_offset"))
        .agg(F.count(F.lit(1)).alias("n_users"))
    )


@register(
    "q_histogram_equidepth",
    family="analytics",
    oracle="""
WITH t AS (
  SELECT o_totalprice,
         ntile(10) OVER (ORDER BY o_totalprice, o_orderkey) AS decile
  FROM orders
)
SELECT decile, COUNT(*) AS n,
       MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
FROM t GROUP BY decile
""",
)
def q_histogram_equidepth(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth (decile) histogram of order value: exact ntile over the
    global order (ties broken by key so both engines split identically),
    then per-bucket count/min/max. The exact global sort is the toy-SF
    form; at 100 TB the same output comes from approx_percentile
    boundaries (q_agg_approx_percentile) + one hash agg over
    width_bucket-style assignment — swap noted here so the intent is
    pinned."""
    o = load_table(spark, sf_dir, "orders")
    w = Window.orderBy("o_totalprice", "o_orderkey")
    return (
        o.select("o_totalprice", F.ntile(10).over(w).alias("decile"))
        .groupBy("decile")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.min("o_totalprice").alias("lo"),
            F.max("o_totalprice").alias("hi"),
        )
    )


@register(
    "q_copurchase_lift",
    family="analytics",
    oracle="""
WITH op AS (
  SELECT DISTINCT l_orderkey, l_partkey FROM lineitem
), pair AS (
  SELECT a.l_partkey AS p1, b.l_partkey AS p2, COUNT(*) AS n_pair
  FROM op a JOIN op b
    ON a.l_orderkey = b.l_orderkey AND a.l_partkey < b.l_partkey
  GROUP BY a.l_partkey, b.l_partkey
), marg AS (
  SELECT l_partkey, COUNT(*) AS n_part FROM op GROUP BY l_partkey
), total AS (
  SELECT COUNT(DISTINCT l_orderkey) AS n_orders FROM op
)
SELECT pair.p1, pair.p2, pair.n_pair,
       round(CAST(pair.n_pair * total.n_orders AS DOUBLE)
             / CAST(m1.n_part * m2.n_part AS DOUBLE), 6) AS lift
FROM pair
JOIN marg m1 ON pair.p1 = m1.l_partkey
JOIN marg m2 ON pair.p2 = m2.l_partkey
CROSS JOIN total
WHERE pair.n_pair >= 2
ORDER BY lift DESC, pair.p1 ASC, pair.p2 ASC
LIMIT 20
""",
)
def q_copurchase_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket co-occurrence with lift: part pairs appearing in the
    same order, scored by lift = P(p1,p2) / (P(p1)P(p2)) — the
    association-rule mining shape (frequent-pair pass of Apriori).

    Scale shape: the self-join is keyed by l_orderkey, so the pair
    fan-out is bounded by lines-per-order (<= 17 here, so <= 136 pairs
    per order — never quadratic in the table); pair counts shuffle one
    row per distinct pair; the marginal joins are part-cardinality-sized
    shuffle joins (size-based planning decides broadcast, never forced —
    at 100 TB the part domain outgrows any broadcast); the 1-row total
    broadcasts. Integer counts; lift is a single IEEE division of two
    exact integer products, rounded at 6dp; full tie-break (p1, p2)."""
    li = load_table(spark, sf_dir, "lineitem")
    op = li.select("l_orderkey", "l_partkey").distinct()
    a = op.alias("a")
    b = op.alias("b")
    pair = (
        a.join(
            b,
            (F.col("a.l_orderkey") == F.col("b.l_orderkey"))
            & (F.col("a.l_partkey") < F.col("b.l_partkey")),
        )
        .groupBy(
            F.col("a.l_partkey").alias("p1"), F.col("b.l_partkey").alias("p2")
        )
        .agg(F.count(F.lit(1)).alias("n_pair"))
        .where(F.col("n_pair") >= 2)
    )
    marg = op.groupBy("l_partkey").agg(F.count(F.lit(1)).alias("n_part"))
    total = op.agg(F.countDistinct("l_orderkey").alias("n_orders"))
    return (
        pair.join(
            marg.select(
                F.col("l_partkey").alias("p1"), F.col("n_part").alias("n1")
            ),
            "p1",
        )
        .join(
            marg.select(
                F.col("l_partkey").alias("p2"), F.col("n_part").alias("n2")
            ),
            "p2",
        )
        .crossJoin(F.broadcast(total))
        .select(
            "p1",
            "p2",
            "n_pair",
            F.round(
                (F.col("n_pair") * F.col("n_orders")).cast("double")
                / (F.col("n1") * F.col("n2")).cast("double"),
                6,
            ).alias("lift"),
        )
        .orderBy(F.col("lift").desc(), F.col("p1").asc(), F.col("p2").asc())
        .limit(20)
    )


@register(
    "q_event_transitions",
    family="analytics",
    oracle="""
WITH seq AS (
  SELECT user_id, event_type,
         LEAD(event_type) OVER (PARTITION BY user_id
                                ORDER BY ts, event_id) AS next_type
  FROM events
)
SELECT event_type, next_type, COUNT(*) AS n
FROM seq
WHERE next_type IS NOT NULL
GROUP BY event_type, next_type
""",
)
def q_event_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order event-transition matrix (Markov counts): for every
    user's time-ordered event stream, count each consecutive
    (event_type -> next event_type) pair — the session-flow /
    next-action model behind funnel diagnosis and behavioral anomaly
    detection.

    Scale shape: ONE user-keyed shuffle for the lead() window (per-user
    state only — no self-join on time), then a 25-cell (5x5 types) hash
    agg whose shuffle carries one row per transition pair per map task.
    Determinism: ties in ts break on the unique event_id in both
    engines."""
    ev = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    seq = ev.select(
        "event_type", F.lead("event_type").over(w).alias("next_type")
    ).where(F.col("next_type").isNotNull())
    return seq.groupBy("event_type", "next_type").agg(
        F.count(F.lit(1)).alias("n")
    )


@register(
    "q_sessionize_batch",
    family="analytics",
    oracle="""
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
), s AS (
  SELECT user_id, ts, event_id,
         SUM(is_new) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM g
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_s
FROM s
GROUP BY user_id, session_seq
""",
)
def q_sessionize_batch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Batch gap-based sessionization (30-min inactivity gap) — the
    backfill/replay counterpart of the streaming session window (T3):
    lag to mark session starts, running sum to number them, one agg for
    per-session stats. The canonical funnel/retention preprocessing op.

    Scale shape: the lag mark and the running-sum numbering ride the
    SAME (user_id)-partitioned sort — ONE exchange for both window
    passes — and the session agg re-keys on (user_id, session_seq),
    which AQE coalesces; no self-join, no single-partition window.
    Determinism: (ts, event_id) is a total order per user; the gap
    predicate subtracts the NTZ timestamps into a DayTimeInterval and
    compares against INTERVAL 30 MINUTE — exact integer MICROSECOND
    math matching the oracle's ``ts - LAG(ts) > INTERVAL 30 MINUTE``
    (the earlier unix_timestamp form floored to whole seconds and
    merged sessions whose true gap fell in (1800s, 1801s]); duration_s
    stays unix_timestamp to match DuckDB's date_diff('second')
    boundary counting."""
    e = load_table(spark, sf_dir, "events")
    w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    g = e.select(
        "user_id",
        "ts",
        "event_id",
        F.when(
            F.lag("ts").over(w).isNull()
            | ((F.col("ts") - F.lag("ts").over(w)) > F.expr("INTERVAL 30 MINUTE")),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    s = g.select(
        "user_id",
        "ts",
        "event_id",
        F.sum("is_new")
        .over(w.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_seq"),
    )
    return s.groupBy("user_id", "session_seq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("session_start"),
        F.max("ts").alias("session_end"),
        (F.unix_timestamp(F.max("ts")) - F.unix_timestamp(F.min("ts"))).alias(
            "duration_s"
        ),
    )


@register(
    "q_sessionize_twophase",
    family="analytics",
    oracle="""
WITH g AS (
  SELECT user_id, ts, event_id,
         CASE WHEN ts - LAG(ts) OVER (PARTITION BY user_id
                                      ORDER BY ts, event_id)
                   > INTERVAL 30 MINUTE
              OR LAG(ts) OVER (PARTITION BY user_id
                               ORDER BY ts, event_id) IS NULL
              THEN 1 ELSE 0 END AS is_new
  FROM events
), s AS (
  SELECT user_id, ts, event_id,
         SUM(is_new) OVER (PARTITION BY user_id
                           ORDER BY ts, event_id
                           ROWS UNBOUNDED PRECEDING) AS session_seq
  FROM g
)
SELECT user_id, CAST(session_seq AS BIGINT) AS session_seq, COUNT(*) AS n_events,
       MIN(ts) AS session_start, MAX(ts) AS session_end,
       CAST(date_diff('second', MIN(ts), MAX(ts)) AS BIGINT) AS duration_s
FROM s
GROUP BY user_id, session_seq
""",
)
def q_sessionize_twophase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """q_sessionize_batch's SKEW-PROOF form, same result and SAME oracle:
    a mega-user funnels the one-pass algorithm through a single window
    task (per-user sequential scan is inherent to gap sessionization).
    Two-phase fix: (1) sessionize within (user, day) chunks — the window
    parallelism becomes users x days, so one user's years of events
    spread across hundreds of tasks; (2) the per-chunk sessions collapse
    to INTERVAL rows (start, end, n_events), and the same gap rule
    re-runs on those intervals per user — a second pass over a frame
    that is smaller by the average session size (at 100 TB: billions of
    events -> millions of intervals). Merging is exact: within-chunk
    gaps were already closed, and a cross-boundary gap <= 30 min merges
    the adjacent intervals precisely where the one-pass algorithm would
    have continued the session. Ordering ties carry (ts, event_id)
    through both passes, so numbering matches the one-pass output
    row-for-row (differential property test in tests/test_properties.py)."""
    e = load_table(spark, sf_dir, "events").select(
        "user_id", "ts", "event_id", F.to_date("ts").alias("chunk")
    )
    w1 = Window.partitionBy("user_id", "chunk").orderBy("ts", "event_id")
    g = e.select(
        "user_id",
        "ts",
        "event_id",
        "chunk",
        F.when(
            F.lag("ts").over(w1).isNull()
            | ((F.col("ts") - F.lag("ts").over(w1)) > F.expr("INTERVAL 30 MINUTE")),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    s1 = g.select(
        "user_id",
        "ts",
        "event_id",
        "chunk",
        F.sum("is_new")
        .over(w1.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("cseq"),
    )
    intervals = s1.groupBy("user_id", "chunk", "cseq").agg(
        F.count(F.lit(1)).alias("n_events"),
        F.min("ts").alias("s_start"),
        F.max("ts").alias("s_end"),
        F.min("event_id").alias("first_eid"),
    )
    # phase 2: the same gap rule over the reduced interval rows
    w2 = Window.partitionBy("user_id").orderBy("s_start", "first_eid")
    g2 = intervals.select(
        "user_id",
        "n_events",
        "s_start",
        "s_end",
        "first_eid",
        F.when(
            F.lag("s_end").over(w2).isNull()
            | (
                (F.col("s_start") - F.lag("s_end").over(w2))
                > F.expr("INTERVAL 30 MINUTE")
            ),
            1,
        )
        .otherwise(0)
        .alias("is_new"),
    )
    s2 = g2.select(
        "user_id",
        "n_events",
        "s_start",
        "s_end",
        F.sum("is_new")
        .over(w2.rowsBetween(Window.unboundedPreceding, Window.currentRow))
        .alias("session_seq"),
    )
    return s2.groupBy("user_id", "session_seq").agg(
        F.sum("n_events").alias("n_events"),
        F.min("s_start").alias("session_start"),
        F.max("s_end").alias("session_end"),
        (
            F.unix_timestamp(F.max("s_end")) - F.unix_timestamp(F.min("s_start"))
        ).alias("duration_s"),
    )
