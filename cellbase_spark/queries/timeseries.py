"""Time-series / temporal-table operators over ``events`` (SURVEY.md §2
extensions T7-T10: gap-filled resampling, SCD-2 interval reconstruction,
per-group linear regression, robust MAD outlier detection).

The reference (imjp94/cellbase) stores rows with no temporal operators at
all (SURVEY.md §1.2 — tables are static spreadsheets); everything here is
a north-star extension expressed with built-in Spark SQL only.

Determinism notes (registry header rules):
- money/value sums go through DECIMAL(18,2) then one rounded cast to
  double, so partial-aggregation order can't change the result;
- the regression works on integer hour offsets and decimal sums small
  enough that every intermediate double is exact (< 2^53);
- the MAD pipeline scales values to integer cents so interpolated
  medians land on exact binary fractions (.5 / .25 steps) in both
  engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from cellbase_spark.io import load_table
from cellbase_spark.registry import register


def _decimal_sum(col: F.Column, scale: int = 2) -> F.Column:
    """Order-independent sum of a double column: exact decimal accumulate,
    round, one cast back to double."""
    return F.round(F.sum(col.cast("decimal(18,2)")), scale).cast("double")


@register(
    "q_gap_fill",
    family="timeseries",
    oracle="""
WITH hourly AS (
  SELECT event_type, date_trunc('hour', ts) AS hour,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS hour_sum
  FROM events GROUP BY 1, 2
), bounds AS (
  SELECT date_trunc('hour', MIN(ts)) AS lo, date_trunc('hour', MAX(ts)) AS hi FROM events
), spine AS (
  SELECT unnest(generate_series(lo, hi, INTERVAL 1 HOUR)) AS hour FROM bounds
), grid AS (
  SELECT t.event_type, s.hour
  FROM (SELECT DISTINCT event_type FROM events) t CROSS JOIN spine s
)
SELECT g.event_type, g.hour,
       COALESCE(LAST_VALUE(h.hour_sum IGNORE NULLS) OVER (
           PARTITION BY g.event_type ORDER BY g.hour
           ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW), 0.0) AS filled_sum,
       (h.hour_sum IS NULL) AS is_gap
FROM grid g LEFT JOIN hourly h ON g.event_type = h.event_type AND g.hour = h.hour
""",
)
def q_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hypertable-style gap-filled resample: hourly revenue per event_type
    on a dense hour spine, missing buckets forward-filled (LOCF).

    Plan shape: one hash-agg shuffle on (type, hour); the spine is a
    `sequence()` explode of a 1-row global min/max agg and the type list is
    a distinct over a low-cardinality column — both tiny, so the grid
    build and the grid⋈hourly join are broadcast-side at any scale. The
    fill itself is one window pass partitioned by event_type (at 100 TB:
    partition count = type cardinality × spine chunks; re-key the window by
    (type, day) and seed each day with the previous day's closing value if
    a single type's spine outgrows one task)."""
    ev = load_table(spark, sf_dir, "events")
    hourly = ev.groupBy(
        "event_type", F.date_trunc("hour", F.col("ts")).alias("hour")
    ).agg(_decimal_sum(F.col("value")).alias("hour_sum"))

    bounds = ev.agg(
        F.date_trunc("hour", F.min("ts")).alias("lo"),
        F.date_trunc("hour", F.max("ts")).alias("hi"),
    )
    spine = bounds.select(
        F.explode(F.sequence("lo", "hi", F.expr("interval 1 hour"))).alias("hour")
    )
    grid = ev.select("event_type").distinct().crossJoin(F.broadcast(spine))

    w = (
        Window.partitionBy("event_type")
        .orderBy("hour")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        grid.join(hourly, ["event_type", "hour"], "left")
        .select(
            "event_type",
            "hour",
            F.coalesce(
                F.last("hour_sum", ignorenulls=True).over(w), F.lit(0.0)
            ).alias("filled_sum"),
            F.col("hour_sum").isNull().alias("is_gap"),
        )
    )


@register(
    "q_scd2_intervals",
    family="timeseries",
    oracle="""
WITH ordered AS (
  SELECT user_id, event_type, ts,
         LAG(event_type) OVER (PARTITION BY user_id ORDER BY ts, event_id) AS prev_type
  FROM events
), flagged AS (
  SELECT user_id, event_type, ts,
         SUM(CASE WHEN prev_type IS NULL OR prev_type <> event_type THEN 1 ELSE 0 END)
             OVER (PARTITION BY user_id ORDER BY ts,
                   CASE WHEN prev_type IS NULL OR prev_type <> event_type THEN 0 ELSE 1 END,
                   event_type ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS run_id
  FROM ordered
), runs AS (
  SELECT user_id, run_id, MIN(event_type) AS state,
         MIN(ts) AS valid_from, COUNT(*) AS n_events
  FROM flagged GROUP BY user_id, run_id
)
SELECT user_id, state, valid_from,
       LEAD(valid_from) OVER (PARTITION BY user_id ORDER BY run_id) AS valid_to,
       n_events
FROM runs
""",
)
def q_scd2_intervals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SCD Type-2 interval reconstruction: collapse each user's event
    stream into runs of consecutive identical event_type and emit
    [valid_from, valid_to) validity intervals (valid_to = next run's
    start; NULL = current). Classic gaps-and-islands: lag -> change flag
    -> running sum as run id -> group -> lead.

    All three window passes share the user_id partitioning, so Spark
    plans ONE exchange on user_id and reuses it (check: a single
    Exchange under consecutive Window nodes in the plan). Scales as long
    as a single user's history fits a task — at 100 TB, bound it by
    sessionizing per (user, month) first."""
    ev = load_table(spark, sf_dir, "events")
    order_w = Window.partitionBy("user_id").orderBy("ts", "event_id")
    changed = (
        F.lag("event_type").over(order_w).isNull()
        | (F.lag("event_type").over(order_w) != F.col("event_type"))
    ).cast("int")
    # Running sum of change flags = run id. Order ties can't occur ((ts,
    # event_id) is unique) but the oracle's tie-break columns are mirrored
    # by construction: same frame, same inputs.
    run_w = (
        Window.partitionBy("user_id")
        .orderBy("ts", "event_id")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    runs = (
        ev.withColumn("chg", changed)
        .withColumn("run_id", F.sum("chg").over(run_w))
        .groupBy("user_id", "run_id")
        .agg(
            F.min("event_type").alias("state"),
            F.min("ts").alias("valid_from"),
            F.count(F.lit(1)).alias("n_events"),
        )
    )
    lead_w = Window.partitionBy("user_id").orderBy("run_id")
    return runs.select(
        "user_id",
        "state",
        "valid_from",
        F.lead("valid_from").over(lead_w).alias("valid_to"),
        "n_events",
    )


@register(
    "q_agg_regression",
    family="timeseries",
    oracle="""
WITH m AS (
  SELECT event_type,
         COUNT(*) AS n,
         CAST(SUM(hr) AS DOUBLE) AS sx,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sy,
         CAST(SUM(hr * hr) AS DOUBLE) AS sxx,
         CAST(ROUND(SUM(hr * CAST(value AS DECIMAL(18,2))), 2) AS DOUBLE) AS sxy,
         CAST(ROUND(SUM(CAST(value AS DECIMAL(18,2)) * CAST(value AS DECIMAL(18,2))), 4) AS DOUBLE) AS syy
  FROM (SELECT event_type, value,
               date_diff('hour', TIMESTAMP '2024-01-01 00:00:00', ts) AS hr
        FROM events)
  GROUP BY event_type
)
SELECT event_type, n,
       (n * sxy - sx * sy) / (n * sxx - sx * sx) AS slope_per_hour,
       (sy - (n * sxy - sx * sy) / (n * sxx - sx * sx) * sx) / n AS intercept,
       ((n * sxy - sx * sy) * (n * sxy - sx * sy))
         / ((n * sxx - sx * sx) * (n * syy - sy * sy)) AS r2
FROM m
""",
)
def q_agg_regression(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group closed-form OLS (value ~ hours since 2024-01-01), from
    five exact sufficient statistics + one fixed IEEE formula — the
    reproducible-aggregate pattern of q_agg_stats/q_agg_corr applied to
    regression (regr_slope/regr_intercept equivalents, but
    partitioning-independent, which the native streaming co-moment
    accumulators are not).

    Exactness: hr <= ~720 so sxx <= 5.2e10·n and every double here stays
    below 2^53 at bench scale; value sums are decimal-accumulated. One
    map-side-combinable hash agg, shuffles |event_type| rows."""
    ev = load_table(spark, sf_dir, "events")
    hr = F.floor(
        (F.unix_timestamp("ts") - F.unix_timestamp(F.lit("2024-01-01 00:00:00")))
        / 3600
    ).alias("hr")
    base = ev.select("event_type", F.col("value"), hr)
    dec = F.col("value").cast("decimal(18,2)")
    m = base.groupBy("event_type").agg(
        F.count(F.lit(1)).alias("n"),
        F.sum("hr").cast("double").alias("sx"),
        F.round(F.sum(dec), 2).cast("double").alias("sy"),
        F.sum(F.col("hr") * F.col("hr")).cast("double").alias("sxx"),
        F.round(F.sum(F.col("hr") * dec), 2).cast("double").alias("sxy"),
        F.round(F.sum(dec * dec), 4).cast("double").alias("syy"),
    )
    n, sx, sy = F.col("n"), F.col("sx"), F.col("sy")
    sxx, sxy, syy = F.col("sxx"), F.col("sxy"), F.col("syy")
    slope = (n * sxy - sx * sy) / (n * sxx - sx * sx)
    return m.select(
        "event_type",
        "n",
        slope.alias("slope_per_hour"),
        ((sy - slope * sx) / n).alias("intercept"),
        (
            ((n * sxy - sx * sy) * (n * sxy - sx * sy))
            / ((n * sxx - sx * sx) * (n * syy - sy * sy))
        ).alias("r2"),
    )


@register(
    "q_anomaly_mad",
    family="timeseries",
    oracle="""
WITH v AS (
  SELECT event_type, CAST(ROUND(value * 100) AS BIGINT) AS cents FROM events
), med AS (
  SELECT event_type, quantile_cont(cents, 0.5) AS med FROM v GROUP BY event_type
), dev AS (
  SELECT v.event_type, v.cents, ABS(v.cents - med.med) AS dev
  FROM v JOIN med ON v.event_type = med.event_type
), mad AS (
  SELECT event_type, quantile_cont(dev, 0.5) AS mad FROM dev GROUP BY event_type
)
SELECT dev.event_type,
       COUNT(*) AS n_total,
       CAST(SUM(CASE WHEN dev.dev > 3 * mad.mad THEN 1 ELSE 0 END) AS BIGINT) AS n_outliers,
       CAST(MAX(dev.dev) AS DOUBLE) AS max_dev_cents,
       CAST(mad.mad AS DOUBLE) AS mad_cents
FROM dev JOIN mad ON dev.event_type = mad.event_type
GROUP BY dev.event_type, mad.mad
""",
)
def q_anomaly_mad(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust outlier detection: per event_type median + MAD (median
    absolute deviation), flag |x - med| > 3·MAD. Values scaled to integer
    cents first, so the two interpolated medians land on exact .5/.25
    binary fractions and the 3·MAD threshold compare is bit-identical
    across engines — no epsilon.

    Two exact-percentile aggs + two broadcast joins of the per-type
    medians back onto the stream. At 100 TB swap `percentile` for
    `percentile_approx` (mergeable GK sketch, q_agg_approx_percentile)
    and keep the identical downstream algebra."""
    ev = load_table(spark, sf_dir, "events")
    v = ev.select(
        "event_type", F.round(F.col("value") * 100).cast("bigint").alias("cents")
    )
    med = v.groupBy("event_type").agg(F.expr("percentile(cents, 0.5)").alias("med"))
    dev = v.join(F.broadcast(med), "event_type").select(
        "event_type", F.abs(F.col("cents") - F.col("med")).alias("dev")
    )
    mad = dev.groupBy("event_type").agg(F.expr("percentile(dev, 0.5)").alias("mad"))
    return (
        dev.join(F.broadcast(mad), "event_type")
        .groupBy("event_type", "mad")
        .agg(
            F.count(F.lit(1)).alias("n_total"),
            F.sum((F.col("dev") > 3 * F.col("mad")).cast("bigint")).alias("n_outliers"),
            F.max("dev").cast("double").alias("max_dev_cents"),
        )
        .select(
            "event_type",
            "n_total",
            "n_outliers",
            "max_dev_cents",
            F.col("mad").cast("double").alias("mad_cents"),
        )
    )


@register(
    "q_ewma",
    family="timeseries",
    oracle="""
WITH ordered AS (
  SELECT user_id, list(value ORDER BY ts, event_id) AS vals
  FROM events GROUP BY user_id
)
SELECT user_id,
       list_reduce(CAST(vals AS DOUBLE[]),
                   (acc, x) -> 0.5 * acc + 0.5 * x) AS ewma
FROM ordered
""",
)
def q_ewma(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user exponentially-weighted moving average (T11), alpha = 0.5.
    EWMA is a sequential recurrence — not a windowable sum — so it runs
    as ONE ordered fold per key: collect the user's series sorted by
    (ts, event_id) and fold acc = 0.5*acc + 0.5*x left-to-right with
    Spark's aggregate() higher-order function (JVM codegen, no Python).
    alpha = 0.5 is an exact binary fraction and each fold step is a
    per-row IEEE op, so the result is BIT-identical to DuckDB's
    list_reduce replaying the same fold (both seed with element 1).
    At 100 TB: one shuffle on user_id; series length is bounded by
    per-user activity, not corpus size — skewed power-users are the
    AQE-skew case, not a plan change."""
    e = load_table(spark, sf_dir, "events")
    vals = F.transform(
        F.sort_array(F.collect_list(F.struct("ts", "event_id", "value"))),
        lambda s: s.value,
    )
    fold = F.aggregate(
        F.slice(F.col("vals"), 2, F.greatest(F.size("vals") - 1, F.lit(0))),
        F.col("vals").getItem(0).cast("double"),
        lambda acc, x: 0.5 * acc + 0.5 * x,
    )
    return (
        e.groupBy("user_id")
        .agg(vals.alias("vals"))
        .select("user_id", fold.alias("ewma"))
    )


@register(
    "q_max_concurrency",
    family="timeseries",
    oracle="""
WITH b AS (
  SELECT event_type, ts AS t, 1 AS delta FROM events
  UNION ALL
  SELECT event_type, ts + INTERVAL 10 MINUTE AS t, -1 AS delta FROM events
), r AS (
  SELECT event_type,
         SUM(delta) OVER (PARTITION BY event_type ORDER BY t, delta
                          ROWS UNBOUNDED PRECEDING) AS conc
  FROM b
)
SELECT event_type, CAST(MAX(conc) AS BIGINT) AS max_concurrent
FROM r GROUP BY event_type
""",
)
def q_max_concurrency(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Maximum interval overlap (peak concurrency) per event_type, each
    event occupying [ts, ts+10min): the classic boundary sweep — +1 at
    start, -1 at end, running sum, max — O(n log n) instead of the
    O(n^2) self-join a naive overlap count would do.

    Scale shape — TWO-PHASE SWEEP, no global single-partition window:
    phase 1 buckets boundaries by hour and computes each bucket's local
    running max and total delta in one hash-partitioned window pass
    (parallel across (event_type, hour)); phase 2 prefix-sums the
    BUCKET TOTALS (rows = #hours, thousands at 100 TB, not billions) to
    get each bucket's starting offset, then max(offset + local_max).
    The only ordered-by-time window runs over the tiny bucket summary.
    Tie semantics: ends (-1) sort before starts (+1) at equal t in both
    engines (delta ascending), so touching intervals don't overlap."""
    ev = load_table(spark, sf_dir, "events")
    starts = ev.select("event_type", F.col("ts").alias("t"), F.lit(1).alias("delta"))
    ends = ev.select(
        "event_type",
        (F.col("ts") + F.expr("INTERVAL 10 MINUTES")).alias("t"),
        F.lit(-1).alias("delta"),
    )
    b = starts.unionByName(ends).withColumn("bucket", F.date_trunc("hour", "t"))
    w_local = (
        Window.partitionBy("event_type", "bucket")
        .orderBy("t", "delta")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    local = (
        b.withColumn("run", F.sum("delta").over(w_local))
        .groupBy("event_type", "bucket")
        .agg(
            F.max("run").alias("local_max"),
            F.sum("delta").alias("total"),
        )
    )
    w_bucket = (
        Window.partitionBy("event_type")
        .orderBy("bucket")
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    return (
        local.withColumn("offset_after", F.sum("total").over(w_bucket))
        .withColumn("offset_before", F.col("offset_after") - F.col("total"))
        .groupBy("event_type")
        .agg(
            F.max(F.col("offset_before") + F.col("local_max")).alias(
                "max_concurrent"
            )
        )
    )
