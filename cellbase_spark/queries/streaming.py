"""Streaming-window queries (SURVEY.md §2.9 T1-T3, T5), batch-parity face.

The reference has no streams (SURVEY.md §1.2: "Not present in cellbase:
streams"); this family is the north-star extension, built on Spark's
unified batch/stream API: each transformation lives in
cellbase_spark.streaming.pipelines as a plain DataFrame->DataFrame
function, applied here to the *static* events table (the DuckDB-oracle
face) and in tests/test_streaming.py to a readStream file source with
watermarks (the true streaming face). The logical plan is identical; only
the sink/trigger differ — that's the point of Structured Streaming.

Oracle notes:
- events.ts is TIMESTAMP_NS parquet; both engines compare at us: Spark
  truncates on load (io.load_table), the oracle CASTs to TIMESTAMP.
- Sliding windows: an event at t belongs to exactly width/slide = 4
  windows whose starts are floor(t/slide)*slide - i*slide, i in 0..3 —
  the oracle generates them with an unnest cross join.
- Session windows: Spark's session_window(ts, gap) closes a session when
  the next event arrives >= gap after the previous one (end = last+gap);
  the oracle is the classic gaps-and-islands rewrite (lag -> new-session
  flag -> running sum as session id).
"""

from __future__ import annotations

import os
import re
import tempfile

from pyspark.sql import DataFrame, SparkSession

from cellbase_spark.functions.exact import dsum_sql
from cellbase_spark.io import load_table
from cellbase_spark.registry import register
from cellbase_spark.streaming import pipelines


@register(
    "q_stream_tumbling",
    family="stream",
    oracle=f"""
SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS wstart,
       event_type,
       COUNT(*) AS n,
       {dsum_sql('value', 'total', 4)}
FROM events
GROUP BY 1, 2
""",
)
def q_stream_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1: tumbling 1-hour window x event_type counts + exact sums.

    Streaming shape: state is one row per (window, type), evicted by the
    watermark — bounded memory on an unbounded stream; batch shape: plain
    partial+final hash-agg on (hour(ts), type).
    """
    return pipelines.tumbling_agg(load_table(spark, sf_dir, "events"))


@register(
    "q_stream_sliding",
    family="stream",
    oracle="""
SELECT TIMESTAMP '1970-01-01 00:00:00'
         + to_seconds((CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 900) AS BIGINT) - s.i) * 900)
         AS wstart,
       event_type,
       COUNT(*) AS n
FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) s
GROUP BY 1, 2
""",
)
def q_stream_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2: 1-hour windows sliding every 15 min — each event contributes to
    width/slide = 4 windows (Spark expands via an internal explode; state
    and shuffle scale 4x a tumbling window, bounded by the watermark)."""
    return pipelines.sliding_agg(load_table(spark, sf_dir, "events"))


@register(
    "q_stream_session",
    family="stream",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
         lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
), flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR ts - prev_ts >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
  FROM ordered
), sessions AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       {dsum_sql('value', 'total', 4)}
FROM sessions
GROUP BY user_id, sid
""",
)
def q_stream_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3: per-user session windows (30-min inactivity gap) via the native
    session_window operator — state per open session, closed by watermark.
    The oracle proves the semantics equal the gaps-and-islands SQL."""
    return pipelines.session_agg(load_table(spark, sf_dir, "events"))


def _events_stream_dir(sf_dir: str) -> str:
    """A file stream source watches a DIRECTORY; the testdata table is a
    single file. Stage a per-sf temp directory holding a symlink to
    events.parquet — zero data copied, and the watched dir has exactly
    the table's files."""
    d = os.path.join(
        tempfile.gettempdir(), "cb_stream_src_" + re.sub(r"\W", "_", sf_dir)
    )
    os.makedirs(d, exist_ok=True)
    link = os.path.join(d, "events.parquet")
    if not os.path.lexists(link):
        os.symlink(os.path.join(sf_dir, "events.parquet"), link)
    return d


@register(
    "q_stream_run_tumbling",
    family="stream",
    oracle=f"""
SELECT CAST(date_trunc('hour', CAST(ts AS TIMESTAMP)) AS TIMESTAMP) AS wstart,
       event_type,
       COUNT(*) AS n,
       {dsum_sql('value', 'total', 4)}
FROM events
GROUP BY 1, 2
""",
)
def q_stream_run_tumbling(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T1/S6 genuinely STREAMED: the same tumbling agg as
    q_stream_tumbling, but executed by the streaming engine end-to-end —
    readStream file source over the events parquet, micro-batch planner,
    windowed state store, availableNow trigger, memory sink. The oracle
    hash-checking this against DuckDB proves stream execution converges
    to the batch answer on real data (exact decimal sums make it
    arrival-order independent); tests/test_streaming.py additionally
    proves multi-batch incremental arrival (maxFilesPerTrigger=1) and
    watermark semantics the oracle can't see."""
    events = pipelines.read_events_stream(spark, _events_stream_dir(sf_dir))
    return pipelines.run_stream_to_memory(
        pipelines.tumbling_agg(events), "cb_stream_tumbling_sink"
    )


@register(
    "q_stream_run_sliding",
    family="stream",
    oracle="""
SELECT TIMESTAMP '1970-01-01 00:00:00'
         + to_seconds((CAST(floor(epoch(CAST(ts AS TIMESTAMP)) / 900) AS BIGINT) - s.i) * 900)
         AS wstart,
       event_type,
       COUNT(*) AS n
FROM events CROSS JOIN (SELECT unnest([0, 1, 2, 3]) AS i) s
GROUP BY 1, 2
""",
)
def q_stream_run_sliding(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T2 genuinely STREAMED: overlapping-window state (each event lands
    in width/slide = 4 windows; 4x the state rows of tumbling) run
    end-to-end by the streaming engine against the offset-expansion
    batch oracle."""
    events = pipelines.read_events_stream(spark, _events_stream_dir(sf_dir))
    return pipelines.run_stream_to_memory(
        pipelines.sliding_agg(events), "cb_stream_sliding_sink"
    )


@register(
    "q_stream_run_session",
    family="stream",
    oracle=f"""
WITH ordered AS (
  SELECT user_id, CAST(ts AS TIMESTAMP) AS ts, value,
         lag(CAST(ts AS TIMESTAMP)) OVER (PARTITION BY user_id ORDER BY ts) AS prev_ts
  FROM events
), flagged AS (
  SELECT *, CASE WHEN prev_ts IS NULL
                   OR ts - prev_ts >= INTERVAL 30 MINUTE THEN 1 ELSE 0 END AS new_sess
  FROM ordered
), sessions AS (
  SELECT *, SUM(new_sess) OVER (PARTITION BY user_id ORDER BY ts
                                ROWS UNBOUNDED PRECEDING) AS sid
  FROM flagged
)
SELECT user_id,
       MIN(ts) AS session_start,
       MAX(ts) + INTERVAL 30 MINUTE AS session_end,
       COUNT(*) AS n_events,
       {dsum_sql('value', 'total', 4)}
FROM sessions
GROUP BY user_id, sid
""",
)
def q_stream_run_session(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T3 genuinely STREAMED: session_window state (per open session —
    the one state type that MERGES entries as late events bridge two
    sessions) run end-to-end by the streaming engine, hash-matched
    against the gaps-and-islands batch oracle."""
    events = pipelines.read_events_stream(spark, _events_stream_dir(sf_dir))
    return pipelines.run_stream_to_memory(
        pipelines.session_agg(events), "cb_stream_session_sink"
    )


@register(
    "q_stream_run_dedup",
    family="stream",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q_stream_run_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5 genuinely STREAMED: stateful dropDuplicates over the event
    stream (key state, first-arrival wins), run to completion by the
    streaming engine. NO watermark on purpose: with one, a key first
    seen BELOW the advanced watermark in a later micro-batch would be
    silently dropped, diverging from the batch DISTINCT oracle under
    multi-batch arrival — order-independence requires unexpired key
    state, and this bounded source needs no state eviction. (Watermarked
    dedup-with-eviction semantics are pinned separately in
    tests/test_streaming.py.)"""
    events = pipelines.read_events_stream(spark, _events_stream_dir(sf_dir))
    deduped = events.dropDuplicates(["user_id", "event_type"]).select(
        "user_id", "event_type"
    )
    return pipelines.run_stream_to_memory(
        deduped, "cb_stream_dedup_sink", output_mode="append"
    )


@register(
    "q_stream_run_stateful",
    family="stream",
    oracle="""
SELECT user_id,
       COUNT(*) AS n_events,
       round(SUM(value), 4) AS total
FROM events
GROUP BY user_id
""",
)
def q_stream_run_stateful(spark: SparkSession, sf_dir: str) -> DataFrame:
    """U5 genuinely STREAMED and oracle-gated: the custom
    applyInPandasWithState operator (per-user running count/total with
    explicit state updates) run to completion by the streaming engine.
    The bounded source arrives as ONE micro-batch under availableNow, so
    the final emission per user equals the batch aggregate — which is
    exactly what the oracle checks; multi-batch state carry-over is
    pinned separately in tests/test_streaming.py. The kernel's float
    accumulation is per-user sequential within the single batch
    (pandas sum over the user's rows), matching DuckDB's per-group sum
    order after the 4dp round."""
    events = pipelines.read_events_stream(spark, _events_stream_dir(sf_dir))
    return pipelines.run_stream_to_memory(
        pipelines.running_user_totals(events),
        "cb_stream_stateful_sink",
        output_mode="update",
    )


@register(
    "q_stream_dedup",
    family="stream",
    oracle="SELECT DISTINCT user_id, event_type FROM events",
)
def q_stream_dedup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """T5: stateful key dedup. Streaming: dropDuplicates keeps
    first-arrival per key with state bounded by the watermark; batch face
    (this query) is DISTINCT on the key projection — same output set."""
    return pipelines.stream_dedup_keys(
        load_table(spark, sf_dir, "events"), ["user_id", "event_type"]
    )
