"""Structured Streaming pipelines (SURVEY.md §2.9).

The unified-API design: every windowed transformation is a plain
DataFrame->DataFrame function in pipelines.py, applied unchanged to either
a static DF (the driver's batch-parity oracle path) or a readStream DF
(the real streaming path, exercised in tests with a file source +
micro-batch control). Watermarks only attach on the streaming side.
"""

from cellbase_spark.streaming.pipelines import (  # noqa: F401
    read_events_stream,
    session_agg,
    sliding_agg,
    stream_dedup_keys,
    tumbling_agg,
)
