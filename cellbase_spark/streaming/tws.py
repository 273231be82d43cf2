"""transformWithStateInPandas pipelines (Spark 4 StatefulProcessor API).

SURVEY.md §2 U6. The TWS Python worker needs the google.protobuf runtime
for its JVM state-server protocol; this container has none, so importing
this module installs the pure-Python wire-format shim
(cellbase_spark.streaming.pbshim) in its place. The processor class is
defined at MODULE level on purpose: cloudpickle then serializes it by
reference, so the Python worker (and the driver-side TWS worker) import
this module to unpickle it — running install() in every process that is
about to speak the state protocol, before the first state call. A
closure-local class would pickle by value and never trigger the
worker-side install.
"""

from __future__ import annotations

import pandas as pd
from pyspark.sql import DataFrame
from pyspark.sql.streaming.stateful_processor import (
    StatefulProcessor,
    StatefulProcessorHandle,
)

from cellbase_spark.streaming import pbshim

pbshim.install()


class RunningTotalsProcessor(StatefulProcessor):
    """Per-user running (count, total) on a named ValueState variable —
    the declared-state successor of applyInPandasWithState's opaque
    tuple (pipelines.running_user_totals, U5): same semantics, so the
    same oracle gates both."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._totals = handle.getValueState("totals", "count long, total double")

    def handleInputRows(self, key, rows, timerValues):
        count, total = (
            self._totals.get() if self._totals.exists() else (0, 0.0)
        )
        for pdf in rows:
            count += len(pdf)
            total += float(pdf["value"].sum())
        self._totals.update((count, total))
        yield pd.DataFrame(
            {"user_id": [key[0]], "n_events": [count], "total": [round(total, 4)]}
        )

    def close(self) -> None:
        pass


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def running_user_totals_tws(events: DataFrame) -> DataFrame:
    """The TWS form of the running per-user accumulator. State is one
    named ValueState per user — bounded by key cardinality, hash-
    partitioned by the groupBy key across executors; at 100 TB the state
    store (RocksDB on a cluster) holds it off-heap per partition.

    TWS state lives in per-variable column families, which the default
    HDFSBackedStateStoreProvider cannot create — RocksDB (bundled with
    Spark 4) is required, so the builder sets it session-wide; it is the
    right provider for large state anyway (off-heap, incremental
    checkpoints)."""
    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    return events.groupBy("user_id").transformWithStateInPandas(
        statefulProcessor=RunningTotalsProcessor(),
        outputStructType="user_id long, n_events long, total double",
        outputMode="Update",
        timeMode="None",
    )


SESSION_GAP_MS = 3600 * 1000  # 1-hour inactivity gap
_SESSION_COLS = ["user_id", "start_ms", "end_ms", "n_events"]


class SessionGapProcessor(StatefulProcessor):
    """Per-user session windows with EVENT-TIME TIMERS: handleInputRows
    walks the user's rows in ts order, extending the open session or
    emitting a finished one when the 1-hour gap is crossed in-stream;
    one timer is (re)armed at session_end + gap, and handleExpiredTimer
    emits the session once the WATERMARK passes that instant — the
    timer-driven close a streaming sessionizer needs for users who
    simply stop sending (in-stream gap detection alone would hold their
    last session open forever). State per user is one (start, end, n)
    ValueState plus one timer — bounded by key cardinality."""

    def init(self, handle: StatefulProcessorHandle) -> None:
        self._handle = handle
        self._sess = handle.getValueState("sess", "start long, end long, n long")

    def handleInputRows(self, key, rows, timerValues):
        parts = [pdf["ts_ms"] for pdf in rows]
        ts = pd.concat(parts).sort_values().astype("int64").tolist()
        out = []
        start = end = n = None
        # INVARIANT (optimization r16, guide §4 — every state/timer call
        # is one JVM state-server round trip through the pure-Python
        # protobuf shim, and this processor is the q_stream_run_timer
        # floor): a user with open-session state has EXACTLY ONE timer
        # registered, at end + GAP. handleInputRows maintains it below;
        # handleExpiredTimer only fires through it (the engine deletes a
        # fired timer itself), and it clears the state in the same
        # breath. So the prior timer is DERIVABLE from the prior state —
        # the old listTimers() iteration (1 RPC per row + terminator)
        # and the unconditional delete+register pair collapse to at most
        # one delete + one register, and to ZERO timer RPCs when the
        # batch did not move session_end. Measured: 6-7 RPCs per user
        # per batch -> 4 (state moved) / 3 (end unchanged).
        prev_timer = None
        if self._sess.exists():
            start, end, n = self._sess.get()
            prev_timer = end + SESSION_GAP_MS
        for t in ts:
            if start is None:
                start, end, n = t, t, 1
            elif t <= end + SESSION_GAP_MS:
                if t > end:
                    end = t
                n += 1
            else:
                out.append((key[0], start, end, n))  # closed in-stream
                start, end, n = t, t, 1
        if start is not None:
            self._sess.update((start, end, n))
            new_timer = end + SESSION_GAP_MS
            if new_timer != prev_timer:
                if prev_timer is not None:
                    self._handle.deleteTimer(prev_timer)
                self._handle.registerTimer(new_timer)
        yield pd.DataFrame(out, columns=_SESSION_COLS)

    def handleExpiredTimer(self, key, timerValues, expiredTimerInfo):
        if self._sess.exists():
            start, end, n = self._sess.get()
            if end + SESSION_GAP_MS <= expiredTimerInfo.getExpiryTimeInMs():
                self._sess.clear()
                yield pd.DataFrame([(key[0], start, end, n)], columns=_SESSION_COLS)

    def close(self) -> None:
        pass


def session_windows_tws(events: DataFrame, watermark: str = "10 minutes") -> DataFrame:
    """Timer-driven per-user sessionization (SessionGapProcessor). The
    input needs an event-time `ts`; emission is append-mode: sessions
    close either in-stream (a later event crosses the gap) or by
    event-time timer once the watermark passes session_end + gap."""
    from pyspark.sql import functions as F

    events.sparkSession.conf.set(
        "spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER
    )
    return (
        events.withWatermark("ts", watermark)
        # unix_millis is exact integer arithmetic on the internal
        # microsecond long; a double-seconds detour could flip a
        # millisecond boundary vs the oracle's epoch_ms
        .select("user_id", F.unix_millis(F.col("ts")).alias("ts_ms"))
        .groupBy("user_id")
        .transformWithStateInPandas(
            statefulProcessor=SessionGapProcessor(),
            outputStructType="user_id long, start_ms long, end_ms long, n_events long",
            outputMode="Append",
            timeMode="EventTime",
        )
    )
