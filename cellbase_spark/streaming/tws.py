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
