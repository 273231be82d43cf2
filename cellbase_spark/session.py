"""SparkSession builder tuned for this engine.

Scale notes (100 TB design intent, local[32] test reality):
- AQE on: runtime partition coalescing + skew-join splitting replaces any
  hand-tuned static plan; at cluster scale AQE re-plans from shuffle stats.
- shuffle.partitions: 32 locally (one per core); on a real cluster this is
  set to ~2-3x total executor cores, and AQE coalesces small partitions.
- UTC session timezone: parquet timestamps are naive; both the engine and
  the DuckDB oracle must interpret them identically.
- Arrow enabled: every Python<->JVM boundary (toPandas, pandas UDFs) is
  Arrow-batched, never row-at-a-time pickling.
- nanosAsLong: tolerance for TIMESTAMP(NANOS) parquet inputs (which
  Spark does not natively read); io.load_table and the streaming reader
  detect such files and convert to microsecond TimestampType (identical
  truncation to DuckDB's ns->us read). The driver testdata itself is
  timestamp[us] and takes the native path.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_SHUFFLE", "32"))


def get_spark(
    app_name: str = "cellbase-spark",
    shuffle_partitions: int | None = None,
    extra_conf: dict | None = None,
) -> SparkSession:
    """Build (or fetch) the engine's SparkSession.

    Works both when we own the session (tests, bench) and when the driver
    hands us one (``__spark_entry__``): `getOrCreate` returns the active
    session, and `configure_session` (below) applies the runtime-settable
    subset of our config to it.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        # Size-gated SMJ->SHJ conversion: AQE converts a sort-merge join to
        # a shuffled hash join only when runtime stats show every build-side
        # partition map fits under this threshold, so it never builds an
        # unbounded hash table (unlike preferSortMergeJoin=false). Measured
        # at sf10 (60M lineitem): q_tpch_q5 9.6s SMJ -> 6.3-7.3s converted;
        # above the threshold the plan stays the spillable SMJ, which is
        # the robust 100 TB default.
        .config("spark.sql.adaptive.shuffledHashJoinLocalMapThreshold", "128m")
        # AQE-only broadcast threshold: unlike the static 10m default this
        # one acts on ACCURATE runtime shuffle sizes, so a filter-reduced
        # join side under 64 MB converts to broadcast after the fact
        # (q_tpch_q5's date+region-reduced orders at sf10: 5.4s -> 3.8s).
        # Static planning keeps the 10m threshold, and explicit merge
        # hints (q_knn_join_smj) are preserved through AQE re-planning.
        .config("spark.sql.adaptive.autoBroadcastJoinThreshold", "64m")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.sql.legacy.parquet.nanosAsLong", "true")
        .config("spark.ui.enabled", "false")
        .config("spark.driver.memory", os.environ.get("SPARK_GRAFT_DRIVER_MEM", "8g"))
        # saveAsTable target for bucketed-table tests; keep out of the repo
        .config("spark.sql.warehouse.dir", "/tmp/cellbase_spark_warehouse")
    )
    for k, v in (extra_conf or {}).items():
        builder = builder.config(k, v)
    spark = builder.getOrCreate()
    configure_session(spark)
    return spark


# Conf keys that are safe to set on an already-running session and that the
# engine depends on for correctness (timezone), for reading the testdata
# (nanos timestamps), or for sane shuffle sizing (a foreign session's
# default 200 partitions means 200 tasks — and 200 streaming state-store
# instances — per 25 MB shuffle at test scale; AQE coalesces batch reads
# but not the state store). Applied defensively in case the driver built
# the session.
_RUNTIME_CONF = {
    "spark.sql.session.timeZone": "UTC",
    "spark.sql.legacy.parquet.nanosAsLong": "true",
    "spark.sql.adaptive.enabled": "true",
    "spark.sql.execution.arrow.pyspark.enabled": "true",
    "spark.sql.shuffle.partitions": str(DEFAULT_SHUFFLE_PARTITIONS),
    # size-gated SMJ->SHJ (see builder note): pure AQE runtime decision,
    # falls back to spillable SMJ whenever a partition exceeds the cap
    "spark.sql.adaptive.shuffledHashJoinLocalMapThreshold": "128m",
    # AQE-only broadcast threshold (see builder note): accurate runtime
    # sizes justify the higher cap; static planning stays at 10m
    "spark.sql.adaptive.autoBroadcastJoinThreshold": "64m",
    # Trust sortBy order on bucketed scans whose buckets are single
    # files (Spark verifies the one-file-per-bucket precondition itself;
    # multi-file buckets keep the defensive re-Sort). The engine writes
    # bucketed layouts repartitioned to the bucket count, so its sorted
    # layouts qualify: drops the per-partition Sort under bucket-local
    # SMJs (q_tpch_q5_bucketed sf10: 2.8s -> 2.1s).
    "spark.sql.legacy.bucketedTableScan.outputOrdering": "true",
    # Always read the engine's bucketed layouts AS bucketed: the
    # DisableUnnecessaryBucketedScan planner rule only credits bucketing
    # that feeds an interesting partitioning (join/agg), so it silently
    # drops the bucketed scan — and with it BUCKET PRUNING — on a point
    # lookup, reverting `SelectedBucketsCount: 1 out of 16` to a scan of
    # every file (r12, q_point_lookup_bucketed). Every bucketed layout
    # this engine writes is deliberate (join locality or key pruning),
    # so the auto-disable heuristic is never right here.
    "spark.sql.sources.bucketing.autoBucketedScan.enabled": "false",
}


def configure_session(spark: SparkSession) -> SparkSession:
    """Apply runtime-settable engine config to an existing session."""
    for k, v in _RUNTIME_CONF.items():
        try:
            spark.conf.set(k, v)
        except Exception:  # pragma: no cover - static conf on foreign session
            pass
    return spark
