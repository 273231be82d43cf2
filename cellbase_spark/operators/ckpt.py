"""Eager localCheckpoint with deterministic block release.

Why this exists: ``df.localCheckpoint(eager=True)`` truncates lineage and
caches the partitions — but the cached blocks are the ONLY copy, so Spark
can never evict them under memory pressure, and PySpark offers no public
handle to free them (``DataFrame.unpersist`` only covers cacheManager
entries). Repeated calls to a checkpoint-using query therefore ACCUMULATE
non-evictable blocks until the JVM GC-locks: measured at sf10,
back-to-back ``q_pagerank`` calls crashed the second run, and at sf1
back-to-back ``q_dedup_clusters`` calls degraded 83 s -> 121 s with
GCLocker thrash (BASELINE.md round-5 notes).

``eager_checkpoint`` keeps the exact localCheckpoint semantics (same
plans, same lineage truncation — the plan-pin suite is unaffected) but
records the underlying JVM RDD handle; ``release_prior`` frees every
recorded handle from PREVIOUS query builds. The registry calls
``release_prior`` at the start of each query build: by then the previous
query's result has been consumed (the driver, bench, and the oracle gate
are all strictly sequential), so its checkpoint blocks are dead weight.

Caveat (documented contract): a caller that builds query A, then builds
query B, and only then collects A would recompute-fail on A's truncated
lineage. No engine surface does this — results are collected before the
next build everywhere (driver contract, bench.py, check_oracle,
driver_sim, tests).
"""

from __future__ import annotations

from pyspark.sql import DataFrame

# JVM RDD handles of checkpoints created by the current query build;
# two generations so the release is strictly "previous build", never
# "the build currently in progress".
_LIVE: list = []


def eager_checkpoint(df: DataFrame) -> DataFrame:
    """``df.localCheckpoint(eager=True)`` + record the block handle."""
    out = df.localCheckpoint(eager=True)
    try:  # handle is best-effort: failing to record must never fail the query
        _LIVE.append(out._jdf.queryExecution().analyzed().rdd())
    except Exception:  # pragma: no cover - py4j accessor drift
        pass
    return out


def release_prior() -> int:
    """Free all recorded checkpoint blocks; returns how many were freed."""
    n = 0
    while _LIVE:
        rdd = _LIVE.pop()
        try:
            rdd.unpersist(False)
            n += 1
        except Exception:  # pragma: no cover - session already stopped
            pass
    return n
