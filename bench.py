"""Benchmark harness: runs every oracle-checkable query at
$SPARK_GRAFT_SF_DIR (default /root/testdata/sf0.1) on local[$SPARK_GRAFT_CPUS]
and prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Timing protocol (BASELINE.md): steady-state — each query is run twice and
the second (post-JIT, post-shuffle-service-warmup) run is reported; session
startup is excluded. `value` is the sum of per-query steady-state seconds.
"""

from __future__ import annotations

import json
import os
import sys
import time
from pathlib import Path

_REPO = str(Path(__file__).resolve().parent)
sys.path.insert(0, _REPO)

from cellbase_spark import registry  # noqa: E402
from cellbase_spark.session import get_spark  # noqa: E402

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _sf_from_dir(sf_dir: str) -> float:
    base = os.path.basename(sf_dir.rstrip("/"))
    try:
        return float(base.replace("sf", ""))
    except ValueError:
        return -1.0


def run_query(fn, spark, sf_dir: str) -> float:
    t0 = time.time()
    df = fn(spark, sf_dir)
    # noop sink: forces FULL evaluation of every column (count() would let
    # Catalyst prune pure projections — a zorder/quantize/mask query would
    # measure only its scan), with no Py4J result transfer in the timing.
    df.write.format("noop").mode("overwrite").save()
    return time.time() - t0


def main() -> None:
    spark = get_spark("cellbase-spark-bench")
    spark.sparkContext.setLogLevel("ERROR")
    qs = registry.queries()
    timings: dict[str, float] = {}
    for name in sorted(qs):
        fn = qs[name]
        try:
            run_query(fn, spark, SF_DIR)  # warm-up run
            timings[name] = round(run_query(fn, spark, SF_DIR), 4)
        except Exception as exc:  # never let one query kill the bench
            print(f"bench error {name}: {exc!r}", file=sys.stderr)
            timings[name] = -1.0
    total = round(sum(t for t in timings.values() if t >= 0), 4)
    print(
        json.dumps(
            {
                "metric": "sum_steady_state_query_sec",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "sf": _sf_from_dir(SF_DIR),
            }
        )
    )


if __name__ == "__main__":
    main()
